"""Working-set mask invariants — the analogue of the reference's
test/internal/working_set.jl plus masked-formulation properties."""

import jax.numpy as jnp
import numpy as np

from enlsip_tpu.core.types import Dims, working_view
from enlsip_tpu.core.working_set import (evaluate_violated_constraints,
                                         init_working_set)


def test_working_view_partition():
    mask = jnp.asarray([True, False, True, True, False])
    v = working_view(mask)
    assert int(v.t) == 3
    al = np.asarray(v.active_list)
    np.testing.assert_array_equal(al[:3], [0, 2, 3])   # sorted active
    np.testing.assert_array_equal(al[3:], [1, 4])      # sorted inactive


def test_working_view_all_and_none():
    v = working_view(jnp.ones(4, bool))
    assert int(v.t) == 4
    np.testing.assert_array_equal(np.asarray(v.active_list), np.arange(4))
    v = working_view(jnp.zeros(4, bool))
    assert int(v.t) == 0
    np.testing.assert_array_equal(np.asarray(v.active_list), np.arange(4))


def test_init_working_set():
    """INIALC: equalities always active; inequalities active iff
    cx <= noise scale (reference: cx <= 0; see PARITY.md D7);
    w = min(|cx| + 0.01, 0.1); K = 0.1."""
    dims = Dims(n=5, m=4, q=2, l=6)
    cx = jnp.asarray([1.0, -1.0, -0.5, 0.3, 0.0, 2.0])
    A = jnp.ones((6, 5))
    x = jnp.ones(5)
    mask, w, K = init_working_set(cx, A, x, dims)
    np.testing.assert_array_equal(
        np.asarray(mask), [True, True, True, False, True, False])
    np.testing.assert_allclose(
        np.asarray(w), [0.1, 0.1, 0.1, 0.1, 0.01, 0.1])
    assert np.all(np.asarray(K) == 0.1)


def test_init_working_set_noise_window():
    """An inequality whose cx is positive but below its evaluation-noise
    scale eps*(1 + |grad c|*|x|) starts ACTIVE (f32: it is on the
    boundary as far as the dtype can tell); above the scale it starts
    inactive.  Closes the D7 gap with UPBND's candidacy window."""
    dims = Dims(n=3, m=3, q=0, l=2)
    dtype = jnp.float32
    x = jnp.asarray([3.65, 3.65, 4.62], dtype)
    A = jnp.asarray([[-7.3, -7.3, -9.24], [1.0, 0.0, 0.0]], dtype)
    eps = float(jnp.finfo(dtype).eps)
    noise0 = eps * (1.0 + float(jnp.linalg.norm(A[0])) *
                    float(jnp.linalg.norm(x)))
    cx = jnp.asarray([0.5 * noise0, 10.0 * noise0], dtype)
    mask, _, _ = init_working_set(cx, A, x, dims)
    np.testing.assert_array_equal(np.asarray(mask), [True, False])


def test_evadd_adds_violated():
    dims = Dims(n=5, m=4, q=1, l=4)
    mask = jnp.asarray([True, False, False, False])
    cx = jnp.asarray([0.0, -0.2, 0.5, -1e-12])
    mask2, added = evaluate_violated_constraints(cx, mask, jnp.int32(-1), dims)
    assert bool(added)
    np.testing.assert_array_equal(np.asarray(mask2),
                                  [True, True, False, True])


def test_evadd_alpha_upp_threshold():
    """The steplength-capping constraint is added already at cx < 0.1."""
    dims = Dims(n=5, m=4, q=0, l=3)
    mask = jnp.zeros(3, bool)
    cx = jnp.asarray([0.05, 0.05, 0.5])
    m_no, _ = evaluate_violated_constraints(cx, mask, jnp.int32(-1), dims)
    np.testing.assert_array_equal(np.asarray(m_no), [False] * 3)
    m_yes, _ = evaluate_violated_constraints(cx, mask, jnp.int32(1), dims)
    np.testing.assert_array_equal(np.asarray(m_yes), [False, True, False])


def test_evadd_capacity_swap():
    """t is capped at min(l, n); the least-violated active inequality is
    swapped out for a more-violated candidate."""
    dims = Dims(n=2, m=4, q=0, l=3)  # capacity min(3, 2) = 2
    mask = jnp.asarray([True, True, False])
    cx = jnp.asarray([0.5, -0.1, -1.0])  # active 0 not violated, cand 2 worse
    mask2, added = evaluate_violated_constraints(cx, mask, jnp.int32(-1), dims)
    assert bool(added)
    np.testing.assert_array_equal(np.asarray(mask2), [False, True, True])
    assert int(jnp.sum(mask2)) == 2
