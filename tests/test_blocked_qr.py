"""Blocked CPQR vs the unblocked reference implementation and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enlsip_tpu.ops.blocked_qr import (cpqr_blocked, q_apply, qt_apply,
                                       right_q_apply)
from enlsip_tpu.ops.qr import cpqr


def _check(M, nb):
    rows, cols = M.shape
    kmax = min(rows, cols)
    f = cpqr_blocked(jnp.asarray(M), nb=nb)
    Q = np.asarray(q_apply(f, jnp.eye(rows)))
    R = np.zeros((rows, cols))
    R[:kmax] = np.asarray(f.R)
    perm = np.asarray(f.perm)
    np.testing.assert_allclose(Q @ R, M[:, perm], atol=1e-9 * max(1, np.abs(M).max()))
    np.testing.assert_allclose(Q.T @ Q, np.eye(rows), atol=1e-10)
    return f


@pytest.mark.parametrize("shape,nb", [((6, 6), 8), ((40, 24), 8),
                                      ((24, 40), 8), ((65, 33), 16),
                                      ((128, 100), 32)])
def test_blocked_reconstruction(shape, nb):
    rng = np.random.default_rng(42)
    _check(rng.normal(size=shape), nb)


def test_blocked_matches_unblocked():
    rng = np.random.default_rng(1)
    M = rng.normal(size=(50, 30))
    fb = cpqr_blocked(jnp.asarray(M), nb=8)
    fu = cpqr(jnp.asarray(M))
    np.testing.assert_array_equal(np.asarray(fb.perm), np.asarray(fu.perm))
    np.testing.assert_allclose(np.asarray(fb.R), np.asarray(fu.R), atol=1e-10)


def test_blocked_masked_columns():
    rng = np.random.default_rng(2)
    M = rng.normal(size=(30, 20))
    M[:, 12:] = 0.0
    f = _check(M, 8)
    assert set(np.asarray(f.perm)[:12]) == set(range(12))
    assert np.all(np.abs(np.asarray(f.diag)[12:]) < 1e-12)


def test_blocked_rank_deficient():
    rng = np.random.default_rng(3)
    M = rng.normal(size=(40, 5)) @ rng.normal(size=(5, 30))
    f = _check(M, 8)
    d = np.abs(np.asarray(f.diag))
    assert np.all(d[5:] < 1e-8 * d[0])


def test_apply_consistency():
    rng = np.random.default_rng(4)
    M = rng.normal(size=(30, 18))
    f = cpqr_blocked(jnp.asarray(M), nb=8)
    Q = np.asarray(q_apply(f, jnp.eye(30)))
    x = rng.normal(size=30)
    np.testing.assert_allclose(np.asarray(qt_apply(f, jnp.asarray(x))),
                               Q.T @ x, atol=1e-10)
    J = rng.normal(size=(12, 30))
    np.testing.assert_allclose(np.asarray(right_q_apply(f, jnp.asarray(J))),
                               J @ Q, atol=1e-10)


def test_blocked_under_vmap():
    rng = np.random.default_rng(5)
    Ms = jnp.asarray(rng.normal(size=(4, 20, 12)))
    fs = jax.vmap(lambda M: cpqr_blocked(M, nb=8))(Ms)
    for i in range(4):
        fi = cpqr_blocked(Ms[i], nb=8)
        np.testing.assert_allclose(np.asarray(fs.R[i]), np.asarray(fi.R),
                                   atol=1e-12)
