"""geqp3-style panel CPQR (_cpqr_xla_panels) vs the plain rank-1 loop.

The panel variant must reproduce the plain loop's pivot sequence and
factors on generic matrices (values to reduction-order rounding), honor
the traced ``nsteps`` bound, handle masked zero columns, rank
deficiency, and multi-panel shapes, and satisfy the factorization
identity M[:, perm] = Q R.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enlsip_tpu.ops.blocked_qr import (_cpqr_xla, _cpqr_xla_panels, q_apply,
                                       qt_apply)


def _check_pair(M, nb=8, nsteps=None, rtol=1e-10):
    f_ref = _cpqr_xla(M, nb, nsteps)
    f_pan = _cpqr_xla_panels(M, nb, nsteps)
    np.testing.assert_array_equal(np.asarray(f_pan.perm),
                                  np.asarray(f_ref.perm))
    for name in ("R", "V", "tau", "diag"):
        np.testing.assert_allclose(np.asarray(getattr(f_pan, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   rtol=rtol, atol=rtol)
    return f_pan


def test_panels_match_plain_square():
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=(24, 24)))
    _check_pair(M, nb=8)


def test_panels_match_plain_tall_and_wide():
    rng = np.random.default_rng(1)
    _check_pair(jnp.asarray(rng.normal(size=(40, 12))), nb=8)
    _check_pair(jnp.asarray(rng.normal(size=(12, 40))), nb=8)


def test_panels_partial_last_panel():
    rng = np.random.default_rng(2)
    _check_pair(jnp.asarray(rng.normal(size=(30, 21))), nb=8)


def test_panels_masked_zero_columns_and_nsteps():
    rng = np.random.default_rng(3)
    M = np.asarray(rng.normal(size=(20, 16)))
    M[:, 10:] = 0.0                      # masked dead columns
    _check_pair(jnp.asarray(M), nb=8, nsteps=jnp.int32(10))


def test_panels_rank_deficient():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(24, 5))
    M = jnp.asarray(A @ rng.normal(size=(5, 18)))   # rank 5
    f = _cpqr_xla_panels(M, 8, None)
    d = np.abs(np.asarray(f.diag))
    assert (d[5:] < 1e-10 * d[0]).all()


def test_panels_factorization_identity():
    rng = np.random.default_rng(5)
    M = jnp.asarray(rng.normal(size=(35, 22)))
    f = _cpqr_xla_panels(M, 8, None)
    rows = M.shape[0]
    Rfull = jnp.zeros((rows, 22)).at[:22].set(f.R)
    QR = q_apply(f, Rfull)
    np.testing.assert_allclose(np.asarray(QR),
                               np.asarray(M[:, f.perm]), atol=1e-12)
    # Q^T Q = I through the panel T factors
    X = qt_apply(f, q_apply(f, jnp.eye(rows)))
    np.testing.assert_allclose(np.asarray(X), np.eye(rows), atol=1e-12)


def test_panels_large_smoke_f32():
    # Larger multi-panel case at f32 (the deployment regime); compare
    # pivots + diag magnitudes against the plain loop at loose
    # tolerance (downdated vs exact norms round differently).
    rng = np.random.default_rng(6)
    M = jnp.asarray(rng.normal(size=(300, 260)), jnp.float32)
    f_ref = _cpqr_xla(M, 128, None)
    f_pan = _cpqr_xla_panels(M, 128, None)
    np.testing.assert_array_equal(np.asarray(f_pan.perm),
                                  np.asarray(f_ref.perm))
    np.testing.assert_allclose(np.asarray(f_pan.diag),
                               np.asarray(f_ref.diag), rtol=2e-4)
