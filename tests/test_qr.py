"""Unit tests for the masked fixed-shape CPQR and triangular solves
(enlsip_tpu/ops/qr.py) — the L0 numerics substrate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enlsip_tpu.ops.qr import (cpqr, invperm, prefix_norm, pseudo_rank,
                               solve_lower, solve_upper)


def _dense_check(M, ncols):
    """Factor M (with trailing cols zeroed past ncols) and check
    M[:, perm] == Q R on the live columns."""
    rows, cols = M.shape
    Mb = M.copy()
    Mb[:, ncols:] = 0.0
    f = cpqr(jnp.asarray(Mb), jnp.eye(rows))
    Q = np.asarray(f.qt_aug).T  # Q^T I -> rows give Q^T; transpose = Q
    R = np.zeros((rows, cols))
    kmax = min(rows, cols)
    R[:kmax, :] = np.asarray(f.R)
    R = np.triu(R)
    perm = np.asarray(f.perm)
    np.testing.assert_allclose(Q @ R, Mb[:, perm], atol=1e-10)
    # orthogonality
    np.testing.assert_allclose(Q.T @ Q, np.eye(rows), atol=1e-10)
    # live columns pivot before zero columns
    assert set(perm[:ncols]) == set(range(ncols)) or ncols == cols
    return f


def test_cpqr_square():
    rng = np.random.default_rng(0)
    _dense_check(rng.normal(size=(6, 6)), 6)


def test_cpqr_tall():
    rng = np.random.default_rng(1)
    _dense_check(rng.normal(size=(8, 4)), 4)


def test_cpqr_masked_columns():
    rng = np.random.default_rng(2)
    _dense_check(rng.normal(size=(6, 6)), 3)


def test_cpqr_matches_lapack_diag():
    """|diag R| must match scipy's pivoted QR (same pivot strategy)."""
    from scipy.linalg import qr as sqr
    rng = np.random.default_rng(3)
    M = rng.normal(size=(7, 5))
    f = cpqr(jnp.asarray(M))
    _, Rs, _ = sqr(M, pivoting=True)
    np.testing.assert_allclose(np.abs(np.asarray(f.diag)),
                               np.abs(np.diag(Rs)), rtol=1e-10)


def test_cpqr_rank_deficient():
    rng = np.random.default_rng(4)
    B = rng.normal(size=(6, 2))
    M = B @ rng.normal(size=(2, 5))  # rank 2
    f = _dense_check(np.asarray(M), 5)
    r = pseudo_rank(f.diag, jnp.int32(5), jnp.asarray(1e-10))
    assert int(r) == 2


def test_pseudo_rank_empty_and_tiny():
    d = jnp.asarray([0.0, 0.0, 0.0])
    assert int(pseudo_rank(d, jnp.int32(0), jnp.asarray(1e-10))) == 0
    d = jnp.asarray([1e-12, 0.0, 0.0])
    assert int(pseudo_rank(d, jnp.int32(3), jnp.asarray(1e-10))) == 0
    d = jnp.asarray([1.0, 0.5, 1e-14])
    assert int(pseudo_rank(d, jnp.int32(3), jnp.asarray(1e-10))) == 2


def test_solve_upper_masked():
    rng = np.random.default_rng(5)
    R = np.triu(rng.normal(size=(5, 5))) + 5 * np.eye(5)
    b = rng.normal(size=5)
    x = solve_upper(jnp.asarray(R), jnp.asarray(b), jnp.int32(3))
    expect = np.zeros(5)
    expect[:3] = np.linalg.solve(R[:3, :3], b[:3])
    np.testing.assert_allclose(np.asarray(x), expect, atol=1e-12)


def test_solve_lower_masked():
    rng = np.random.default_rng(6)
    L = np.tril(rng.normal(size=(4, 4))) + 4 * np.eye(4)
    b = rng.normal(size=4)
    x = solve_lower(jnp.asarray(L), jnp.asarray(b), jnp.int32(2))
    expect = np.zeros(4)
    expect[:2] = np.linalg.solve(L[:2, :2], b[:2])
    np.testing.assert_allclose(np.asarray(x), expect, atol=1e-12)


def test_invperm():
    p = jnp.asarray([2, 0, 3, 1], dtype=jnp.int32)
    ip = invperm(p)
    np.testing.assert_array_equal(np.asarray(ip)[np.asarray(p)],
                                  np.arange(4))


def test_prefix_norm():
    v = jnp.asarray([3.0, 4.0, 100.0])
    assert float(prefix_norm(v, jnp.int32(2))) == pytest.approx(5.0)


def test_cpqr_under_vmap():
    rng = np.random.default_rng(7)
    Ms = jnp.asarray(rng.normal(size=(3, 5, 4)))
    f = jax.vmap(lambda M: cpqr(M))(Ms)
    for i in range(3):
        fi = cpqr(Ms[i])
        np.testing.assert_allclose(np.asarray(f.R[i]), np.asarray(fi.R),
                                   atol=1e-12)
