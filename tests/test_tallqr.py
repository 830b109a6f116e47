"""Single-chip tall-skinny factorization path (ops/tsqr.py axis=None):
one thin QR + pivoted QR of its R must reproduce the direct CPQR's
R magnitudes / pivoting / rank logic, and the end-to-end solve must
match the pivot-loop path (the giant-m auto-dispatch in
core/subproblem.gn_search_direction)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import enlsip_tpu as et
from enlsip_tpu.core.driver import Functions
from enlsip_tpu.core.types import Dims, Options, Tols
from enlsip_tpu.ops.blocked_qr import cpqr_blocked, qt_apply
from enlsip_tpu.ops.tsqr import tsqr_cpqr, qt_apply_tsqr


def test_tall_cpqr_matches_direct():
    rng = np.random.default_rng(5)
    m, n = 8192, 12
    M = jnp.asarray(rng.normal(size=(m, n)))
    # zero two trailing columns like a masked J2 buffer
    M = M.at[:, 10:].set(0.0)

    direct = jax.jit(lambda M: cpqr_blocked(M))(M)
    tall = jax.jit(lambda M: tsqr_cpqr(M, nsteps=n, axis=None))(M)

    np.testing.assert_array_equal(np.asarray(tall.perm),
                                  np.asarray(direct.perm))
    np.testing.assert_allclose(np.abs(np.asarray(tall.diag)),
                               np.abs(np.asarray(direct.diag)), rtol=1e-10)
    # R rows agree up to per-row sign (Householder sign convention of
    # the thin QR differs from the pivot loop's)
    Rd, Rt = np.asarray(direct.R)[:n], np.asarray(tall.R)[:n]
    sign = np.sign(np.diagonal(Rd)) * np.sign(np.diagonal(Rt))
    sign = np.where(sign == 0, 1.0, sign)
    np.testing.assert_allclose(sign[:, None] * Rt, Rd, atol=1e-9)

    # Q^T v: coefficients within the numerical rank (10 live columns)
    # agree up to the same signs; beyond the rank the basis is
    # arbitrary in BOTH factorizations and no consumer reads those
    # entries individually (solves/prefix norms are truncated at
    # rankJ2) — the total norm is preserved via the complement entry.
    v = jnp.asarray(rng.normal(size=m))
    qd = np.asarray(jax.jit(lambda: qt_apply(direct, v))())
    qt = np.asarray(jax.jit(lambda: qt_apply_tsqr(tall, v))())
    np.testing.assert_allclose(sign[:10] * qt[:10], qd[:10], atol=1e-9)
    np.testing.assert_allclose(np.sum(qt ** 2), np.sum(qd ** 2), rtol=1e-10)


def test_tall_dispatch_solve_matches_loop_path():
    """A tall data-fit problem solved through the auto-dispatched thin-QR
    path must reach the pivot-loop path's solution (same iterations)."""
    N, M_, L = 4, 65536, 3
    rng = np.random.default_rng(1)
    W = rng.normal(size=(M_, N)) / np.sqrt(N)
    xtrue = rng.normal(size=N)
    Y = W @ xtrue + 0.01 * rng.normal(size=M_)

    def res(x):
        z = jnp.asarray(W) @ x
        return jnp.asarray(Y) - (z + 0.05 * jnp.tanh(z))

    def ineq(x):
        return jnp.concatenate([x[:L - 1] + 5.0,
                                jnp.array([16.0 - jnp.dot(x, x)])])

    fns = Functions(res=res, jac_res=jax.jacfwd(res), cons=ineq,
                    jac_cons=jax.jacfwd(ineq))
    dims = Dims(n=N, m=M_, q=0, l=L)
    opts = Options(second_derivatives=False, max_iter=30)
    eps = float(jnp.finfo(jnp.float64).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.float64(v) for v in (1e-10, rel, rel, rel, rel)))
    x0 = jnp.zeros(N, jnp.float64)

    import enlsip_tpu.ops.tsqr as tsqr_mod
    orig_tsqr = tsqr_mod.tsqr_cpqr
    called = {"tall": False}

    def spy(Mb, nsteps, axis):
        if axis is None:
            called["tall"] = True
        return orig_tsqr(Mb, nsteps, axis)

    # auto-dispatch: rows >= 32n and >= 4096 -> tall path (pinned via
    # the Householder variant so the spy sits on the dispatch site; the
    # default cholqr variant's dispatch is covered by test_cholqr.py)
    tsqr_mod.tsqr_cpqr = spy
    try:
        tall = et.core_solve(fns, x0, dims,
                             dataclasses.replace(opts, tall_qr="qr"), tols)
    finally:
        tsqr_mod.tsqr_cpqr = orig_tsqr
    assert called["tall"], "tall auto-dispatch did not trigger"
    assert tall.exit_code > 0

    # force the pivot-loop path through the same call site (CPQRF is
    # consumed by the direct qt_apply branch); clear the jit cache so
    # the patched tracer actually runs
    jax.clear_caches()
    tsqr_mod.tsqr_cpqr = lambda Mb, nsteps, axis: cpqr_blocked(
        Mb, nsteps=nsteps)
    try:
        loop = et.core_solve(fns, x0, dims,
                             dataclasses.replace(opts, tall_qr="qr"), tols)
    finally:
        tsqr_mod.tsqr_cpqr = orig_tsqr
        jax.clear_caches()
    assert loop.exit_code > 0
    assert loop.n_iter == tall.n_iter
    np.testing.assert_allclose(np.asarray(tall.x), np.asarray(loop.x),
                               atol=1e-8)
