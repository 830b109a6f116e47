"""Factored-Jacobian hook (Functions.jac_rowscale/jac_base): the
solver trajectory must match the dense-Jacobian path.

J(x) = diag(s(x)) @ W for r(x) = Y - phi(W @ x) — the structure the
giant-m config has.  The factored path never materializes J; products
reassociate (s * (W v) vs (s*W) v), so the comparison is
close-to-roundoff at f64, not bit-exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enlsip_tpu.core.driver import Functions, init_carry, run_chunk
from enlsip_tpu.core.types import Dims, Options, Tols


def _tols(dtype):
    eps = float(jnp.finfo(dtype).eps)
    rel = float(np.sqrt(eps))
    return Tols(*(jnp.asarray(v, dtype) for v in (1e-10, rel, rel, rel,
                                                  rel)))


def _problem(m, n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    W = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), dtype)
    xtrue = jnp.asarray(rng.normal(size=(n,)), dtype)
    z = W @ xtrue
    Y = z + 0.1 * jnp.tanh(z) + jnp.asarray(
        0.01 * rng.normal(size=(m,)), dtype)

    def res(x):
        z = W @ x
        return Y - (z + 0.1 * jnp.tanh(z))

    def jac_dense(x):
        z = W @ x
        return -(1.0 + 0.1 * (1.0 - jnp.tanh(z) ** 2))[:, None] * W

    def rowscale(x):
        z = W @ x
        return -(1.0 + 0.1 * (1.0 - jnp.tanh(z) ** 2))

    blo = xtrue[:2] + 0.2  # 2 inequalities active at the solution

    def cons(x):
        return jnp.concatenate(
            [x[:2] - blo, jnp.array([float(n) * 4.0 - jnp.dot(x, x)])])

    dense = Functions(res=res, jac_res=jac_dense, cons=cons,
                      jac_cons=jax.jacfwd(cons))
    fact = Functions(res=res, jac_res=None, cons=cons,
                     jac_cons=jax.jacfwd(cons),
                     jac_rowscale=rowscale, jac_base=lambda: W)
    return dense, fact, Dims(n=n, m=m, q=0, l=3)


def _solve(fns, dims, dtype=jnp.float64, max_iter=25):
    opts = Options(second_derivatives=False, max_iter=max_iter)
    tols = _tols(dtype)

    @jax.jit
    def go(x0, tols):
        c = init_carry(fns, x0, dims, opts, dtype)
        c = run_chunk(c, fns, dims, opts, tols, opts.max_iter + 1)
        return c.x, c.exit_code, c.nb_iter, jnp.sum(c.active_mask)

    return go(jnp.zeros(dims.n, dtype), tols)


@pytest.mark.parametrize("m,n", [(8192, 16),   # tall -> CholQR path
                                 (200, 10)])   # dense CPQR path
def test_factored_matches_dense(m, n):
    dense, fact, dims = _problem(m, n)
    xd, ed, id_, td = _solve(dense, dims)
    xf, ef, if_, tf = _solve(fact, dims)
    assert int(ed) == int(ef), (int(ed), int(ef))
    assert int(id_) == int(if_)
    assert int(td) == int(tf)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xd),
                               rtol=1e-8, atol=1e-10)
    assert int(ed) > 0  # genuinely converged, constraints active
    assert int(td) >= 2


def test_batched_rejects_factored():
    from enlsip_tpu.parallel import solve_batched
    dense, fact, dims = _problem(200, 10)
    with pytest.raises(ValueError, match="single-solve"):
        solve_batched(fact, np.zeros((4, dims.n)), dims, Options(),
                      _tols(jnp.float64), dtype=jnp.float64)


def test_factored_matches_dense_scaling_and_newton():
    """Factored mode composed with EVSCAL row scaling and with the
    second-derivatives (Newton-capable) configuration — the two option
    axes that touch the working-set/direction machinery hardest."""
    dense, fact, dims = _problem(200, 10, seed=3)
    for opts in (Options(scaling=True, second_derivatives=False,
                         max_iter=25),
                 Options(second_derivatives=True, max_iter=25)):
        dtype = jnp.float64
        tols = _tols(dtype)

        def run(fns):
            @jax.jit
            def go(x0, tols):
                from enlsip_tpu.core.driver import init_carry, run_chunk
                c = init_carry(fns, x0, dims, opts, dtype)
                c = run_chunk(c, fns, dims, opts, tols, opts.max_iter + 1)
                return c.x, c.exit_code, c.nb_iter
            return go(jnp.zeros(dims.n, dtype), tols)

        xd, ed, id_ = run(dense)
        xf, ef, if_ = run(fact)
        assert int(ed) == int(ef), (opts, int(ed), int(ef))
        assert int(id_) == int(if_)
        np.testing.assert_allclose(np.asarray(xf), np.asarray(xd),
                                   rtol=1e-8, atol=1e-10)
