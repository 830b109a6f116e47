"""Giant-m row-sharded solve: must compile over an 8-device mesh and
match the dense single-device solution."""

import jax
import jax.numpy as jnp
import numpy as np

import enlsip_tpu as et
from enlsip_tpu.core.driver import Functions
from enlsip_tpu.core.types import Dims, Options, Tols
from enlsip_tpu.parallel.rowsharded import row_mesh, solve_rowsharded

N, M, L = 8, 512, 4
_rng = np.random.default_rng(0)
_T = np.linspace(0.0, 1.0, M)
_W = _rng.normal(size=(M, N)) / np.sqrt(N)
_Y = np.sin(3 * _T) + 0.1 * _rng.normal(size=M)


def _residuals(x):
    # data-fit residuals with a mild nonlinearity
    z = jnp.asarray(_W) @ x
    return jnp.asarray(_Y) - (z + 0.1 * jnp.tanh(z))


def _ineq(x):
    # simple smooth inequality constraints + norm cap
    return jnp.concatenate([x[:L - 1] + 1.0,
                            jnp.array([4.0 - jnp.dot(x, x)])])


def _setup():
    fns = Functions(res=_residuals, jac_res=jax.jacfwd(_residuals),
                    cons=_ineq, jac_cons=jax.jacfwd(_ineq))
    dims = Dims(n=N, m=M, q=0, l=L)
    opts = Options(second_derivatives=False, max_iter=30)
    eps = float(jnp.finfo(jnp.float64).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.float64(v) for v in (1e-10, rel, rel, rel, rel)))
    return fns, dims, opts, tols


def test_rowsharded_matches_dense(eight_devices):
    fns, dims, opts, tols = _setup()
    x0 = jnp.zeros(N, jnp.float64)
    dense = et.core_solve(fns, x0, dims, opts, tols)
    assert dense.exit_code > 0

    mesh = row_mesh(eight_devices)
    carry = solve_rowsharded(fns, x0, dims, opts, tols, mesh=mesh)
    assert int(carry.exit_code) > 0
    np.testing.assert_allclose(np.asarray(carry.x), np.asarray(dense.x),
                               atol=1e-9)
    assert int(carry.nb_iter) == dense.n_iter
