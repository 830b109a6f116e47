"""FD Jacobian spec + the ODE-fit batched benchmark problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enlsip_tpu as et
from enlsip_tpu.models.fd import jac_forward_diff
from enlsip_tpu.problems import ode_fit


def test_jac_forward_diff_matches_ad():
    def fn(x):
        return jnp.array([x[0] ** 2 + x[1], jnp.sin(x[1]) * x[2], x[2]])

    x = jnp.array([1.3, -0.4, 2.0])
    J_fd = jac_forward_diff(fn)(x)
    J_ad = jax.jacfwd(fn)(x)
    np.testing.assert_allclose(np.asarray(J_fd), np.asarray(J_ad),
                               atol=1e-6)


def test_fd_jacobian_solve():
    """Solve HS65-like with an FD residual Jacobian end-to-end."""
    from problems import HS65, HS65_FSTAR
    kw = dict(HS65)
    kw["jacobian_residuals"] = jac_forward_diff(kw["residuals"])
    model = et.CnlsModel(**kw)
    et.solve(model)
    assert et.sum_sq_residuals(model) == pytest.approx(HS65_FSTAR, abs=1e-6)


def test_ode_fit_single():
    model = et.CnlsModel(**ode_fit.model_kwargs())
    et.solve(model)
    assert et.status(model) == "found_first_order_stationary_point"
    assert et.sum_sq_residuals(model) < 1e-3
    s = et.solution(model)
    assert np.all(s >= ode_fit.X_LOW - 1e-8)
    assert np.all(s <= ode_fit.X_UPP + 1e-8)


def test_ode_fit_batched():
    from enlsip_tpu.core.driver import Functions
    from enlsip_tpu.core.types import Dims, Options, Tols
    from enlsip_tpu.models.model import build_constraint_functions
    from enlsip_tpu.parallel import solve_batched

    model = et.CnlsModel(**ode_fit.model_kwargs())
    cons, jac_cons = build_constraint_functions(model)
    fns = Functions(res=ode_fit.residuals,
                    jac_res=jax.jacfwd(ode_fit.residuals),
                    cons=cons, jac_cons=jac_cons)
    dims = Dims(n=10, m=40, q=0, l=20)
    eps = float(jnp.finfo(jnp.float64).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.float64(v) for v in (1e-10, rel, rel, rel, rel)))
    res = solve_batched(fns, ode_fit.perturbed_starts(8), dims, Options(),
                        tols)
    # Multiexponential fits are classically ill-conditioned: from
    # perturbed starts the Newton fallback near the optimum can fail
    # its Cholesky (exit -3, like the reference's error lattice), so
    # success is measured by reaching the data-noise-level optimum.
    good = np.asarray(res.f) < 1e-3
    assert good.mean() >= 0.75, (res.exit_code, res.f)
