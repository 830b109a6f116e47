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


def _data_fns():
    from enlsip_tpu.core.driver import Functions
    from enlsip_tpu.models.model import build_constraint_functions

    model = et.CnlsModel(**ode_fit.model_kwargs())
    cons, jac_cons = build_constraint_functions(model)
    return Functions(
        res=ode_fit.residuals_data,
        jac_res=lambda x, y: jax.jacfwd(ode_fit.residuals_data)(x, y),
        cons=lambda x, y: cons(x),
        jac_cons=lambda x, y: jac_cons(x))


def test_ode_fit_batched_per_lane_data():
    """First-class per-lane data: each lane fits its own noisy
    observation vector and must match the single solve on that data."""
    from enlsip_tpu.core.driver import Functions, solve
    from enlsip_tpu.core.types import Dims, Options, Tols
    from enlsip_tpu.parallel import solve_batched

    B = 6
    fns = _data_fns()
    dims = Dims(n=10, m=40, q=0, l=20)
    rel = float(np.sqrt(jnp.finfo(jnp.float64).eps))
    tols = Tols(*(jnp.float64(v) for v in (1e-10, rel, rel, rel, rel)))
    ys = ode_fit.scenario_observations(B, noise=0.01)
    x0 = np.broadcast_to(ode_fit.X0, (B, 10))

    res = solve_batched(fns, x0, dims, Options(), tols, data=ys)
    f = np.asarray(res.f)
    assert np.all(f < 1e-1)
    # Different data -> different optima (data actually flowed per lane).
    assert np.std(np.asarray(res.x)[:, 0]) > 0
    # Lanes must match their own single-instance solves.  The batched
    # kernels reduce in a different order than the single-instance ones
    # and this multiexponential fit is ill-conditioned, so the match is
    # semantic (same point, same success/failure), not bitwise — the
    # bitwise batch-parity contract is covered on HS65 in test_batch.py.
    sign_match = []
    for i in range(B):
        y_i = jnp.asarray(ys[i])
        single = Functions(res=lambda x: fns.res(x, y_i),
                           jac_res=lambda x: fns.jac_res(x, y_i),
                           cons=lambda x: fns.cons(x, y_i),
                           jac_cons=lambda x: fns.jac_cons(x, y_i))
        sr = solve(single, jnp.asarray(ode_fit.X0, jnp.float64), dims,
                   Options(), tols)
        np.testing.assert_allclose(np.asarray(res.f[i]), sr.f,
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.x[i]), np.asarray(sr.x),
                                   rtol=1e-4, atol=1e-6)
        sign_match.append((int(res.exit_code[i]) > 0) == (sr.exit_code > 0))
    # Exit-status sign can flip on at most one knife-edge lane: at the
    # optimum GNDCHK may escalate to Newton in one lowering and not the
    # other (float-noise-level progress differences), turning +10000
    # into a -3 Cholesky failure AT the already-matched solution.
    assert sum(sign_match) >= B - 1, sign_match


def test_ode_fit_sharded_per_lane_data():
    """Per-lane data under mesh sharding (uneven batch exercises data
    padding)."""
    from enlsip_tpu.core.types import Dims, Options, Tols
    from enlsip_tpu.parallel import batch_mesh, solve_batched_sharded

    B = 5  # not a multiple of 8 devices -> padding path
    fns = _data_fns()
    dims = Dims(n=10, m=40, q=0, l=20)
    rel = float(np.sqrt(jnp.finfo(jnp.float64).eps))
    tols = Tols(*(jnp.float64(v) for v in (1e-10, rel, rel, rel, rel)))
    ys = ode_fit.scenario_observations(B, noise=0.01)
    x0 = np.broadcast_to(ode_fit.X0, (B, 10))
    res = solve_batched_sharded(fns, x0, dims, Options(), tols,
                                mesh=batch_mesh(), data=ys)
    assert res.x.shape[0] == B
    assert np.all(np.asarray(res.f) < 1e-1)
