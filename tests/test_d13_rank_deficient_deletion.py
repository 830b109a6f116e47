"""D13 (PARITY.md): f32 rank-deficient second-order working-set deletion.

The reference only deletes through the second-order multiplier estimate
when the factorizations are FULL-rank (enlsip_functions.jl:745-790).
At f32 the pseudo-rank can drop AT the optimum; a lane holding a
genuinely negative inequality multiplier there is deadlocked — TERCRI's
necessary conditions fail on sigma_min forever and the lane aborts -6
at a point whose working set is one deletion away from optimal
(measured round 3: 19/10k ODE-fit lanes).  D13 performs the deletion
despite the deficient rank when the iterate is otherwise stationary,
the truncated second estimate still flags the negative multiplier, and
the lane shows stall evidence.  f64 is untouched (dtype-static branch;
pinned transitively by the f64 reference-oracle and golden-trace
suites, which run the identical driver code).

The lanes below were found by running the 4096-lane ODE-fit scenario
batch (bench.bench_ode_fit_batched inputs) on CPU f32 with
``rank_deficient_deletion=False`` and collecting every -6/-4 exit.
"""

import jax
import jax.numpy as jnp
import numpy as np

import enlsip_tpu as et
from enlsip_tpu.core.driver import Functions
from enlsip_tpu.core.types import Dims, Options, Tols
from enlsip_tpu.models.model import (build_constraint_functions,
                                     total_nb_constraints)
from enlsip_tpu.parallel import solve_batched
from enlsip_tpu.problems import ode_fit

_CONS = {}


def _res(x, y):
    return ode_fit.residuals_data(x, y)


def _jac(x, y):
    return jax.jacfwd(ode_fit.residuals_data)(x, y)


def _cons(x, y):
    return _CONS["cons"](x)


def _jac_cons(x, y):
    return _CONS["jac"](x)


def _setup():
    model = et.CnlsModel(**ode_fit.model_kwargs())
    if not _CONS:
        cons, jac = build_constraint_functions(model)
        _CONS["cons"] = cons
        _CONS["jac"] = jac
    fns = Functions(res=_res, jac_res=_jac, cons=_cons, jac_cons=_jac_cons)
    dims = Dims(n=model.nb_parameters, m=model.nb_residuals, q=0,
                l=total_nb_constraints(model))
    eps = float(jnp.finfo(jnp.float32).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.asarray(v, jnp.float32)
                  for v in (1e-10, rel, rel, rel, rel)))
    # Deadlocked lanes of the B=4096 ODE-fit scenario batch (see module
    # docstring); regenerating the full batch keeps the data identical
    # to the discovery run.
    B, idx = 4096, np.array([20, 222, 252, 537, 622, 723, 1326, 2038])
    starts = ode_fit.perturbed_starts(B)[idx]
    ys = ode_fit.scenario_observations(B)[idx].astype(np.float32)
    return fns, dims, tols, starts, ys


def test_d13_deadlock_without_deletion():
    """With the reference's full-rank-only gate (flag off), every pinned
    lane terminates abnormally: stationary, feasible, but sigma_min is
    blocked forever, so no positive exit is possible.  (-6 under the
    pure-f32 decision path; -2/max_iter when jax_enable_x64 promotes the
    merit-derivative decision scalars and the -6 abort never races in —
    either way the lane never converges.)"""
    fns, dims, tols, starts, ys = _setup()
    opts = Options(second_derivatives=False, rank_deficient_deletion=False)
    r = solve_batched(fns, starts, dims, opts, tols, dtype=jnp.float32,
                      data=ys)
    ec = np.asarray(r.exit_code)
    assert np.all(ec < 0), ec
    assert np.all(np.isin(ec, (-2, -6))), ec


def test_d13_deletion_resolves_deadlock():
    """With D13 (default), most pinned lanes convert to positive exits
    and land at the noise-level optimum; none gets WORSE than -6."""
    fns, dims, tols, starts, ys = _setup()
    opts = Options(second_derivatives=False)
    r = solve_batched(fns, starts, dims, opts, tols, dtype=jnp.float32,
                      data=ys)
    ec = np.asarray(r.exit_code)
    f = np.asarray(r.f)
    # At least 6 of the 8 deadlocks resolve to positive exits...
    assert np.sum(ec > 0) >= 6, (ec, f)
    # ...and at least half reach the noise-level optimum outright.
    assert np.sum((ec > 0) & (f < 1e-4)) >= 4, (ec, f)
    # No new abnormal classes appear (-6 may conservatively remain).
    assert np.all((ec > 0) | (ec == -6)), ec
