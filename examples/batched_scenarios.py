"""Batched parameter estimation: thousands of ODE-fit instances on one
chip (vmap), optionally sharded over every visible device."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import enlsip_tpu as et
from enlsip_tpu.core.driver import Functions
from enlsip_tpu.core.types import Dims, Options, Tols
from enlsip_tpu.models.model import _model_functions, total_nb_constraints
from enlsip_tpu.parallel import batch_mesh, solve_batched, \
    solve_batched_sharded
from enlsip_tpu.problems import ode_fit


def main(batch=4096, sharded=False):
    """Each lane fits ITS OWN noisy observation vector (the per-lane
    ``data=`` API) from a perturbed starting point."""
    import jax as _jax
    model = et.CnlsModel(**ode_fit.model_kwargs())
    dtype = jnp.float32
    from enlsip_tpu.models.model import build_constraint_functions
    cons, jac_cons = build_constraint_functions(model)
    fns = Functions(
        res=ode_fit.residuals_data,
        jac_res=lambda x, y: _jax.jacfwd(ode_fit.residuals_data)(x, y),
        cons=lambda x, y: cons(x), jac_cons=lambda x, y: jac_cons(x))
    dims = Dims(n=model.nb_parameters, m=model.nb_residuals, q=0,
                l=total_nb_constraints(model))
    eps = float(jnp.finfo(dtype).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.asarray(v, dtype) for v in (1e-10, rel, rel, rel, rel)))

    starts = ode_fit.perturbed_starts(batch)
    ys = ode_fit.scenario_observations(batch).astype(np.float32)
    if sharded:
        res_b = solve_batched_sharded(fns, starts, dims, Options(), tols,
                                      mesh=batch_mesh(), dtype=dtype, data=ys)
    else:
        res_b = solve_batched(fns, starts, dims, Options(), tols, dtype=dtype,
                              data=ys)
    f = np.asarray(res_b.f)
    print(f"{batch} instances (per-lane observations): "
          f"{np.mean(f < 1e-3):.1%} reached the noise-level optimum; "
          f"median f = {np.median(f):.2e}")


if __name__ == "__main__":
    main()
