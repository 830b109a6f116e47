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
    model = et.CnlsModel(**ode_fit.model_kwargs())
    dtype = jnp.float32
    res, jac_res, cons, jac_cons = _model_functions(model, dtype)
    fns = Functions(res=res, jac_res=jac_res, cons=cons, jac_cons=jac_cons)
    dims = Dims(n=model.nb_parameters, m=model.nb_residuals, q=0,
                l=total_nb_constraints(model))
    eps = float(jnp.finfo(dtype).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.asarray(v, dtype) for v in (1e-10, rel, rel, rel, rel)))

    starts = ode_fit.perturbed_starts(batch)
    if sharded:
        res_b = solve_batched_sharded(fns, starts, dims, Options(), tols,
                                      mesh=batch_mesh(), dtype=dtype)
    else:
        res_b = solve_batched(fns, starts, dims, Options(), tols, dtype=dtype)
    f = np.asarray(res_b.f)
    print(f"{batch} instances: {np.mean(f < 1e-3):.1%} reached the "
          f"noise-level optimum; median f = {np.median(f):.2e}")


if __name__ == "__main__":
    main()
