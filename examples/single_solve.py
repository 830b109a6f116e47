"""Single CNLS solve: the HS65 README example."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax.numpy as jnp

import enlsip_tpu as et


def main():
    model = et.CnlsModel(
        residuals=lambda x: jnp.array(
            [x[0] - x[1], (x[0] + x[1] - 10.0) / 3.0, x[2] - 5.0]),
        nb_parameters=3, nb_residuals=3,
        starting_point=np.array([-5.0, 5.0, 0.0]),
        ineq_constraints=lambda x: jnp.array(
            [48.0 - x[0] ** 2 - x[1] ** 2 - x[2] ** 2]),
        nb_ineqcons=1,
        x_low=np.array([-4.5, -4.5, -5.0]),
        x_upp=np.array([4.5, 4.5, 5.0]))
    et.solve(model, silent=False)
    print("solution:", et.solution(model))
    print("objective:", et.sum_sq_residuals(model))


if __name__ == "__main__":
    main()
