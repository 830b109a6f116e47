"""Forward-difference Jacobian fallback.

The reference ships a hand-rolled forward-difference Jacobian
(jac_forward_diff, /root/reference/src/cnls_model.jl:65-82) with step
``delta_j = max(|x_j|, 1) * sqrt(eps)`` even though its constructors
default to AD; we keep the same scheme for user callables that are not
jax-traceable (e.g. wrapping an external simulator via
``jax.pure_callback``), and as the behavioral spec of the no-AD path.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def jac_forward_diff(fn: Callable) -> Callable:
    """Return x -> J where J[i, j] = (fn(x + d_j e_j) - fn(x)) / d_j,
    d_j = max(|x_j|, 1) * sqrt(eps(dtype))."""

    def jac(x):
        x = jnp.asarray(x)
        n = x.shape[0]
        sqrel = jnp.sqrt(jnp.finfo(x.dtype).eps)
        f0 = fn(x)
        delta = jnp.maximum(jnp.abs(x), 1.0) * sqrel

        def col(j):
            return (fn(x.at[j].add(delta[j])) - f0) / delta[j]

        return jax.vmap(col)(jnp.arange(n)).T

    return jac
