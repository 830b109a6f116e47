"""Mesh sharding of batched solves across chips/hosts.

SURVEY.md §5.8: the reference has no communication layer; the TPU-native
design shards the *batch* axis of independent CNLS instances over a
``jax.sharding.Mesh`` and lets XLA insert the collectives (the
all-lanes-converged predicate inside the while_loop becomes an
all-reduce over ICI/DCN; final solutions are gathered only on exit).

Multi-host use: call ``jax.distributed.initialize()`` first, build the
mesh over ``jax.devices()``, and feed a process-local shard of the
batch through ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.driver import Functions
from ..core.types import Dims, Options, Tols
from .batch import BatchResult, finalize, init_batch, run_batch


def batch_mesh(devices: Sequence[jax.Device] | None = None,
               axis: str = "batch") -> Mesh:
    """1-D device mesh over the batch axis (all visible devices by
    default — spanning hosts when jax.distributed is initialized)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis,))


def solve_batched_sharded(fns: Functions, x0_batch, dims: Dims,
                          opts: Options, tols: Tols, mesh: Mesh | None = None,
                          axis: str = "batch", dtype=None) -> BatchResult:
    """Batched solve with the batch dimension sharded over ``mesh``.

    The batch size must divide evenly over the mesh (pad with copies of
    any row and drop the tail if needed — converged duplicates cost one
    frozen lane each).
    """
    mesh = mesh or batch_mesh()
    x0_batch = jnp.asarray(x0_batch)
    dtype = dtype or x0_batch.dtype
    B = x0_batch.shape[0]
    n_dev = mesh.devices.size
    if B % n_dev != 0:
        pad = n_dev - B % n_dev
        x0_batch = jnp.concatenate(
            [x0_batch, jnp.broadcast_to(x0_batch[-1:], (pad,) + x0_batch.shape[1:])])
    sharding = NamedSharding(mesh, P(axis))
    x0_batch = jax.device_put(x0_batch.astype(dtype), sharding)

    # The device_put above pins the batch sharding; jit propagates it
    # through the carry and inserts the convergence all-reduce.
    @partial(jax.jit, static_argnames=("fns", "dims", "opts", "dtype_name"))
    def _run(x0, fns, dims, opts, tols, dtype_name):
        carry = init_batch(fns, x0, dims, opts, jnp.dtype(dtype_name))
        carry = run_batch(carry, fns, dims, opts, tols)
        return finalize(carry)

    res = _run(x0_batch, fns, dims, opts, tols, jnp.dtype(dtype).name)
    if res.x.shape[0] != B:  # drop padding
        res = BatchResult(exit_code=res.exit_code[:B], x=res.x[:B],
                          f=res.f[:B], n_iter=res.n_iter[:B],
                          counters=jax.tree.map(lambda a: a[:B], res.counters))
    return res
