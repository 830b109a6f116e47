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
from ..core.types import Dims, Options, Tols, matmul_precision_scope
from .batch import BatchResult, finalize, init_batch, run_batch


def batch_mesh(devices: Sequence[jax.Device] | None = None,
               axis: str = "batch") -> Mesh:
    """1-D device mesh over the batch axis (all visible devices by
    default — spanning hosts when jax.distributed is initialized)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis,))


def solve_batched_sharded(fns: Functions, x0_batch, dims: Dims,
                          opts: Options, tols: Tols, mesh: Mesh | None = None,
                          axis: str = "batch", dtype=None,
                          data=None, rdims=None) -> BatchResult:
    """Batched solve with the batch dimension sharded over ``mesh``.

    The batch size must divide evenly over the mesh (pad with copies of
    any row and drop the tail if needed — converged duplicates cost one
    frozen lane each).  ``data``: optional per-lane data pytree as in
    :func:`solve_batched`; its leaves are sharded over the same axis.
    """
    mesh = mesh or batch_mesh()
    x0_batch = jnp.asarray(x0_batch)
    dtype = dtype or x0_batch.dtype
    B = x0_batch.shape[0]
    n_dev = mesh.devices.size
    pad = (n_dev - B % n_dev) % n_dev

    def pad_lanes(a):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])])

    sharding = NamedSharding(mesh, P(axis))
    x0_batch = jax.device_put(pad_lanes(x0_batch.astype(dtype)), sharding)
    data = () if data is None else jax.tree.map(
        lambda a: jax.device_put(pad_lanes(jnp.asarray(a)), sharding), data)
    rdims = None if rdims is None else jax.tree.map(
        lambda a: jax.device_put(pad_lanes(jnp.asarray(a)), sharding), rdims)

    # The device_put above pins the batch sharding; jit propagates it
    # through the carry and inserts the convergence all-reduce.
    @partial(jax.jit, static_argnames=("fns", "dims", "opts", "dtype_name"))
    def _run(x0, data, rdims, fns, dims, opts, tols, dtype_name):
        carry = init_batch(fns, x0, dims, opts, jnp.dtype(dtype_name), data,
                           rdims)
        carry = run_batch(carry, fns, dims, opts, tols, data=data,
                          rdims=rdims)
        return finalize(carry)

    with matmul_precision_scope(opts):
        res = _run(x0_batch, data, rdims, fns, dims, opts, tols,
                   jnp.dtype(dtype).name)
    if res.x.shape[0] != B:  # drop padding
        res = BatchResult(exit_code=res.exit_code[:B], x=res.x[:B],
                          f=res.f[:B], n_iter=res.n_iter[:B],
                          counters=jax.tree.map(lambda a: a[:B], res.counters))
    return res
