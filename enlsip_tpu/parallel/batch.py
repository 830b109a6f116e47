"""Batched solves: vmap the whole masked ENLSIP iteration over a batch
of independent CNLS instances.

This is the data-parallel layer the reference does not have (SURVEY.md
§2.4): thousands of scenario instances of the *same-shaped* problem
(shared residual/constraint closures, per-instance data via closure
batching or the x0 batch) advance together inside one jitted
``lax.while_loop``; converged lanes are frozen (guarded_body) and the
loop exits when every lane has terminated.

TPU notes: under vmap the rank-1 CPQR updates fill the vector lanes
with the batch dimension — per-step work becomes (B, rows) x (B, cols)
outer products and (B, m, n) batched GEMMs on the MXU, which is the
intended high-throughput regime.  Sharding the batch axis across a
``Mesh`` turns the convergence predicate into a psum-style collective
that XLA inserts automatically (see parallel/sharding.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.batched import batched_guarded_body
from ..core.driver import Functions, guarded_body, init_carry
from ..core.types import Carry, Counters, Dims, Options, Tols


class BatchResult(NamedTuple):
    """Stacked per-lane results."""

    exit_code: jax.Array   # (B,) raw internal exit codes
    x: jax.Array           # (B, n)
    f: jax.Array           # (B,) ||r(x)||^2
    n_iter: jax.Array      # (B,)
    counters: Counters     # each (B,)


def init_batch(fns: Functions, x0_batch: jax.Array, dims: Dims,
               opts: Options, dtype) -> Carry:
    """Vmapped init_carry over a (B, n) batch of starting points."""
    return jax.vmap(lambda x0: init_carry(fns, x0, dims, opts, dtype))(
        jnp.asarray(x0_batch, dtype))


def run_batch(carry: Carry, fns: Functions, dims: Dims, opts: Options,
              tols: Tols, max_steps: int | None = None,
              specialized: bool = True) -> Carry:
    """Advance every unconverged lane until all lanes terminate (or
    ``max_steps`` loop trips).

    ``specialized=True`` (default) uses the batch-specialized body
    (core/batched.py): rare expensive branches (second working-set
    round, F_L11, subspace, Newton) execute under batch-level conds and
    are skipped entirely whenever no live lane needs them; per-lane
    values are identical to the plain-vmap body.

    Cap invariant: all lanes step in lockstep (a lane's nb_iter only
    advances while its exit_code == 0 and ``record``), so loop trips
    >= any lane's iteration count; max_iter + 2 trips suffice for every
    lane to reach its own -2 exit.  Lanes resumed from a checkpoint
    carry their nb_iter and hit -2 earlier, never later."""
    cap = max_steps if max_steps is not None else opts.max_iter + 2
    if specialized:
        body = partial(batched_guarded_body, fns=fns, dims=dims, opts=opts,
                       tols=tols)
    else:
        body = jax.vmap(partial(guarded_body, fns=fns, dims=dims, opts=opts,
                                tols=tols))

    def cond(state):
        c, trips = state
        return jnp.any(c.exit_code == 0) & (trips < cap)

    def step(state):
        c, trips = state
        return body(c), trips + 1

    final, _ = lax.while_loop(cond, step, (carry, jnp.int32(0)))
    return final


def finalize(carry: Carry) -> BatchResult:
    f = jnp.sum(carry.rx * carry.rx, axis=-1)
    return BatchResult(exit_code=carry.exit_code, x=carry.x, f=f,
                       n_iter=carry.nb_iter, counters=carry.counters)


@partial(jax.jit, static_argnames=("fns", "dims", "opts", "max_steps",
                                   "dtype_name"))
def _solve_batched_jit(x0_batch, fns: Functions, dims: Dims, opts: Options,
                       tols: Tols, max_steps, dtype_name) -> BatchResult:
    dtype = jnp.dtype(dtype_name)
    carry = init_batch(fns, x0_batch, dims, opts, dtype)
    carry = run_batch(carry, fns, dims, opts, tols, max_steps)
    return finalize(carry)


def solve_batched(fns: Functions, x0_batch, dims: Dims, opts: Options,
                  tols: Tols, dtype=None) -> BatchResult:
    """One-call batched solve of B same-shaped CNLS instances.

    ``fns`` must be hashable (e.g. a Functions of top-level closures);
    per-instance data should be baked into x0 or the closures' captured
    batch arrays indexed by a lane id carried in x0's tail — or use the
    lower-level init_batch/run_batch directly under your own jit.
    """
    x0_batch = jnp.asarray(x0_batch)
    dtype = dtype or x0_batch.dtype
    return _solve_batched_jit(x0_batch.astype(dtype), fns, dims, opts, tols,
                              None, jnp.dtype(dtype).name)
