"""Checkpoint / resume for (batched) solver state.

The reference has no checkpointing (SURVEY.md §5.4); the nearest
mechanism is re-``solve!`` from the last iterate.  Here the entire
solver state is one fixed-shape pytree (:class:`~enlsip_tpu.core.types.Carry`),
so checkpointing a million-instance batched solve is a flat save of
its leaves.  Uses numpy ``.npz`` (no external deps); orbax users can
pass the same pytree to ``orbax.checkpoint`` directly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.types import Carry, Counters, PrevIter


def save_carry(path: str, carry: Carry) -> None:
    """Save a (possibly batched) solver carry to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path, **arrays)


def load_carry(path: str, like: Carry | None = None) -> Carry:
    """Load a carry saved by :func:`save_carry`.

    ``like`` (any carry with the same structure, e.g. a fresh
    ``init_carry``/``init_batch`` result) provides the pytree structure
    and dtypes; without it the canonical Carry field order is used.
    """
    data = np.load(path)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    if like is not None:
        treedef = jax.tree.structure(like)
        return jax.tree.unflatten(treedef, leaves)
    # Canonical structure: build an example treedef from field types.
    example = Carry(
        x=0, rx=0, cx=0, J=0, A=0, gf=0, active_mask=0, w=0, K=0,
        prev=PrevIter(*([0] * len(PrevIter._fields))),
        restart=0, index_del=0, nb_newton_steps=0, nb_iter=0, exit_code=0,
        counters=Counters(0, 0, 0, 0), display=0, n_display=0)
    treedef = jax.tree.structure(example)
    return jax.tree.unflatten(treedef, leaves)
