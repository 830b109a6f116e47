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


# Carry layout version.  v2 (round 3) removed the trailing
# ``time_exceeded`` leaf; v1 files (no version entry) are migrated on
# load by dropping it.
FORMAT_VERSION = 2


def save_carry(path: str, carry: Carry) -> None:
    """Save a (possibly batched) solver carry to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__format_version__"] = np.int32(FORMAT_VERSION)
    np.savez(path, **arrays)


def load_carry(path: str, like: Carry | None = None) -> Carry:
    """Load a carry saved by :func:`save_carry`.

    ``like`` (any carry with the same structure, e.g. a fresh
    ``init_carry``/``init_batch`` result) provides the pytree structure
    and dtypes; without it the canonical Carry field order is used.
    Files written before the version entry existed (v1: trailing
    ``time_exceeded`` leaf) are migrated transparently.
    """
    data = np.load(path)
    n_leaf = sum(1 for k in data.files if k.startswith("leaf_"))
    version = int(data["__format_version__"]) \
        if "__format_version__" in data.files else 1
    if version > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path!r} has format version {version}; this "
            f"build reads up to {FORMAT_VERSION} — upgrade enlsip_tpu")
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n_leaf)]
    n_expected = jax.tree.structure(_example_carry()).num_leaves
    if version == 1 and len(leaves) == n_expected + 1:
        leaves = leaves[:-1]  # v1 trailing time_exceeded (bool) leaf
    if len(leaves) != n_expected:
        raise ValueError(
            f"checkpoint {path!r} (format v{version}) holds {len(leaves)} "
            f"leaves; the current Carry has {n_expected} — the file was "
            "written by an incompatible enlsip_tpu version")
    if like is not None:
        treedef = jax.tree.structure(like)
        return jax.tree.unflatten(treedef, leaves)
    # Canonical structure: build an example treedef from field types.
    treedef = jax.tree.structure(_example_carry())
    return jax.tree.unflatten(treedef, leaves)


def _example_carry() -> Carry:
    """A structure-only Carry (leaf values unused)."""
    return Carry(
        x=0, rx=0, cx=0, J=0, A=0, gf=0, active_mask=0, w=0, K=0,
        prev=PrevIter(*([0] * len(PrevIter._fields))),
        restart=0, index_del=0, nb_newton_steps=0, nb_iter=0, exit_code=0,
        counters=Counters(0, 0, 0, 0), display=0, n_display=0)
