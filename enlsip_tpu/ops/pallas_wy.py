"""Fused compact-WY right-apply: JQ1 = J @ Q in ONE pass over J.

The giant-m iteration's biggest op cluster is ``right_q_apply`` —
``J - ((J @ V) @ T) @ V^T`` over a (5M, 100) J with a single small
(n, k) panel.  XLA emits the chain as two convolution-emitter GEMMs
that demand a column-major copy of J (a full extra (m, n) HBM round
trip, ~6.9 ms/iteration at the 5M x 100 spec point — measured in
benchmarks/giant_m_profile.py).  This kernel tiles J into row blocks,
keeps V/T resident, and runs all three GEMMs per block on the MXU:
exactly one J read + one JQ1 write of HBM traffic.

Reference role: the Q1 application inside GNSRCH
(/root/reference/src/enlsip_functions.jl:219-220, ``J * F_A.Q``) — the
reference materializes Q via LAPACK; here Q stays a WY panel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Preferred rows per program; actual block is the largest divisor of
# the row count that is a multiple of 8 (sublane width) and <= this.
MAX_ROW_BLOCK = 2048
_HI = jax.lax.Precision.HIGHEST


def _wy_kernel(j_ref, v_ref, t_ref, o_ref):
    J = j_ref[...]                                # (RB, n)
    V = v_ref[...]                                # (n, k)
    T = t_ref[...]                                # (k, k)
    X = jax.lax.dot_general(J, V, (((1,), (0,)), ((), ())),
                            precision=_HI)        # (RB, k)
    X = jax.lax.dot_general(X, T, (((1,), (0,)), ((), ())),
                            precision=_HI)        # (RB, k)
    # X @ V^T without materializing the transpose: contract k with k.
    U = jax.lax.dot_general(X, V, (((1,), (1,)), ((), ())),
                            precision=_HI)        # (RB, n)
    o_ref[...] = J - U


def _row_block(rows: int) -> int | None:
    """Largest divisor of ``rows`` that is a multiple of 8 and at most
    MAX_ROW_BLOCK (None: no usable divisor — caller falls back)."""
    if rows % 8:
        return None
    best = None
    for rb in range(8, MAX_ROW_BLOCK + 1, 8):
        if rows % rb == 0:
            best = rb
    return best


def use_wy_pallas(rows: int, cols: int, k: int, dtype) -> bool:
    """Dispatch gate: tall f32 single-panel applies on TPU."""
    import os
    if os.environ.get("ENLSIP_DISABLE_PALLAS"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no backend configured
        return False
    return (backend in ("tpu", "axon") and dtype == jnp.float32
            and rows >= 32 * cols and rows >= 4096
            and _row_block(rows) is not None)


def wy_right_apply(J: jax.Array, V: jax.Array, T: jax.Array) -> jax.Array:
    """``J - ((J @ V) @ T) @ V.T`` in one fused pass (see module doc)."""
    rows, n = J.shape
    k = V.shape[1]
    rb = _row_block(rows)
    assert rb is not None, rows
    return pl.pallas_call(
        _wy_kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                  pl.BlockSpec((n, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, k), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rb, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, n), J.dtype),
    )(J, V, T)
