"""Fused compact-WY right-apply kernels: JQ1 = J @ Q in ONE pass over J.

The giant-m iteration's biggest op cluster is the GN direction's tall
algebra over a (5M, 100) J with a single small (n, k) WY panel:

  JQ1  = J - (J @ V) @ (T @ V^T)     (right_q_apply)
  G    = JQ1^T JQ1                   (the CholQR Gram)
  jtrx = JQ1^T rx                    (d-vector + LEAEST projection)

Left to XLA these cost FIVE (m, n)-class HBM streams per iteration —
J read, JQ1 write, a column-major copy of JQ1 feeding the Gram GEMM's
convolution emitter, and two more JQ1 reads (Gram + projection) —
~33 ms at the 5M x 100 spec point (benchmarks/giant_m_profile.py).
:func:`wy_gram_project` computes all three outputs in ONE fused pass:
row blocks of J stream through VMEM once, V/W stay resident, the
(n, n) Gram and (n,) projection accumulate across the sequential grid
in VMEM, and exactly one J read + one JQ1 write + one rx read of HBM
traffic remain.

The apply uses the 2-GEMM W-form (W = T @ V^T precomputed at trace
level): at the padded MXU tile sizes the dropped (J V) @ T pass is a
third of the MXU work.  Kernel dots inherit the AMBIENT matmul
precision (no explicit ``precision=``): under ``solve``'s scoped
``jax.default_matmul_precision`` (Options.matmul_precision, default
"float32") the kernel runs the same accuracy class as the XLA chain it
replaces; raw ``run_chunk`` harnesses get the JAX default exactly as
they do for every other dot in the loop.

Reference role: the Q1 application inside GNSRCH
(/root/reference/src/enlsip_functions.jl:219-220, ``J * F_A.Q``) — the
reference materializes Q via LAPACK; here Q stays a WY panel and the
Gram/projection consumers fuse into its application.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Preferred rows per program; actual block is the largest divisor of
# the row count that is a multiple of 8 (sublane width) and <= this.
MAX_ROW_BLOCK = 2048


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())))


def _wy_kernel(j_ref, v_ref, w_ref, o_ref):
    J = j_ref[...]                                # (RB, n)
    V = v_ref[...]                                # (n, k)
    W = w_ref[...]                                # (k, n) = T @ V^T
    X = _dot(J, V, (((1,), (0,))))                # (RB, k)
    o_ref[...] = J - _dot(X, W, (((1,), (0,))))   # (RB, n)


def _wy_gram_kernel(j_ref, v_ref, w_ref, rx_ref, o_ref, g_ref, p_ref):
    i = pl.program_id(0)
    J = j_ref[...]                                # (RB, n)
    V = v_ref[...]                                # (n, k)
    W = w_ref[...]                                # (k, n)
    X = _dot(J, V, (((1,), (0,))))                # (RB, k)
    JQ1 = J - _dot(X, W, (((1,), (0,))))          # (RB, n)
    o_ref[...] = JQ1
    G_blk = _dot(JQ1, JQ1, (((0,), (0,))))        # (n, n)
    # rx rides as (8, RB) stripes shared by 8 consecutive programs
    # (Mosaic's (8, 128) tiling forbids 1-sublane blocks; the repeated
    # block index skips the re-fetch), this program's rows at i % 8.
    rxb = rx_ref[pl.ds(i % 8, 1), :]              # (1, RB)
    p_blk = _dot(rxb, JQ1, (((1,), (0,))))        # (1, n)

    @pl.when(i == 0)
    def _init():
        g_ref[...] = G_blk
        p_ref[...] = p_blk

    @pl.when(i != 0)
    def _accum():
        g_ref[...] += G_blk
        p_ref[...] += p_blk


def _wy_gram_scale_kernel(j_ref, v_ref, w_ref, rx_ref, s_ref, o_ref, g_ref,
                          p_ref):
    """Row-scaled variant: the streamed operand is the factored
    Jacobian's BASE matrix and ``s`` holds the per-row scale
    (J = diag(s) @ base), so JQ1 = s ⊙ (base@Q1) without ever
    materializing J (the factored-Jacobian hook, Functions.jac_*)."""
    i = pl.program_id(0)
    B = j_ref[...]                                # (RB, n) base rows
    V = v_ref[...]                                # (n, k)
    W = w_ref[...]                                # (k, n)
    X = _dot(B, V, (((1,), (0,))))                # (RB, k)
    BQ1 = B - _dot(X, W, (((1,), (0,))))          # (RB, n)
    # scale rides the same (8, RB) stripe layout as rx; one relayout
    # turns this program's (1, RB) slice into a (RB, 1) column.
    s_row = s_ref[pl.ds(i % 8, 1), :]             # (1, RB)
    JQ1 = BQ1 * jnp.transpose(s_row, (1, 0))      # (RB, n)
    o_ref[...] = JQ1
    G_blk = _dot(JQ1, JQ1, (((0,), (0,))))        # (n, n)
    rxb = rx_ref[pl.ds(i % 8, 1), :]              # (1, RB)
    p_blk = _dot(rxb, JQ1, (((1,), (0,))))        # (1, n)

    @pl.when(i == 0)
    def _init():
        g_ref[...] = G_blk
        p_ref[...] = p_blk

    @pl.when(i != 0)
    def _accum():
        g_ref[...] += G_blk
        p_ref[...] += p_blk


def _wy_gram_scale_noout_kernel(j_ref, v_ref, w_ref, rx_ref, s_ref, g_ref,
                                p_ref):
    """Row-scaled variant WITHOUT the JQ1 output: when every downstream
    consumer rides the Gram (the factored-Jacobian GN path with
    second_derivatives off), the (m, n) JQ1 write is pure waste — this
    kernel streams the base ONCE and emits only the (n, n) Gram and the
    (n,) projection."""
    i = pl.program_id(0)
    B = j_ref[...]                                # (RB, n) base rows
    V = v_ref[...]                                # (n, k)
    W = w_ref[...]                                # (k, n)
    X = _dot(B, V, (((1,), (0,))))                # (RB, k)
    BQ1 = B - _dot(X, W, (((1,), (0,))))          # (RB, n)
    s_row = s_ref[pl.ds(i % 8, 1), :]             # (1, RB)
    JQ1 = BQ1 * jnp.transpose(s_row, (1, 0))      # (RB, n)
    G_blk = _dot(JQ1, JQ1, (((0,), (0,))))        # (n, n)
    rxb = rx_ref[pl.ds(i % 8, 1), :]              # (1, RB)
    p_blk = _dot(rxb, JQ1, (((1,), (0,))))        # (1, n)

    @pl.when(i == 0)
    def _init():
        g_ref[...] = G_blk
        p_ref[...] = p_blk

    @pl.when(i != 0)
    def _accum():
        g_ref[...] += G_blk
        p_ref[...] += p_blk


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
    W = T @ V.T                                   # (k, n), trace-level
    return pl.pallas_call(
        _wy_kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                  pl.BlockSpec((n, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rb, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, n), J.dtype),
    )(J, V, W)


def wy_gram_project(J: jax.Array, V: jax.Array, T: jax.Array,
                    rx: jax.Array, rowscale: jax.Array | None = None):
    """Fused ``(JQ1, JQ1^T JQ1, JQ1^T rx)`` in one pass over J.

    Returns ``(JQ1 (m, n), G (n, n), jtrx (n,))``.  The Gram is raw
    (unmasked) — exactly what :func:`ops.tsqr.cholqr_cpqr` computes
    internally; dead-column masking stays on the (n, n) side.

    ``rowscale`` (factored-Jacobian mode): ``J`` is then the constant
    BASE matrix and the semantic Jacobian is ``diag(rowscale) @ J``;
    the scale is applied in-kernel after the WY apply, so the dense
    Jacobian is never materialized in HBM."""
    rows, n = J.shape
    k = V.shape[1]
    rb = _row_block(rows)
    assert rb is not None, rows
    W = T @ V.T                                   # (k, n), trace-level
    # (nblk, RB) row-stripe layout: a (m,) lane-major operand would pad
    # every block's lane dim to 128 and stream 128x the bytes; the
    # (8, RB) block satisfies the (8, 128) tiling rule and is fetched
    # once per 8 programs (see kernel comment).
    rx2 = rx.reshape(rows // rb, rb)
    stripe = pl.BlockSpec((8, rb), lambda i: (i // 8, 0))
    common = dict(
        grid=(rows // rb,),
        out_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                   pl.BlockSpec((n, n), lambda i: (0, 0)),
                   pl.BlockSpec((1, n), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, n), J.dtype),
                   jax.ShapeDtypeStruct((n, n), J.dtype),
                   jax.ShapeDtypeStruct((1, n), J.dtype)])
    base_specs = [pl.BlockSpec((rb, n), lambda i: (i, 0)),
                  pl.BlockSpec((n, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0)), stripe]
    if rowscale is None:
        JQ1, G, jtrx = pl.pallas_call(
            _wy_gram_kernel, in_specs=base_specs, **common)(J, V, W, rx2)
    else:
        s2 = rowscale.reshape(rows // rb, rb)
        JQ1, G, jtrx = pl.pallas_call(
            _wy_gram_scale_kernel, in_specs=base_specs + [stripe],
            **common)(J, V, W, rx2, s2)
    return JQ1, G, jtrx[0]


def wy_gram_project_noapply(J: jax.Array, V: jax.Array, T: jax.Array,
                            rx: jax.Array, rowscale: jax.Array):
    """Factored-mode Gram/projection WITHOUT materializing JQ1: one
    base read of HBM traffic, period.  Returns ``(G (n, n), jtrx (n,))``
    for ``JQ1 = diag(rowscale) @ (J @ Q1)``.  Only valid when every
    downstream consumer rides the Gram (``j2_transform_d``'s and
    ``second_mult_estimate``'s CholQRF small-side algebra; Newton off)."""
    rows, n = J.shape
    k = V.shape[1]
    rb = _row_block(rows)
    assert rb is not None, rows
    W = T @ V.T
    stripe = pl.BlockSpec((8, rb), lambda i: (i // 8, 0))
    G, jtrx = pl.pallas_call(
        _wy_gram_scale_noout_kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                  pl.BlockSpec((n, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0)), stripe, stripe],
        out_specs=[pl.BlockSpec((n, n), lambda i: (0, 0)),
                   pl.BlockSpec((1, n), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n, n), J.dtype),
                   jax.ShapeDtypeStruct((1, n), J.dtype)],
    )(J, V, W, rx.reshape(rows // rb, rb),
      rowscale.reshape(rows // rb, rb))
    return G, jtrx[0]
