"""Fused batched CPQR: one Pallas program factorizes a block of lanes.

The batched solver's hot factorization is thousands of tiny masked
pivoted QRs (HS-suite shapes: rows, cols <= ~16) under ``vmap``.  As an
XLA loop that regime runs at <1% of HBM stream: each of the ~20 ops per
Householder step is a separate kernel over a (B, 8, 8) buffer whose
trailing dimension fills 8 of 128 vector lanes, and the sequential
``fori_loop`` prevents cross-step fusion.

This kernel runs the ENTIRE factorization of a block of ``LB`` lanes in
one Pallas program, data resident in VMEM, in structure-of-arrays
layout ``(cols, rows, LB)``: the batch fills the 128-wide lane
dimension, matrix axes live on sublanes/major dims, and the step loop
is unrolled (``kmax`` is static and tiny).  Reflector tails are packed
below the diagonal LAPACK-style, so the caller rebuilds the same
compact-WY :class:`~enlsip_tpu.ops.blocked_qr.CPQRF` the XLA path
returns (same pivot tie-breaking, sign convention, tau = 0 no-op
reflectors for zero columns), up to f32 reduction-order rounding.

Reference role: the batched equivalent of LAPACK ``geqp3``
(``qr(A', ColumnNorm())``, /root/reference/src/enlsip_functions.jl:700)
for scenario batches — a regime the single-instance reference never had.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lanes per Pallas program: fills the 128-wide VPU lane dimension and
# amortizes program overhead.  VMEM per program is tiny:
# (cols*rows + cols + kmax) * LB * 4 bytes (~0.5 MB at 16x16x512).
LANE_BLOCK = 512

# Static gates for the kernel path (beyond these, the XLA loop with
# panel-WY blocking is the right tool anyway).
MAX_KMAX = 32
MAX_ELEMS = 32 * 64


def _kernel(a_ref, r_ref, tp_ref, *, kmax: int):
    """Factorize a block of LB lanes.

    a_ref: (cols, rows, LB) SoA input — lane b's matrix is a[:, :, b].T.
    r_ref: (cols, rows, LB) packed output (R in the upper triangle read
      matrix-wise, reflector tails below the diagonal).
    tp_ref: (kmax + cols, LB) — taus stacked over perm.  (This Mosaic
      version SIGABRTs on a third kernel output and on int32 2D
      outputs, so tau and perm ship merged as one f32 buffer; perm
      values are small exact ints, cast back by the wrapper.)
    """
    cols, rows, lb = a_ref.shape
    A = a_ref[...]
    # NOTE: slicing a 3D iota ([:, 0, :]) SIGABRTs this Mosaic version;
    # build each iota directly at the shape it is used at.
    ridx3 = jax.lax.broadcasted_iota(jnp.int32, A.shape, 1)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (cols, lb), 0)   # (cols, LB)
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows, lb), 0)     # (rows, LB)
    # int32 select/reduce chains SIGABRT this Mosaic version, so the
    # permutation bookkeeping runs in f32 (small ints, exact).
    cidx_f = cidx.astype(A.dtype)
    perm = cidx_f
    taus = jnp.zeros((kmax, lb), A.dtype)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (kmax, lb), 0)

    # Mosaic note: every intermediate stays >= 2D with the lane (batch)
    # axis last; per-lane scalars are (1, LB) rows.
    for k in range(kmax):
        # ---- trailing column norms + first-max pivot per lane --------
        # (columns < k hold packed reflector tails below the diagonal;
        # they are excluded from the pivot search by the cidx mask)
        sub = jnp.where(ridx3 >= k, A, 0.0)
        nrm2 = jnp.sum(sub * sub, axis=1)                       # (cols, LB)
        nrm2 = jnp.where(cidx >= k, nrm2, -1.0)
        mx = jnp.max(nrm2, axis=0, keepdims=True)               # (1, LB)
        piv = jnp.min(jnp.where(nrm2 == mx, cidx_f, float(cols)),
                      axis=0, keepdims=True)                    # (1, LB)
        onehot_p = cidx_f == piv                                # (cols, LB)
        is_k = cidx == k
        # ---- swap matrix columns k <-> piv (per lane) -----------------
        colp = jnp.sum(jnp.where(onehot_p[:, None, :], A, 0.0), axis=0)
        colk = A[k]                                             # (rows, LB)
        A = jnp.where(is_k[:, None, :], colp[None],
                      jnp.where(onehot_p[:, None, :], colk[None], A))
        # (sublane-slicing an iota-derived value SIGABRTs this Mosaic
        # version — extract perm[k] by one-hot sum instead)
        pk = jnp.sum(jnp.where(is_k, perm, 0.0), axis=0,
                     keepdims=True)                             # (1, LB)
        pp = jnp.sum(jnp.where(onehot_p, perm, 0.0), axis=0,
                     keepdims=True)                             # (1, LB)
        perm = jnp.where(is_k, pp, jnp.where(onehot_p, pk, perm))
        # ---- Householder reflector on column k ------------------------
        col = A[k]                                              # (rows, LB)
        tail = jnp.where(rr >= k, col, 0.0)
        alpha = col[k:k + 1]                                    # (1, LB)
        signorm = jnp.sqrt(jnp.sum(tail * tail, axis=0,
                                   keepdims=True))              # (1, LB)
        sign = jnp.where(alpha >= 0, 1.0, -1.0)
        beta = -sign * signorm
        denom = alpha - beta
        safe = jnp.abs(denom) > 0
        denom = jnp.where(safe, denom, 1.0)
        v = jnp.where(rr > k, tail / denom, 0.0)
        v = jnp.where(rr == k, jnp.where(safe, 1.0, 0.0), v)    # (rows, LB)
        tau = jnp.where(safe & (beta != 0),
                        (beta - alpha) / jnp.where(beta != 0, beta, 1.0),
                        0.0)                                    # (1, LB)
        taus = jnp.where(kidx == k, tau, taus)
        # ---- apply H = I - tau v v^T to the trailing columns ----------
        # (columns <= k are written explicitly; columns < k hold packed
        # tails that must not receive the update)
        vtA = jnp.sum(v[None] * A, axis=1)                      # (cols, LB)
        vtA = jnp.where(cidx > k, vtA, 0.0)
        A = A - tau[None] * v[None] * vtA[:, None, :]
        # ---- column k: R above, beta on the diagonal, packed reflector
        # tail below (rows < k untouched by H since v vanishes there) --
        newcol = jnp.where(rr == k, jnp.where(safe, beta, alpha),
                           jnp.where(rr < k, colp, v))
        A = jnp.where(is_k[:, None, :], newcol[None], A)

    r_ref[...] = A
    tp_ref[0:kmax, :] = taus
    tp_ref[kmax:kmax + cols, :] = perm


def cpqr_batched_packed(M: jax.Array, *, interpret: bool = False):
    """Batched CPQR of AoS buffers ``M`` (B, rows, cols).

    Returns (packed (B, rows, cols), tau (B, kmax), perm (B, cols) i32):
    R in packed's upper triangle, unit-lower reflector tails below.
    """
    B, rows, cols = M.shape
    kmax = min(rows, cols)
    # Pad the batch to a whole number of kernel lane-blocks.  The grid
    # below is bp // lb, so bp MUST be a multiple of lb: padding only to
    # the 128-lane width left a partial trailing block UNPROCESSED for
    # B > LANE_BLOCK and B % LANE_BLOCK != 0 (e.g. B = 10000: lanes
    # 9728..9999 returned uninitialized garbage — caught round 3 as
    # NaN solves in the ODE-fit bench, tests/test_pallas_batched_qr.py
    # ::test_batched_cpqr_partial_block).
    bp = -(-max(B, 1) // 128) * 128
    lb = min(LANE_BLOCK, bp)
    bp = -(-bp // lb) * lb
    if bp != B:
        M = jnp.pad(M, ((0, bp - B), (0, 0), (0, 0)))
    At = jnp.transpose(M, (2, 1, 0))                            # (cols, rows, bp)
    packed_t, tp_t = pl.pallas_call(
        lambda a, r, tp: _kernel(a, r, tp, kmax=kmax),
        grid=(bp // lb,),
        in_specs=[pl.BlockSpec((cols, rows, lb), lambda i: (0, 0, i))],
        out_specs=(pl.BlockSpec((cols, rows, lb), lambda i: (0, 0, i)),
                   pl.BlockSpec((kmax + cols, lb), lambda i: (0, i))),
        out_shape=(jax.ShapeDtypeStruct((cols, rows, bp), M.dtype),
                   jax.ShapeDtypeStruct((kmax + cols, bp), M.dtype)),
        interpret=interpret,
    )(At)
    packed = jnp.transpose(packed_t, (2, 1, 0))[:B]
    tau = jnp.transpose(tp_t[:kmax], (1, 0))[:B]
    perm = jnp.transpose(tp_t[kmax:], (1, 0))[:B].astype(jnp.int32)
    return packed, tau, perm


def cpqr_blocked_batched(M: jax.Array, *, interpret: bool = False):
    """Batched :class:`~enlsip_tpu.ops.blocked_qr.CPQRF` (leading B axis)
    via the fused kernel — drop-in for ``jax.vmap(cpqr_blocked)``."""
    from .blocked_qr import CPQRF, _panel_T
    B, rows, cols = M.shape
    kmax = min(rows, cols)
    packed, tau, perm = cpqr_batched_packed(M, interpret=interpret)
    ridx = jnp.arange(rows)[None, :, None]
    kcol = jnp.arange(kmax)[None, None, :]
    Bk = packed[:, :, :kmax]
    V = jnp.where(ridx > kcol, Bk, 0.0)
    V = V + jnp.where((ridx == kcol) & (tau[:, None, :] > 0), 1.0, 0.0)
    R = jnp.triu(packed[:, :kmax, :])
    # Single WY panel: nb == kmax (the gate keeps kmax <= 32 << NB).
    T = jax.vmap(lambda v, t: _panel_T(v, t, kmax))(V, tau)
    diag = jnp.diagonal(R, axis1=1, axis2=2)
    return CPQRF(R=R, perm=perm, V=V, tau=tau, T=T, diag=diag)
