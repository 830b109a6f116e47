"""Fused Pallas TPU kernel for column-pivoted Householder QR.

The XLA while-loop factorization (ops/blocked_qr.py) pays per-step op
dispatch and HBM traffic for every pass over the trailing matrix.
This kernel runs the ENTIRE factorization in one ``pallas_call`` with
the matrix resident in VMEM: each of the kmax steps is a handful of
VPU passes over on-chip memory (pivot norms, Householder, rank-1
update), with no HBM round-trips and no per-op overhead.

Applicability: rows * cols * 4 bytes must fit the VMEM budget
(~12 MB on v5e, i.e. up to roughly 2000 x 1500 f32).  Larger problems
fall back to the XLA path.

Storage: LAPACK-style packed output — R in the upper triangle,
reflector tails below the diagonal (unit diagonal implicit), plus
``tau`` and ``perm`` vectors.  The wrapper unpacks into the same
:class:`~enlsip_tpu.ops.blocked_qr.CPQRF` the rest of the solver
consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocked_qr import NB, CPQRF, _panel_T

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _cpqr_kernel(m_hbm_ref, b_ref, tau_ref, perm_ref):
    rows, cols = b_ref.shape
    kmax = min(rows, cols)
    dtype = b_ref.dtype
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)

    # Stream the input from HBM into the (single) resident VMEM buffer;
    # keeping the input out of VMEM halves the kernel's footprint.
    def load(sem):
        dma = pltpu.make_async_copy(m_hbm_ref, b_ref, sem)
        dma.start()
        dma.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA)
    tau_ref[:] = jnp.zeros_like(tau_ref)
    perm_ref[:] = jax.lax.broadcasted_iota(jnp.int32, perm_ref.shape, 1)

    kidx = jax.lax.broadcasted_iota(jnp.int32, tau_ref.shape, 1)

    def step(k, _):
        # ---- pivot: exact trailing column norms (fused masked
        # square-reduce over the resident buffer; no full-size temp) ---
        nrm2 = jnp.sum(jnp.where(ridx >= k, b_ref[:], 0.0) ** 2,
                       axis=0, keepdims=True)                # (1, cols)
        nrm2 = jnp.where(cidx >= k, nrm2, -1.0)
        piv = jnp.argmax(nrm2[0]).astype(jnp.int32)
        # ---- swap columns k <-> piv (masked select; the lane dim
        # cannot be dynamically sliced on TPU) -------------------------
        is_k = cidx == k                                     # (1, cols)
        is_p = cidx == piv
        col_k = jnp.sum(jnp.where(is_k, b_ref[:], 0.0), axis=1,
                        keepdims=True)                       # (rows, 1)
        col_p = jnp.sum(jnp.where(is_p, b_ref[:], 0.0), axis=1,
                        keepdims=True)
        b_ref[:] = jnp.where(is_k, col_p,
                             jnp.where(is_p, col_k, b_ref[:]))
        perm = perm_ref[:]
        pk = jnp.sum(jnp.where(cidx == k, perm, 0))
        pp = jnp.sum(jnp.where(cidx == piv, perm, 0))
        perm_ref[:] = jnp.where(cidx == k, pp,
                                jnp.where(cidx == piv, pk, perm))
        # ---- Householder on column k ---------------------------------
        col = col_p
        tail = jnp.where(ridx >= k, col, 0.0)
        alpha = jnp.sum(jnp.where(ridx == k, col, 0.0))
        signorm = jnp.sqrt(jnp.sum(tail * tail))
        sign = jnp.where(alpha >= 0.0, 1.0, -1.0)
        beta = -sign * signorm
        denom = alpha - beta
        safe = jnp.abs(denom) > 0.0
        denom = jnp.where(safe, denom, 1.0)
        v = jnp.where(ridx > k, tail / denom, 0.0)
        v = v + jnp.where((ridx == k) & safe, 1.0, 0.0)      # (rows, 1)
        tau = jnp.where(safe & (beta != 0.0),
                        (beta - alpha) / jnp.where(beta != 0.0, beta, 1.0),
                        0.0)
        # ---- rank-1 update of columns > k (fused broadcast FMA) ------
        vtB = jnp.sum(v * b_ref[:], axis=0, keepdims=True)   # (1, cols)
        vtB = jnp.where(cidx > k, vtB, 0.0)
        b_ref[:] = b_ref[:] - (tau * v) * vtB
        # ---- pack column k: R above/diag, reflector tail below -------
        newcol = jnp.where(ridx == k, jnp.where(safe, beta, alpha),
                           jnp.where(ridx < k, col, v))
        b_ref[:] = jnp.where(is_k, newcol, b_ref[:])
        tau_ref[:] = jnp.where(kidx == k, tau, tau_ref[:])
        return 0

    lax.fori_loop(0, kmax, step, 0)


def cpqr_pallas_packed(M: jax.Array, *, interpret: bool = False):
    """Run the fused kernel; returns (packed B, tau (1, kp), perm (1, cols))."""
    rows, cols = M.shape
    kmax = min(rows, cols)
    nb = NB if kmax >= NB else kmax
    kp = -(-kmax // nb) * nb
    return pl.pallas_call(
        _cpqr_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), M.dtype),
            jax.ShapeDtypeStruct((1, kp), M.dtype),
            jax.ShapeDtypeStruct((1, cols), jnp.int32),
        ),
        # Input pinned to HBM (ANY sometimes places it in VMEM, doubling
        # the footprint past the 16M budget); the kernel DMAs it in.
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(M)


def cpqr_pallas(M: jax.Array, *, interpret: bool = False) -> CPQRF:
    """Fused-kernel CPQR returning the solver's CPQRF (V unpacked,
    panel-wise WY T factors computed outside the kernel)."""
    rows, cols = M.shape
    kmax = min(rows, cols)
    nb = NB if kmax >= NB else kmax
    kp = -(-kmax // nb) * nb
    B, tau2, perm2 = cpqr_pallas_packed(M, interpret=interpret)
    tau = tau2[0]
    perm = perm2[0]
    R = jnp.triu(B[:kmax, :])
    ridx = jnp.arange(rows)[:, None]
    kidx = jnp.arange(kp)[None, :]
    Bk = jnp.pad(B[:, :kmax], ((0, 0), (0, kp - kmax)))
    V = jnp.where(ridx > kidx, Bk, 0.0)
    V = V + jnp.where((ridx == kidx) & (tau[None, :] > 0), 1.0, 0.0)
    return CPQRF(R=R, perm=perm, V=V, tau=tau,
                 T=_panel_T(V, tau, nb), diag=jnp.diagonal(R))


def fits_vmem(rows: int, cols: int, itemsize: int = 4) -> bool:
    return rows * cols * itemsize <= VMEM_BUDGET_BYTES
