"""Fused Pallas CPQR, v2: transposed layout + dynamic step bound.

Improvements over ops/pallas_qr.py:

* The matrix lives TRANSPOSED in VMEM (``Bt = M.T``, shape
  (cols, rows)): matrix columns become sublane-dimension rows, which
  Mosaic CAN dynamically slice — pivot swaps, column extraction and
  the packed write are O(rows) row ops instead of full-matrix masked
  selects.  Per step only three full passes remain (trailing norms,
  v^T B, rank-1 update), and v^T B is an MXU matvec with the
  contraction on the lane dimension.
* ``nsteps`` (the live-column count) enters via SMEM, so masked
  buffers (like the solver's J2, with n - rankA live columns of n)
  stop after the live columns instead of running min(rows, cols)
  no-op steps.

Returns the same :class:`~enlsip_tpu.ops.blocked_qr.CPQRF` as the XLA
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocked_qr import NB, CPQRF, _panel_T

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _kernel(nsteps_ref, mt_hbm_ref, bt_ref, tau_ref, perm_ref):
    cols, rows = bt_ref.shape
    kmax = min(rows, cols)
    dtype = bt_ref.dtype
    cidx = jax.lax.broadcasted_iota(jnp.int32, (cols, 1), 0)   # B-columns
    lidx = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)   # B-rows

    def load(sem):
        dma = pltpu.make_async_copy(mt_hbm_ref, bt_ref, sem)
        dma.start()
        dma.wait()

    pl.run_scoped(load, pltpu.SemaphoreType.DMA)
    tau_ref[:] = jnp.zeros_like(tau_ref)
    perm_ref[:] = jax.lax.broadcasted_iota(jnp.int32, perm_ref.shape, 1)
    kidx = jax.lax.broadcasted_iota(jnp.int32, tau_ref.shape, 1)
    nsteps = jnp.minimum(nsteps_ref[0], kmax)

    def step(k, _):
        # ---- trailing column norms (B-rows >= k == lanes >= k) -------
        nrm2 = jnp.sum(jnp.where(lidx >= k, bt_ref[:], 0.0) ** 2,
                       axis=1, keepdims=True)                  # (cols, 1)
        nrm2 = jnp.where(cidx >= k, nrm2, -1.0)
        piv = jnp.argmax(nrm2[:, 0]).astype(jnp.int32)
        # ---- swap B-columns k <-> piv (rows of Bt) -------------------
        row_k = bt_ref[pl.ds(k, 1), :]                          # (1, rows)
        row_p = bt_ref[pl.ds(piv, 1), :]
        bt_ref[pl.ds(piv, 1), :] = row_k
        bt_ref[pl.ds(k, 1), :] = row_p
        perm = perm_ref[:]
        pidx = jax.lax.broadcasted_iota(jnp.int32, perm.shape, 1)
        pk = jnp.sum(jnp.where(pidx == k, perm, 0))
        pp = jnp.sum(jnp.where(pidx == piv, perm, 0))
        perm_ref[:] = jnp.where(pidx == k, pp,
                                jnp.where(pidx == piv, pk, perm))
        # ---- Householder on the (1, rows) column ---------------------
        col = row_p
        tail = jnp.where(lidx >= k, col, 0.0)
        alpha = jnp.sum(jnp.where(lidx == k, col, 0.0))
        signorm = jnp.sqrt(jnp.sum(tail * tail))
        sign = jnp.where(alpha >= 0.0, 1.0, -1.0)
        beta = -sign * signorm
        denom = alpha - beta
        safe = jnp.abs(denom) > 0.0
        denom = jnp.where(safe, denom, 1.0)
        v = jnp.where(lidx > k, tail / denom, 0.0)
        v = v + jnp.where((lidx == k) & safe, 1.0, 0.0)         # (1, rows)
        tau = jnp.where(safe & (beta != 0.0),
                        (beta - alpha) / jnp.where(beta != 0.0, beta, 1.0),
                        0.0)
        # ---- v^T B as an MXU matvec: Bt @ v^T ------------------------
        vtB = jnp.dot(bt_ref[:], v.T,
                      preferred_element_type=dtype)             # (cols, 1)
        vtB = jnp.where(cidx > k, vtB, 0.0)
        # ---- rank-1 update (broadcast FMA) ---------------------------
        bt_ref[:] = bt_ref[:] - (tau * vtB) * v
        # ---- pack column k: R above/diag, reflector tail below -------
        newrow = jnp.where(lidx == k, jnp.where(safe, beta, alpha),
                           jnp.where(lidx < k, col, v))
        bt_ref[pl.ds(k, 1), :] = newrow
        tau_ref[:] = jnp.where(kidx == k, tau, tau_ref[:])
        return 0

    lax.fori_loop(0, nsteps, step, 0)


def cpqr_pallas2_packed(M: jax.Array, nsteps, *, interpret: bool = False):
    """Run the v2 kernel.  Returns (Bt packed (cols, rows), tau (1, kp),
    perm (1, cols))."""
    rows, cols = M.shape
    kmax = min(rows, cols)
    nb = NB if kmax >= NB else kmax
    kp = -(-kmax // nb) * nb
    nsteps = jnp.asarray(nsteps, jnp.int32).reshape(1)
    return pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((cols, rows), M.dtype),
            jax.ShapeDtypeStruct((1, kp), M.dtype),
            jax.ShapeDtypeStruct((1, cols), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(nsteps, M.T)


def cpqr_pallas2(M: jax.Array, nsteps=None, *, interpret: bool = False) -> CPQRF:
    rows, cols = M.shape
    kmax = min(rows, cols)
    nb = NB if kmax >= NB else kmax
    kp = -(-kmax // nb) * nb
    if nsteps is None:
        nsteps = kmax
    Bt, tau2, perm2 = cpqr_pallas2_packed(M, nsteps, interpret=interpret)
    B = Bt.T
    tau = tau2[0]
    perm = perm2[0]
    R = jnp.triu(B[:kmax, :])
    ridx = jnp.arange(rows)[:, None]
    kcol = jnp.arange(kp)[None, :]
    Bk = jnp.pad(B[:, :kmax], ((0, 0), (0, kp - kmax)))
    V = jnp.where(ridx > kcol, Bk, 0.0)
    V = V + jnp.where((ridx == kcol) & (tau[None, :] > 0), 1.0, 0.0)
    return CPQRF(R=R, perm=perm, V=V, tau=tau,
                 T=_panel_T(V, tau, nb), diag=jnp.diagonal(R))


def fits_vmem(rows: int, cols: int, itemsize: int = 4) -> bool:
    return rows * cols * itemsize <= VMEM_BUDGET_BYTES
