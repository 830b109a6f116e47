"""Blocked column-pivoted Householder QR with compact-WY Q application.

The reference leans on LAPACK ``geqp3`` through Julia's
``qr(A, ColumnNorm())`` (/root/reference/src/enlsip_functions.jl:700,
223, 724).  This module is the TPU-native equivalent: a fixed-shape,
jit/vmap-friendly right-looking blocked factorization in the style of
LAPACK's ``dlaqps`` panel algorithm —

* partial column norms are *downdated* each step (not recomputed),
  and recomputed exactly at panel boundaries, which bounds drift the
  same way LAPACK's recompute heuristic does;
* within a panel, only the pivot column and one row are updated
  (one trailing-matrix GEMV per step — the minimum data movement a
  norm-pivoted factorization admits);
* the trailing matrix is updated once per panel with two GEMMs
  (MXU work), not per step;
* ``Q`` is never materialized during factorization.  The reflectors
  ``V, tau`` are returned with the compact-WY ``T`` factor
  (``Q = I - V T V^T``), so every subsequent ``Q^T x``, ``Q x`` and
  ``J @ Q`` is a couple of GEMMs.

Zero (masked) columns have zero norms, pivot last and produce
``tau = 0`` no-op reflectors, exactly like ops/qr.py's unblocked
version — callers mask invalid columns and get the factorization of
the live submatrix.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class CPQRF(NamedTuple):
    """Blocked pivoted QR: ``M[:, perm] = Q @ [R; 0]``,
    ``Q = I - V @ T @ V.T`` (rows x rows, implicit).

    R: (kmax, cols) upper-trapezoidal; V: (rows, kmax) unit-lower
    reflectors; tau: (kmax,); T: (kmax, kmax) upper-triangular WY
    factor; perm: (cols,); diag: (kmax,).
    """

    R: jax.Array
    perm: jax.Array
    V: jax.Array
    tau: jax.Array
    T: jax.Array
    diag: jax.Array


def _householder_col(col: jax.Array, k: jax.Array):
    """Reflector annihilating col[k+1:]; entries < k ignored.
    Returns (v, tau, beta); no-op (v=0, tau=0) for a zero tail."""
    rows = col.shape[0]
    idx = jnp.arange(rows)
    tail = jnp.where(idx >= k, col, 0.0)
    alpha = jnp.take(col, k)
    signorm = jnp.sqrt(jnp.sum(tail * tail))
    sign = jnp.where(alpha >= 0, 1.0, -1.0)
    beta = -sign * signorm
    denom = alpha - beta
    safe = jnp.abs(denom) > 0
    denom = jnp.where(safe, denom, 1.0)
    v = jnp.where(idx > k, tail / denom, 0.0)
    v = v.at[k].set(jnp.where(safe, 1.0, 0.0))
    tau = jnp.where(safe & (beta != 0), (beta - alpha) /
                    jnp.where(beta != 0, beta, 1.0), 0.0)
    return v, tau, jnp.where(safe, beta, alpha)


def cpqr_blocked(M: jax.Array, nb: int = 128) -> CPQRF:
    """Column-pivoted blocked QR of a fixed-shape buffer (zeroed
    invalid columns pivot last)."""
    rows, cols = M.shape
    kmax = min(rows, cols)
    nb = max(8, min(nb, kmax))
    n_panels = -(-kmax // nb)
    dtype = M.dtype

    B = M
    perm = jnp.arange(cols, dtype=jnp.int32)
    V = jnp.zeros((rows, kmax), dtype)
    taus = jnp.zeros((kmax,), dtype)
    nrm2 = jnp.sum(M * M, axis=0)
    ridx = jnp.arange(rows)
    cidx = jnp.arange(cols)

    for p in range(n_panels):
        p0 = p * nb
        p1 = min(p0 + nb, kmax)
        F = jnp.zeros((cols, nb), dtype)
        Vp = jnp.zeros((rows, nb), dtype)

        def step(kk, carry):
            B, F, Vp, V, taus, nrm2, perm = carry
            k = p0 + kk
            live = k < kmax  # masked no-op for padded steps
            # ---- pivot among downdated norms, positions [k, cols) ----
            nmask = jnp.where((cidx >= k) & live, nrm2, -1.0)
            piv = jnp.argmax(nmask).astype(jnp.int32)
            piv = jnp.where(live, piv, k)

            def do_swap(args):
                B, F, nrm2, perm = args
                bk, bp = B[:, k], jnp.take(B, piv, axis=1)
                B = B.at[:, k].set(bp).at[:, piv].set(bk)
                fk, fp = F[k], jnp.take(F, piv, axis=0)
                F = F.at[k].set(fp).at[piv].set(fk)
                nk, npv = nrm2[k], jnp.take(nrm2, piv)
                nrm2 = nrm2.at[k].set(npv).at[piv].set(nk)
                pk, pp = perm[k], jnp.take(perm, piv)
                perm = perm.at[k].set(pp).at[piv].set(pk)
                return B, F, nrm2, perm

            B, F, nrm2, perm = lax.cond(piv != k, do_swap,
                                        lambda a: a, (B, F, nrm2, perm))
            # ---- update column k by the panel's previous reflectors --
            col = B[:, k] - Vp @ F[k]
            v, tau, _beta = _householder_col(col, k)
            v = jnp.where(live, v, 0.0)
            tau = jnp.where(live, tau, 0.0)
            newcol = col - tau * v * jnp.dot(v, col)
            newcol = jnp.where(ridx > k, 0.0, newcol)
            B = B.at[:, k].set(jnp.where(live, newcol, B[:, k]))
            Vp = Vp.at[:, kk].set(v)
            V = V.at[:, k].set(jnp.where(live, v, V[:, k]))
            taus = taus.at[k].set(jnp.where(live, tau, taus[k]))
            # ---- F[:, kk] = tau (B^T v - F_prev (Vp^T v)) ------------
            w1 = B.T @ v                      # (cols,) one full GEMV
            w2 = Vp.T @ v                     # (nb,)
            fcol = tau * (w1 - F @ w2)
            F = F.at[:, kk].set(jnp.where(live, fcol, F[:, kk]))
            # ---- updated row k -> norm downdate ----------------------
            rowk = B[k, :] - F @ Vp[k, :]
            nrm2 = jnp.where((cidx > k) & live,
                             jnp.maximum(nrm2 - rowk * rowk, 0.0), nrm2)
            return B, F, Vp, V, taus, nrm2, perm

        B, F, Vp, V, taus, nrm2, perm = lax.fori_loop(
            0, p1 - p0, step, (B, F, Vp, V, taus, nrm2, perm))

        # ---- panel-end trailing update (GEMM) + exact norm refresh ---
        if p1 < cols:
            upd = B - Vp @ F.T                      # (rows, cols) GEMM
            trail = cidx[None, :] >= p1
            B = jnp.where(trail, upd, B)
            live_rows = (ridx[:, None] >= p1)
            nrm2_exact = jnp.sum(jnp.where(live_rows, B, 0.0) ** 2, axis=0)
            nrm2 = jnp.where(cidx >= p1, nrm2_exact, nrm2)

    R = jnp.triu(B[:kmax, :])
    diag = jnp.diagonal(R)
    # Compact WY: T = U^{-1}, U = diag(1/tau) + strict_upper(V^T V).
    VtV = V.T @ V
    iu = jnp.triu(jnp.ones((kmax, kmax), bool), 1)
    safe_tau = jnp.where(taus > 0, taus, 1.0)
    U = jnp.where(iu, VtV, 0.0) + jnp.diag(1.0 / safe_tau)
    T = jax.scipy.linalg.solve_triangular(U, jnp.eye(kmax, dtype=dtype),
                                          lower=False)
    # tau = 0 (no-op reflector): zero out its row/col so Q treats it as I.
    live_k = taus > 0
    T = jnp.where(live_k[:, None] & live_k[None, :], T, 0.0)
    return CPQRF(R=R, perm=perm, V=V, tau=taus, T=T, diag=diag)


# ------------------------------------------------------- Q application

def qt_apply(f: CPQRF, x: jax.Array) -> jax.Array:
    """Q^T @ x (vector or matrix): x - V T^T (V^T x)."""
    return x - f.V @ (f.T.T @ (f.V.T @ x))


def q_apply(f: CPQRF, x: jax.Array) -> jax.Array:
    """Q @ x: x - V T (V^T x)."""
    return x - f.V @ (f.T @ (f.V.T @ x))


def right_q_apply(f: CPQRF, J: jax.Array) -> jax.Array:
    """J @ Q: J - ((J V) T) V^T — two GEMMs on the MXU."""
    return J - (J @ f.V) @ f.T @ f.V.T
