"""Column-pivoted Householder QR with compact-WY implicit Q.

The reference leans on LAPACK ``geqp3`` through Julia's
``qr(A, ColumnNorm())`` (/root/reference/src/enlsip_functions.jl:700,
223, 724).  This module is the TPU-native equivalent, shaped by
on-device measurements rather than CPU folklore:

* The factorization dispatches per shape.  Small/medium matrices run
  a rank-1 update loop with *exact* column norms each step
  (LAPACK-grade pivoting, no downdating drift): the panel scheme's
  bookkeeping (conditional swaps, F accumulation) dominates there and
  was measured ~5x SLOWER.  Large factorizations (kmax >= 192, e.g.
  Chained Rosenbrock n=5000) flip: the full-width VPU passes dominate
  the step cost, so they run a geqp3-style panel loop
  (:func:`_cpqr_xla_panels`) with ~3x fewer full-width passes and one
  trailing MXU GEMM per panel.  A fused Pallas kernel (whole
  factorization resident in VMEM) covers the batched small shapes and
  plugs into the same interface (see ops/pallas_qr2.py).
* ``Q`` is never materialized.  Reflectors ``V, tau`` come back with
  *panel-wise* compact-WY ``T`` factors (``Q = prod_p (I - V_p T_p
  V_p^T)``), so ``Q^T x``, ``Q x`` and ``J @ Q`` are a short
  sequence of GEMMs on the MXU — and building the ``T_p`` costs a few
  (nb x nb) solves instead of one O(kmax^3) triangular inversion.

Zero (masked) columns have zero norms, pivot last and produce
``tau = 0`` no-op reflectors — callers mask invalid columns and get
the factorization of the live submatrix.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .select_update import set1, set_col

# WY panel width for T/apply blocking (static).
NB = 128


class CPQRF(NamedTuple):
    """Pivoted QR: ``M[:, perm] = Q @ [R; 0]`` with
    ``Q = (I - V_0 T_0 V_0^T) (I - V_1 T_1 V_1^T) ...`` (implicit).

    R: (kmax, cols) upper-trapezoidal; V: (rows, kp) unit-lower
    reflectors (kp = kmax padded to the panel width); tau: (kp,);
    T: (np, nb, nb) per-panel WY factors; perm: (cols,); diag: (kmax,).
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
    v = set1(v, k, jnp.where(safe, 1.0, 0.0))
    tau = jnp.where(safe & (beta != 0), (beta - alpha) /
                    jnp.where(beta != 0, beta, 1.0), 0.0)
    return v, tau, jnp.where(safe, beta, alpha)


def _panel_T(V: jax.Array, taus: jax.Array, nb: int) -> jax.Array:
    """Per-panel compact-WY T factors: T_p = U_p^{-1},
    U_p = diag(1/tau_p) + strict_upper(V_p^T V_p)."""
    rows, kp = V.shape
    n_panels = kp // nb
    Vp = V.reshape(rows, n_panels, nb).transpose(1, 0, 2)   # (np, rows, nb)
    tp = taus.reshape(n_panels, nb)
    VtV = jnp.einsum("prk,prl->pkl", Vp, Vp)
    iu = jnp.triu(jnp.ones((nb, nb), bool), 1)
    safe_tau = jnp.where(tp > 0, tp, 1.0)
    U = jnp.where(iu[None], VtV, 0.0) + jax.vmap(jnp.diag)(1.0 / safe_tau)
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=V.dtype), U.shape)
    T = jax.vmap(lambda u, e: jax.scipy.linalg.solve_triangular(
        u, e, lower=False))(U, eye)
    live = tp > 0
    return jnp.where(live[:, :, None] & live[:, None, :], T, 0.0)


def _use_pallas(rows: int, cols: int, itemsize: int) -> bool:
    """Fused-kernel dispatch gate: large factorizations on TPU run the
    v2 Pallas kernel (ops/pallas_qr2.py; transposed VMEM-resident
    layout, ~2x the XLA loop at (1998, 1000), dynamic live-column
    stop).  The first Mosaic compile is slow through this environment's
    remote-compile path but lands in the persistent jax cache.
    Set ENLSIP_DISABLE_PALLAS=1 to force the XLA loop."""
    import os
    if os.environ.get("ENLSIP_DISABLE_PALLAS"):
        return False
    from .pallas_qr2 import fits_vmem
    kmax = min(rows, cols)
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no backend configured
        return False
    return (backend in ("tpu", "axon") and kmax >= 192
            and fits_vmem(rows, cols, itemsize))


def _use_batched_pallas(rows: int, cols: int, dtype) -> bool:
    """Dispatch gate for the fused *batched* CPQR kernel
    (ops/pallas_batched_qr.py): tiny factorizations under ``vmap`` on
    TPU — the scenario-batch regime where the XLA loop runs at <1% of
    HBM stream.  Single (unbatched) calls are unaffected: the kernel
    only engages through the custom_vmap rule below."""
    import os
    if os.environ.get("ENLSIP_DISABLE_PALLAS"):
        return False
    from .pallas_batched_qr import MAX_ELEMS, MAX_KMAX
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no backend configured
        return False
    return (backend in ("tpu", "axon") and dtype == jnp.float32
            and min(rows, cols) <= MAX_KMAX and rows * cols <= MAX_ELEMS)


@jax.custom_batching.custom_vmap
def _cpqr_small(M: jax.Array, nsteps: jax.Array) -> CPQRF:
    return _cpqr_xla(M, NB, nsteps)


@_cpqr_small.def_vmap
def _cpqr_small_vmap(axis_size, in_batched, M, nsteps):
    """Under ``vmap`` a whole batch of tiny CPQRs runs as ONE fused
    Pallas program per 512-lane block (ops/pallas_batched_qr.py) instead
    of ~20 underutilized kernels per Householder step.  The fused kernel
    runs all kmax steps; per-lane ``nsteps`` is safely ignored because
    steps past the live-column count act on zero columns and produce
    tau = 0 no-op reflectors (same values, bit-for-bit pivot order)."""
    m_b, ns_b = in_batched
    if m_b and M.ndim == 3:
        from .pallas_batched_qr import cpqr_blocked_batched
        out = cpqr_blocked_batched(M)
    else:  # pragma: no cover - unexpected batching pattern
        out = jax.vmap(lambda m, ns: _cpqr_xla(m, NB, ns),
                       in_axes=(0 if m_b else None, 0 if ns_b else None),
                       axis_size=axis_size)(M, nsteps)
    return out, jax.tree.map(lambda _: True, out)


def cpqr_blocked(M: jax.Array, nb: int = NB,
                 nsteps: jax.Array | None = None) -> CPQRF:
    """Column-pivoted QR of a fixed-shape buffer (zeroed invalid
    columns pivot last); exact column norms every step.

    ``nsteps`` (traced) bounds the number of Householder steps to the
    number of LIVE columns: steps past it would be no-ops on zero
    columns (tau = 0), so skipping them changes nothing — but for a
    masked buffer like the solver's J2 (live columns = n - rankA of n)
    it removes almost the whole sequential loop.

    Large factorizations on TPU dispatch to the fused Pallas kernel
    (whole matrix resident in VMEM, ops/pallas_qr2.py); tiny ones route
    through a custom_vmap wrapper so scenario batches hit the fused
    batched kernel (ops/pallas_batched_qr.py)."""
    rows, cols = M.shape
    kmax = min(rows, cols)
    if _use_pallas(rows, cols, M.dtype.itemsize):
        from .pallas_qr2 import cpqr_pallas2
        return cpqr_pallas2(M, nsteps=nsteps)
    if _use_batched_pallas(rows, cols, M.dtype):
        ns = jnp.asarray(kmax if nsteps is None else nsteps, jnp.int32)
        return _cpqr_small(M, ns)
    if kmax >= 192 and not os.environ.get("ENLSIP_DISABLE_GEQP3"):
        # Large factorization the Pallas kernel can't take (VMEM):
        # the geqp3-style panel loop does ~3x less per-step work.
        return _cpqr_xla_panels(M, nb, nsteps)
    return _cpqr_xla(M, nb, nsteps)


def _cpqr_xla_panels(M: jax.Array, nb: int, nsteps: jax.Array | None
                     ) -> CPQRF:
    """geqp3-style panel CPQR (LAPACK xLAQPS structure, re-derived):
    within a panel the matrix stays STALE and each reflector's effect
    is carried by the accumulator F, with updated_j = B - V_j F_j^T
    holding exactly (F_j's new column is tau_j (B^T v_j - F (V^T v_j)));
    the trailing matrix is updated ONCE per panel by a single MXU GEMM.
    Pivoting searches ALL trailing columns using geqp3-downdated norms
    (nrm2 -= R[k, :]^2 off the incrementally-computed row k), with an
    EXACT recompute at every panel start, so downdating drift is
    bounded to one panel.

    Per step this costs one full-width pass (B^T v) + O(rows x nb)
    panel-local work, vs the plain loop's ~4 full-width passes (norm
    scan + v^T B + rank-1 read/write) — ~3x fewer VPU ops for the
    large VMEM-resident factorizations that dominate Chained
    Rosenbrock n=5000 (the reference's own scaling benchmark).

    Outputs match :func:`_cpqr_xla`'s contract bit-compatibly in
    STRUCTURE (R/V/tau/T/perm/diag; diagonal entries are the exact
    Householder betas); individual float values differ by reduction
    order, and pivot TIE-breaking can differ where downdated and
    exact norms round differently (the reference oracle itself uses
    LAPACK geqp3, i.e. downdated norms)."""
    rows, cols = M.shape
    kmax = min(rows, cols)
    nb = min(nb, kmax) if kmax >= nb else kmax
    kp = -(-kmax // nb) * nb
    n_panels = kp // nb
    dtype = M.dtype
    ridx = jnp.arange(rows)
    cidx = jnp.arange(cols)
    jidx = jnp.arange(nb)
    ub = jnp.asarray(kmax if nsteps is None else jnp.clip(nsteps, 0, kmax),
                     jnp.int32)

    B = M
    V = jnp.zeros((rows, kp), dtype)
    taus = jnp.zeros((kp,), dtype)
    perm = jnp.arange(cols, dtype=jnp.int32)

    from .select_update import set_col_dus, set_row_dus

    def swap_row(F, i1, i2):
        r1, r2 = jnp.take(F, i1, axis=0), jnp.take(F, i2, axis=0)
        F = set_row_dus(F, i1, r2)
        return set_row_dus(F, i2, jnp.where(i1 == i2, r2, r1))

    for p in range(n_panels):
        s = p * nb

        # Exact trailing norms at panel start (bounds downdate drift).
        sub = jnp.where(ridx[:, None] >= s, B, 0.0)
        nrm2 = jnp.sum(sub * sub, axis=0)

        def step(j, carry, s=s):
            B, Vp, tp, betas, perm, nrm2, F = carry
            active = (s + j) < ub
            # Clamp to a real column: on inactive steps of the final
            # panel s+j can reach kp > cols, and jnp.take's OOB mode
            # is 'fill' (NaN), which would poison B/F through the
            # self-swaps below.  Clamped, every inactive step is an
            # exact no-op (piv == k self-swap, tau = v = 0).
            k = jnp.minimum(s + j, cols - 1)
            # ---- pivot among trailing columns (downdated norms) ------
            nm = jnp.where(cidx >= k, nrm2, -1.0)
            piv = jnp.where(active, jnp.argmax(nm).astype(jnp.int32), k)
            bk, bp = B[:, k], jnp.take(B, piv, axis=1)
            B = set_col_dus(B, k, bp)
            B = set_col_dus(B, piv, jnp.where(piv == k, bp, bk))
            F = swap_row(F, k, piv)
            nk, npv = jnp.take(nrm2, k), jnp.take(nrm2, piv)
            nrm2 = set1(nrm2, k, npv)
            nrm2 = set1(nrm2, piv, jnp.where(piv == k, npv, nk))
            pk, pp = perm[k], jnp.take(perm, piv)
            perm = set1(perm, k, pp)
            perm = set1(perm, piv, jnp.where(piv == k, pp, pk))
            # ---- current column with pending panel updates applied ---
            Fk = jnp.take(F, k, axis=0)                       # (nb,)
            bcol = B[:, k] - Vp @ jnp.where(jidx < j, Fk, 0.0)
            v, tau, beta = _householder_col(bcol, k)
            v = jnp.where(active, v, 0.0)
            tau = jnp.where(active, tau, 0.0)
            # ---- F column j: tau (B^T v - F (Vp^T v)) ----------------
            w1 = B.T @ v                                      # full pass
            w2 = jnp.where(jidx < j, Vp.T @ v, 0.0)           # (nb,)
            f = tau * (w1 - F @ w2)
            F = set_col(F, j, f)
            Vp = set_col(Vp, j, v)
            tp = set1(tp, j, tau)
            betas = set1(betas, j, jnp.where(active, beta, 0.0))
            # ---- row k of the updated matrix -> norm downdate --------
            vpk = jnp.take(Vp, k, axis=0)                     # (nb,)
            rowk = jnp.take(B, k, axis=0) - F @ jnp.where(jidx <= j, vpk,
                                                          0.0)
            nrm2 = jnp.where(active & (cidx > k),
                             jnp.maximum(nrm2 - rowk * rowk, 0.0), nrm2)
            return B, Vp, tp, betas, perm, nrm2, F

        Vp0 = jnp.zeros((rows, nb), dtype)
        tp0 = jnp.zeros((nb,), dtype)
        b0 = jnp.zeros((nb,), dtype)
        F0 = jnp.zeros((cols, nb), dtype)
        B, Vp, tp, betas, perm, nrm2, F = lax.fori_loop(
            0, nb, step, (B, Vp0, tp0, b0, perm, nrm2, F0))

        # ---- one MXU GEMM updates panel + trailing columns -----------
        B = B - Vp @ F.T
        # Panel columns: exact Householder beta on the diagonal, zeros
        # below it (V is stored separately).
        in_panel = (cidx >= s) & (cidx < s + nb)
        below = ridx[:, None] > cidx[None, :]
        # Only columns inside the traced nsteps bound are zeroed below
        # the diagonal — columns past ub were never factorized, and
        # touching them would diverge from _cpqr_xla's handling of
        # (out-of-contract) nonzero trailing columns (ADVICE r4).
        active_col = in_panel & (cidx < ub)
        B = jnp.where(active_col[None, :] & below, 0.0, B)
        # (indexing, not dynamic_update_slice: for the last panel
        # s + nb may exceed cols and the slice start would CLAMP,
        # shifting every beta)
        beta_of_col = betas[jnp.clip(cidx - s, 0, nb - 1)]
        diag_mask = (ridx[:, None] == cidx[None, :]) & active_col[None, :]
        B = jnp.where(diag_mask, beta_of_col[None, :], B)
        V = lax.dynamic_update_slice(V, Vp, (0, s))
        taus = lax.dynamic_update_slice(taus, tp, (s,))

    R = jnp.triu(B[:kmax, :])
    return CPQRF(R=R, perm=perm, V=V, tau=taus,
                 T=_panel_T(V, taus, nb), diag=jnp.diagonal(R))


def _cpqr_xla(M: jax.Array, nb: int, nsteps: jax.Array | None) -> CPQRF:
    """The XLA rank-1-update loop (see module docstring)."""
    rows, cols = M.shape
    kmax = min(rows, cols)
    nb = min(nb, kmax) if kmax >= nb else kmax
    kp = -(-kmax // nb) * nb
    dtype = M.dtype
    ridx = jnp.arange(rows)
    cidx = jnp.arange(cols)

    def step(k, carry):
        B, V, taus, perm = carry
        sub = jnp.where(ridx[:, None] >= k, B, 0.0)
        nrm2 = jnp.sum(sub * sub, axis=0)
        nrm2 = jnp.where(cidx >= k, nrm2, -1.0)
        piv = jnp.argmax(nrm2).astype(jnp.int32)
        bk, bp = B[:, k], jnp.take(B, piv, axis=1)
        B = set_col(B, k, bp)
        B = set_col(B, piv, jnp.where(piv == k, bp, bk))
        pk, pp = perm[k], jnp.take(perm, piv)
        perm = set1(perm, k, pp)
        perm = set1(perm, piv, jnp.where(piv == k, pp, pk))
        v, tau, _ = _householder_col(B[:, k], k)
        vtB = v @ B
        B = B - tau * jnp.outer(v, vtB)
        B = set_col(B, k, jnp.where(ridx > k, 0.0, B[:, k]))
        V = set_col(V, k, v)
        taus = set1(taus, k, tau)
        return B, V, taus, perm

    ub = kmax if nsteps is None else jnp.clip(nsteps, 0, kmax)
    B, V, taus, perm = lax.fori_loop(
        0, ub, step,
        (M, jnp.zeros((rows, kp), dtype), jnp.zeros((kp,), dtype),
         jnp.arange(cols, dtype=jnp.int32)))
    R = jnp.triu(B[:kmax, :])
    return CPQRF(R=R, perm=perm, V=V, tau=taus,
                 T=_panel_T(V, taus, nb), diag=jnp.diagonal(R))


# ------------------------------------------------------- Q application
# Q = P_0 P_1 ... P_{np-1},  P_i = I - V_i T_i V_i^T.

def _panels(f: CPQRF):
    rows, kp = f.V.shape
    nb = f.T.shape[1]
    return [(f.V[:, i * nb:(i + 1) * nb], f.T[i]) for i in range(kp // nb)]


def qt_apply(f: CPQRF, x: jax.Array) -> jax.Array:
    """Q^T @ x (vector or matrix): apply P_i^T in forward order."""
    for Vi, Ti in _panels(f):
        x = x - Vi @ (Ti.T @ (Vi.T @ x))
    return x


def q_apply(f: CPQRF, x: jax.Array) -> jax.Array:
    """Q @ x: apply P_i in reverse order."""
    for Vi, Ti in reversed(_panels(f)):
        x = x - Vi @ (Ti @ (Vi.T @ x))
    return x


def right_q_apply(f: CPQRF, J: jax.Array, allow_pallas: bool = True
                  ) -> jax.Array:
    """J @ Q: right-multiply by P_i in forward order (MXU GEMMs).

    Tall single-panel applies on TPU dispatch to the fused Pallas
    kernel (ops/pallas_wy.py): XLA's emitter chain for this shape
    demands a column-major copy of J — a full extra (m, n) HBM round
    trip per iteration on giant-m.  ``allow_pallas=False`` keeps the
    plain GEMM chain (row-sharded callers: a pallas_call must not see
    a GSPMD-sharded operand)."""
    panels = _panels(f)
    if allow_pallas and len(panels) == 1 and J.ndim == 2:
        from .pallas_wy import use_wy_pallas, wy_right_apply
        V0, T0 = panels[0]
        if use_wy_pallas(J.shape[0], J.shape[1], V0.shape[1], J.dtype):
            return wy_right_apply(J, V0, T0)
    for Vi, Ti in panels:
        J = J - ((J @ Vi) @ Ti) @ Vi.T
    return J
