"""Working-set management as masked, fixed-shape operations.

Reference routines reproduced:

* INIALC  (/root/reference/src/enlsip_functions.jl:826-859)
* SIGNCH  (:574-603)
* EVADD   (:608-650) including the capacity bound t <= min(l, n) with
  swap-out of the least-violated active inequality
* minmax_lagrangian_mult (:540-564)

The working set is a boolean mask of length l; sorted active/inactive
lists are derived on demand (types.working_view).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.select_update import set1
from .types import Dims, rdims_or, working_view


def init_working_set(cx: jax.Array, A: jax.Array, x: jax.Array, dims: Dims,
                     rdims=None) -> tuple[jax.Array, jax.Array, jax.Array]:
    """INIALC: initial mask (equalities + non-positive inequalities),
    initial penalty weights w_i = min(|cx_i| + 0.01, 0.1), and the
    penalty history K = 0.1 * ones(4, l).

    Deviation D7 (f32 robustness): the activity test is
    cx <= eps*(1 + |grad c_j|*|x|) — the constraint's evaluation-noise
    scale — instead of the reference's cx <= 0.  A cx that is zero up
    to dtype roundoff is ON the boundary; at f32 it can round to +1e-6
    and would otherwise be neither in the initial working set nor a
    step-cap candidate in UPBND (which uses the SAME noise window,
    linesearch.upper_bound_steplength), letting the first unconstrained
    GN step fly deep infeasible.  Together the two windows leave no
    gap: every inactive constraint either caps the step (cx > noise)
    or starts active (cx <= noise).  The reference's own EVADD treats
    near-boundary constraints the same way (adds inactive cx < sqrt(eps),
    :608-650); at f64 the window is ~1e-14*scale."""
    l, q = dims.l, rdims_or(rdims, dims).q
    idx = jnp.arange(l)
    row_norm = jnp.sqrt(jnp.sum(A * A, axis=1))
    noise = jnp.finfo(cx.dtype).eps * (1.0 + row_norm * jnp.linalg.norm(x))
    mask = (idx < q) | ((idx >= q) & (cx <= noise))
    w = jnp.minimum(jnp.abs(cx) + 0.01, 0.1)
    K = jnp.full((4, l), 0.1, dtype=cx.dtype)
    return mask, w, K


def check_constraint_deletion(q: int, lam: jax.Array, valid: jax.Array,
                              t: jax.Array, scaling: bool,
                              diag_scale: jax.Array, grad_res: jax.Array
                              ) -> jax.Array:
    """SIGNCH (:574-603): slot index (int32) of the inequality with the
    most negative row-scaled multiplier, or -1 if none shall be deleted.

    Ties resolve to the *last* qualifying slot (the reference updates on
    ``<=``).  Deletion is suppressed while far from stationarity on the
    current working set: ``grad_res > -e * 10``.
    """
    tmax = lam.shape[0]
    dtype = lam.dtype
    eps = jnp.finfo(dtype).eps
    lam_max = jnp.where(t == 0, 1.0,
                        jnp.max(jnp.where(valid, jnp.abs(lam), -jnp.inf)))
    sq_rel = jnp.sqrt(eps) * lam_max
    rows = (1.0 / diag_scale) if scaling else diag_scale
    vals = rows * lam
    slot = jnp.arange(tmax)
    cand = (slot >= q) & (slot < t)
    masked = jnp.where(cand, vals, jnp.inf)
    vmin = jnp.min(masked)
    found = vmin <= sq_rel
    # last index achieving the min (reference's <= update keeps the last)
    s = jnp.max(jnp.where(cand & (masked == vmin), slot, -1))
    e = jnp.where(found, vmin, sq_rel)
    s = jnp.where(found & (t > q), s, -1)
    s = jnp.where(grad_res > -e * 10.0, -1, s)
    return s.astype(jnp.int32)


def minmax_lagrangian_mult(lam: jax.Array, valid: jax.Array, t: jax.Array,
                           q: int, scaling: bool, diag_scale: jax.Array
                           ) -> tuple[jax.Array, jax.Array]:
    """(:540-564): sigma_min = most-negative inequality multiplier whose
    row-scaled value is <= -sqrt(eps) (Inf if none); lam_abs_max = max |lam|
    over the whole working set (0 if t <= q)."""
    tmax = lam.shape[0]
    eps = jnp.finfo(lam.dtype).eps
    sq_rel = jnp.sqrt(eps)
    slot = jnp.arange(tmax)
    any_ineq = t > q
    lam_abs_max = jnp.where(any_ineq,
                            jnp.max(jnp.where(valid, jnp.abs(lam), -jnp.inf)),
                            0.0)
    rows = (1.0 / diag_scale) if scaling else diag_scale
    cand = (slot >= q) & (slot < t) & (lam * rows <= -sq_rel)
    sigmin = jnp.min(jnp.where(cand, lam, jnp.inf))
    return sigmin, lam_abs_max


def evaluate_violated_constraints(cx: jax.Array, mask: jax.Array,
                                  index_alpha_upp: jax.Array, dims: Dims,
                                  rdims=None) -> tuple[jax.Array, jax.Array]:
    """EVADD (:608-650): add every inactive constraint with
    cx < sqrt(eps) (or cx < 0.1 for the steplength-capping constraint)
    to the working set, respecting the capacity bound t <= min(l, n)
    by swapping out the least-violated active inequality when it is
    less violated than the candidate.

    Returns (new_mask, added_flag).  ``index_alpha_upp`` is a global
    constraint index (-1 = none; the reference's 0 sentinel, shifted for
    0-based indexing).

    Parity note: the reference rescans constraints it swapped *out*
    within the same pass when their index lies ahead of the scan
    position (:636 inserts into the live inactive list); we scan a
    snapshot of the original inactive candidates instead.  This only
    differs in the doubly-degenerate case of a saturated working set
    whose swapped-out member is itself violated.
    """
    l = dims.l
    rd = rdims_or(rdims, dims)
    q = rd.q
    eps_s = jnp.sqrt(jnp.finfo(cx.dtype).eps)
    delta = 0.1
    bnd = jnp.minimum(rd.l, rd.n)
    view0 = working_view(mask)
    t0 = view0.t
    # Snapshot of the inactive candidates in ascending order.  The trip
    # count must be static: l - q when q is static, else all l slots
    # (extra trips fail ``want`` on the never-violated padding rows).
    n_inact = l - dims.q if rdims is None else l
    cand_list = view0.active_list[jnp.minimum(t0 + jnp.arange(l), l - 1)]
    idxg = jnp.arange(l, dtype=jnp.int32)

    def body(j, carry):
        m, added = carry
        k = cand_list[j]
        is_cand = (j < l - t0)
        ck = cx[k]
        want = is_cand & ((ck < eps_s) | ((k == index_alpha_upp) & (ck < delta)))
        t = jnp.sum(m)
        at_cap = t >= bnd
        # Least-violated (max cx) active inequality; first argmax like
        # the reference's strict-> scan over ascending slots.
        act_ineq = m & (idxg >= q)
        vals = jnp.where(act_ineq, cx, -jnp.inf)
        worst_idx = jnp.argmax(vals).astype(jnp.int32)
        worst_val = vals[worst_idx]
        can_swap = jnp.any(act_ineq) & (worst_val > ck)
        do_plain = want & ~at_cap
        do_swap = want & at_cap & can_swap
        m = jnp.where(do_swap, set1(m, worst_idx, False), m)
        m = jnp.where(do_plain | do_swap, set1(m, k, True), m)
        added = added | do_plain | do_swap
        return m, added

    mask2, added = lax.fori_loop(0, n_inact if n_inact > 0 else 0,
                                 body, (mask, jnp.asarray(False)))
    return mask2, added
