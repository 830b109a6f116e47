"""Direction-method selection: GNDCHK, PREGN/PRESUB/DIMUPP/SUBSPC, ANALYS.

Reference: /root/reference/src/enlsip_functions.jl
  GNDCHK :943-1030, PREGN :909-932, PRESUB :864-904, DIMUPP :1041-1113,
  SUBSPC :1118-1176, ANALYS :1191-1291.

All magic constants are reproduced verbatim.  "Dimensions" here are
1-based counts (as in the reference); array buffers are 0-indexed, so
count k reads buffer index k-1.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.qr import prefix_norm, solve_upper
from .subproblem import (ActiveConstraint, FactorA, FactorJ2, FactorL11,
                         GNResult, factor_l11, j2_transform_d,
                         newton_search_direction, sub_search_direction)
from .types import Dims, PrevIter, WorkingView, rdims_or


def check_gn_direction(b1nrm, d1nrm, d1nrm_as_km1, dnrm, active_c_sum,
                       iter_number, rankA, dims: Dims, restart,
                       constraint_added, constraint_deleted, t, lam, valid,
                       inact_cx_min, prev: PrevIter, scaling: bool,
                       diag_scale, rdims=None) -> tuple[jax.Array, jax.Array]:
    """GNDCHK (:943-1030).  Returns (method_code, beta_k) with
    method_code in {1 (GN), -1 (subspace), 2 (Newton)}.

    ``inact_cx_min``: min over inactive constraints of cx (+inf if none)
    — the only thing the reference reads from the inactive set here
    (``any(<(delta), inact_c)``)."""
    rd = rdims_or(rdims, dims)
    n, m, q, l = rd.n, rd.m, rd.q, rd.l
    dtype = b1nrm.dtype
    eps_rel = jnp.finfo(dtype).eps
    delta, c1, c2, c3, c4, c5 = 0.1, 0.5, 0.1, 4.0, 10.0, 0.05
    beta_k = jnp.sqrt(d1nrm ** 2 + b1nrm ** 2)

    newton_or_restart = (prev.code == 2) | restart
    first_iter = iter_number == 0
    submin_prev = prev.code == -1
    add_or_del = constraint_added | constraint_deleted
    conv_lower_c1 = beta_k < c1 * prev.beta
    progress_not_close = (prev.progress > c2 * prev.predicted_reduction) & (dnrm <= c3 * beta_k)
    take_branch = newton_or_restart | (
        ~first_iter & (submin_prev | ~(add_or_del | conv_lower_c1 | progress_not_close)))

    # ---- subspace/Newton branch -------------------------------------
    nonlin_k = jnp.sqrt(d1nrm ** 2 + active_c_sum)
    nonlin_km1 = jnp.sqrt(d1nrm_as_km1 ** 2 + active_c_sum)

    slot = jnp.arange(lam.shape[0])
    ineq = (slot >= q) & (slot < t)
    rows = (1.0 / diag_scale) if scaling else diag_scale
    sqr_eps = jnp.sqrt(eps_rel)
    lagrange_mult_cond = (
        jnp.any(ineq & (lam * rows >= -sqr_eps)) & jnp.any(ineq & (lam < 0)))
    to_reduce = (t > q) & lagrange_mult_cond
    to_reduce = to_reduce | ((l - t > 0) & (inact_cx_min < delta))

    newton_previously = (prev.code == 2) & ~constraint_deleted
    cond4 = active_c_sum > c2
    cond5 = constraint_deleted | constraint_added | to_reduce | ((t == n) & (t == rankA))
    eps6 = jnp.maximum(1e-2, 10.0 * eps_rel)
    cond6 = ~((l == q) | (rankA <= t)) & ~((beta_k < eps6 * dnrm) |
                                           ((b1nrm < eps6) & (m == n - t)))
    inner = newton_previously | ~(cond4 | cond5 | cond6)
    cond7 = ((prev.alpha < c5) & (nonlin_km1 < c2 * nonlin_k)) | (m == n - t)
    cond8 = ~(dnrm <= c4 * beta_k)
    newton = inner & (newton_previously | cond7 | cond8)

    method_code = jnp.where(take_branch,
                            jnp.where(newton, 2, -1), 1).astype(jnp.int32)
    return method_code, beta_k


def _pregn(sd, sd_nrm, mindim, rh, rh_nrm, rank) -> jax.Array:
    """PREGN (:909-932).  sd/rh are cumulative-norm buffers (0-indexed:
    count k -> index k-1); all dims are counts."""
    tau_max, rho_min = 0.2, 0.5
    C = sd.shape[0]
    pm1 = rank - 1
    counts = jnp.arange(1, C + 1)
    cond = (jnp.take(sd, counts - 1) >= tau_max * sd_nrm) | \
           (jnp.take(rh, counts - 1) <= rho_min * rh_nrm)
    window = (counts > mindim) & (counts <= pm1)
    # Descending walk from pm1 while cond holds: final k = pm1 minus the
    # length of the trailing all-true run of cond within the window.
    flags = jnp.where(window, cond, False)
    inwin_rev = jnp.flip((counts <= pm1))
    run = jnp.cumprod(jnp.where(inwin_rev, jnp.flip(flags), True).astype(jnp.int32))
    trailing = jnp.sum(run * inwin_rev.astype(jnp.int32))
    k = jnp.maximum(pm1 - trailing, mindim)
    sugg = jnp.where(k > mindim, k, jnp.maximum(mindim, pm1))
    return jnp.where(mindim > pm1, mindim, sugg)


def _presub(sd, rh, rh_nrm, c1, rank, previous_dim, progress,
            predicted_linear_progress, prelin_previous_dim, previous_alpha
            ) -> jax.Array:
    """PRESUB (:864-904)."""
    stepb, pgb1, pgb2, predb, rlenb, c2 = 0.2, 0.3, 0.1, 0.7, 2.0, 100.0
    C = sd.shape[0]

    def at(buf, count):  # 1-based count -> value, clamped
        return jnp.take(buf, jnp.clip(count - 1, 0, C - 1))

    bad_step = (previous_alpha < stepb) & \
               (progress <= pgb1 * predicted_linear_progress ** 2) & \
               (progress <= pgb2 * prelin_previous_dim ** 2)
    dim_b = jnp.maximum(1, previous_dim - 1)
    early = bad_step & (previous_dim > 1) & (at(rh, dim_b) > c1 * rh_nrm)

    dim = previous_dim
    grow_ok = (previous_dim < rank) & (
        ((at(rh, dim) > predb * rh_nrm) & (rlenb * at(sd, dim) < at(sd, dim + 1))) |
        (c2 * at(sd, dim) < at(sd, dim + 1)))
    i1 = previous_dim - 1
    # buff = {i in [i1, previous_dim] : rh[i] > predb*rh_nrm}; min or rank
    c_a = at(rh, i1) > predb * rh_nrm
    c_b = at(rh, previous_dim) > predb * rh_nrm
    from_buff = jnp.where(c_a, i1, jnp.where(c_b, previous_dim, rank))
    sugg = jnp.where(grow_ok, dim, jnp.where(i1 <= 0, rank, from_buff))
    return jnp.where(early, dim_b, sugg)


def determine_solving_dim(previous_dim, rank, predicted_linear_progress,
                          obj_progress, prelin_previous_dim, diagR, y,
                          previous_alpha, restart) -> jax.Array:
    """DIMUPP (:1041-1113).  ``diagR``: diagonal buffer of the triangular
    factor; ``y``: rhs buffer.  Returns the new dimension (count).  The
    reference also returns eta = a length ratio that no caller consumes;
    it is omitted."""
    C = diagR.shape[0]
    i = jnp.arange(C)
    yC = y[:C]
    live = i < rank
    sd = jnp.sqrt(jnp.cumsum(jnp.where(live, yC * yC, 0.0)))
    safe_diag = jnp.where(jnp.abs(diagR) > 0, diagR, 1.0)
    rhterm = jnp.where(live, yC / safe_diag, 0.0)
    rh = jnp.sqrt(jnp.cumsum(rhterm * rhterm))
    last = jnp.clip(rank - 1, 0, C - 1)
    sd_nrm = jnp.take(sd, last)
    rh_nrm = jnp.take(rh, last)
    # mindim maximizes psi_i = sqrt(sum_{j<=i} sd_j^2) * |R_ii| — note
    # the reference accumulates the SQUARED CUMULATIVE norms
    # (enlsip_functions.jl:1077-1086: dsum += l_estim_sd[i]^2 with
    # l_estim_sd already cumulative), reproduced verbatim.
    dsum = jnp.cumsum(jnp.where(live, sd * sd, 0.0))
    psi = jnp.where(live, jnp.sqrt(dsum) * jnp.abs(diagR), -jnp.inf)
    mindim = (jnp.argmax(psi) + 1).astype(jnp.int32)  # first max, count

    was_gn = (previous_dim == rank) | (previous_dim <= 0)
    sugg_gn = _pregn(sd, sd_nrm, mindim, rh, rh_nrm, rank)
    sugg_sub = _presub(sd, rh, rh_nrm, 0.1, rank, previous_dim, obj_progress,
                       predicted_linear_progress, prelin_previous_dim,
                       previous_alpha)
    newdim_live = jnp.maximum(mindim, jnp.where(was_gn, sugg_gn, sugg_sub))
    newdim_restart = jnp.maximum(0, jnp.minimum(rank, previous_dim))
    newdim = jnp.where(restart, newdim_restart, newdim_live)
    return jnp.where(rank > 0, newdim, rank).astype(jnp.int32)


def choose_subspace_dimensions(rx_sum, rx, active_cx_sum, t, rankJ2, rankA,
                               F_L11: FactorL11, F_J2: FactorJ2,
                               JQ1, prev: PrevIter, restart, dims: Dims
                               ) -> tuple[jax.Array, jax.Array]:
    """SUBSPC (:1118-1176).  Returns (dimA, dimJ2)."""
    n, m, l, ka = dims.n, dims.m, dims.l, dims.ka
    alpha_low = 0.2
    b = F_L11.qt_b                     # (l,)

    # rankA > 0 branch
    previous_dimA = jnp.abs(prev.dimA) + t - prev.t
    nrm_b_asprev = prefix_norm(b, jnp.clip(previous_dimA, 0, l))
    nrm_b = prefix_norm(b, t)
    constraint_progress = prev.cx_sum - active_cx_sum
    dimA_pos = determine_solving_dim(previous_dimA, rankA, nrm_b,
                                     constraint_progress, nrm_b_asprev,
                                     F_L11.diag, b, prev.alpha, restart)
    dimA = jnp.where(rankA > 0, dimA_pos, 0)
    previous_dimA = jnp.where(rankA > 0, previous_dimA, 0)

    # d = -(rx + J1 p1) transformed by Q3^T iff rankJ2 > 0 (:1156-1163)
    dp1 = solve_upper(F_L11.R[:ka, :ka], b[:ka], dimA)
    p1_full = jnp.zeros(ka, rx.dtype).at[F_L11.perm].set(dp1)
    p1 = jnp.where(jnp.arange(ka) < rankA, p1_full, 0.0)
    p1n = jnp.zeros(n, rx.dtype).at[:ka].set(p1)
    # d = -(rx + J1 p1), transformed by Q3^T iff rankJ2 > 0 (:1161-1163).
    # When rankJ2 == 0, DIMUPP returns 0 without reading d, so the
    # transformed vector can be used unconditionally.
    d = j2_transform_d(F_J2, JQ1, p1n, rx)

    previous_dimJ2 = jnp.abs(prev.dimJ2) + prev.t - t
    nrm_d_asprev = prefix_norm(d, jnp.clip(previous_dimJ2, 0, m))
    nrm_d = jnp.sqrt(jnp.sum(d * d))
    residual_progress = prev.rx_sum - rx_sum
    kk = min(m, n)
    dimJ2 = determine_solving_dim(previous_dimJ2, rankJ2, nrm_d,
                                  residual_progress, nrm_d_asprev,
                                  F_J2.diag, d[:kk], prev.alpha, restart)

    keep = (~restart) & (prev.alpha >= alpha_low)
    dimA = jnp.where(keep, jnp.maximum(dimA, previous_dimA), dimA)
    dimJ2 = jnp.where(keep, jnp.maximum(dimJ2, previous_dimJ2), dimJ2)
    return dimA.astype(jnp.int32), dimJ2.astype(jnp.int32)


def analysis_decide(cx, act: ActiveConstraint, active_cx_sum, gn: GNResult,
                    view: WorkingView, t, lam, iter_number, prev: PrevIter,
                    restart, constraint_added, constraint_deleted,
                    dims: Dims, scaling: bool, rdims=None):
    """The cheap front of ANALYS: direction norms + GNDCHK decision
    (:1230-1243).  Returns (method_code, beta)."""
    m, tmax = dims.m, dims.tmax
    rankA, rankJ2 = gn.rankA, gn.rankJ2
    nrm_b1 = prefix_norm(gn.b, rankA)         # dimA == rankA here
    nrm_d = jnp.sqrt(jnp.sum(gn.d * gn.d))
    nrm_d1 = prefix_norm(gn.d, rankJ2)
    prev_dimJ2m1 = prev.dimJ2 + prev.t - t - 1
    nrm_d1_asprev = prefix_norm(gn.d, jnp.clip(prev_dimJ2m1, 0, m))

    # min over inactive constraints of cx (GNDCHK's any(< delta))
    inact = ~(jnp.zeros(dims.l, bool).at[view.active_list[:tmax]].set(
        jnp.arange(tmax) < t))
    inact_cx_min = jnp.min(jnp.where(inact, cx, jnp.inf))

    return check_gn_direction(
        nrm_b1, nrm_d1, nrm_d1_asprev, nrm_d, active_cx_sum, iter_number,
        rankA, dims, restart, constraint_added, constraint_deleted, t, lam,
        act.valid, inact_cx_min, prev, scaling, act.diag_scale, rdims)


def subspace_direction(rx, rx_sum, act: ActiveConstraint, active_cx_sum,
                       gn: GNResult, F_A: FactorA, t, prev: PrevIter,
                       restart, dims: Dims):
    """ANALYS's subspace-minimization branch (:1249-1253).  F_L11 is
    needed here even when rankA == t (the driver only computes it lazily
    for the rank-deficient case), so it is refactored locally."""
    rankA, rankJ2 = gn.rankA, gn.rankJ2
    F_L11_b = factor_l11(F_A, act, t)
    dimA, dimJ2 = choose_subspace_dimensions(
        rx_sum, rx, active_cx_sum, t, rankJ2, rankA, F_L11_b, gn.F_J2,
        gn.JQ1, prev, restart, dims)
    p, b, d, _ = sub_search_direction(act, rx, F_A, F_L11_b, gn.F_J2,
                                   gn.JQ1, t, rankA, dimA, dimJ2,
                                   jnp.int32(-1), dims)
    code = jnp.where((dimA == rankA) & (dimJ2 == rankJ2), 1, -1)
    return p, b, d, dimA, dimJ2, code.astype(jnp.int32), jnp.int32(0)


def newton_direction(res_fn: Callable, cons_fn: Callable, x, rx, lam,
                     view: WorkingView, act: ActiveConstraint, F_A: FactorA,
                     F_L11: FactorL11, gn: GNResult, t, dims: Dims,
                     rdims=None):
    """ANALYS's Newton branch when second derivatives are allowed
    (:1262-1268)."""
    n = rdims_or(rdims, dims).n
    p, err = newton_search_direction(res_fn, cons_fn, x, rx, lam, view, act,
                                     F_A, F_L11, gn.JQ1, gn.rankA, t, dims,
                                     rdims)
    dimA = -t
    dimJ2 = t - n
    ec = jnp.where(err, -3, 0).astype(jnp.int32)
    return (p, gn.b, gn.d, dimA.astype(jnp.int32), dimJ2.astype(jnp.int32),
            jnp.int32(2), ec)


class AnalysResult(NamedTuple):
    p: jax.Array
    b: jax.Array          # (tmax,)
    d: jax.Array          # (m,)
    dimA: jax.Array
    dimJ2: jax.Array
    code: jax.Array
    beta: jax.Array
    speed: jax.Array
    error_code: jax.Array
    newton_taken: jax.Array


def search_direction_analysis(res_fn: Callable, cons_fn: Callable,
                              x, rx, cx, act: ActiveConstraint,
                              active_cx_sum, gn: GNResult,
                              F_A: FactorA, F_L11: FactorL11,
                              view: WorkingView, t, lam, iter_number,
                              prev: PrevIter, restart, constraint_added,
                              constraint_deleted, dims: Dims,
                              scaling: bool, second_derivatives: bool,
                              rdims=None) -> AnalysResult:
    """ANALYS (:1191-1291)."""
    rx_sum = jnp.sum(rx * rx)
    rankA, rankJ2 = gn.rankA, gn.rankJ2

    method_code, beta = analysis_decide(
        cx, act, active_cx_sum, gn, view, t, lam, iter_number, prev, restart,
        constraint_added, constraint_deleted, dims, scaling, rdims)

    # --- subspace minimization branch (code == -1) --------------------
    def subspace_branch(_):
        return subspace_direction(rx, rx_sum, act, active_cx_sum, gn, F_A, t,
                                  prev, restart, dims)

    # --- Newton branch (code == 2) ------------------------------------
    def newton_branch(_):
        if second_derivatives:
            return newton_direction(res_fn, cons_fn, x, rx, lam, view, act,
                                    F_A, F_L11, gn, t, dims, rdims)
        else:
            return (gn.p, gn.b, gn.d, rankA.astype(jnp.int32),
                    rankJ2.astype(jnp.int32), jnp.int32(2), jnp.int32(-4))

    def gn_branch(_):
        return (gn.p, gn.b, gn.d, rankA.astype(jnp.int32),
                rankJ2.astype(jnp.int32), jnp.int32(1), jnp.int32(0))

    branch_idx = jnp.where(method_code == 1, 0,
                           jnp.where(method_code == -1, 1, 2))
    p, b, d, dimA, dimJ2, code, error_code = lax.switch(
        branch_idx, [gn_branch, subspace_branch, newton_branch], None)

    speed = beta / prev.beta
    return AnalysResult(p=p, b=b, d=d, dimA=dimA, dimJ2=dimJ2, code=code,
                        beta=beta, speed=speed, error_code=error_code,
                        newton_taken=(method_code == 2) & jnp.asarray(second_derivatives))
