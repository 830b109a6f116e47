"""The ENLSIP-TPU solver driver: one jitted iteration body inside a
single ``lax.while_loop`` plus a thin chunked host loop for wall-clock
time limits.

Reference: /root/reference/src/enlsip_functions.jl
  WRKSET :686-795 (orchestrated in :func:`_working_set_round`),
  driver ``enlsip`` :2638-2880.

Design notes (TPU-first re-architecture, not a port):

* The reference unrolls the first iteration (:2670-2772); here the loop
  body is uniform and the first-iteration special cases are encoded in
  the initial carry (see :func:`init_carry` — the analysis in each
  field's comment shows the seeded values reproduce the unrolled
  behavior exactly).
* The reference's WRKSET deletes a constraint suggested by the
  first-order multipliers, recomputes the GN direction on the reduced
  set, applies a feasible-direction test that — in the mounted source —
  is constant-false (``As_p = (rankA <= W.t ? 0.0 : ...)`` at :728 with
  rankA <= t-1 = W.t always), re-adds the constraint and recomputes on
  the original set.  The only lasting effects are ``del = false`` and
  ``index_del = 0`` (:737-738); we apply those directly and skip the
  dead factorizations.  Actual deletions flow through the second-order
  multiplier estimate (:745-764, :773-790), which is fully implemented.
* Every iteration runs exactly one factorization round in the common
  case and a second one under ``lax.cond`` when the second-order
  estimate deletes a constraint.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.select_update import set1, set_row
from .direction import search_direction_analysis
from .linesearch import compute_steplength
from .subproblem import (ActiveConstraint, FactorA, FactorL11, GNResult,
                         factor_active, factor_l11, first_mult_estimate,
                         gather_active, gn_search_direction,
                         second_mult_estimate, zeros_factor_l11)
from .termination import check_termination
from .types import (Carry, Counters, Dims, Options, PrevIter, Tols,
                    WorkingView, matmul_precision_scope, rdims_or,
                    working_view)
from .working_set import (check_constraint_deletion,
                          evaluate_violated_constraints, init_working_set,
                          minmax_lagrangian_mult)


class Functions(NamedTuple):
    """Traced user callables (jacobians resolved by the models layer).

    ``res_trial`` (optional): a directional-evaluation factory
    ``res_trial(x, p) -> (alpha -> r(x + alpha*p))`` for problems whose
    residual has cheap structure along a ray — e.g. r(x) = phi(W@x)
    with a giant (m, n) W: the factory computes zx = W@x and zp = W@p
    ONCE per steplength computation and every line-search trial costs
    O(m) instead of an O(m*n) matrix stream.  The default (None) is the
    black-box form ``lambda a: res(x + a*p)``, bit-identical to
    evaluating res at the trial point.  Trial evaluations bump the
    residual counter exactly like the reference's psi (the counter
    counts semantic evaluations of r).

    ``jac_rowscale``/``jac_base`` (optional, set together): a FACTORED
    residual Jacobian ``J(x) = diag(jac_rowscale(x)) @ jac_base()`` —
    the shape of every phi(W@x)-style fit, where J is a row-scaled
    constant matrix.  The solver then never materializes J: the carry
    stores the (m, 1) scale, the WY right-apply streams the base with
    the scale fused in-kernel (ops/pallas_wy.py), and J@v / J^T u
    products become base products with O(m) scaling.  On the 5M x 100
    giant-m config this removes two (m, n) HBM streams per iteration
    (the jac write and the apply's J read are replaced by one base
    read).  Single-solve paths only (init_carry/run_chunk/solve);
    ``solve_batched`` rejects it.  When set, ``jac_res`` may be None
    (it is not called).  The reference has no analogue — its J is
    always a materialized Matrix (enlsip_functions.jl:34-52)."""

    res: Callable
    jac_res: Callable
    cons: Callable
    jac_cons: Callable
    res_trial: Callable | None = None
    jac_rowscale: Callable | None = None
    jac_base: Callable | None = None


def new_point(fns: Functions, x, counters: Counters):
    """new_point! (:34-52): evaluate r, J, c, A (4 evaluations).

    The solve dtype (x's) is authoritative — the reference's element
    type T flows from x0 through every array (solver.jl:62); here user
    closures are cast at this evaluation boundary, so e.g. an f32 solve
    under jax_enable_x64 (where closure constants default to f64) keeps
    a uniformly-f32 carry instead of mixed dtypes that break the
    while_loop carry typing."""
    dt = x.dtype
    rx = jnp.asarray(fns.res(x), dt)
    if fns.jac_rowscale is not None:
        # Factored mode: J = diag(s) @ base.  The carry's J slot holds
        # the (m, 1) scale; the shared base subexpression with res
        # (e.g. W@x) is CSE'd by XLA, so this costs no extra (m, n)
        # stream.
        J = jnp.asarray(fns.jac_rowscale(x), dt)[:, None]
    else:
        J = jnp.asarray(fns.jac_res(x), dt)
    cx = jnp.asarray(fns.cons(x), dt)
    A = jnp.asarray(fns.jac_cons(x), dt)
    counters = Counters(nb_res=counters.nb_res + 1,
                        nb_jacres=counters.nb_jacres + 1,
                        nb_cons=counters.nb_cons + 1,
                        nb_jaccons=counters.nb_jaccons + 1)
    return rx, J, cx, A, counters


def _grad_f(fns: Functions, J, rx):
    """gf = J^T rx (:2830); factored mode: base^T (s * rx)."""
    if fns.jac_base is not None:
        return fns.jac_base().T @ (J[:, 0] * rx)
    return J.T @ rx


class WorkingSetRound(NamedTuple):
    mask: jax.Array
    view: WorkingView
    t: jax.Array
    act: ActiveConstraint
    F_A: FactorA
    F_L11: FactorL11
    gn: GNResult
    lam: jax.Array
    grad_res: jax.Array
    deleted: jax.Array
    index_del: jax.Array


def _factor_stage1(mask, A, cx, gf, dims: Dims, scaling: bool, eps_rank):
    """Gather/scale the active set and factor A_act^T (F_A + rank)."""
    view = working_view(mask)
    t = view.t
    act = gather_active(A, cx, view, dims, scaling)
    F_A = factor_active(act, gf, t, dims)
    from ..ops.qr import pseudo_rank
    rankA = pseudo_rank(F_A.diag, t, eps_rank)
    return view, t, act, F_A, rankA


def _cx_sq_sum(cx, dims: Dims, rdims):
    """||cx||^2 over the lane's true l constraints (the reference's
    dot(cx, cx); heterogeneous padding rows are excluded)."""
    if rdims is None:
        return jnp.dot(cx, cx)
    return jnp.sum(jnp.where(jnp.arange(dims.l) < rdims.l, cx * cx, 0.0))


def _factor_and_gn(mask, A, cx, rx, J, gf, dims: Dims, scaling: bool,
                   eps_rank, rdims=None, tsqr_axis=None,
                   tall_qr: str = "cholqr", jac_base=None,
                   elide_jq1: bool = False):
    """One full factorization round: gather/scale -> F_A -> (F_L11) -> GN.

    F_L11 is only consumed on the rank-deficient (stabilized) path, so
    it is computed under a cond; the full-rank GN path gets a zeros
    placeholder whose downstream products are masked away.  (ANALYS's
    subspace and Newton branches that genuinely need F_L11 when
    rankA == t recompute it inside their own branch.)"""
    view, t, act, F_A, rankA = _factor_stage1(mask, A, cx, gf, dims, scaling,
                                              eps_rank)
    F_L11 = lax.cond(rankA < t,
                     lambda: factor_l11(F_A, act, t),
                     lambda: zeros_factor_l11(dims, F_A.R.dtype))
    gn = gn_search_direction(J, rx, act, F_A, F_L11, rankA, t, eps_rank, dims,
                             rdims, tsqr_axis, tall_qr, jac_base=jac_base,
                             elide_jq1=elide_jq1)
    return view, t, act, F_A, F_L11, gn


class WSRound1(NamedTuple):
    """Everything the first WRKSET round produces, plus the decision
    inputs for the (rare) second-order deletion round."""

    view: WorkingView
    t: jax.Array
    act: ActiveConstraint
    F_A: FactorA
    F_L11: FactorL11
    gn: GNResult
    lam: jax.Array        # first estimate
    lam_sel: jax.Array    # lam2 on the full-rank path, else lam
    lam2: jax.Array
    grad_res: jax.Array
    s2: jax.Array
    do2: jax.Array
    index_del: jax.Array


def _ws_round1(mask, A, cx, rx, J, gf, index_del_in, dims: Dims,
               scaling: bool, tols: Tols, view, t, act, F_A, rankA,
               F_L11, rdims=None, tsqr_axis=None,
               tall_qr: str = "cholqr",
               stall_hint=jnp.bool_(True),
               rank_deficient_deletion: bool = True,
               jac_base=None, elide_jq1: bool = False) -> WSRound1:
    """WRKSET round 1 given stage-1 factorization results: GN direction,
    both multiplier estimates, and the round-2 decision (:686-795)."""
    rd = rdims_or(rdims, dims)
    eps_rank = tols.eps_rank
    gn = gn_search_direction(J, rx, act, F_A, F_L11, rankA, t, eps_rank, dims,
                             rdims, tsqr_axis, tall_qr, jac_base=jac_base,
                             elide_jq1=elide_jq1)
    lam, grad_res = first_mult_estimate(F_A, act, t, dims, scaling, eps_rank)
    s = check_constraint_deletion(rd.q, lam, act.valid, t, scaling,
                                  act.diag_scale, grad_res)
    # Lasting effect of the (always rolled back) first-order deletion
    # detour: del := false, index_del := 0 (:737-738).
    index_del = jnp.where(s >= 0, jnp.int32(-1), index_del_in)

    # Second-order estimate round (:745-764, :773-790): only when the
    # factorizations are full-rank.
    full_rank = (t == gn.rankA) & (gn.rankJ2 == jnp.minimum(rd.m, rd.n - gn.rankA))
    lam2 = second_mult_estimate(F_A, gn.JQ1, rx, J, gn.p, t, act, dims,
                                scaling, F_J2=gn.F_J2, y_gn=gn.y,
                                jac_base=jac_base)
    lam_sel = jnp.where(full_rank, lam2, lam)
    s2 = check_constraint_deletion(rd.q, lam2, act.valid, t, scaling,
                                   act.diag_scale, jnp.asarray(0.0, rx.dtype))
    do2 = full_rank & (s2 >= 0)
    if rank_deficient_deletion and \
            jnp.finfo(rx.dtype).eps > jnp.finfo(jnp.float64).eps:
        # D13 (f32 robustness): rank-deficient second-order deletion.
        # The reference's deletion gate requires FULL-RANK factorizations
        # (enlsip_functions.jl:745-790, the same t == rankA && rankJ2 ==
        # min(m, n - rankA) condition as ``full_rank`` above).  At f64
        # that gate opens at every stationary point the suite reaches; at
        # f32 a pseudo-rank can drop AT the optimum, and a lane holding a
        # genuinely negative inequality multiplier there is deadlocked:
        # TERCRI's necessary conditions fail on sigma_min forever (the
        # multiplier can only leave through this gate) and the lane
        # eventually aborts -6/-4 at a point whose working set is simply
        # one deletion away from optimal (measured round 3: 19/10k
        # ODE-fit lanes).  When the iterate already satisfies EVERY
        # OTHER necessary first-order condition (feasible active +
        # inactive sets, small projected gradient) and the second
        # estimate — which second_mult_estimate already computes on the
        # pseudo-rank-TRUNCATED factorization — still flags a negative
        # multiplier, AND the lane shows stall evidence (``stall_hint``:
        # the last two steps moved x by < eps_x relative — the same
        # noise-limited-movement signal as TERCRI's +300 class; without
        # it the predicate fires on TRANSIENT negative multipliers at
        # near-stationary waypoints of still-moving trajectories and
        # deflects them to alternate stationary points, measured -54bp
        # of optimum rate on the 10k ODE-fit batch), the deletion is
        # performed despite the deficient rank.  Far from stationarity
        # nothing changes (the predicate fails); f64 is untouched
        # (dtype-static branch).
        act_cx_nrm = jnp.sqrt(jnp.sum(jnp.where(act.valid,
                                                act.cx_act * act.cx_act, 0.0)))
        stationary = (act_cx_nrm < tols.eps_c) & \
            (grad_res < jnp.sqrt(tols.eps_rel) * (1 + jnp.linalg.norm(gf)))
        inact = ~mask
        inact_ok = jnp.all(jnp.where(inact, cx > 0.0, True))
        stationary = stationary & jnp.where(jnp.sum(inact) > 0, inact_ok, True)
        sigma_min, lam_abs_max = minmax_lagrangian_mult(
            lam, act.valid, t, rd.q, scaling, act.diag_scale)
        factor = jnp.where(t == 1, 1.0 + jnp.dot(rx, rx), lam_abs_max)
        neg_block = (t > rd.q) & (sigma_min < tols.eps_rel * factor)
        deadlock = (stationary & neg_block & ~full_rank & (s2 >= 0) &
                    stall_hint)
        do2 = do2 | deadlock
    return WSRound1(view=view, t=t, act=act, F_A=F_A, F_L11=F_L11, gn=gn,
                    lam=lam, lam_sel=lam_sel, lam2=lam2, grad_res=grad_res,
                    s2=s2, do2=do2, index_del=index_del)


def _ws_round2(r1: WSRound1, mask, A, cx, rx, J, gf, dims: Dims,
               scaling: bool, eps_rank, rdims=None, tsqr_axis=None,
               tall_qr: str = "cholqr", jac_base=None,
               elide_jq1: bool = False):
    """WRKSET second-order deletion round (:745-764, :773-790): drop the
    suggested constraint and re-run the full factorization chain."""
    s2c = jnp.maximum(r1.s2, 0)
    gidx = r1.view.active_list[s2c]
    mask2 = set1(mask, gidx, False)
    view2, t2, act2, F_A2, F_L11_2, gn2 = _factor_and_gn(
        mask2, A, cx, rx, J, gf, dims, scaling, eps_rank, rdims, tsqr_axis,
        tall_qr, jac_base=jac_base, elide_jq1=elide_jq1)
    # Compact lam2: new slot j maps to old slot j (+1 past s2).
    tmax = dims.tmax
    j = jnp.arange(tmax)
    lam_c = jnp.where(j < s2c, r1.lam2[j], r1.lam2[jnp.minimum(j + 1, tmax - 1)])
    lam_c = jnp.where(act2.valid, lam_c, 0.0)
    return (mask2, view2, t2, act2, F_A2, F_L11_2, gn2, lam_c,
            jnp.asarray(True), gidx.astype(jnp.int32))


def _ws_keep(r1: WSRound1, mask):
    return (mask, r1.view, r1.t, r1.act, r1.F_A, r1.F_L11, r1.gn, r1.lam_sel,
            jnp.asarray(False), r1.index_del)


def _working_set_round(mask, A, cx, rx, J, gf, index_del_in, dims: Dims,
                       opts: Options, tols: Tols, rdims=None,
                       stall_hint=jnp.bool_(True),
                       jac_base=None,
                       elide_jq1: bool = False) -> WorkingSetRound:
    """WRKSET (:686-795), see module docstring for the branch analysis."""
    scaling = opts.scaling
    eps_rank = tols.eps_rank
    with jax.named_scope("factor_stage1"):
        view, t, act, F_A, rankA = _factor_stage1(mask, A, cx, gf, dims,
                                                  scaling, eps_rank)
        F_L11 = lax.cond(rankA < t,
                         lambda: factor_l11(F_A, act, t),
                         lambda: zeros_factor_l11(dims, F_A.R.dtype))
    with jax.named_scope("ws_round1"):
        r1 = _ws_round1(mask, A, cx, rx, J, gf, index_del_in, dims, scaling,
                        tols, view, t, act, F_A, rankA, F_L11, rdims,
                        opts.tsqr_axis, opts.tall_qr, stall_hint,
                        opts.rank_deficient_deletion, jac_base=jac_base,
                        elide_jq1=elide_jq1)

    with jax.named_scope("ws_round2"):
        (mask_o, view_o, t_o, act_o, F_A_o, F_L11_o, gn_o, lam_o, deleted,
         index_del_o) = lax.cond(
            r1.do2,
            lambda _: _ws_round2(r1, mask, A, cx, rx, J, gf, dims, scaling,
                                 eps_rank, rdims, opts.tsqr_axis,
                                 opts.tall_qr, jac_base=jac_base,
                                 elide_jq1=elide_jq1),
            lambda _: _ws_keep(r1, mask), None)
    return WorkingSetRound(mask=mask_o, view=view_o, t=t_o, act=act_o,
                           F_A=F_A_o, F_L11=F_L11_o, gn=gn_o, lam=lam_o,
                           grad_res=r1.grad_res, deleted=deleted,
                           index_del=index_del_o)


def init_carry(fns: Functions, x0, dims: Dims, opts: Options,
               dtype, rdims=None) -> Carry:
    """Seed the carry so the uniform loop body reproduces the reference's
    unrolled first iteration (:2670-2772).  The previous-iteration
    snapshot fields only need the values the first body actually reads:
    alpha = 1.0 (:2674), beta = 0, code = 1, w = INIALC weights,
    progress = predicted_reduction = 0, x = x0."""
    x0 = jnp.asarray(x0, dtype)
    counters = Counters.zeros()
    rx, J, cx, A, counters = new_point(fns, x0, counters)
    mask, w0, K = init_working_set(cx, A, x0, dims, rdims)
    gf = _grad_f(fns, J, rx)
    prev = PrevIter(
        x=x0, rx_sum=jnp.dot(rx, rx), cx_sum=_cx_sq_sum(cx, dims, rdims),
        t=jnp.sum(mask).astype(jnp.int32),
        alpha=jnp.asarray(1.0, dtype), beta=jnp.asarray(0.0, dtype),
        code=jnp.int32(1), w=w0,
        progress=jnp.asarray(0.0, dtype),
        predicted_reduction=jnp.asarray(0.0, dtype),
        rankA=jnp.int32(0), rankJ2=jnp.int32(0),
        dimA=jnp.int32(0), dimJ2=jnp.int32(0))
    return Carry(
        x=x0, rx=rx, cx=cx, J=J, A=A, gf=gf, active_mask=mask, w=w0, K=K,
        prev=prev, restart=jnp.asarray(False), index_del=jnp.int32(-1),
        nb_newton_steps=jnp.int32(0), nb_iter=jnp.int32(0),
        exit_code=jnp.int32(0), counters=counters,
        display=jnp.zeros((opts.max_iter + 1, 5), dtype),
        n_display=jnp.int32(0))


def iterate_body(carry: Carry, fns: Functions, dims: Dims, opts: Options,
                 tols: Tols, rdims=None) -> Carry:
    """One full ENLSIP iteration (= the reference loop body :2776-2878,
    which is also the unrolled first iteration :2670-2772)."""
    x, rx, cx, J, A, gf = carry.x, carry.rx, carry.cx, carry.J, carry.A, carry.gf
    rx_sum_start = jnp.dot(rx, rx)
    cx_sum_start = _cx_sq_sum(cx, dims, rdims)

    # --- EVSCAL + WRKSET ------------------------------------------------
    # D13 stall evidence (f32 only; see _ws_round1): the last two steps
    # moved x by less than eps_x relative — prev.x spans two steps, same
    # as TERCRI's x_diff (the :2860 copy-before-refresh quirk).
    x_diff_prev = jnp.linalg.norm(carry.prev.x - x)
    stall_hint = (carry.nb_iter >= 2) & \
        (x_diff_prev < tols.eps_x * (1.0 + jnp.linalg.norm(x)))
    jb = fns.jac_base() if fns.jac_base is not None else None
    # JQ1-write elision: safe exactly when the Newton branch (the only
    # true JQ1 reader) is statically off — see gn_search_direction.
    elide = jb is not None and not opts.second_derivatives
    with jax.named_scope("wrkset"):
        wsr = _working_set_round(carry.active_mask, A, cx, rx, J, gf,
                                 carry.index_del, dims, opts, tols, rdims,
                                 stall_hint, jac_base=jb, elide_jq1=elide)
    t = wsr.t
    act_idx = wsr.view.active_list[:dims.tmax]
    active_cx_sum = jnp.sum(jnp.where(wsr.act.valid, cx[act_idx] ** 2, 0.0))

    # --- ANALYS ----------------------------------------------------------
    with jax.named_scope("analys"):
        ana = search_direction_analysis(
            fns.res, fns.cons, x, rx, cx, wsr.act, active_cx_sum, wsr.gn,
            wsr.F_A, wsr.F_L11, wsr.view, t, wsr.lam, carry.nb_iter,
            carry.prev, carry.restart, jnp.asarray(False), wsr.deleted,
            dims, opts.scaling, opts.second_derivatives, rdims)
    return _post_direction(carry, fns, dims, opts, tols, wsr, ana,
                           active_cx_sum, rx_sum_start, cx_sum_start, rdims)


def _post_direction(carry: Carry, fns: Functions, dims: Dims, opts: Options,
                    tols: Tols, wsr: WorkingSetRound, ana, active_cx_sum,
                    rx_sum_start, cx_sum_start, rdims=None) -> Carry:
    """Everything after ANALYS: STPLNG, the step, new_point, TERCRI and
    the bookkeeping (reference loop tail :2809-2878)."""
    x, rx, cx, J, A = carry.x, carry.rx, carry.cx, carry.J, carry.A
    counters = carry.counters
    t = wsr.t
    act_idx = wsr.view.active_list[:dims.tmax]
    # The reference bumps the residual/constraint counters through its
    # finite-difference Hessians; our AD Hessians are single evaluations.
    counters = lax.cond(
        ana.newton_taken,
        lambda c: c._replace(nb_res=c.nb_res + 1, nb_cons=c.nb_cons + 1),
        lambda c: c, counters)
    nb_newton = carry.nb_newton_steps + jnp.where(ana.newton_taken, 1, 0)

    # --- STPLNG ----------------------------------------------------------
    if fns.res_trial is not None:
        res_trial = fns.res_trial
    else:  # black-box default: bit-identical to res at the trial point
        res_trial = lambda xx, pp: (
            lambda a: fns.res(xx + a.astype(xx.dtype) * pp))
    with jax.named_scope("stplng"):
        sl = compute_steplength(
            res_trial, fns.cons, x, rx, J, cx, A, wsr.act, wsr.view, t,
            ana.p, ana.dimA, wsr.gn.rankJ2, ana.code, wsr.index_del,
            carry.prev, carry.K, wsr.mask, dims, opts.weight_code, counters,
            opts.linesearch_max_refine, opts.gac_max_halvings,
            opts.eucmod_max_passes, opts.scaling,
            alive=carry.exit_code == 0,
            jac_base=(fns.jac_base() if fns.jac_base is not None
                      else None))
    counters = sl.counters

    # --- step + new point --------------------------------------------
    with jax.named_scope("new_point"):
        x_new = x + sl.alpha * ana.p
        rx_new, J_new, cx_new, A_new, counters = new_point(fns, x_new,
                                                           counters)
        gf_new = _grad_f(fns, J_new, rx_new)
    rx_sum_new = jnp.dot(rx_new, rx_new)
    restart_new = ana.error_code < 0

    sigma_min, lam_abs_max = minmax_lagrangian_mult(
        wsr.lam, wsr.act.valid, t, rdims_or(rdims, dims).q, opts.scaling,
        wsr.act.diag_scale)

    # NOTE: the reference copies previous_iter BEFORE refreshing iter.x
    # (:2860-2862), so the prev_iter.x TERCRI reads in body k is the
    # PREVIOUS body's starting point: x_diff = ||s_{k-1} - s_{k+1}||
    # spans TWO steps (verified against the numpy reference oracle,
    # tests/oracle_enlsip.py).  carry.prev.x holds exactly that point
    # (and x0 in the first body, matching the :2703 copy).
    exit_code = check_termination(
        ana.p, ana.code, restart_new, wsr.deleted, ana.d, ana.dimJ2,
        wsr.grad_res, wsr.act.cx_act, wsr.act.A_act, wsr.act.valid, t,
        x_new, carry.prev.x, cx_new, wsr.mask, rx_sum_new, gf_new,
        carry.nb_iter, opts.max_iter, tols, ana.error_code, sigma_min,
        lam_abs_max, sl.psi_error, nb_newton, sl.w, act_idx, dims, rdims)

    # --- bookkeeping: display, EVADD, prev snapshot -------------------
    record = (carry.nb_iter == 0) | (exit_code == 0)
    objective = jnp.where(carry.nb_iter == 0, rx_sum_start, rx_sum_new)
    row = jnp.stack([objective, active_cx_sum, jnp.linalg.norm(ana.p),
                     sl.alpha, jnp.where(sl.updated_progress, sl.progress,
                                         carry.prev.progress)])
    display = jnp.where(record,
                        set_row(carry.display, carry.nb_iter, row),
                        carry.display)
    n_display = carry.n_display + jnp.where(record, 1, 0)

    mask_evadd, _added = evaluate_violated_constraints(
        cx_new, wsr.mask, sl.index_alpha_upp, dims, rdims)
    mask_final = jnp.where(record, mask_evadd, wsr.mask)

    progress_out = jnp.where(sl.updated_progress, sl.progress,
                             carry.prev.progress)
    predred_out = jnp.where(sl.updated_progress, sl.predicted_reduction,
                            carry.prev.predicted_reduction)
    prev_new = PrevIter(
        x=x, rx_sum=rx_sum_start, cx_sum=cx_sum_start, t=t, alpha=sl.alpha,
        beta=ana.beta, code=ana.code, w=sl.w, progress=progress_out,
        predicted_reduction=predred_out, rankA=wsr.gn.rankA,
        rankJ2=wsr.gn.rankJ2, dimA=ana.dimA, dimJ2=ana.dimJ2)

    return Carry(
        x=x_new, rx=rx_new, cx=cx_new, J=J_new, A=A_new, gf=gf_new,
        active_mask=mask_final, w=sl.w, K=sl.K, prev=prev_new,
        restart=restart_new, index_del=wsr.index_del,
        nb_newton_steps=nb_newton,
        nb_iter=carry.nb_iter + jnp.where(record, 1, 0),
        exit_code=exit_code, counters=counters, display=display,
        n_display=n_display)


def guarded_body(carry: Carry, fns: Functions, dims: Dims, opts: Options,
                 tols: Tols, rdims=None) -> Carry:
    """Run one iteration unless this lane has already terminated —
    the freeze rule that makes the body safe under vmap."""
    new = iterate_body(carry, fns, dims, opts, tols, rdims)
    done = carry.exit_code != 0
    return jax.tree.map(lambda a, b: jnp.where(done, a, b), carry, new)


def run_chunk(carry: Carry, fns: Functions, dims: Dims, opts: Options,
              tols: Tols, chunk, rdims=None) -> Carry:
    """Run up to ``chunk`` iterations inside one jitted while_loop
    (``chunk`` may be a traced int32 — the loop condition handles it)."""
    start = carry.nb_iter

    def cond(c):
        return (c.exit_code == 0) & (c.nb_iter - start < chunk)

    def body(c):
        return iterate_body(c, fns, dims, opts, tols, rdims)

    return lax.while_loop(cond, body, carry)


@partial(jax.jit, static_argnames=("fns", "dims", "opts"))
def _run_chunk_jit(carry: Carry, tols: Tols, chunk, fns: Functions,
                   dims: Dims, opts: Options) -> Carry:
    # ``chunk`` is traced: every chunk size shares ONE compiled
    # executable (the while_loop condition reads it as data).
    return run_chunk(carry, fns, dims, opts, tols, chunk)


@partial(jax.jit, static_argnames=("fns", "dims", "opts", "dtype_name"))
def _init_carry_jit(x0, fns: Functions, dims: Dims, opts: Options,
                    dtype_name: str) -> Carry:
    return init_carry(fns, x0, dims, opts, jnp.dtype(dtype_name))


def _pack_result(carry: Carry, f_dev) -> jax.Array:
    """Flatten every field ``solve`` reports into ONE dtype array.

    On this environment's transport each fetched leaf costs a full host
    round trip (measured 2.5-27 ms EACH depending on tunnel load), so
    the result crosses the wire as a single buffer:
    [exit_code, f, nb_iter, n_display, 4 counters, x (n), display].
    The integer fields are small (|exit_code| <= 12340, counters bound
    by max_iter * linesearch trials) and exact in f32."""
    cnt = carry.counters
    head = jnp.stack([
        carry.exit_code.astype(f_dev.dtype), f_dev,
        carry.nb_iter.astype(f_dev.dtype),
        carry.n_display.astype(f_dev.dtype),
        cnt.nb_res.astype(f_dev.dtype), cnt.nb_jacres.astype(f_dev.dtype),
        cnt.nb_cons.astype(f_dev.dtype), cnt.nb_jaccons.astype(f_dev.dtype)])
    return jnp.concatenate([head, carry.x, carry.display.ravel()])


def _unpack_result(flat, n: int, start_time: float) -> "SolveResult":
    head, x, disp = flat[:8], flat[8:8 + n], flat[8 + n:]
    exit_code, f, n_iter, n_display = (int(head[0]), float(head[1]),
                                       int(head[2]), int(head[3]))
    counters = Counters(nb_res=int(head[4]), nb_jacres=int(head[5]),
                        nb_cons=int(head[6]), nb_jaccons=int(head[7]))
    return SolveResult(exit_code=exit_code, x=x, f=f, n_iter=n_iter,
                       display=disp.reshape(-1, 5), n_display=n_display,
                       counters=counters,
                       solving_time=time.time() - start_time)


@partial(jax.jit, static_argnames=("fns", "dims", "opts", "dtype_name"))
def _solve_full_jit(x0, tols: Tols, fns: Functions, dims: Dims,
                    opts: Options, dtype_name: str):
    """Whole default-limit solve as ONE dispatch: init + full while_loop
    + the packed result, so the host pays a single round trip."""
    carry = init_carry(fns, x0, dims, opts, jnp.dtype(dtype_name))
    carry = run_chunk(carry, fns, dims, opts, tols, opts.max_iter + 1)
    return _pack_result(carry, jnp.dot(carry.rx, carry.rx))


@jax.jit
def _pack_result_jit(carry: Carry):
    return _pack_result(carry, jnp.dot(carry.rx, carry.rx))


class SolveResult(NamedTuple):
    exit_code: int
    x: jax.Array
    f: float
    n_iter: int
    display: jax.Array
    n_display: int
    counters: Counters
    solving_time: float


def solve(fns: Functions, x0, dims: Dims, opts: Options, tols: Tols,
          time_limit: float | None = None, dtype=None) -> SolveResult:
    """Host-level solve: jitted chunked while_loop + wall-clock limit.

    The reference checks elapsed time every iteration (:2836,
    :2511-2512); a device loop cannot read the wall clock, so a finite
    limit is enforced by an adaptive chunk schedule: one measured
    iteration, then chunks sized to half the remaining budget from the
    measured per-iteration time.  ``chunk`` is traced (every size
    shares one compiled executable), so a limited solve costs ~3
    dispatches total — not one dispatch per iteration.  With the
    default (``time_limit=None`` / ``inf``: unlimited — the reference's
    1e3 s default is never reached by a max_iter=100 solve) the whole
    solve is a single dispatch with a SINGLE host sync (the final
    bundled transfer): on this environment's transport each host round
    trip costs ~45 ms — more than the n=1000 device loop itself — so
    the unlimited path avoids every intermediate sync and fetches all
    result fields in one ``device_get``.  Any finite numeric
    ``time_limit`` (including values >= 1e3) is honored via the chunked
    path.
    """
    dtype = dtype or jnp.asarray(x0).dtype
    start_time = time.time()
    with matmul_precision_scope(opts):
        if time_limit is None or time_limit == float("inf"):
            # Unlimited fast path: init + the full while_loop + the
            # packed result fused into ONE dispatch (TERCRI returns -2
            # at max_iter, so it always terminates); the only host
            # round trip is the single-buffer transfer of the packed
            # result.
            flat = _solve_full_jit(jnp.asarray(x0, dtype), tols, fns,
                                   dims, opts, jnp.dtype(dtype).name)
            return _unpack_result(jax.device_get(flat), dims.n, start_time)
        carry = _init_carry_jit(jnp.asarray(x0, dtype), fns, dims, opts,
                                jnp.dtype(dtype).name)
        per_iter = None
        while True:
            remaining_t = time_limit - (time.time() - start_time)
            if remaining_t <= 0:
                carry = carry._replace(exit_code=jnp.int32(-11))
                break
            if per_iter is None:
                chunk = 1  # measurement chunk (absorbs cold compile too)
            else:
                chunk = max(1, min(opts.max_iter + 1,
                                   int(0.5 * remaining_t / per_iter)))
            iter_before = int(carry.nb_iter)
            t0 = time.time()
            carry = _run_chunk_jit(carry, tols, jnp.int32(chunk), fns, dims,
                                   opts)
            exit_code = int(carry.exit_code)  # syncs the dispatch
            dt = time.time() - t0
            done_iters = max(int(carry.nb_iter) - iter_before, 1)
            measured = dt / done_iters
            per_iter = measured if per_iter is None else max(
                0.5 * per_iter, measured)
            if exit_code != 0:
                break
        # ONE single-buffer host transfer for everything (each extra
        # device_get leaf is a full round trip on this transport).
        return _unpack_result(jax.device_get(_pack_result_jit(carry)),
                              dims.n, start_time)
