"""Batch-specialized iteration body: rare expensive branches run under
BATCH-LEVEL ``lax.cond`` instead of per-lane ``lax.cond``.

Under ``vmap``, ``lax.cond``/``lax.switch`` lower to ``select`` — every
lane computes BOTH sides of every branch, every iteration.  For the
solver that means each lane pays: a second full working-set
factorization round (WRKSET's second-order deletion detour,
/root/reference/src/enlsip_functions.jl:745-790), the F_L11
factorization, the subspace-minimization chain AND the Newton Hessian
contraction — even when no lane needs any of them.

The fix (this module): vmap the body in *sections*, and wrap each rare
expensive section in a real branch on the batch-level scalar predicate
``jnp.any(pred & alive)``.  When no live lane needs a section, the whole
batch skips it; when some lane does, the section runs vmapped and a
per-lane select keeps the untouched lanes on their cheap-path values —
bit-identical to the per-lane cond semantics of
:func:`enlsip_tpu.core.driver.iterate_body` in both cases.

Trajectory parity with single-instance solves is asserted by
tests/test_batch.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .direction import (AnalysResult, analysis_decide, newton_direction,
                        subspace_direction)
from .driver import (Functions, WorkingSetRound, _factor_stage1,
                     _post_direction, _ws_keep, _ws_round1, _ws_round2)
from .subproblem import factor_l11, zeros_factor_l11
from .types import Carry, Dims, Options, Tols


def bind_data(fns: Functions, d) -> Functions:
    """Bind one lane's data pytree into the user closures.

    With per-lane data, the ``Functions`` members take ``(x, data)``;
    binding turns them back into the ``(x)``-only closures the core
    solver calls.  An empty pytree (no leaves) means "no data" and
    returns ``fns`` unchanged.
    """
    if not jax.tree_util.tree_leaves(d):
        return fns
    return Functions(res=lambda x: fns.res(x, d),
                     jac_res=lambda x: fns.jac_res(x, d),
                     cons=lambda x: fns.cons(x, d),
                     jac_cons=lambda x: fns.jac_cons(x, d),
                     res_trial=(None if fns.res_trial is None else
                                (lambda x, p: fns.res_trial(x, p, d))))


def tree_where(pred, t, f):
    """Per-lane select over two identically-shaped pytrees; ``pred`` is
    a (B,) bool broadcast over each leaf's trailing dims."""
    def sel(a, b):
        p = pred.reshape(pred.shape + (1,) * (a.ndim - 1))
        return jnp.where(p, a, b)
    return jax.tree.map(sel, t, f)


def _broadcast_tree(tree, B):
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + jnp.shape(a)), tree)


def batched_working_set_round(mask, A, cx, rx, J, gf, index_del, alive,
                              dims: Dims, opts: Options,
                              tols: Tols, rdims=None,
                              stall_hint=None) -> WorkingSetRound:
    """Batched WRKSET: round 1 always (vmapped), F_L11 and the
    second-order deletion round only when some live lane needs them."""
    scaling = opts.scaling
    eps_rank = tols.eps_rank
    B = mask.shape[0]

    view, t, act, F_A, rankA = jax.vmap(
        lambda mask, A, cx, gf: _factor_stage1(mask, A, cx, gf, dims,
                                               scaling, eps_rank)
    )(mask, A, cx, gf)

    dtype = F_A.R.dtype
    need_l11 = (rankA < t) & alive
    zeros_l11 = _broadcast_tree(zeros_factor_l11(dims, dtype), B)
    F_L11 = lax.cond(
        jnp.any(need_l11),
        lambda: tree_where(need_l11, jax.vmap(factor_l11)(F_A, act, t),
                           zeros_l11),
        lambda: zeros_l11)

    if stall_hint is None:
        stall_hint = jnp.ones(B, bool)
    r1 = jax.vmap(
        lambda mask, A, cx, rx, J, gf, idel, view, t, act, F_A, rankA, F_L11,
        rd, sh: _ws_round1(
            mask, A, cx, rx, J, gf, idel, dims, scaling, tols,
            view, t, act, F_A, rankA, F_L11, rd, stall_hint=sh,
            rank_deficient_deletion=opts.rank_deficient_deletion)
    )(mask, A, cx, rx, J, gf, index_del, view, t, act, F_A, rankA, F_L11,
      rdims, stall_hint)

    do2 = r1.do2 & alive
    keep_out = jax.vmap(_ws_keep)(r1, mask)
    out = lax.cond(
        jnp.any(do2),
        lambda: tree_where(
            do2,
            jax.vmap(lambda r1, mask, A, cx, rx, J, gf, rd: _ws_round2(
                r1, mask, A, cx, rx, J, gf, dims, scaling, eps_rank, rd)
            )(r1, mask, A, cx, rx, J, gf, rdims),
            keep_out),
        lambda: keep_out)
    (mask_o, view_o, t_o, act_o, F_A_o, F_L11_o, gn_o, lam_o, deleted,
     index_del_o) = out
    return WorkingSetRound(mask=mask_o, view=view_o, t=t_o, act=act_o,
                           F_A=F_A_o, F_L11=F_L11_o, gn=gn_o, lam=lam_o,
                           grad_res=r1.grad_res, deleted=deleted,
                           index_del=index_del_o)


def batched_direction_analysis(fns: Functions, x, rx, cx, active_cx_sum,
                               wsr: WorkingSetRound, alive, nb_iter, prev,
                               restart, dims: Dims, opts: Options, data=(),
                               rdims=None) -> AnalysResult:
    """Batched ANALYS: GNDCHK per lane (cheap, vmapped); the subspace
    and Newton directions only when some live lane selects them."""
    gn = wsr.gn
    rx_sum = jnp.sum(rx * rx, axis=-1)

    mc, beta = jax.vmap(
        lambda cx, act, acs, gn, view, t, lam, it, prev, restart, cd, rd:
        analysis_decide(cx, act, acs, gn, view, t, lam, it, prev, restart,
                        jnp.asarray(False), cd, dims, opts.scaling, rd)
    )(cx, wsr.act, active_cx_sum, gn, wsr.view, wsr.t, wsr.lam, nb_iter,
      prev, restart, wsr.deleted, rdims)

    rankA32 = gn.rankA.astype(jnp.int32)
    rankJ232 = gn.rankJ2.astype(jnp.int32)
    out = (gn.p, gn.b, gn.d, rankA32, rankJ232,
           jnp.ones_like(rankA32), jnp.zeros_like(rankA32))

    sub_pred = (mc == -1) & alive
    out = lax.cond(
        jnp.any(sub_pred),
        lambda out: tree_where(
            sub_pred,
            jax.vmap(lambda rx, rxs, act, acs, gn, F_A, t, prev, restart:
                     subspace_direction(rx, rxs, act, acs, gn, F_A, t, prev,
                                        restart, dims)
                     )(rx, rx_sum, wsr.act, active_cx_sum, gn, wsr.F_A,
                       wsr.t, prev, restart),
            out),
        lambda out: out, out)

    newton_pred = (mc == 2) & alive
    if opts.second_derivatives:
        def lane_newton(x, rx, lam, view, act, F_A, F_L11, gn, t, d, rd):
            lf = bind_data(fns, d)
            return newton_direction(lf.res, lf.cons, x, rx, lam, view, act,
                                    F_A, F_L11, gn, t, dims, rd)

        out = lax.cond(
            jnp.any(newton_pred),
            lambda out: tree_where(
                newton_pred,
                jax.vmap(lane_newton)(x, rx, wsr.lam, wsr.view, wsr.act,
                                      wsr.F_A, wsr.F_L11, gn, wsr.t, data,
                                      rdims),
                out),
            lambda out: out, out)
    else:
        p, b, d, dimA, dimJ2, code, ec = out
        out = (p, b, d, dimA, dimJ2,
               jnp.where(mc == 2, 2, code),
               jnp.where(mc == 2, -4, ec))

    p, b, d, dimA, dimJ2, code, error_code = out
    speed = beta / prev.beta
    newton_taken = (mc == 2) & jnp.asarray(opts.second_derivatives)
    return AnalysResult(p=p, b=b, d=d, dimA=dimA, dimJ2=dimJ2, code=code,
                        beta=beta, speed=speed, error_code=error_code,
                        newton_taken=newton_taken)


def batched_iterate_body(carry: Carry, fns: Functions, dims: Dims,
                         opts: Options, tols: Tols, data=(),
                         rdims=None) -> Carry:
    """One batched ENLSIP iteration over a (B,)-leading carry; values
    per lane are identical to :func:`driver.iterate_body`."""
    alive = carry.exit_code == 0
    x, rx, cx, J, A, gf = (carry.x, carry.rx, carry.cx, carry.J, carry.A,
                           carry.gf)
    rx_sum_start = jnp.sum(rx * rx, axis=-1)
    if rdims is None:
        cx_sum_start = jnp.sum(cx * cx, axis=-1)
    else:
        real = jnp.arange(dims.l)[None, :] < rdims.l[:, None]
        cx_sum_start = jnp.sum(jnp.where(real, cx * cx, 0.0), axis=-1)

    x_diff_prev = jnp.linalg.norm(carry.prev.x - x, axis=-1)
    stall_hint = (carry.nb_iter >= 2) & \
        (x_diff_prev < tols.eps_x * (1.0 + jnp.linalg.norm(x, axis=-1)))
    wsr = batched_working_set_round(
        carry.active_mask, A, cx, rx, J, gf, carry.index_del, alive, dims,
        opts, tols, rdims, stall_hint)

    act_idx = wsr.view.active_list[:, :dims.tmax]
    active_cx_sum = jnp.sum(
        jnp.where(wsr.act.valid,
                  jnp.take_along_axis(cx, act_idx, axis=1) ** 2, 0.0),
        axis=-1)

    ana = batched_direction_analysis(
        fns, x, rx, cx, active_cx_sum, wsr, alive, carry.nb_iter,
        carry.prev, carry.restart, dims, opts, data, rdims)

    return jax.vmap(
        lambda carry, wsr, ana, acs, rss, css, d, rd: _post_direction(
            carry, bind_data(fns, d), dims, opts, tols, wsr, ana, acs, rss,
            css, rd)
    )(carry, wsr, ana, active_cx_sum, rx_sum_start, cx_sum_start, data,
      rdims)


def batched_guarded_body(carry: Carry, fns: Functions, dims: Dims,
                         opts: Options, tols: Tols, data=(),
                         rdims=None) -> Carry:
    """Freeze rule over the batched body: terminated lanes keep their
    carry unchanged."""
    new = batched_iterate_body(carry, fns, dims, opts, tols, data, rdims)
    done = carry.exit_code != 0
    return tree_where(done, carry, new)
