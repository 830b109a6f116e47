"""Merit function and the Lindström–Wedin line search.

Reference: /root/reference/src/enlsip_functions.jl
  psi :1307-1340, CONCAT/LINC2 :1635-1689, QUAMIN/MINRN :1694-1735,
  MINRM machinery :1739-1862, REDC :1870-1886, GAC :1893-1923,
  LINEC :1940-2143, UPBND :2149-2178, STPLNG :2197-2293,
  check_derivatives :2295-2322.

The merit is
  psi(x + a p, w) = 1/2 (||r||^2 + sum_{i in W} w_i c_i^2
                         + sum_{j not in W, c_j < 0} w_j c_j^2).

Every psi evaluation re-evaluates the user residual and constraint
functions (exactly like the reference), so evaluation counters are
threaded through all routines.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .types import Counters, Dims, PrevIter


# --------------------------------------------------- accumulation dtype
#
# The line search's DECISIONS hinge on small differences of large merit
# values and on the quartic-model coefficient v2 = ((v(a)-v0)/a - v1)/a,
# which cancels catastrophically in f32 (observed: lanes stalling at an
# infeasible vertex with alpha ~ 1e-7 that f64 escapes).  All merit /
# model scalars therefore accumulate in f64 when x64 is available —
# a no-op for f64 solves, and only a few (m+l)-vector promotions per
# line search for f32 ones.  Identical decision semantics, reference
# behavior unchanged (the reference is Float64 end-to-end).

from .types import acc as _acc


# ----------------------------------------------------------------- psi

def psi(x, alpha, p, w, mask, res_at, cons_fn, counters: Counters):
    """Merit function at x + alpha*p (:1307-1340).

    ``res_at(alpha)`` evaluates r(x + alpha*p) — the black-box default
    closure is built in driver._post_direction; structured problems may
    supply a cheap directional form (Functions.res_trial)."""
    x_new = x + alpha.astype(x.dtype) * p
    rxn = _acc(res_at(alpha))
    cxn = _acc(cons_fn(x_new))
    w = _acc(w)
    counters = counters._replace(nb_res=counters.nb_res + 1,
                                 nb_cons=counters.nb_cons + 1)
    pen = jnp.where(mask | (cxn < 0.0), w * cxn * cxn, 0.0)
    return 0.5 * (jnp.dot(rxn, rxn) + jnp.sum(pen)), counters


def concat_v(rx, cx, w, mask, dims: Dims):
    """CONCAT (:1635-1659): v = [rx ; sqrt(w_k) c_k (active) ;
    min-part (inactive: 0 if c_k > 0 else sqrt(w_k) c_k)], indexed by
    global constraint id at offset m."""
    rx, cx, w = _acc(rx), _acc(cx), _acc(w)
    sw = jnp.sqrt(w)
    tail = jnp.where(mask, sw * cx, jnp.where(cx > 0.0, 0.0, sw * cx))
    return jnp.concatenate([rx, tail])


def linesearch_v1(JpAp, cx, w, mask, dims: Dims):
    """LINC2's v1 scaling (:1984-1998): constraint rows of [Jp; Ap] get
    sqrt(w) (active) or the min-part rule (inactive)."""
    m = dims.m
    JpAp, cx, w = _acc(JpAp), _acc(cx), _acc(w)
    head, tail = JpAp[:m], JpAp[m:]
    sw = jnp.sqrt(w)
    tail = jnp.where(mask, sw * tail, jnp.where(cx > 0.0, 0.0, sw * tail))
    return jnp.concatenate([head, tail])


# -------------------------------------------------------------- minrn

def minimize_quadratic(x1, y1, x2, y2, x3, y3):
    """QUAMIN (:1694-1702)."""
    d1, d2 = y2 - y1, y3 - y1
    s = (x3 - x1) ** 2 * d1 - (x2 - x1) ** 2 * d2
    q = 2.0 * ((x2 - x1) * d2 - (x3 - x1) * d1)
    return x1 - s / jnp.where(q != 0, q, jnp.finfo(x1.dtype).tiny)


def minrn(x1, y1, x2, y2, x3, y3, alpha_min, alpha_max, p_max):
    """MINRN (:1708-1735): 3-point quadratic interpolation, clamped."""
    eps = jnp.sqrt(jnp.finfo(x1.dtype).eps) / p_max
    degenerate = (jnp.abs(x1 - x2) < eps) | (jnp.abs(x3 - x1) < eps) | \
                 (jnp.abs(x3 - x2) < eps)
    u = minimize_quadratic(x1, y1, x2, y2, x3, y3)
    a = jnp.clip(u, alpha_min, alpha_max)
    safe = lambda v: jnp.where(jnp.abs(v) > 0, v, jnp.finfo(x1.dtype).tiny)
    t1 = (a - x1) * (a - x2) * y3 / safe((x3 - x1) * (x3 - x2))
    t2 = (a - x3) * (a - x2) * y1 / safe((x1 - x3) * (x1 - x2))
    t3 = (a - x3) * (a - x2) * y2 / safe((x2 - x1) * (x2 - x3))
    pa = t1 + t2 + t3
    zero = jnp.zeros_like(a)
    return jnp.where(degenerate, zero, a), jnp.where(degenerate, zero, pa)


# -------------------------------------------------------------- minrm

def _poly_eval(c, x):
    """Evaluate sum c_k x^k (c ascending, static length) via Horner."""
    acc = jnp.zeros_like(x)
    for ck in reversed(c):
        acc = acc * x + ck
    return acc


def _newton_raphson(x_min, Dm, dsc, ddsc, need):
    """Safeguarded NR on s'(a) = 0 (:1791-1811), <= 50 iters.

    ``need`` gates the loop for lanes whose result is discarded (see
    min_norm_w's note on vmapped while-loop trip counts)."""
    eps = jnp.finfo(x_min.dtype).eps

    def cond(st):
        a, err, it, done = st
        return ((err > 1e-4) | (it < 3)) & (it < 50) & (~done) & need

    def body(st):
        a, err, it, done = st
        c = _poly_eval(ddsc, a)
        stop = jnp.abs(c) < eps
        h = -_poly_eval(dsc, a) / jnp.where(stop, 1.0, c)
        a2 = jnp.where(stop, a, a + h)
        err2 = jnp.where(stop, err, (2.0 * Dm * h * h) / jnp.abs(
            jnp.where(stop, 1.0, c)))
        return a2, err2, it + 1, done | stop

    a, *_ = lax.while_loop(cond, body, (x_min, jnp.ones_like(x_min),
                                        jnp.int32(0), jnp.asarray(False)))
    return a


def _one_root(c, d, a):
    """ONER (:1815-1818)."""
    sq = jnp.sqrt(jnp.maximum(d, 0.0))
    return jnp.cbrt(-c / 2 + sq) + jnp.cbrt(-c / 2 - sq) - a / 3


def _two_roots(b, c, d, a, x_min):
    """TWOR (:1821-1837).  Valid when d < 0 (then b < 0)."""
    bsafe = jnp.minimum(b, -jnp.finfo(b.dtype).tiny)
    arg = jnp.clip(jnp.abs(c / 2) / (-bsafe / 3) ** 1.5, -1.0, 1.0)
    phi = jnp.arccos(arg)
    t = jnp.where(c <= 0, 2.0, -2.0) * jnp.sqrt(-bsafe / 3)
    pi = jnp.pi
    roots = jnp.stack([t * jnp.cos(phi / 3) - a / 3,
                       t * jnp.cos((phi + 2 * pi) / 3) - a / 3,
                       t * jnp.cos((phi + 4 * pi) / 3) - a / 3])
    r = jnp.sort(roots)
    lo, mid, hi = r[0], r[1], r[2]
    alpha = jnp.where(x_min <= mid, lo, hi)
    beta = jnp.where(x_min <= mid, hi, lo)
    return alpha, beta


def minrm(v0, v1, v2, x_min, alpha_min, alpha_max, need=None):
    """MINRM (:1841-1862): minimize the quartic
    s(a) = 1/2 ||v0 + v1 a + v2 a^2||^2 analytically; returns the best
    two local minimizers clamped to [alpha_min, alpha_max] with values.
    """
    need = jnp.asarray(True) if need is None else need
    dtype = v0.dtype
    c0 = 0.5 * jnp.dot(v0, v0)
    c1 = jnp.dot(v0, v1)
    c2 = jnp.dot(v0, v2) + 0.5 * jnp.dot(v1, v1)
    c3 = jnp.dot(v1, v2)
    c4 = 0.5 * jnp.dot(v2, v2)
    sc = (c0, c1, c2, c3, c4)
    dsc = (c1, 2 * c2, 3 * c3, 4 * c4)
    ddsc = (2 * c2, 6 * c3, 12 * c4)

    normv2 = jnp.dot(v2, v2)
    nv2 = jnp.where(normv2 != 0, normv2, jnp.finfo(dtype).tiny)
    dds_best = _poly_eval(ddsc, x_min)
    h0 = jnp.abs(_poly_eval(dsc, x_min) /
                 jnp.where(dds_best != 0, dds_best, jnp.finfo(dtype).tiny))
    Dm = jnp.abs(6 * jnp.dot(v1, v2) + 12 * x_min * normv2) + 24 * h0 * normv2
    hm = jnp.maximum(h0, 1.0)
    analytic = dds_best * 0.1 < 2 * Dm * hm

    a1 = 3 * c3 / (2 * nv2)
    a2 = 2 * c2 / (2 * nv2)
    a3 = c1 / (2 * nv2)
    b = a2 - (a1 ** 2) / 3
    c = a3 - a1 * a2 / 3 + 2 * (a1 / 3) ** 3
    d = (c / 2) ** 2 + (b / 3) ** 3

    ar_two, br_two = _two_roots(b, c, d, a1, x_min)
    ar_one = _one_root(c, d, a1)
    a_analytic = jnp.where(d < 0, ar_two, ar_one)
    a_nr = _newton_raphson(x_min, Dm, dsc, ddsc, need & ~analytic)
    alpha_hat = jnp.where(analytic, a_analytic, a_nr)
    d_eff = jnp.where(analytic, d, 1.0)  # NR branch leaves d = 1.0 (:1748)
    beta_hat = jnp.where(d_eff < 0, jnp.where(analytic, br_two, alpha_hat),
                         alpha_hat)

    s = lambda a: _poly_eval(sc, a)
    alpha_old = alpha_hat
    alpha_c = jnp.clip(alpha_hat, alpha_min, alpha_max)
    s_alpha = s(alpha_c)
    same = alpha_old == beta_hat
    beta_c = jnp.where(same, alpha_c, jnp.clip(beta_hat, alpha_min, alpha_max))
    s_beta = jnp.where(same, s(alpha_c), s(beta_c))
    return alpha_c, s_alpha, beta_c, s_beta


# ------------------------------------------------------------- checks

def check_reduction(psi_alpha, psi_k, approx_k, eta, diff_psi):
    """REDC (:1870-1886)."""
    delta = 0.2
    likely = ~((psi_alpha - psi_k < eta * diff_psi) & (psi_k > delta * psi_alpha))
    return jnp.where(psi_alpha - approx_k >= eta * diff_psi, likely, False)


def goldstein_armijo_step(psi0, dpsi0, alpha_min, tau, p_max, x, alpha0, p,
                          w, mask, res_at, cons_fn, counters: Counters,
                          max_halvings: int, need=None):
    """GAC (:1893-1923): halve until psi(u) <= psi0 + tau u dpsi0."""
    need = jnp.asarray(True) if need is None else need
    sqr_eps = jnp.sqrt(jnp.finfo(x.dtype).eps)
    u0 = _acc(alpha0)
    exit0 = (p_max * u0 < sqr_eps) | (u0 <= alpha_min)
    psi_u0, counters = psi(x, u0, p, w, mask, res_at, cons_fn, counters)

    def cond(st):
        u, psiu, ext, cnt, it = st
        return ((~ext) & (psiu > psi0 + tau * u * dpsi0)
                & (it < max_halvings) & need)

    def body(st):
        u, psiu, ext, cnt, it = st
        u = u * 0.5
        psiu, cnt = psi(x, u, p, w, mask, res_at, cons_fn, cnt)
        ext = (p_max * u < sqr_eps) | (u <= alpha_min)
        return u, psiu, ext, cnt, it + 1

    u, psiu, ext, counters, _ = lax.while_loop(
        cond, body, (u0, psi_u0, exit0, counters, jnp.int32(0)))
    return u, ext, counters


# -------------------------------------------------------------- LINEC

class LinesearchResult(NamedTuple):
    alpha: jax.Array
    gac_error: jax.Array
    counters: Counters


def linesearch_constrained(x, alpha0, p, rx, cx, JpAp, w, mask, psi0, dpsi0,
                           alpha_low, alpha_upp, res_at, cons_fn,
                           counters: Counters, dims: Dims,
                           max_refine: int, gac_max: int,
                           need=None) -> LinesearchResult:
    """LINEC (:1940-2143).

    ``need``: whether this lane consumes the result; False only gates
    inner-loop trip counts (values for need=True lanes are unchanged —
    under vmap a while-loop runs the max trips over ALL lanes, so
    frozen/branch-untaken lanes otherwise force everyone through the
    worst case)."""
    need = jnp.asarray(True) if need is None else need
    eta, tau, gamma = 0.3, 0.25, 0.4
    psi0, dpsi0 = _acc(psi0), _acc(dpsi0)
    alpha_min, alpha_max = _acc(alpha_low), _acc(alpha_upp)
    alpha_k = jnp.minimum(_acc(alpha0), alpha_max)
    p_max = _acc(jnp.max(jnp.abs(p)))

    v1 = linesearch_v1(JpAp, cx, w, mask, dims)
    psi_k, counters = psi(x, alpha_k, p, w, mask, res_at, cons_fn, counters)
    diff_psi0 = psi0 - psi_k

    x_new = x + alpha_k.astype(x.dtype) * p
    rx_new = res_at(alpha_k)
    cx_new = cons_fn(x_new)
    counters = counters._replace(nb_res=counters.nb_res + 1,
                                 nb_cons=counters.nb_cons + 1)
    v0 = concat_v(rx, cx, w, mask, dims)
    vb = concat_v(rx_new, cx_new, w, mask, dims)
    v2 = ((vb - v0) / alpha_k - v1) / alpha_k

    x_min = jnp.where(diff_psi0 >= 0, alpha_k, jnp.zeros_like(alpha_k))
    a_kp1, pk, bta, pbta = minrm(v0, v1, v2, x_min, alpha_min, alpha_max,
                                 need)
    better_beta = (a_kp1 != bta) & (pbta < pk) & (bta <= alpha_k)
    a_kp1 = jnp.where(better_beta, bta, a_kp1)
    pk = jnp.where(better_beta, pbta, pk)

    # UPDATE
    alpha_km2, psi_km2 = jnp.zeros_like(alpha_k), psi0
    alpha_km1, psi_km1 = alpha_k, psi_k
    alpha_k = a_kp1
    psi_k, counters = psi(x, alpha_k, p, w, mask, res_at, cons_fn, counters)

    def refine_loop(carry, fixed_diff, branch_need):
        """The reduction-likely 3-point refinement loop (:2048-2064 and
        :2113-2129).  When ``fixed_diff`` is True the loop keeps the
        stale diff_psi (the reference's second branch never updates it).
        ``branch_need``: lane actually executes this branch (trip gate).
        """
        def cond(st):
            (ak2, pk2, ak1, pk1, ak, pkk, approx, dpsi, cnt, it, likely) = st
            return likely & (it < max_refine) & branch_need

        def body(st):
            (ak2, pk2, ak1, pk1, ak, pkk, approx, dpsi, cnt, it, _) = st
            a_new, approx2 = minrn(ak, pkk, ak1, pk1, ak2, pk2,
                                   alpha_min, alpha_max, p_max)
            ak2, pk2 = ak1, pk1
            ak1, pk1 = ak, pkk
            ak = a_new
            pkk, cnt = psi(x, ak, p, w, mask, res_at, cons_fn, cnt)
            dpsi2 = jnp.where(fixed_diff, dpsi, psi0 - pkk)
            likely = check_reduction(pk1, pkk, approx2, eta, dpsi2)
            return ak2, pk2, ak1, pk1, ak, pkk, approx2, dpsi2, cnt, it + 1, likely

        return lax.while_loop(cond, body, carry)

    # ---- branch 1: termination satisfied at alpha0 (:2039-2070) -------
    def branch1(counters):
        diff_psi = psi0 - psi_k
        likely0 = check_reduction(psi_km1, psi_k, pk, eta, diff_psi)
        st = (alpha_km2, psi_km2, alpha_km1, psi_km1, alpha_k, psi_k,
              pk, diff_psi, counters, jnp.int32(0), likely0)
        (ak2, pk2, ak1, pk1, ak, pkk, approx, dpsi, cnt, _, _) = \
            refine_loop(st, fixed_diff=False, branch_need=need & term_a0)
        best = (pk1 - approx >= eta * dpsi) & (pkk < pk1)
        a_out = jnp.where(best, ak, ak1)
        return a_out, jnp.asarray(False), cnt

    # ---- branch 2 (:2072-2139) ----------------------------------------
    def branch2(counters):
        diff_psi = psi0 - psi_k
        term_a1 = (-diff_psi <= tau * dpsi0 * alpha_k) | (psi_k < gamma * psi0)
        sat_need = need & ~term_a0 & term_a1

        def sat(counters):
            # alpha0 not useful: redo the quartic model at alpha_k
            def redo(cnt):
                xk = x + alpha_k.astype(x.dtype) * p
                rxn = res_at(alpha_k)
                cxn = cons_fn(xk)
                cnt = cnt._replace(nb_res=cnt.nb_res + 1,
                                   nb_cons=cnt.nb_cons + 1)
                vbk = concat_v(rxn, cxn, w, mask, dims)
                v2k = ((vbk - v0) / alpha_k - v1) / alpha_k
                a_n, pk_n, b_n, pb_n = minrm(v0, v1, v2k, alpha_k,
                                             alpha_min, alpha_max,
                                             sat_need & (psi0 <= psi_km1))
                swap = (a_n != b_n) & (pb_n < pk_n) & (b_n <= alpha_k)
                a_n = jnp.where(swap, b_n, a_n)
                pk_n = jnp.where(swap, pb_n, pk_n)
                return a_n, pk_n, jnp.zeros_like(alpha_k), psi0, cnt

            def interp(cnt):
                a_n, pk_n = minrn(alpha_k, psi_k, alpha_km1, psi_km1,
                                  alpha_km2, psi_km2, alpha_min, alpha_max,
                                  p_max)
                return a_n, pk_n, alpha_km1, psi_km1, cnt

            a_kp1b, pkb, akm1b, pkm1b, cnt = lax.cond(
                psi0 <= psi_km1, redo, interp, counters)
            # UPDATE (:2102-2108)
            ak2, pk2 = akm1b, pkm1b
            ak1, pk1 = alpha_k, psi_k
            ak = a_kp1b
            pkk, cnt = psi(x, ak, p, w, mask, res_at, cons_fn, cnt)
            likely0 = check_reduction(pk1, pkk, pkb, eta, diff_psi)
            st = (ak2, pk2, ak1, pk1, ak, pkk, pkb, diff_psi, cnt,
                  jnp.int32(0), likely0)
            (ak2, pk2, ak1, pk1, ak, pkk, approx, dpsi, cnt, _, _) = \
                refine_loop(st, fixed_diff=True, branch_need=sat_need)
            best = (pk1 - approx >= eta * dpsi) & (pkk < pk1)
            a_out = jnp.where(best, ak, ak1)
            return a_out, jnp.asarray(False), cnt

        def gac(counters):
            u, err, cnt = goldstein_armijo_step(
                psi0, dpsi0, alpha_min, tau, p_max, x, alpha_k, p, w, mask,
                res_at, cons_fn, counters, gac_max,
                need & ~term_a0 & ~term_a1)
            return u, err, cnt

        return lax.cond(term_a1, sat, gac, counters)

    term_a0 = (-diff_psi0 <= tau * dpsi0 * alpha_km1) | (psi_km1 < gamma * psi0)
    alpha, gac_error, counters = lax.cond(term_a0, branch1, branch2, counters)
    return LinesearchResult(alpha=alpha, gac_error=gac_error, counters=counters)


# -------------------------------------------------------------- UPBND

def upper_bound_steplength(A, cx, p, x, mask, index_del, dims: Dims):
    """UPBND (:2149-2178): alpha_upp = min(3, min over inactive j with
    cx_j > 0, grad_j^T p < 0 of -cx_j / grad_j^T p); returns the capping
    constraint's global index (-1 if none).

    Deviation D7 (f32 robustness): the positivity test uses the
    constraint's own evaluation-noise scale eps*(1 + |grad c_j|*|x|)
    instead of strict 0.  A cx that is zero up to f32 roundoff is ON the
    boundary (the f64 reference sees an exact 0 there and excludes it);
    the strict test would turn its roundoff residue into an ~eps step
    cap and stall the lane.  A cx genuinely above its noise scale is a
    real interior constraint and MUST cap the step (an earlier sqrt(eps)
    threshold let near-boundary starts fly deep infeasible and fail -6
    in recovery — pinned by tests/test_dpsi0_floor.py)."""
    row_norm = jnp.sqrt(jnp.sum(A * A, axis=1))                 # (l,)
    noise = jnp.finfo(cx.dtype).eps * (1.0 + row_norm * jnp.linalg.norm(x))
    Ap = A @ p  # (l,)
    idx = jnp.arange(dims.l)
    cand = (~mask) & (idx != index_del) & (cx > noise) & (Ap < 0.0)
    alpha_j = -cx / jnp.where(Ap != 0, Ap, 1.0)
    vals = jnp.where(cand, alpha_j, jnp.inf)
    amin = jnp.min(vals)
    # first (ascending global index) strict minimizer, like the scan
    ix = jnp.argmin(vals).astype(jnp.int32)
    has = amin < jnp.inf
    alpha_upper = jnp.minimum(3.0, amin)
    index = jnp.where(has, ix, -1)
    return alpha_upper, index.astype(jnp.int32)


# ------------------------------------------------------------- STPLNG

def check_derivatives(dpsi0, psi0, psi_k, x_old, alpha, p, w, mask,
                      res_at, cons_fn, counters: Counters):
    """(:2295-2322): finite-difference consistency test of dpsi0 after a
    Goldstein-Armijo failure.  Returns (-1 on inconsistency, counters)."""
    psi_m, counters = psi(x_old, -alpha, p, w, mask, res_at, cons_fn, counters)
    fwd = (psi_k - psi0) / alpha
    bwd = (psi0 - psi_m) / alpha
    ctr = (psi_k - psi_m) / (2 * alpha)
    max_diff = jnp.maximum(jnp.maximum(jnp.abs(fwd - ctr), jnp.abs(fwd - bwd)),
                           jnp.abs(bwd - ctr))
    inconsistent = (jnp.abs(fwd - dpsi0) > max_diff) & \
                   (jnp.abs(ctr - dpsi0) > max_diff)
    return jnp.where(inconsistent, -1, 0).astype(jnp.int32), counters


class SteplengthResult(NamedTuple):
    alpha: jax.Array
    w: jax.Array
    K: jax.Array
    psi_error: jax.Array
    index_alpha_upp: jax.Array
    predicted_reduction: jax.Array  # nan-sentinel free: flag 'updated'
    progress: jax.Array
    updated_progress: jax.Array     # bool: whether the two above were set
    counters: Counters


def compute_steplength(res_trial, cons_fn, x, rx, J, cx, A,
                       act, view, t, p, dimA, rankJ2, code, index_del,
                       prev: PrevIter, K, mask, dims: Dims, weight_code: int,
                       counters: Counters, max_refine: int, gac_max: int,
                       eucmod_max: int, scaling: bool,
                       alive=None, jac_base=None) -> SteplengthResult:
    """STPLNG (:2197-2293).

    ``res_trial(x, p) -> (alpha -> r(x + alpha*p))``: the directional
    residual factory (driver builds the bit-identical black-box default
    when Functions.res_trial is None); built ONCE here so structured
    problems pay their ray setup (e.g. W@x, W@p) once per steplength.

    ``alive``: this lane is still iterating (exit_code == 0).  Only
    gates inner-loop trip counts under vmap; single-lane semantics and
    alive-lane values are unchanged."""
    from .weights import penalty_weight_update

    res_at = res_trial(x, p)
    alive = jnp.asarray(True) if alive is None else alive
    dtype = x.dtype
    tmax = dims.tmax
    w_old = prev.w
    if jac_base is not None:  # factored J (Functions.jac_*): J p = s*(base p)
        Jp = J[:, 0] * (jac_base @ p)
    else:
        Jp = J @ p
    Ap_full = A @ p
    JpAp = jnp.concatenate([Jp, Ap_full])
    active_Ap = act.A_act @ p                       # (tmax,)
    if scaling:
        active_Ap = active_Ap / act.diag_scale      # un-scale (:2231-2233)
    active_global = view.active_list[:tmax]

    # ---- penalty weights + dpsi0 (code != 2 path) ---------------------
    w, dpsi0, dpsi_scale, K_new = penalty_weight_update(
        w_old, Jp, active_Ap, K, rx, cx, active_global, act.valid, t, dimA,
        weight_code, dims, eucmod_max, need=alive & (code != 2))

    wa = _acc(w[active_global])
    cxa = _acc(cx[active_global])
    psi0 = 0.5 * (jnp.dot(_acc(rx), _acc(rx)) +
                  jnp.sum(jnp.where(act.valid, wa * cxa * cxa, 0.0)))

    # Non-descent detection (:2238-2250 sets Ψ_error = -1 when dψ0 ≥ 0,
    # → exit -6).  In f32 the two sums forming dψ0 cancel to roundoff at
    # a stationary point, so a numerically-zero dψ0 can land at +1e-7
    # and spuriously fail a solve that has in fact converged.  Only
    # treat dψ0 as a true ascent signal when it clears the dtype noise
    # floor of its own summands (dpsi_scale: pre-cancellation summand
    # magnitudes, fcx-gated identically to dpsi0 — see weights.py); at
    # f64 the floor is ~1e-15·scale, i.e. reference-shaped.  Documented
    # deviation D10 in PARITY.md, pinned by tests/test_dpsi0_floor.py.
    noise_floor = 10.0 * jnp.finfo(dtype).eps * dpsi_scale
    is_descent = dpsi0 < noise_floor

    def descent(cnt):
        alpha_upp, index_alpha_upp = upper_bound_steplength(
            A, cx, p, x, mask, index_del, dims)
        alpha_low = alpha_upp / 3000.0
        magfy = jnp.where(rankJ2 < prev.rankJ2, 6.0, 3.0)
        alpha0 = jnp.minimum(jnp.minimum(1.0, magfy * prev.alpha), alpha_upp)
        res = linesearch_constrained(
            x, alpha0, p, rx, cx, JpAp, w, mask, psi0, dpsi0, alpha_low,
            alpha_upp, res_at, cons_fn, cnt, dims, max_refine, gac_max,
            need=alive & (code != 2) & is_descent)
        alpha, cnt = res.alpha, res.counters

        def deriv_check(cnt):
            psi_k, cnt = psi(x, alpha, p, w, mask, res_at, cons_fn, cnt)
            return check_derivatives(dpsi0, psi0, psi_k, x, alpha, p, w,
                                     mask, res_at, cons_fn, cnt)

        psi_err, cnt = lax.cond(res.gac_error, deriv_check,
                                lambda c: (jnp.int32(0), c), cnt)

        uppbound = jnp.minimum(_acc(jnp.asarray(1.0, dtype)), _acc(alpha_upp))
        aAp = _acc(active_Ap)
        atwa = jnp.sum(jnp.where(act.valid, wa * aAp ** 2, 0.0))
        Jp_a, rx_a = _acc(Jp), _acc(rx)
        pred = uppbound * (-2.0 * jnp.dot(Jp_a, rx_a)
                           - uppbound * jnp.dot(Jp_a, Jp_a)
                           + (2.0 - uppbound ** 2) * atwa)
        x_new = x + alpha.astype(dtype) * p
        rx_new = _acc(res_at(alpha))
        cx_new = _acc(cons_fn(x_new))
        cnt = cnt._replace(nb_res=cnt.nb_res + 1, nb_cons=cnt.nb_cons + 1)
        cxna = cx_new[active_global]
        whsum = jnp.sum(jnp.where(act.valid, wa * cxna * cxna, 0.0))
        progress = 2 * psi0 - jnp.dot(rx_new, rx_new) - whsum
        index_alpha_upp = jnp.where(
            (index_alpha_upp != -1) & (jnp.abs(alpha - _acc(alpha_upp)) > 0.1),
            -1, index_alpha_upp)
        return (alpha, psi_err, index_alpha_upp, pred, progress,
                jnp.asarray(True), cnt)

    def nondescent(cnt):
        return (_acc(jnp.asarray(1.0, dtype)), jnp.int32(-1), jnp.int32(-1),
                _acc(prev.predicted_reduction), _acc(prev.progress),
                jnp.asarray(False), cnt)

    def gn_path(cnt):
        return lax.cond(~is_descent, nondescent, descent, cnt)

    def newton_path(cnt):
        # undamped step (:2284-2291); weights stay w_old
        return (_acc(jnp.asarray(1.0, dtype)), jnp.int32(0), jnp.int32(-1),
                _acc(prev.predicted_reduction), _acc(prev.progress),
                jnp.asarray(False), cnt)

    (alpha, psi_err, index_alpha_upp, pred, progress, updated, counters) = \
        lax.cond(code == 2, newton_path, gn_path, counters)

    w_out = jnp.where(code == 2, w_old, w).astype(dtype)
    K_out = jnp.where(code == 2, K, K_new).astype(dtype)
    # Cast decision-precision scalars back to the carry dtype.
    return SteplengthResult(alpha=alpha.astype(dtype), w=w_out, K=K_out,
                            psi_error=psi_err,
                            index_alpha_upp=index_alpha_upp,
                            predicted_reduction=pred.astype(dtype),
                            progress=progress.astype(dtype),
                            updated_progress=updated, counters=counters)
