"""Penalty-weight updates for the merit function.

Reference: /root/reference/src/enlsip_functions.jl
  ASSORT :1344-1360, EUCMOD (min_norm_w!) :1374-1423,
  EUCNRM :1429-1497, MAXNRM :1504-1539, WEIGHT :1545-1629.

Weights live in a global (l,) vector; the top-4 history K is a (4, l)
array (the reference's 4 separate vectors).  Active-slot quantities are
(tmax,) buffers aligned with the sorted active list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .types import Dims, acc as _acc


def assort(K: jax.Array, w: jax.Array, active_global: jax.Array,
           valid: jax.Array) -> jax.Array:
    """ASSORT: insert w[k] into each active constraint's descending
    top-4 history.  Equivalent to appending and keeping the largest 4
    (ties resolve identically because insertion requires strict >)."""
    l = K.shape[1]
    upd = jnp.zeros(l, bool).at[active_global].set(valid)
    stacked = jnp.concatenate([K, w[None, :]], axis=0)         # (5, l)
    top4 = -jnp.sort(-stacked, axis=0)[:4]
    return jnp.where(upd[None, :], top4, K)


def min_norm_w(ctrl: int, w_old_global: jax.Array, y_slots: jax.Array,
               tau: jax.Array, pos: jax.Array, active_global: jax.Array,
               max_passes: int, need=None) -> jax.Array:
    """EUCMOD (:1374-1423): min ||w|| s.t. w >= w_old and <y, w> {=,>=} tau.

    Operates on slot-aligned buffers: ``y_slots`` (tmax,), ``pos`` the
    candidate mask, ``active_global`` the slot -> constraint-index map.
    Returns the new global weight vector (= w_old everywhere except the
    clipped candidates, exactly like the reference's ``w[:] = w_old``).

    ctrl == 2 performs a single clipping pass; ctrl == 1 iterates until
    no candidate is removed (each pass removes >= 1 else terminates, so
    ``max_passes`` = tmax + 1 is exact; smaller values only early-stop
    degenerate cases).

    ``need`` (bool, default True): whether this lane's result is
    actually consumed.  Values are unchanged for need=True; need=False
    only short-circuits the iteration loop — under vmap the while-loop
    trip count is the max over lanes, so without this gate one frozen
    or branch-untaken lane forces every lane through max_passes trips.
    """
    dtype = w_old_global.dtype
    eps = jnp.finfo(dtype).eps
    w_old_slots = w_old_global[active_global]
    y2 = jnp.where(pos, y_slots * y_slots, 0.0)
    y_sum0 = jnp.sum(y2)
    y_norm = jnp.sqrt(y_sum0)
    yn = jnp.where(y_norm != 0.0, y_slots / jnp.where(y_norm != 0, y_norm, 1.0),
                   y_slots)
    nb_pos = jnp.sum(pos)

    def body(carry):
        w_slots, running, tau_new, s, y_sum, _stop, it = carry
        tau_new = tau_new - s
        yinf = jnp.max(jnp.where(running, jnp.abs(yn), -jnp.inf))
        c = jnp.where(yinf <= eps, 1.0, tau_new / jnp.where(y_sum != 0, y_sum, 1.0))
        buff = c * yn * y_norm
        ok = running & (buff >= w_old_slots)
        w_slots = jnp.where(ok, buff, w_slots)
        s_new = jnp.sum(jnp.where(running & ~ok, w_old_slots * yn * y_norm, 0.0))
        y_sum_new = jnp.sum(jnp.where(ok, yn * yn, 0.0)) * y_norm * y_norm
        n_before = jnp.sum(running)
        n_after = jnp.sum(ok)
        stop = (n_after <= 0) | (ctrl == 2) | (n_after == n_before)
        return w_slots, ok, tau_new, s_new, y_sum_new, stop, it + 1

    needed = jnp.asarray(True) if need is None else need

    def cond(carry):
        *_, stop, it = carry
        return (~stop) & (it < max_passes) & needed

    init = (w_old_slots, pos, tau, jnp.asarray(0.0, dtype), y_sum0,
            nb_pos <= 0, jnp.int32(0))
    # Always run at least one pass when nb_pos > 0 (the reference's
    # do-while): run body once, then while.
    first = lax.cond(nb_pos > 0, body, lambda c: c, init)
    w_slots, *_ = lax.while_loop(cond, body, first)

    valid = pos  # only candidate slots may have been updated
    return w_old_global.at[active_global].set(
        jnp.where(valid, w_slots, w_old_slots), mode="drop")


def euclidean_norm_weight_update(vA: jax.Array, cx: jax.Array,
                                 active_global: jax.Array, valid: jax.Array,
                                 t: jax.Array, mu: jax.Array, dimA: jax.Array,
                                 previous_w: jax.Array, K: jax.Array,
                                 dims: Dims, max_passes: int, need=None
                                 ) -> tuple[jax.Array, jax.Array]:
    """EUCNRM (:1429-1497).  vA = active_Ap (slot buffer), cx = full
    constraint values.  Returns (w, K_updated)."""
    z = jnp.where(valid, vA * vA, 0.0)
    w_old = K[3]  # 4th-largest history, per constraint
    cx_act = cx[active_global]
    ztw = jnp.sum(jnp.where(valid, z * w_old[active_global], 0.0))
    ge = ztw >= mu
    lt_t = dimA < t
    needed = jnp.asarray(True) if need is None else need

    # Branch 1: ztw >= mu, dimA < t
    y1 = jnp.where(valid, vA * (vA + cx_act), 0.0)
    pos1 = valid & (y1 > 0)
    gamma = -jnp.sum(jnp.where(valid & ~pos1, y1 * w_old[active_global], 0.0))
    w_b1 = min_norm_w(2, w_old, y1, gamma, pos1, active_global, max_passes)

    # Branch 2: ztw < mu, dimA < t
    e2 = jnp.where(valid, -vA * cx_act, 0.0)
    pos2 = valid & (e2 > 0)
    tau2 = mu - jnp.sum(jnp.where(valid & ~pos2, e2 * w_old[active_global], 0.0))
    w_b2 = min_norm_w(2, w_old, e2, tau2, pos2, active_global, max_passes)

    # Branch 3: ztw < mu, dimA == t (ctrl = 1, y = z, all active slots).
    # The only looping EUCMOD call — gated to lanes actually taking it.
    w_b3 = min_norm_w(1, w_old, z, mu, valid, active_global, max_passes,
                      need=needed & ~ge & ~lt_t)
    w = jnp.where(ge & lt_t, w_b1,
                  jnp.where(~ge & lt_t, w_b2,
                            jnp.where(~ge & ~lt_t, w_b3, previous_w)))
    hit = lt_t | ~ge
    w = jnp.where(t > 0, jnp.where(hit, w, previous_w), previous_w)
    K_new = assort(K, w, active_global, valid)
    K_out = jnp.where(t > 0, K_new, K)
    return w, K_out


def max_norm_weight_update(nrm_Ap: jax.Array, rmy: jax.Array,
                           alpha_w: jax.Array, delta: float, w: jax.Array,
                           active_global: jax.Array, valid: jax.Array,
                           t: jax.Array, K: jax.Array
                           ) -> tuple[jax.Array, jax.Array]:
    """MAXNRM (:1504-1539): uniform weight over the working set; the
    history lives in K[:, 0] (the reference's K[·][1])."""
    mu = jnp.where(jnp.abs(alpha_w - 1.0) <= delta, 0.0,
                   rmy / jnp.where(nrm_Ap != 0, nrm_Ap, 1.0))
    i1 = jnp.where(t > 0, active_global[0], 0)
    previous_w = w[i1]
    nu = jnp.maximum(mu, K[3, 0])
    w_new = w.at[active_global].set(jnp.where(valid, nu, w[active_global]),
                                    mode="drop")
    # Insert mu into the descending K[:, 0] history when mu > previous_w.
    col = K[:, 0]
    newcol = -jnp.sort(-jnp.concatenate([col, mu[None]]))[:4]
    K_new = jnp.where(mu > previous_w, K.at[:, 0].set(newcol), K)
    return w_new, K_new


def penalty_weight_update(w_old: jax.Array, Jp: jax.Array,
                          active_Ap: jax.Array, K: jax.Array, rx: jax.Array,
                          cx: jax.Array, active_global: jax.Array,
                          valid: jax.Array, t: jax.Array, dimA: jax.Array,
                          norm_code: int, dims: Dims, max_passes: int,
                          need=None
                          ) -> tuple[jax.Array, jax.Array, jax.Array,
                                     jax.Array]:
    """WEIGHT (:1545-1629).  Returns (w, dpsi0, dpsi_scale, K_updated).

    The reference normalizes Jp/Ap/rx/cx and rescales every product; the
    net quantities are the plain inner products computed here.

    ``dpsi_scale`` is the sum of the magnitudes of dpsi0's own summands
    (pre-cancellation), including the same fcx zeroing applied to the
    constraint term — the correct roundoff scale for the descent test's
    noise floor (see compute_steplength / PARITY.md D10).
    """
    delta = 0.25
    tmax = active_Ap.shape[0]
    slot = jnp.arange(tmax)
    in_dimA = slot < dimA

    Jp_rx = jnp.dot(Jp, rx)
    nrm_Jp2 = jnp.dot(Jp, Jp)
    nrm_Ap = jnp.sqrt(jnp.sum(jnp.where(valid, active_Ap * active_Ap, 0.0)))
    cx_act = cx[active_global]
    w_old_act = w_old[active_global]

    # The reference normalizes cx by nrm_cx = max |cx[active[1:dimA]]|
    # and re-multiplies products by nrm_cx (:1562,1579-1581,1597,1610,
    # 1624); when nrm_cx == 0 that *zeroes* every cx-carrying product
    # even if active entries beyond dimA are nonzero.  fcx reproduces
    # that exactly.
    nrm_cx = jnp.max(jnp.where(in_dimA & valid, jnp.abs(cx_act), 0.0))
    fcx = jnp.where(nrm_cx != 0.0, 1.0, 0.0)

    AtwA = jnp.sum(jnp.where(in_dimA & valid, w_old_act * active_Ap ** 2, 0.0))
    BtwA = fcx * jnp.sum(jnp.where(in_dimA & valid,
                                   w_old_act * active_Ap * cx_act, 0.0))
    eps = jnp.finfo(rx.dtype).eps
    alpha_w = jnp.where(jnp.abs(AtwA + nrm_Jp2) > eps,
                        (-BtwA - Jp_rx) / jnp.where(
                            jnp.abs(AtwA + nrm_Jp2) > eps, AtwA + nrm_Jp2, 1.0),
                        1.0)
    rmy = (jnp.abs(Jp_rx + nrm_Jp2) / delta) - nrm_Jp2

    if norm_code == 0:
        w, K_new = max_norm_weight_update(nrm_Ap, rmy, alpha_w, delta,
                                          w_old, active_global, valid, t, K)
    elif norm_code == 2:
        w, K_new = euclidean_norm_weight_update(
            active_Ap, cx * fcx, active_global, valid, t, rmy, dimA, w_old,
            K, dims, max_passes, need)
    else:  # pragma: no cover - reference supports only 0 and 2
        raise ValueError(f"unsupported weight_code {norm_code}")

    # dpsi0 decides descent vs -6 abort; accumulate at decision precision.
    w_act = _acc(w[active_global])
    cons_terms = jnp.where(valid, w_act * _acc(active_Ap) * _acc(cx_act), 0.0)
    BtwA2 = _acc(fcx) * jnp.sum(cons_terms)
    Jp_a, rx_a = _acc(Jp), _acc(rx)
    dpsi0 = BtwA2 + jnp.dot(Jp_a, rx_a)
    # Roundoff scale of dpsi0: summand magnitudes BEFORE cancellation
    # (|Jp_i·rx_i| element sums, not |Jp·rx|), constraint term gated by
    # the same fcx that gates dpsi0's constraint term.
    dpsi_scale = (jnp.sum(jnp.abs(Jp_a * rx_a)) +
                  _acc(fcx) * jnp.sum(jnp.abs(cons_terms)))
    return w, dpsi0, dpsi_scale, K_new
