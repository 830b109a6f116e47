"""Oracle tests for the penalty-weight machinery.

The masked fixed-shape implementations (core/weights.py) are checked
against small plain-numpy loop oracles written directly from the
documented EUCMOD/EUCNRM/MAXNRM/ASSORT semantics (SURVEY.md §2.3d) —
the decision-tree constants and clipping loops are the hardest parity
surface, so each branch gets an independent derivation here.
"""

import jax.numpy as jnp
import numpy as np

from enlsip_tpu.core.types import Dims
from enlsip_tpu.core.weights import (assort, euclidean_norm_weight_update,
                                     max_norm_weight_update, min_norm_w,
                                     penalty_weight_update)


def oracle_min_norm_w(ctrl, w_old, y, tau, pos_idx):
    """EUCMOD oracle: min ||w|| s.t. w >= w_old, <y, w> {=,>=} tau.
    Loop semantics: scale y, clip candidates below w_old out, repeat
    (once for ctrl=2)."""
    w = w_old.copy()
    y = np.asarray(y, dtype=float).copy()
    idx = list(pos_idx)
    vals = [y[i] for i in range(len(idx))]
    if not idx:
        return w
    y_sum = float(np.dot(vals, vals))
    y_norm = float(np.sqrt(y_sum))
    if y_norm != 0:
        vals = [v / y_norm for v in vals]
    tau_new = tau
    s = 0.0
    while True:
        tau_new -= s
        c = 1.0 if max(abs(v) for v in vals) <= np.finfo(float).eps else \
            tau_new / y_sum
        y_sum, s = 0.0, 0.0
        keep_i, keep_v = [], []
        for i, v in zip(idx, vals):
            buff = c * v * y_norm
            if buff >= w_old[i]:
                w[i] = buff
                y_sum += v * v
                keep_i.append(i)
                keep_v.append(v)
            else:
                s += w_old[i] * v * y_norm
        y_sum *= y_norm * y_norm
        removed = len(idx) - len(keep_i)
        idx, vals = keep_i, keep_v
        if not idx or ctrl == 2 or removed == 0:
            return w


def test_min_norm_w_matches_oracle_ctrl2():
    rng = np.random.default_rng(0)
    l = 6
    for trial in range(8):
        w_old = np.abs(rng.normal(size=l)) * 0.2
        y_slots = np.abs(rng.normal(size=l))
        # slots 0..t-1 active, random candidate mask
        t = 4
        pos = np.zeros(l, bool)
        pos[:t] = rng.random(t) > 0.3
        tau = float(abs(rng.normal())) * 2.0
        active_global = np.arange(l, dtype=np.int32)  # identity mapping
        got = np.asarray(min_norm_w(
            2, jnp.asarray(w_old), jnp.asarray(np.where(pos, y_slots, 0.0)),
            jnp.asarray(tau), jnp.asarray(pos), jnp.asarray(active_global),
            max_passes=l + 1))
        # oracle operates on the candidate subset in slot order
        pos_idx = [i for i in range(l) if pos[i]]
        want = oracle_min_norm_w(2, w_old.copy(),
                                 [y_slots[i] for i in pos_idx], tau, pos_idx)
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=str(trial))


def test_min_norm_w_matches_oracle_ctrl1():
    rng = np.random.default_rng(1)
    l = 5
    for trial in range(8):
        w_old = np.abs(rng.normal(size=l)) * 0.3
        y_slots = np.abs(rng.normal(size=l)) + 0.01
        pos = np.ones(l, bool)
        tau = float(abs(rng.normal())) * 3.0
        got = np.asarray(min_norm_w(
            1, jnp.asarray(w_old), jnp.asarray(y_slots), jnp.asarray(tau),
            jnp.asarray(pos), jnp.asarray(np.arange(l, dtype=np.int32)),
            max_passes=l + 1))
        want = oracle_min_norm_w(1, w_old.copy(), list(y_slots), tau,
                                 list(range(l)))
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=str(trial))


def test_assort_matches_insertion_oracle():
    rng = np.random.default_rng(2)
    l = 5
    K = np.sort(rng.random(size=(4, l)), axis=0)[::-1]  # descending
    w = rng.random(size=l) * 2.0
    active_global = np.array([0, 2, 4, 1, 3], dtype=np.int32)
    valid = np.array([True, True, True, False, False])
    got = np.asarray(assort(jnp.asarray(K), jnp.asarray(w),
                            jnp.asarray(active_global), jnp.asarray(valid)))
    want = K.copy()
    for slot in range(3):  # valid slots
        k = active_global[slot]
        for ii in range(4):
            if w[k] > want[ii, k]:
                want[ii + 1:, k] = want[ii:3, k]
                want[ii, k] = w[k]
                break
    np.testing.assert_allclose(got, want, atol=1e-14)


def test_maxnrm_uniform_weight():
    l = 4
    K = np.full((4, l), 0.1)
    w = np.full(l, 0.1)
    active_global = np.arange(l, dtype=np.int32)
    valid = np.array([True, True, False, False])
    w2, K2 = max_norm_weight_update(
        jnp.asarray(2.0), jnp.asarray(6.0), jnp.asarray(0.1), 0.25,
        jnp.asarray(w), jnp.asarray(active_global), jnp.asarray(valid),
        jnp.int32(2), jnp.asarray(K))
    # mu = rmy / nrm_Ap = 3.0 (|alpha_w - 1| > delta); nu = max(3, 0.1)
    np.testing.assert_allclose(np.asarray(w2)[:2], [3.0, 3.0])
    np.testing.assert_allclose(np.asarray(w2)[2:], [0.1, 0.1])
    # mu placed into K[:, 0] history
    np.testing.assert_allclose(np.asarray(K2)[:, 0], [3.0, 0.1, 0.1, 0.1])


def test_maxnrm_alpha_w_near_one():
    l = 2
    K = np.full((4, l), 0.1)
    w = np.full(l, 0.5)
    w2, K2 = max_norm_weight_update(
        jnp.asarray(2.0), jnp.asarray(6.0), jnp.asarray(1.1), 0.25,
        jnp.asarray(w), jnp.asarray(np.arange(l, dtype=np.int32)),
        jnp.asarray(np.array([True, True])), jnp.int32(2), jnp.asarray(K))
    # |alpha_w - 1| <= delta -> mu = 0 -> nu = K4 = 0.1
    np.testing.assert_allclose(np.asarray(w2), [0.1, 0.1])
    np.testing.assert_allclose(np.asarray(K2), K)


def test_weight_update_dpsi0_identity():
    """dpsi0 must equal <Jp, rx> + sum_active w_i (Ap)_i cx_i for the
    returned weights."""
    rng = np.random.default_rng(3)
    dims = Dims(n=3, m=4, q=0, l=5)
    l = dims.l
    Jp = rng.normal(size=4)
    rx = rng.normal(size=4)
    cx = rng.normal(size=l)
    active_global = np.asarray(np.argsort(~np.array([1, 1, 1, 0, 0], bool)),
                               dtype=np.int32)
    valid = np.array([True, True, True, False, False])
    active_Ap = np.where(valid, rng.normal(size=l), 0.0)
    w_old = np.abs(rng.normal(size=l)) * 0.1 + 0.05
    K = np.full((4, l), 0.05)
    w, dpsi0, dpsi_scale, K_new = penalty_weight_update(
        jnp.asarray(w_old), jnp.asarray(Jp), jnp.asarray(active_Ap),
        jnp.asarray(K), jnp.asarray(rx), jnp.asarray(cx),
        jnp.asarray(active_global), jnp.asarray(valid), jnp.int32(3),
        jnp.int32(3), 2, dims, 8)
    w_np = np.asarray(w)
    expect = float(np.dot(Jp, rx))
    for slot in range(3):
        k = int(active_global[slot])
        expect += w_np[k] * active_Ap[slot] * cx[k]
    np.testing.assert_allclose(float(dpsi0), expect, rtol=1e-10)
    # dpsi_scale = pre-cancellation summand magnitudes of dpsi0
    scale_expect = float(np.sum(np.abs(Jp * rx)))
    for slot in range(3):
        k = int(active_global[slot])
        scale_expect += abs(w_np[k] * active_Ap[slot] * cx[k])
    np.testing.assert_allclose(float(dpsi_scale), scale_expect, rtol=1e-10)
    # weights never drop below the K4 floor on active constraints
    for slot in range(3):
        k = int(active_global[slot])
        assert w_np[k] >= 0.05 - 1e-12