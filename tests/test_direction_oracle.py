"""Oracle tests for the subspace-dimension machinery (DIMUPP / PREGN /
PRESUB) — loop oracles written from the documented semantics
(SURVEY.md §2.3c), checked against the masked implementations."""

import jax.numpy as jnp
import numpy as np

from enlsip_tpu.core.direction import (_pregn, _presub,
                                       determine_solving_dim)


def oracle_pregn(sd, sd_nrm, mindim, rh, rh_nrm, rank):
    """PREGN: largest k in (mindim, rank-1] scanning DOWN from rank-1
    while sd[k] >= 0.2*sd_nrm or rh[k] <= 0.5*rh_nrm; if the walk went
    below, suggestion max(mindim, rank-1)."""
    tau_max, rho_min = 0.2, 0.5
    pm1 = rank - 1
    if mindim > pm1:
        return mindim
    k = pm1
    while k > mindim and (sd[k - 1] >= tau_max * sd_nrm
                          or rh[k - 1] <= rho_min * rh_nrm):
        k -= 1
    return k if k > mindim else max(mindim, pm1)


def oracle_presub(sd, rh, rh_nrm, c1, rank, prev_dim, progress,
                  pred_lin, prelin_prev, prev_alpha):
    """PRESUB loop oracle."""
    stepb, pgb1, pgb2, predb, rlenb, c2 = 0.2, 0.3, 0.1, 0.7, 2.0, 100.0

    def at(buf, cnt):
        return buf[min(max(cnt - 1, 0), len(buf) - 1)]

    if (prev_alpha < stepb and progress <= pgb1 * pred_lin ** 2
            and progress <= pgb2 * prelin_prev ** 2):
        dim = max(1, prev_dim - 1)
        if prev_dim > 1 and at(rh, dim) > c1 * rh_nrm:
            return dim
    dim = prev_dim
    if prev_dim < rank and (
            (at(rh, dim) > predb * rh_nrm
             and rlenb * at(sd, dim) < at(sd, dim + 1))
            or c2 * at(sd, dim) < at(sd, dim + 1)):
        return dim
    i1 = prev_dim - 1
    if i1 <= 0:
        return rank
    if at(rh, i1) > predb * rh_nrm:
        return i1
    if at(rh, prev_dim) > predb * rh_nrm:
        return prev_dim
    return rank


def _rand_profiles(rng, C, rank):
    y = rng.normal(size=C)
    diag = np.concatenate([np.sort(np.abs(rng.normal(size=rank)))[::-1] + 0.1,
                           np.zeros(C - rank)])
    live = np.arange(C) < rank
    sd = np.sqrt(np.cumsum(np.where(live, y * y, 0.0)))
    rhterm = np.where(live, y / np.where(diag > 0, diag, 1.0), 0.0)
    rh = np.sqrt(np.cumsum(rhterm * rhterm))
    return y, diag, sd, rh


def test_pregn_matches_oracle():
    rng = np.random.default_rng(0)
    C = 8
    for trial in range(30):
        rank = int(rng.integers(1, C + 1))
        _, _, sd, rh = _rand_profiles(rng, C, rank)
        sd_nrm, rh_nrm = sd[rank - 1], rh[rank - 1]
        mindim = int(rng.integers(1, rank + 1))
        got = int(_pregn(jnp.asarray(sd), jnp.asarray(sd_nrm),
                         jnp.int32(mindim), jnp.asarray(rh),
                         jnp.asarray(rh_nrm), jnp.int32(rank)))
        want = oracle_pregn(sd, sd_nrm, mindim, rh, rh_nrm, rank)
        assert got == want, (trial, rank, mindim, got, want)


def test_presub_matches_oracle():
    rng = np.random.default_rng(1)
    C = 8
    for trial in range(40):
        rank = int(rng.integers(1, C + 1))
        _, _, sd, rh = _rand_profiles(rng, C, rank)
        rh_nrm = rh[rank - 1]
        prev_dim = int(rng.integers(1, rank + 1))
        progress = float(abs(rng.normal())) * 0.1
        pred_lin = float(abs(rng.normal()))
        prelin_prev = float(abs(rng.normal()))
        prev_alpha = float(rng.random())
        got = int(_presub(jnp.asarray(sd), jnp.asarray(rh),
                          jnp.asarray(rh_nrm), 0.1, jnp.int32(rank),
                          jnp.int32(prev_dim), jnp.asarray(progress),
                          jnp.asarray(pred_lin), jnp.asarray(prelin_prev),
                          jnp.asarray(prev_alpha)))
        want = oracle_presub(sd, rh, rh_nrm, 0.1, rank, prev_dim, progress,
                             pred_lin, prelin_prev, prev_alpha)
        assert got == want, (trial, rank, prev_dim, got, want)


def test_dimupp_mindim_and_bounds():
    """DIMUPP output is always in [mindim, rank] (live), equals rank at
    rank 0, and respects the restart rule min(rank, prev_dim)."""
    rng = np.random.default_rng(2)
    C = 8
    for trial in range(20):
        rank = int(rng.integers(1, C + 1))
        y, diag, sd, rh = _rand_profiles(rng, C, rank)
        live = np.arange(C) < rank
        dsum = np.cumsum(np.where(live, sd * sd, 0.0))
        psi = np.where(live, np.sqrt(dsum) * np.abs(diag), -np.inf)
        mindim = int(np.argmax(psi)) + 1
        prev_dim = int(rng.integers(0, rank + 1))
        got = int(determine_solving_dim(
            jnp.int32(prev_dim), jnp.int32(rank), jnp.asarray(1.0),
            jnp.asarray(0.5), jnp.asarray(1.0), jnp.asarray(diag),
            jnp.asarray(y), jnp.asarray(0.5), jnp.asarray(False)))
        assert mindim <= got <= rank, (trial, got, mindim, rank)
        got_restart = int(determine_solving_dim(
            jnp.int32(prev_dim), jnp.int32(rank), jnp.asarray(1.0),
            jnp.asarray(0.5), jnp.asarray(1.0), jnp.asarray(diag),
            jnp.asarray(y), jnp.asarray(0.5), jnp.asarray(True)))
        assert got_restart == max(0, min(rank, prev_dim))
    # rank 0
    got0 = int(determine_solving_dim(
        jnp.int32(0), jnp.int32(0), jnp.asarray(1.0), jnp.asarray(0.5),
        jnp.asarray(1.0), jnp.zeros(C), jnp.zeros(C), jnp.asarray(0.5),
        jnp.asarray(False)))
    assert got0 == 0