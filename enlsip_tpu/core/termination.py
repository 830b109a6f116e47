"""Termination criteria — the TERCRI exit-code lattice.

Reference: /root/reference/src/enlsip_functions.jl:2399-2517.
Convergence codes are additive (+10000, +2000, +300, +40); abnormal
codes are negative (-2 max iters, -3/-4/-5 passthrough, -9 too many
Newton steps, -6 merit-derivative inconsistency, -10 infeasible stall,
-11 time limit).  The infeasibility negation (:2471-2481) is reproduced
even though the necessary conditions already imply it cannot fire.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.qr import prefix_dot
from .types import Dims, Tols, rdims_or


def check_termination(p, code, restart, deleted, d_gn, dimJ2, grad_res,
                      act_cx, act_A, act_valid, t, x, prev_x, cx, mask,
                      rx_sum, gf, nb_iter, max_iter: int, tols: Tols,
                      error_code, sigma_min, lam_abs_max, psi_error,
                      nb_newton_steps, w, active_global,
                      dims: Dims, rdims=None) -> jax.Array:
    """TERCRI.  All inputs are post-step values except the factorization
    products (grad_res, d_gn, act_*) which come from the direction
    computation at the pre-step point, exactly as in the reference."""
    m, q = dims.m, rdims_or(rdims, dims).q
    dtype = x.dtype
    rel = jnp.finfo(dtype).eps
    alfnoi = rel / (jnp.linalg.norm(p) + rel)

    preliminary = ~(restart | ((code == -1) & (alfnoi <= 0.25)))

    act_cx_nrm = jnp.sqrt(jnp.sum(jnp.where(act_valid, act_cx * act_cx, 0.0)))
    gf_nrm = jnp.linalg.norm(gf)
    necessary = (~deleted) & (act_cx_nrm < tols.eps_c) & \
                (grad_res < jnp.sqrt(tols.eps_rel) * (1 + gf_nrm))
    inact = ~mask
    inact_ok = jnp.all(jnp.where(inact, cx > 0.0, True))
    necessary = necessary & jnp.where(jnp.sum(inact) > 0, inact_ok, True)
    factor = jnp.where(t == 1, 1.0 + rx_sum, lam_abs_max)
    necessary = necessary & jnp.where(t > q, sigma_min >= tols.eps_rel * factor,
                                      True)

    d1sq = prefix_dot(d_gn, jnp.clip(dimJ2, 0, m))
    x_diff = jnp.linalg.norm(prev_x - x)
    xnrm = jnp.linalg.norm(x)
    conv = jnp.int32(0)
    conv = conv + jnp.where(d1sq <= rx_sum * tols.eps_rel ** 2, 10000, 0)
    conv = conv + jnp.where(rx_sum <= tols.eps_abs ** 2, 2000, 0)
    conv = conv + jnp.where(x_diff < tols.eps_x * xnrm, 300, 0)
    conv = conv + jnp.where(alfnoi > 0.25, 40, 0)
    # Infeasibility negation (:2471-2481) — dead under the necessary
    # conditions above, kept for exactness.
    any_viol = jnp.any(jnp.where(inact, cx <= 0.0, False))
    conv = jnp.where((conv > 0) & (jnp.sum(inact) > 0) & any_viol, -conv, conv)
    exit_code = jnp.where(preliminary & necessary, conv, 0)

    # Abnormal termination (:2485-2513), priority order preserved.
    Atcx = act_A.T @ jnp.where(act_valid, act_cx, 0.0)
    Atcx_nrm = jnp.linalg.norm(Atcx)
    w_act = w[active_global]
    pen_sum = jnp.sum(jnp.where(act_valid, w_act * w_act, 0.0))
    pen_sum = jnp.where(t == 0, 0.0, pen_sum)
    stuck = (x_diff <= 10.0 * tols.eps_x) & (Atcx_nrm <= 10.0 * tols.eps_c) & \
            (pen_sum >= 1.0)
    if jnp.finfo(dtype).eps > jnp.finfo(jnp.float64).eps:
        # f32-aware stall discrimination.  At f32 the absolute window
        # x_diff <= 10*eps_x (~3.5e-3 with the default sqrt(eps)
        # tolerances) sits exactly at the f32 step-noise floor, so lanes
        # converging normally land in it before any sufficient
        # convergence code fires and exit -10 at the optimum (observed:
        # 14.5% of batched HS65 lanes).  A genuinely "stuck at an
        # infeasible point" iterate (the -10 semantics, reference
        # :2507-2508) has a LARGE active-constraint violation with a
        # stationary infeasibility measure; a converged-but-noisy
        # iterate has act_cx ~ 0.  Requiring actual infeasibility
        # separates the two where x_diff cannot.  f64 keeps the exact
        # reference-shaped test (this branch is dtype-static).
        stuck = stuck & (act_cx_nrm > tols.eps_c)
    # -11 (time limit, reference :2511-2512) is assigned HOST-side by the
    # chunked drivers (core/driver.solve, parallel/batch.solve_batched):
    # a device loop cannot read the wall clock, and a -11 iteration is
    # never display-recorded in the reference either, so the observable
    # state is identical.
    code_m6 = jnp.int32(-6)
    code_m4 = error_code
    if jnp.finfo(dtype).eps > jnp.finfo(jnp.float64).eps:
        # D12 (f32 robustness): at a stationary point dpsi0 is pure
        # rounding noise and GN "stall" (which GNDCHK escalates to a
        # Newton request) IS convergence; the -6 non-descent abort and
        # the -4 Newton-disallowed abort race the sufficient
        # convergence codes, and batched-kernel vs single-path f32
        # rounding can flip the winner (observed: ~10% of ODE-fit lanes
        # exiting -6/-4 AT the optimum while the identical lane solved
        # alone exits +10300).  When the iterate already satisfies
        # every NECESSARY first-order condition (feasible active and
        # inactive sets, small projected gradient, multiplier signs, no
        # deletion — the `necessary` predicate above, which does not
        # depend on `preliminary`: the -4 path sets restart and would
        # otherwise mask it), the abort is noise-limited-steplength
        # evidence — the reference's own +40 class (alfnoi > 0.25,
        # :2452).  Genuine ascent / genuine Newton need far from
        # stationarity still exit -6/-4 (necessary fails there); -3/-5
        # (Cholesky failure / evaluation errors) are never converted.
        # f64 is untouched (dtype-static branch).
        #
        # The two abort flavors carry different inconsistency risk
        # (round-3 advisor finding), so they are gated differently:
        #
        # -6 claims a genuine merit-derivative inconsistency (dpsi0
        # cleared the D10 noise floor — possibly a wrong user Jacobian
        # whose projected gradient merely hides inside `necessary`'s
        # ~2%-of-|gf| window).  Its upgrade additionally requires the
        # step itself to look noise-limited (the reference's own
        # alfnoi > 0.25, or the +300 class's relative x-stagnation
        # window) OR the projected gradient to sit at the NOISE scale
        # eps_rel*(1+|gf|) — 54x tighter than `necessary`'s window, a
        # band the loosely-stationary adversarial case cannot reach
        # (live -6-at-optimum lanes land there after a last large step
        # that bounced across the f32-flat valley).  A large-step
        # inconsistency in the loose band (eps_rel, sqrt(eps_rel)]
        # stays -6.
        #
        # -4 claims nothing inconsistent: the lane asked for a Newton
        # step (GNDCHK stall escalation) and the configuration disallows
        # second derivatives.  At a necessary-satisfying iterate the
        # stall request IS the noise-limited evidence (observed lanes
        # sit at the optimum with noise-ball gradients but bounced in a
        # flat valley, so no x_diff window separates them), and no
        # derivative claim exists for a step gate to protect — it
        # converts on `necessary` alone.
        noise_step = (alfnoi > 0.25) | (x_diff <= 10.0 * tols.eps_x * xnrm) \
            | (grad_res < tols.eps_rel * (1 + gf_nrm))
        code_m6 = jnp.where(necessary & noise_step, jnp.int32(40), code_m6)
        code_m4 = jnp.where((error_code == -4) & necessary,
                            jnp.int32(40), error_code)
    abn = jnp.where(nb_iter >= max_iter, -2,
          jnp.where((error_code >= -5) & (error_code <= -3), code_m4,
          jnp.where(nb_newton_steps > 5, -9,
          jnp.where(psi_error == -1, code_m6,
          jnp.where(stuck, -10, 0)))))
    return jnp.where(exit_code == 0, abn, exit_code).astype(jnp.int32)
