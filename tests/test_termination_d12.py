"""D12 lattice rule (PARITY.md): at f32, a -6 non-descent abort at an
iterate satisfying every NECESSARY first-order condition converts to
the +40 noise-limited-steplength evidence class; at f64 the reference's
-6 is unchanged; far from stationarity (necessary fails) -6 fires at
both dtypes.
"""

import jax.numpy as jnp
import numpy as np

from enlsip_tpu.core.termination import check_termination
from enlsip_tpu.core.types import Dims, Tols


def _call(dtype, grad_res, psi_error=-1, step=3e-3):
    dims = Dims(n=3, m=4, q=0, l=2)
    tmax = dims.tmax
    eps = float(jnp.finfo(dtype).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.asarray(v, dtype)
                  for v in (1e-10, rel, rel, rel, rel)))
    # One active constraint (feasible to noise), one inactive (strictly
    # feasible); step p large enough that alfnoi <= 0.25; d_gn large so
    # +10000 does not fire.  The default x_diff (step=3e-3 per coord,
    # ||x||~3.74) sits INSIDE D12's noise-step window 10*eps_x*xnrm
    # (~1.3e-2 at f32) but OUTSIDE the +300 additive window eps_x*xnrm
    # (~1.3e-3), isolating the abnormal-branch conversion exactly where
    # the live converted lanes sit (noise-scale last step at the
    # optimum).  Pass step=0.5 for the adversarial large-step case.
    p = jnp.asarray([0.1, 0.0, 0.0], dtype)
    d_gn = jnp.asarray([1.0, 1.0, 1.0, 0.0], dtype)
    act_cx = jnp.zeros(tmax, dtype)
    act_A = jnp.zeros((tmax, 3), dtype).at[0, 0].set(1.0)
    act_valid = jnp.asarray([True, False])
    x = jnp.asarray([1.0, 2.0, 3.0], dtype)
    prev_x = x + jnp.asarray(step, dtype)
    cx = jnp.asarray([0.0, 1.0], dtype)
    mask = jnp.asarray([True, False])
    gf = jnp.asarray([1.0, 0.0, 0.0], dtype)
    return int(check_termination(
        p, jnp.int32(1), jnp.asarray(False), jnp.asarray(False), d_gn,
        jnp.int32(2), jnp.asarray(grad_res, dtype), act_cx, act_A,
        act_valid, jnp.int32(1), x, prev_x, cx, mask,
        jnp.asarray(1.0, dtype), gf, jnp.int32(3), 100, tols,
        jnp.int32(0), jnp.asarray(jnp.inf, dtype),
        jnp.asarray(1.0, dtype), jnp.int32(psi_error), jnp.int32(0),
        jnp.asarray([0.1, 0.1], dtype), jnp.asarray([0, 1], jnp.int32),
        dims))


def test_f32_nondescent_at_stationary_point_exits_positive():
    assert _call(jnp.float32, grad_res=0.0) == 40


def test_f64_nondescent_keeps_reference_minus6():
    assert _call(jnp.float64, grad_res=0.0) == -6


def test_f32_genuine_ascent_far_from_stationarity_still_minus6():
    # huge projected gradient -> necessary fails -> -6 at both dtypes
    assert _call(jnp.float32, grad_res=1e3) == -6
    assert _call(jnp.float64, grad_res=1e3) == -6


def test_f32_large_step_inconsistency_still_minus6():
    # Round-3 advisor: a genuine merit-derivative inconsistency at a
    # merely LOOSELY-stationary feasible point — grad_res inside
    # `necessary`'s sqrt(eps_rel)*(1+|gf|) window (~3.7e-2 here) but
    # above the noise scale eps_rel*(1+|gf|) (~6.9e-4) — arriving after
    # a LARGE step (x_diff >> 10*eps_x*xnrm, alfnoi <= 0.25).  The +40
    # upgrade requires noise-limited evidence, so this stays -6.
    assert _call(jnp.float32, grad_res=0.01, step=0.5) == -6


def test_f32_noise_scale_gradient_converts_even_after_large_step():
    # grad_res at the NOISE scale (< eps_rel*(1+|gf|)): the live
    # -6-at-optimum class — a last large step bounced across the
    # f32-flat valley and landed at a to-noise-stationary point.
    assert _call(jnp.float32, grad_res=0.0, step=0.5) == 40


def test_no_psi_error_unchanged():
    assert _call(jnp.float32, grad_res=0.0, psi_error=0) == 0


def _call_err4(dtype, grad_res, step=3e-3):
    """error_code -4 (Newton wanted, second derivatives disallowed).
    The live combination sets restart=True in the same iteration
    (driver: restart_new = error_code < 0), which suppresses the normal
    exit lattice — the D12 conversion must act on the abnormal branch
    itself."""
    import jax.numpy as jnp
    dims = Dims(n=3, m=4, q=0, l=2)
    tmax = dims.tmax
    eps = float(jnp.finfo(dtype).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.asarray(v, dtype)
                  for v in (1e-10, rel, rel, rel, rel)))
    p = jnp.asarray([0.1, 0.0, 0.0], dtype)
    d_gn = jnp.asarray([1.0, 1.0, 1.0, 0.0], dtype)
    act_cx = jnp.zeros(tmax, dtype)
    act_A = jnp.zeros((tmax, 3), dtype).at[0, 0].set(1.0)
    act_valid = jnp.asarray([True, False])
    x = jnp.asarray([1.0, 2.0, 3.0], dtype)
    return int(check_termination(
        p, jnp.int32(1), jnp.asarray(True), jnp.asarray(False), d_gn,
        jnp.int32(2), jnp.asarray(grad_res, dtype), act_cx, act_A,
        act_valid, jnp.int32(1), x, x + jnp.asarray(step, dtype),
        jnp.asarray([0.0, 1.0], dtype), jnp.asarray([True, False]),
        jnp.asarray(1.0, dtype), jnp.asarray([1.0, 0.0, 0.0], dtype),
        jnp.int32(3), 100, tols, jnp.int32(-4),
        jnp.asarray(jnp.inf, dtype), jnp.asarray(1.0, dtype),
        jnp.int32(0), jnp.int32(0), jnp.asarray([0.1, 0.1], dtype),
        jnp.asarray([0, 1], jnp.int32), dims))


def test_f32_newton_request_at_stationary_point_exits_positive():
    assert _call_err4(jnp.float32, grad_res=0.0) == 40


def test_f64_newton_request_keeps_reference_minus4():
    assert _call_err4(jnp.float64, grad_res=0.0) == -4


def test_f32_genuine_newton_need_still_minus4():
    assert _call_err4(jnp.float32, grad_res=1e3) == -4


def test_f32_large_step_newton_request_converts():
    # -4 claims nothing inconsistent (Newton wanted, disallowed by
    # config); at a necessary-satisfying iterate it converts on
    # `necessary` alone — no step gate (live lanes bounce across the
    # f32-flat valley with x_diff above any stagnation window).
    assert _call_err4(jnp.float32, grad_res=0.0, step=0.5) == 40
