"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric: Chained Rosenbrock n=1000 solve wall time (steady
state, compile excluded — the reference's number is BenchmarkTools
@btime, which also excludes compilation; docs/src/tutorial.md:301,
baseline 2.325 s).  vs_baseline = baseline_seconds / our_seconds
(speedup, >1 is better).

Secondary metrics ride along as extra JSON fields: batched-HS65
throughput (solves/s) with % matched optima, and giant-m (5M residual
rows, constraints active at the solution) GN iteration rate.

Capture robustness (VERDICT r4 #1 — BENCH_r04 was rc=124/parsed=null):
the output dict is built INCREMENTALLY section by section; the single
JSON line is guaranteed to be printed exactly once by whichever fires
first of (a) normal completion, (b) a watchdog thread at
ENLSIP_BENCH_BUDGET_S seconds (default 1700) that prints the partial
dict and _exits 0 even if the main thread is stuck inside a blocking
XLA/Mosaic compile, (c) a SIGTERM/SIGINT handler (the driver's
`timeout` sends SIGTERM).  Sections run in evidence-value order, each
gated on an estimated cost vs the remaining budget; sections that
don't run are recorded in "skipped".

Note on timing: the remote-TPU transport makes block_until_ready
unreliable, so every measurement syncs through an explicit host
transfer of a scalar/array.
"""

from __future__ import annotations

import json
import os as _os
import signal
import sys
import threading
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# NOTE: x64 deliberately NOT enabled here.  With it, f32 solves
# accumulate line-search decision scalars in f64 (core/linesearch.py),
# but f64 emulation inflates the TPU graphs/compile time substantially;
# the UPBND threshold fix alone recovers the known f32 stalls.

# Cold-cache insurance: the fused Pallas kernels compile in seconds from
# the persistent cache but in minutes cold (remote Mosaic compile).  If
# the cache looks empty, fall back to the XLA factorization path so the
# bench completes within any reasonable timeout (still >10x baseline).
_cache_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           ".jax_cache")
try:
    _n_cached = len(_os.listdir(_cache_dir))
except OSError:
    _n_cached = 0
if _n_cached < 10:
    _os.environ.setdefault("ENLSIP_DISABLE_PALLAS", "1")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                 "tests"))

BASELINE_CR1000_S = 2.325


def _tols(dtype):
    from enlsip_tpu.core.types import Tols
    eps = float(jnp.finfo(dtype).eps)
    rel = float(np.sqrt(eps))
    return Tols(*(jnp.asarray(v, dtype) for v in (1e-10, rel, rel, rel, rel)))


def bench_chained_rosenbrock(n=1000, dtype=jnp.float32, repeats=3):
    """Steady-state solve time; the model (and its cached closures) is
    reused across repeats exactly as the reference's @btime re-solves
    one problem."""
    import enlsip_tpu as et
    from problems import chained_rosenbrock

    model = et.CnlsModel(**chained_rosenbrock(n))
    times = []
    status = None
    for _ in range(repeats + 1):  # first solve includes compile; drop it
        t0 = time.perf_counter()
        et.solve(model, dtype=dtype)
        times.append(time.perf_counter() - t0)
        status = et.status(model)
    return min(times[1:]), status


def bench_small_n(dtype=jnp.float32, repeats=5):
    """Single-solve latency at the reference tutorial's small sizes
    (docs/src/tutorial.md:299-300: 3.616e-4 s at n=10, 3.322e-2 s at
    n=100 for Enlsip.jl) — VERDICT r4 #4.  Measured steady-state like
    the reference's @btime (compile excluded)."""
    import enlsip_tpu as et
    from problems import chained_rosenbrock

    out = {}
    for n, ref_s in ((10, 3.616e-4), (100, 3.322e-2)):
        model = et.CnlsModel(**chained_rosenbrock(n))
        times = []
        for _ in range(repeats + 1):  # first includes compile; drop it
            t0 = time.perf_counter()
            et.solve(model, dtype=dtype)
            times.append(time.perf_counter() - t0)
        best = min(times[1:])
        out[f"small_n{n}_solve_seconds"] = round(best, 5)
        out[f"small_n{n}_vs_reference"] = round(ref_s / best, 3)

    # The floor those numbers sit on: ONE trivial dispatch + host
    # transfer through this environment's remote-TPU (axon) tunnel.
    # Everything below it is transport, not solver.
    f = jax.jit(lambda x: x + 1.0)
    xs = jnp.zeros(4, dtype)
    np.asarray(f(xs))
    floors = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(f(xs))
        floors.append(time.perf_counter() - t0)
    out["dispatch_floor_seconds"] = round(min(floors), 5)

    # The supported recipe for many small problems: ONE launch, B
    # independent lanes (tutorial "batched small problems" section) —
    # per-solve latency amortizes the tunnel round-trip away.
    out.update(_small_n_batched(dtype=dtype))
    return out


def _small_n_batched(B=1024, n=10, ref_s=3.616e-4, dtype=jnp.float32):
    import enlsip_tpu as et
    from enlsip_tpu.core.driver import Functions
    from enlsip_tpu.core.types import Dims, Options
    from enlsip_tpu.models.model import (_model_functions,
                                         total_nb_constraints)
    from enlsip_tpu.parallel import solve_batched
    from problems import chained_rosenbrock

    kw = chained_rosenbrock(n)
    model = et.CnlsModel(**kw)
    res_fn, jac_res, cons, jac_cons = _model_functions(model, dtype)
    fns = Functions(res=res_fn, jac_res=jac_res, cons=cons,
                    jac_cons=jac_cons)
    dims = Dims(n=n, m=model.nb_residuals, q=model.nb_eqcons,
                l=total_nb_constraints(model))
    rng = np.random.default_rng(0)
    x0 = np.asarray(kw["starting_point"], float)
    starts = x0[None, :] + 0.1 * rng.normal(size=(B, n))
    tols = _tols(dtype)

    res = solve_batched(fns, starts, dims, Options(), tols, dtype=dtype)
    np.asarray(res.f)  # compile + run
    t0 = time.perf_counter()
    res = solve_batched(fns, starts, dims, Options(), tols, dtype=dtype)
    f = np.asarray(res.f)
    dt = time.perf_counter() - t0
    per = dt / B
    ok = float(np.mean(np.asarray(res.exit_code) > 0))
    return {
        "small_n10_batched_lanes": B,
        "small_n10_batched_per_solve_seconds": round(per, 7),
        "small_n10_batched_per_solve_vs_reference": round(ref_s / per, 1),
        "small_n10_batched_converged_rate": round(ok, 4),
    }


def bench_cr5000(dtype=jnp.float32):
    """CR n=5000 both ways on the per-solve precision knob (VERDICT r3
    #4): default f32-highest GEMMs vs opt-in bf16 MXU passes.  The
    reference's analogue is its generic element type T (solver.jl:62)."""
    import enlsip_tpu as et
    from problems import chained_rosenbrock

    model = et.CnlsModel(**chained_rosenbrock(5000))
    out = {}
    for label, prec in (("default", "float32"), ("bf16", "bfloat16")):
        times, status = [], None
        for _ in range(2):  # first includes compile; keep the second
            t0 = time.perf_counter()
            et.solve(model, dtype=dtype, matmul_precision=prec)
            times.append(time.perf_counter() - t0)
            status = et.status(model)
        out[label] = {"seconds": round(times[-1], 3), "status": str(status)}
    return out


def bench_batched_hs65(B=512, dtype=jnp.float32):
    import enlsip_tpu as et
    from enlsip_tpu.core.driver import Functions
    from enlsip_tpu.core.types import Dims, Options
    from enlsip_tpu.models.model import build_constraint_functions
    from enlsip_tpu.parallel import solve_batched
    from problems import HS65, HS65_FSTAR

    model = et.CnlsModel(**HS65)
    from enlsip_tpu.models.model import _model_functions
    res_fn, jac_res, cons, jac_cons = _model_functions(model, dtype)
    fns = Functions(res=res_fn, jac_res=jac_res, cons=cons,
                    jac_cons=jac_cons)
    dims = Dims(n=3, m=3, q=0, l=7)
    rng = np.random.default_rng(0)
    x0 = np.asarray(HS65["starting_point"])
    starts = x0[None, :] + 0.3 * rng.normal(size=(B, 3))
    tols = _tols(dtype)

    res = solve_batched(fns, starts, dims, Options(), tols, dtype=dtype)
    np.asarray(res.f)  # sync (compile + run)
    t0 = time.perf_counter()
    res = solve_batched(fns, starts, dims, Options(), tols, dtype=dtype)
    f = np.asarray(res.f)  # sync
    dt = time.perf_counter() - t0
    ok = np.asarray(res.exit_code) > 0
    matched = np.abs(f - HS65_FSTAR) < 1e-4
    return B / dt, float(np.mean(matched)), float(np.mean(ok & matched))


# ------------------- ODE-fit batched (module-level for fn identity) ---

def _ode_res(x, y):
    from enlsip_tpu.problems import ode_fit
    return ode_fit.residuals_data(x, y)


def _ode_jac(x, y):
    from enlsip_tpu.problems import ode_fit
    return jax.jacfwd(ode_fit.residuals_data)(x, y)


_ODE_CONS = {}


def _ode_cons(x, y):
    return _ODE_CONS["cons"](x)


def _ode_jac_cons(x, y):
    return _ODE_CONS["jac"](x)


def bench_ode_fit_batched(B=10_000, dtype=jnp.float32):
    """10k-instance batched parameter estimation with PER-LANE noisy
    observations (BASELINE configs[3] single-chip slice; the data= API)."""
    import enlsip_tpu as et
    from enlsip_tpu.core.driver import Functions
    from enlsip_tpu.core.types import Dims, Options
    from enlsip_tpu.models.model import (build_constraint_functions,
                                         total_nb_constraints)
    from enlsip_tpu.parallel import solve_batched
    from enlsip_tpu.problems import ode_fit

    model = et.CnlsModel(**ode_fit.model_kwargs())
    if not _ODE_CONS:
        cons, jac = build_constraint_functions(model)
        _ODE_CONS["cons"] = cons
        _ODE_CONS["jac"] = jac
    fns = Functions(res=_ode_res, jac_res=_ode_jac, cons=_ode_cons,
                    jac_cons=_ode_jac_cons)
    dims = Dims(n=model.nb_parameters, m=model.nb_residuals, q=0,
                l=total_nb_constraints(model))
    opts = Options(second_derivatives=False)
    tols = _tols(dtype)
    starts = ode_fit.perturbed_starts(B)
    ys = ode_fit.scenario_observations(B).astype(np.float32)

    res = solve_batched(fns, starts, dims, opts, tols, dtype=dtype, data=ys)
    np.asarray(res.f)  # sync (compile + run)
    t0 = time.perf_counter()
    res = solve_batched(fns, starts, dims, opts, tols, dtype=dtype, data=ys)
    f = np.asarray(res.f)  # sync
    dt = time.perf_counter() - t0
    # Miss breakdown by exit code (VERDICT r2 item 7): the non-optimum
    # lanes are (a) -6 at iteration ~1 — genuinely non-descent first GN
    # direction from that start at f32 evaluation noise, (b) -4 — the
    # lane requests a Newton step under this GN-only throughput config,
    # (c) positive codes — legitimate alternate local minima of the
    # 5-exponential fit.
    ec = np.asarray(res.exit_code)
    miss = f >= 1e-3
    codes, counts = np.unique(ec[miss], return_counts=True)
    breakdown = {int(c): int(k) for c, k in zip(codes, counts)}
    strict = float(np.mean(~miss & (ec > 0)))
    # Hybrid escalation (VERDICT r3 #5): re-solve the non-matched /
    # non-converged residue at f64 (one follow-up launch over the ~tens
    # of flagged lanes) and report the escalated strict rate.
    strict_esc, n_esc = strict, 0
    esc_mask = miss | (ec <= 0)
    if esc_mask.any():
        res_e = solve_batched(fns, starts, dims, opts, tols, dtype=dtype,
                              data=ys, escalate_mask=esc_mask)
        f_e = np.asarray(res_e.f)
        ec_e = np.asarray(res_e.exit_code)
        strict_esc = float(np.mean((f_e < 1e-3) & (ec_e > 0)))
        n_esc = int(esc_mask.sum())
    return (B / dt, float(np.mean(~miss)), strict, breakdown, strict_esc,
            n_esc)


def bench_hetero_suite(per_family=512, dtype=jnp.float32, names=None,
                       second_derivatives=False):
    """Mixed-(n, m, q, l) HS families in ONE fused jitted launch
    (parallel/hetero.py) — the heterogeneous scenario-batch config.

    The default family set converges under GN-only from perturbed
    starts; pass ``second_derivatives=True`` (and include hs42) for the
    fused-Newton regime row."""
    from enlsip_tpu.core.types import Options
    from enlsip_tpu.parallel.hetero import solve_suite_fused
    from enlsip_tpu.parallel.suite import hs_scenario_batch

    from enlsip_tpu.parallel.hetero import fuse_families

    # Five families with genuinely distinct (n, m, q, l): n 2-5, m 2-4,
    # q 0-3, l 1-13.
    if names is None:
        names = ["hs14", "hs65", "hs26", "hs53", "hs79"]
    fams = hs_scenario_batch(names, per_family=per_family, seed=0)
    B = sum(f.x0_batch.shape[0] for f in fams.values())
    opts = Options(max_iter=60, second_derivatives=second_derivatives)

    # The union closures are the jit cache key: build them ONCE so the
    # measured call reuses the compiled executable.
    fused = fuse_families(fams)
    out = solve_suite_fused(fams, opts, _tols, dtype=dtype, fused=fused)
    np.asarray(out[names[0]].f)  # sync (compile + run)
    t0 = time.perf_counter()
    out = solve_suite_fused(fams, opts, _tols, dtype=dtype, fused=fused)
    fvals = {k: np.asarray(v.f) for k, v in out.items()}
    dt = time.perf_counter() - t0
    matched = []
    for name, fam in fams.items():
        if fam.fstar is not None:
            matched.append(np.abs(fvals[name] - fam.fstar)
                           < 1e-3 * max(1.0, abs(fam.fstar)))
    match_rate = float(np.mean(np.concatenate(matched))) if matched else None
    return B / dt, match_rate, (fused, opts, dtype)


def hetero_peak_memory_gb(ctx) -> float:
    """XLA's own accounting of the fused-solve executable's peak device
    memory (args + outputs + temps at the high-water point) — the
    memory-feasibility evidence for the 100k-lane design point
    (device.memory_stats() is unavailable through the axon tunnel)."""
    fused, opts, dtype = ctx
    from enlsip_tpu.parallel.batch import _solve_batched_jit
    lowered = _solve_batched_jit.lower(
        fused.x0, fused.data, fused.rdims, fused.fns, fused.dims, opts,
        _tols(dtype), None, jnp.dtype(dtype).name)
    ma = lowered.compile().memory_analysis()
    return round(ma.peak_memory_in_bytes / 2**30, 3)


def bench_hetero_100k(dtype=jnp.float32):
    """The scenario batch at design-point scale on ONE chip: 100k mixed
    lanes (BASELINE configs[3] names 1M lanes across v5e-16 — 62.5k/chip;
    the 1M-lane 8-device layout is dryrun-proven in __graft_entry__
    layout 5).  Returns (solves/s, match_rate, peak_hbm_gb)."""
    rate, match, ctx = bench_hetero_suite(per_family=20_000, dtype=dtype)
    try:
        stats = jax.devices()[0].memory_stats()
        peak = round((stats or {}).get("peak_bytes_in_use", 0) / 2**30, 2)
        if not peak:
            raise ValueError("no live stats")
    except Exception:  # transport-dependent: fall back to XLA's account
        peak = hetero_peak_memory_gb(ctx)
    return rate, match, peak


def bench_hetero_newton(per_family=512, dtype=jnp.float32):
    """The HARD hetero regime: second_derivatives=True including hs42,
    whose perturbed lanes genuinely request fused-Newton steps under
    per-lane RDims (the path tests/test_hetero.py exercises at B=8)."""
    rate, match, _ = bench_hetero_suite(
        per_family=per_family, dtype=dtype,
        names=["hs14", "hs65", "hs26", "hs53", "hs79", "hs42"],
        second_derivatives=True)
    return rate, match


# --------------------------- giant-m (module-level for fn identity) ---

_GM_M, _GM_N, _GM_L = 5_000_000, 100, 50
_GM = {}


def _gm_init():
    """Eagerly build the giant-m data OUTSIDE any trace (the closures
    below only read the finished arrays)."""
    if not _GM:
        rng = np.random.default_rng(3)
        W = np.asarray(rng.normal(size=(_GM_M, _GM_N)),
                       np.float32) / np.sqrt(_GM_N)
        xtrue = rng.normal(size=(_GM_N,)).astype(np.float32)
        z = W @ xtrue
        Y = z + 0.1 * np.tanh(z) + 0.01 * rng.normal(
            size=(_GM_M,)).astype(np.float32)
        _GM["W"] = jnp.asarray(W)
        _GM["Y"] = jnp.asarray(Y)
        # First 5 inequalities x_j >= xtrue_j + 0.2 cut off the
        # unconstrained optimum, so the solve terminates with t >= 5
        # ACTIVE constraints (the working-set machinery is exercised at
        # scale, not just unconstrained GN).  Most are also violated at
        # x0 = 0 and enter the initial working set.
        _GM["blo"] = jnp.asarray(xtrue[:5] + 0.2)


def _gm_cons(x):
    return jnp.concatenate([
        x[:5] - _GM["blo"],
        x[5: _GM_L - 1] + 5.0,
        jnp.array([float(_GM_N) * 4.0 - jnp.dot(x, x)])])


def bench_giant_m(dtype=jnp.float32, max_iter=8, trace_dir=None):
    """GN iterations/s on a 5M-row (BASELINE spec scale) dense problem with active
    constraints at the solution (single chip; the row-sharded
    multi-chip variant runs the same code over a mesh — see
    parallel/rowsharded.py and the TSQR dryrun layout).

    The 2 GB data arrays enter as jit ARGUMENTS (the problem closures
    are built over tracers inside the jitted solve) — closing over
    concrete arrays would bake them into the HLO as constants and choke
    compilation.

    Precision contract (VERDICT r4 #2): this drives run_chunk raw, so
    it scopes ``matmul_precision_scope(opts)`` exactly as ``solve`` and
    ``solve_batched`` do (core/types.py:131).  Measured at 5M x 100 on
    v5e: ambient DEFAULT precision (bf16-class GEMM passes) perturbs
    d1sq enough to flip the exit class from +10000 (relative-residual
    convergence) to +40 (noise-limited step) at the same iterate count
    — that was BENCH r03->r04's giant_m_exit shift.  Scoped float32
    restores +10000 (ambient: 20.0 it/s, scoped: 16.8 it/s)."""
    from enlsip_tpu.core.driver import Functions, init_carry, run_chunk
    from enlsip_tpu.core.types import (Dims, Options,
                                       matmul_precision_scope)

    _gm_init()
    dims = Dims(n=_GM_N, m=_GM_M, q=0, l=_GM_L)
    opts = Options(second_derivatives=False, max_iter=max_iter)
    tols = _tols(dtype)

    @jax.jit
    def gm_solve(W, Y, x0, tols):
        def res(x):
            z = W @ x
            return Y - (z + 0.1 * jnp.tanh(z))

        def jac(x):
            z = W @ x
            return -(1.0 + 0.1 * (1.0 - jnp.tanh(z) ** 2))[:, None] * W

        def res_trial(x, p):
            # r(x) = phi(W@x): every line-search trial rides the ray
            # W@x + a*(W@p) — O(m) per trial instead of an O(m*n)
            # stream of W (Functions.res_trial contract).  Both ray
            # endpoints come from ONE W pass ((n, 2) rhs) instead of
            # two matvecs.
            zxp = W @ jnp.stack([x, p], axis=1)      # (m, 2)
            zx, zp = zxp[:, 0], zxp[:, 1]

            def at(a):
                u = zx + a.astype(zx.dtype) * zp
                return Y - (u + 0.1 * jnp.tanh(u))

            return at

        def rowscale(x):
            # Factored J = diag(rowscale) @ W (Functions.jac_* hook,
            # round 5): J is never materialized — the WY apply streams
            # W with the scale fused in-kernel, saving two (m, n) HBM
            # streams per iteration vs the dense closure above (kept
            # for reference/tests).
            z = W @ x
            return -(1.0 + 0.1 * (1.0 - jnp.tanh(z) ** 2))

        fns = Functions(res=res, jac_res=jac, cons=_gm_cons,
                        jac_cons=jax.jacfwd(_gm_cons), res_trial=res_trial,
                        jac_rowscale=rowscale, jac_base=lambda: W)
        c = init_carry(fns, x0, dims, opts, dtype)
        c = run_chunk(c, fns, dims, opts, tols, opts.max_iter + 1)
        return c.x, c.nb_iter, c.exit_code, jnp.sum(c.active_mask)

    x0 = jnp.zeros(_GM_N, dtype)
    W, Y = _GM["W"], _GM["Y"]
    with matmul_precision_scope(opts):
        x, n_iter, exit_code, t_act = gm_solve(W, Y, x0, tols)  # compile
        np.asarray(x)
        if trace_dir is not None:  # op-level attribution (roofline)
            with jax.profiler.trace(trace_dir):
                x, n_iter, exit_code, t_act = gm_solve(W, Y, x0, tols)
                np.asarray(x)
        t0 = time.perf_counter()
        x, n_iter, exit_code, t_act = gm_solve(W, Y, x0, tols)
        np.asarray(x)
        dt = time.perf_counter() - t0
        # XLA's own peak-memory accounting of the solve executable:
        # the factored+elided path holds no dense J and no JQ1, so the
        # 5M-row solve fits in 4.4 GB vs 9.2 GB dense — ~2x the rows
        # per chip before HBM exhaustion (round 5).
        try:
            ma = gm_solve.lower(W, Y, x0, tols).compile().memory_analysis()
            peak_gb = round(ma.peak_memory_in_bytes / 2**30, 2)
        except Exception:  # pragma: no cover - accounting unavailable
            peak_gb = None
    n_iter = int(n_iter)
    return max(n_iter, 1) / dt, n_iter, int(exit_code), int(t_act), peak_gb


def bench_hs_suite_subprocess(dtype_name: str, timeout_s: float = 1500):
    """Full 28-problem HS suite %-matched-optima (BASELINE's headline
    accuracy metric) in a subprocess: one fused launch for the whole
    suite (benchmarks/hs_suite_bench.py); f64 gets JAX_ENABLE_X64=1
    without polluting this process's f32 benches."""
    import subprocess
    env = dict(_os.environ)
    if dtype_name == "f64":
        env["JAX_ENABLE_X64"] = "1"
    script = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "benchmarks", "hs_suite_bench.py")
    p = subprocess.run([sys.executable, script, dtype_name],
                       capture_output=True, text=True, timeout=timeout_s,
                       env=env)
    if p.returncode != 0:
        raise RuntimeError(p.stderr.strip().splitlines()[-1][:120]
                           if p.stderr.strip() else f"rc={p.returncode}")
    return json.loads(p.stdout.strip().splitlines()[-1])


def bench_multiproc(timeout_s: float = 1800):
    """Multi-process jax.distributed weak-scaling proxy (VERDICT r3 #1):
    the harness runs the REAL multi-host code path (distributed init,
    gloo collectives, make_array_from_process_local_data) on 1 vs 2 CPU
    processes at fixed per-process batch and asserts per-lane parity.
    Runs on CPU in subprocesses regardless of this process's TPU."""
    import subprocess
    script = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "benchmarks", "multiproc_harness.py")
    env = dict(_os.environ, ENLSIP_MP_ROUNDS="1")
    p = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, timeout=timeout_s, env=env)
    result = None
    for line in p.stdout.splitlines():
        if line.startswith("MULTIPROC_RESULT "):
            result = json.loads(line[len("MULTIPROC_RESULT "):])
    if result is None:
        raise RuntimeError((p.stdout + p.stderr)[-120:])
    return result


def _qr_path():
    """Which CPQR path the CR n=1000 factorizations actually take
    (the J2 buffer there is ~(1998, 1000) f32)."""
    from enlsip_tpu.ops.blocked_qr import _use_pallas
    return "pallas" if _use_pallas(1998, 1000, 4) else "xla"


# ---------------------------------------------------------------- emit

_T0 = time.monotonic()
_BUDGET_S = float(_os.environ.get("ENLSIP_BENCH_BUDGET_S", "1700"))
_EMIT_LOCK = threading.Lock()
_EMITTED = False

OUT = {
    "metric": "chained_rosenbrock_n1000_solve_seconds",
    "value": None,
    "unit": "s",
    "vs_baseline": None,
    "sections_done": [],
    "skipped": {},
    "notes": {
        "capture": "incremental dict; one JSON line emitted by first of "
                   "completion / watchdog / SIGTERM (VERDICT r4 #1)",
        "ode_fit_10k_solves_per_sec":
            "not comparable to BENCH_r02 (2165/s): that number was "
            "measured while the partial-block CPQR bug corrupted "
            "lanes 9728+ (fixed in r03, commit a99073f); r03+ "
            "values are post-fix.",
        "multiproc":
            "proxy on one machine: N CPU processes x 2 virtual "
            "devices each, disjoint cores, gloo collectives, fixed "
            "per-process batch (real multi-host TPU unavailable). "
            "Processes share DRAM bandwidth, which depresses the "
            "proxy below what separate hosts would show.",
        "cr5000": "matmul_precision='bfloat16' opt-in recovers the "
                  "f32-default regression; see cr5000_* fields.",
        "hetero_100k_peak_hbm_gb":
            "device.memory_stats() when live; otherwise XLA's "
            "executable memory_analysis().peak_memory_in_bytes "
            "(args + outputs + temps at the high-water point).",
    },
}


def _emit_once(reason: str):
    """Print the single JSON line exactly once, whoever calls first."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        OUT["elapsed_s"] = round(time.monotonic() - _T0, 1)
        OUT["emit_reason"] = reason
        print(json.dumps(OUT), flush=True)


def _watchdog():
    """Fires at the budget even if the main thread is stuck inside a
    blocking XLA/Mosaic compile (signal handlers can't preempt C)."""
    remaining = _BUDGET_S - (time.monotonic() - _T0)
    if remaining > 0:
        time.sleep(remaining)
    _emit_once("watchdog_budget")
    _os._exit(0)


def _sig_handler(signum, frame):  # pragma: no cover - driver timeout path
    _emit_once(f"signal_{signum}")
    _os._exit(0)


def _remaining():
    return _BUDGET_S - (time.monotonic() - _T0)


def _section(name: str, est_cost_s: float, fn):
    """Run one bench section if the remaining budget can afford it;
    record results into OUT inside fn.  Failures and budget skips are
    recorded, never fatal."""
    if _remaining() < est_cost_s:
        OUT["skipped"][name] = f"budget (est {est_cost_s:.0f}s > " \
                               f"remaining {_remaining():.0f}s)"
        print(f"[bench] skip {name}: budget", file=sys.stderr, flush=True)
        return
    t0 = time.monotonic()
    print(f"[bench] start {name} (t+{t0 - _T0:.0f}s)", file=sys.stderr,
          flush=True)
    try:
        fn()
        OUT["sections_done"].append(
            f"{name}:{time.monotonic() - t0:.0f}s")
    except Exception as e:  # pragma: no cover - keep the line alive
        OUT["skipped"][name] = f"error: {str(e)[:100]}"
        print(f"[bench] {name} failed: {e}", file=sys.stderr, flush=True)


# ------------------------------------------------------------ sections

def _sec_cr1000():
    t_cr, status = bench_chained_rosenbrock()
    OUT["value"] = round(t_cr, 4)
    OUT["vs_baseline"] = round(BASELINE_CR1000_S / t_cr, 3)
    OUT["cr1000_status"] = status


def _sec_small_n():
    OUT.update(bench_small_n())


def _sec_cr5000():
    cr5000 = bench_cr5000()
    OUT["cr5000_default_seconds"] = cr5000.get("default", {}).get(
        "seconds", cr5000.get("error"))
    OUT["cr5000_bf16_seconds"] = cr5000.get("bf16", {}).get("seconds")
    OUT["cr5000_default_status"] = cr5000.get("default", {}).get("status")
    OUT["cr5000_bf16_status"] = cr5000.get("bf16", {}).get("status")


def _sec_giant_m():
    gm_rate, gm_iters, gm_exit, gm_t, gm_peak = bench_giant_m()
    OUT["giant_m_5m_iters_per_sec"] = round(gm_rate, 2)
    OUT["giant_m_iters"] = gm_iters
    OUT["giant_m_exit"] = gm_exit
    OUT["giant_m_active_t"] = gm_t
    OUT["giant_m_peak_hbm_gb"] = gm_peak


def _sec_giant_m_marginal():
    """Marginal per-iteration cost vs the roofline bounds (VERDICT r4
    #3, captured as BENCH fields instead of stdout-only): a 4-iter and
    a 1-iter run difference out init/ray-setup/dispatch amortization;
    the ideal and trace-calibrated bounds come from the same
    trace-verified cost model (benchmarks/roofline.py docstring)."""
    sys.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "benchmarks"))
    import roofline
    marginal, bound, bound_cal, _, _ = roofline.measure_giant_m()
    OUT["giant_m_marginal_ms_per_iter"] = round(marginal * 1e3, 1)
    OUT["giant_m_ideal_bound_ms"] = round(bound * 1e3, 1)
    OUT["giant_m_calibrated_bound_ms"] = round(bound_cal * 1e3, 1)
    OUT["giant_m_marginal_vs_calibrated"] = round(marginal / bound_cal, 3)


def _sec_hs65():
    hs_rate, hs_match, hs_strict = bench_batched_hs65()
    OUT["hs65_batched_solves_per_sec"] = round(hs_rate, 1)
    OUT["hs65_batched_match_rate"] = round(hs_match, 4)
    OUT["hs65_batched_match_and_converged_rate"] = round(hs_strict, 4)
    hs4k_rate, hs4k_match, _ = bench_batched_hs65(B=4096)
    OUT["hs65_batched_4096_solves_per_sec"] = round(hs4k_rate, 1)
    OUT["hs65_batched_4096_match_rate"] = round(hs4k_match, 4)


def _sec_hetero():
    het_rate, het_match, _ = bench_hetero_suite()
    OUT["hetero_suite_solves_per_sec"] = round(het_rate, 1)
    OUT["hetero_suite_match_rate"] = (round(het_match, 4)
                                      if isinstance(het_match, float)
                                      else het_match)


def _sec_ode():
    (ode_rate, ode_opt, ode_strict, ode_breakdown, ode_strict_esc,
     ode_n_esc) = bench_ode_fit_batched()
    OUT["ode_fit_10k_solves_per_sec"] = round(ode_rate, 1)
    OUT["ode_fit_10k_optimum_rate"] = (round(ode_opt, 4)
                                       if isinstance(ode_opt, float)
                                       else ode_opt)
    OUT["ode_fit_10k_match_and_converged_rate"] = (
        round(ode_strict, 4) if isinstance(ode_strict, float)
        else ode_strict)
    OUT["ode_fit_10k_miss_exit_codes"] = (
        {str(k): v for k, v in ode_breakdown.items()}
        if isinstance(ode_breakdown, dict) else ode_breakdown)
    OUT["ode_fit_10k_strict_escalated"] = (
        round(ode_strict_esc, 4) if isinstance(ode_strict_esc, float)
        else ode_strict_esc)
    OUT["ode_fit_10k_escalated_lanes"] = ode_n_esc


def _sec_hs_suite_f32():
    r = bench_hs_suite_subprocess("f32", timeout_s=min(600, _remaining()))
    OUT["hs_suite_match_f32"] = r.get("matched")
    OUT["hs_suite_match_f32_escalated"] = r.get("matched_escalated")
    OUT["hs_suite_misses_f32_escalated"] = r.get("misses_escalated")
    OUT["hs_suite_misses_f32"] = r.get("misses")
    OUT["hs_suite_total"] = r.get("total")
    OUT["hs_suite_match_multistart"] = r.get("matched_multistart")
    OUT["hs_suite_misses_multistart"] = r.get("misses_multistart")


def _sec_hs_suite_f64():
    r = bench_hs_suite_subprocess("f64", timeout_s=min(600, _remaining()))
    OUT["hs_suite_match_f64"] = r.get("matched")
    OUT["hs_suite_misses_f64"] = r.get("misses")
    OUT.setdefault("hs_suite_total", r.get("total"))


def _sec_hetero_100k():
    het100k_rate, het100k_match, het100k_peak = bench_hetero_100k()
    OUT["hetero_100k_solves_per_sec"] = round(het100k_rate, 1)
    OUT["hetero_100k_match_rate"] = (round(het100k_match, 4)
                                     if isinstance(het100k_match, float)
                                     else het100k_match)
    OUT["hetero_100k_peak_hbm_gb"] = het100k_peak


def _sec_hetero_newton():
    hetN_rate, hetN_match = bench_hetero_newton()
    OUT["hetero_newton_solves_per_sec"] = round(hetN_rate, 1)
    OUT["hetero_newton_match_rate"] = (round(hetN_match, 4)
                                       if isinstance(hetN_match, float)
                                       else hetN_match)


def _sec_multiproc():
    mp = bench_multiproc(timeout_s=min(900, _remaining()))
    mp_eff = mp.get("weak_scaling_efficiency")
    OUT["multiproc_2proc_weak_scaling_efficiency"] = (
        round(mp_eff, 3) if isinstance(mp_eff, float) else mp_eff)
    eff4 = mp.get("weak_scaling_efficiency_4proc")
    OUT["multiproc_4proc_weak_scaling_efficiency"] = (
        round(eff4, 3) if isinstance(eff4, float) else eff4)
    OUT["multiproc_parity_ok"] = mp.get("parity_ok")
    OUT["multiproc_collective_fraction"] = mp.get("collective_fraction")
    OUT["multiproc_detail"] = {
        "t_1proc_s": mp.get("t_1proc_s"),
        "t_2proc_s": mp.get("t_2proc_s"),
        "t_4proc_s": mp.get("t_4proc_s"),
        "b_local": mp.get("b_local"),
        "check_every": mp.get("check_every")}


def main():
    signal.signal(signal.SIGTERM, _sig_handler)
    signal.signal(signal.SIGINT, _sig_handler)
    threading.Thread(target=_watchdog, daemon=True).start()
    OUT["qr_path"] = _qr_path()
    OUT["device"] = str(jax.devices()[0])
    OUT["bench_budget_s"] = _BUDGET_S

    # Evidence-value order (VERDICT r4 #1).  Estimated costs are
    # warm-cache; a cold cache overruns a section, and the budget gate +
    # watchdog then degrade gracefully instead of losing everything.
    _section("cr1000", 60, _sec_cr1000)
    _section("small_n", 60, _sec_small_n)
    _section("cr5000", 90, _sec_cr5000)
    _section("giant_m", 150, _sec_giant_m)
    _section("giant_m_marginal", 120, _sec_giant_m_marginal)
    _section("hs_suite_f32", 180, _sec_hs_suite_f32)
    _section("hs65_batched", 60, _sec_hs65)
    _section("hetero_suite", 90, _sec_hetero)
    _section("ode_fit", 120, _sec_ode)
    _section("hetero_100k", 150, _sec_hetero_100k)
    _section("hs_suite_f64", 180, _sec_hs_suite_f64)
    _section("hetero_newton", 90, _sec_hetero_newton)
    _section("multiproc", 330, _sec_multiproc)
    _emit_once("complete")


if __name__ == "__main__":
    main()
