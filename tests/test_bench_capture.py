"""The bench harness's capture contract (VERDICT r4 #1): exactly one
JSON line must be emitted whatever ends the run — normal completion,
the watchdog budget, or the driver's `timeout` SIGTERM (BENCH_r04 was
rc=124/parsed=null because the old harness only printed at the very
end)."""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(budget):
    env = dict(os.environ)
    env["ENLSIP_BENCH_BUDGET_S"] = str(budget)
    # Keep the probe off the persistent cache (CPU executable
    # (de)serialization segfaults in this jaxlib — see conftest).
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    return env


def _one_json_line(stdout):
    json_lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, stdout[-1500:]  # exactly ONE line
    return json.loads(json_lines[0])


def test_bench_expired_budget_emits_one_line():
    """Budget already gone at startup: every section is budget-skipped,
    the single line still carries the skip markers, rc = 0."""
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=300,
                       cwd=REPO, env=_env(3))
    assert p.returncode == 0, p.stderr[-1500:]
    d = _one_json_line(p.stdout)
    assert d["emit_reason"] in ("complete", "watchdog_budget")
    assert d["metric"] == "chained_rosenbrock_n1000_solve_seconds"
    # Either the watchdog preempted main during import (no sections
    # reached) or main ran and budget-skipped every section.
    if d["emit_reason"] == "complete":
        assert d["skipped"], d  # nothing could run inside 3 s
        assert d["bench_budget_s"] == 3.0


def test_bench_sigterm_emits_one_line():
    """The r04 failure mode: the driver's `timeout` SIGTERMs the bench
    mid-run.  The handler must print the partial JSON and exit 0."""
    p = subprocess.Popen([sys.executable, os.path.join(REPO, "bench.py")],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, cwd=REPO, env=_env(3600))
    time.sleep(15)  # past import + into the first section
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=120)
    assert p.returncode == 0, err[-1500:]
    d = _one_json_line(out)
    assert d["emit_reason"].startswith("signal"), d["emit_reason"]
    assert d["metric"] == "chained_rosenbrock_n1000_solve_seconds"
