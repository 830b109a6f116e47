"""Hock–Schittkowski CNLS suite: % matched optima (the BASELINE.json
accuracy metric).

Every problem must reach a first-order stationary point or a documented
degenerate outcome; the match rate against published optima must stay
at or above the recorded level (raising it is progress, dropping it is
a regression).  Each problem is solved once per session (fixture).
"""

import numpy as np
import pytest

import enlsip_tpu as et
from enlsip_tpu.problems import HS_PROBLEMS

# Problems where this algorithm family (undamped-Newton fallback,
# penalty linesearch) is known to land elsewhere from the standard x0:
#   hs2/hs16: converge to a different (legitimate) stationary point.
#   hs13: LICQ fails at the solution; converges with O(1e-3) error.
#   hs27: GN/Newton path diverges from x0 = (2,2,2) (exit -9).
#   hs32/hs60: correct optimum but exit -10 (penalty-sum quirk).
KNOWN_DIFFICULT = {"hs2", "hs13", "hs16", "hs27", "hs32", "hs60"}

MIN_MATCH_RATE = 0.80


@pytest.fixture(scope="module")
def suite_results():
    results = {}
    for name, builder in HS_PROBLEMS.items():
        kw, fstar = builder()
        model = et.CnlsModel(**kw)
        et.solve(model)
        results[name] = (et.status(model), et.sum_sq_residuals(model), fstar)
    return results


@pytest.mark.parametrize("name", sorted(HS_PROBLEMS))
def test_hs_problem(name, suite_results):
    st, f, fstar = suite_results[name]
    assert st in et.dict_status_codes.values()
    assert np.isfinite(f)
    if name not in KNOWN_DIFFICULT:
        assert st == "found_first_order_stationary_point", (name, st)
        assert f == pytest.approx(fstar, abs=1e-5 * (1 + abs(fstar))), name


def test_hs_suite_match_rate(suite_results):
    matched = sum(1 for st, f, fstar in suite_results.values()
                  if abs(f - fstar) <= 1e-5 * (1 + abs(fstar)))
    total = len(suite_results)
    assert matched / total >= MIN_MATCH_RATE, (matched, total)
