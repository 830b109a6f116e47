"""Hock–Schittkowski CNLS suite: % matched optima (the BASELINE.json
accuracy metric).

Every problem must reach a first-order stationary point or a documented
degenerate outcome; the match rate against published optima must stay
at or above the recorded level (raising it is progress, dropping it is
a regression).  Each problem is solved once per session (fixture).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import enlsip_tpu as et
import oracle_enlsip as oe
from enlsip_tpu.models.model import _model_functions, total_nb_constraints
from enlsip_tpu.problems import HS_PROBLEMS

# Problems where this algorithm family (undamped-Newton fallback,
# penalty linesearch) is known to land elsewhere from the standard x0.
# Every one is ORACLE-ADJUDICATED below: the reference algorithm itself
# (tests/oracle_enlsip.py, the numpy transliteration of the reference
# loop) produces the same outcome from the same start:
#   hs2:  both converge (exit 10000) to the alternate stationary point
#         f = 4.9412293.
#   hs13: LICQ fails at the solution; both converge to f = 0.99696744
#         (published f* = 1, miss at the 1e-5 threshold only).
#   hs16: both fail abnormally (oracle exit -9) after diverging.
#   hs27: both take the undamped-Newton divergence from x0 = (2,2,2)
#         and exit -9 at f ~ 0 (infeasible; published f* = 0.04).
#   hs32/hs60: correct optimum; exit may land -10 (penalty-sum quirk).
KNOWN_DIFFICULT = {"hs2", "hs13", "hs16", "hs27", "hs32", "hs60"}

# f64 match rate is 24/28 (the four adjudicated misses above); keep a
# one-problem slack against FP-level trajectory sensitivity.
MIN_MATCH_RATE = 23.0 / 28.0


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


def _oracle_outcome(name):
    kw, fstar = HS_PROBLEMS[name]()
    model = et.CnlsModel(**kw)
    n, m, q = model.nb_parameters, model.nb_residuals, model.nb_eqcons
    l = total_nb_constraints(model)
    r_, jr_, c_, jc_ = _model_functions(model, jnp.float64)
    fns = oe.Fns(lambda x: np.asarray(r_(jnp.asarray(x))),
                 lambda x: np.asarray(jr_(jnp.asarray(x))),
                 lambda x: np.asarray(c_(jnp.asarray(x))),
                 lambda x: np.asarray(jc_(jnp.asarray(x))))
    rel = float(np.sqrt(np.finfo(np.float64).eps))
    res = oe.enlsip(np.asarray(model.starting_point, float), fns, n, m, q, l,
                    eps_abs=1e-10, eps_rel=rel, eps_x=rel, eps_c=rel,
                    eps_rank=rel)
    return res.exit_code, res.f


@pytest.mark.parametrize("name", ["hs2", "hs13"])
def test_miss_converges_like_reference(name, suite_results):
    """The two converging f64 misses must land exactly where the
    reference-derived oracle lands (alternate stationary point /
    LICQ-failure point) — the miss is the algorithm's behavior, not an
    implementation defect."""
    st, f, _ = suite_results[name]
    oexit, of = _oracle_outcome(name)
    assert oexit > 0 and st == "found_first_order_stationary_point"
    np.testing.assert_allclose(f, of, rtol=1e-6)


@pytest.mark.parametrize("name", ["hs16", "hs27"])
def test_miss_fails_like_reference(name, suite_results):
    """The two failing f64 misses must fail through the abnormal exit
    lattice exactly as the reference-derived oracle does."""
    st, f, _ = suite_results[name]
    oexit, _ = _oracle_outcome(name)
    assert oexit < 0 and st == "failed", (st, oexit)
