"""End-to-end problem tests mirroring the reference suite
(test/problems/*.jl) with accuracy pinned to the documented optima."""

import numpy as np
import pytest

import enlsip_tpu as et

from problems import (HS65, HS65_FSTAR, HS65_XSTAR, OSBORNE2,
                      chained_rosenbrock, chained_wood)


def test_hs65():
    model = et.CnlsModel(**HS65)
    et.solve(model)
    assert et.status(model) == "found_first_order_stationary_point"
    assert et.sum_sq_residuals(model) == pytest.approx(HS65_FSTAR, abs=1e-7)
    np.testing.assert_allclose(et.solution(model), HS65_XSTAR, atol=1e-5)


def test_hs65_ad_jacobians():
    kw = dict(HS65)
    kw.pop("jacobian_residuals")
    kw.pop("jacobian_ineqcons")
    model = et.CnlsModel(**kw)
    et.solve(model)
    assert et.status(model) == "found_first_order_stationary_point"
    assert et.sum_sq_residuals(model) == pytest.approx(HS65_FSTAR, abs=1e-7)


def test_osborne2():
    model = et.CnlsModel(**OSBORNE2)
    et.solve(model)
    assert et.status(model) == "found_first_order_stationary_point"
    assert np.isfinite(et.sum_sq_residuals(model))
    # solution within bounds
    s = et.solution(model)
    assert np.all(s >= OSBORNE2["x_low"] - 1e-8)
    assert np.all(s <= OSBORNE2["x_upp"] + 1e-8)


def test_chained_rosenbrock_small():
    model = et.CnlsModel(**chained_rosenbrock(50))
    et.solve(model)
    assert et.status(model) == "found_first_order_stationary_point"
    # feasibility of equality constraints at the solution
    cx = np.asarray(et.equality_constraints_values(model))
    assert np.max(np.abs(cx)) < 1e-5


def test_chained_rosenbrock_time_limit():
    model = et.CnlsModel(**chained_rosenbrock(50))
    et.solve(model, time_limit=-1.0)
    assert et.status(model) == "time_limit_exceeded"


def test_chained_wood_newton_path():
    model = et.CnlsModel(**chained_wood(20))
    et.solve(model, rel_tol=1e-5, x_tol=1e-3, c_tol=1e-6)
    # Pinned to the numpy reference oracle (tests/oracle_enlsip.py) run
    # with the same tolerance mapping: exit 10300 after 20 iterations,
    # f = 474.2585640745832.
    assert et.status(model) == "found_first_order_stationary_point"
    np.testing.assert_allclose(et.sum_sq_residuals(model), 474.25856407,
                               rtol=1e-6)
