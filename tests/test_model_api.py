"""Model-layer tests — the analogue of test/internal/constraints.jl:
constructor validation, bounds synthesis, constraint stacking order."""

import jax.numpy as jnp
import numpy as np
import pytest

import enlsip_tpu as et
from enlsip_tpu.models.model import build_constraint_functions

from problems import HS65


def _mk(**over):
    kw = dict(HS65)
    kw.update(over)
    return et.CnlsModel(**kw)


def test_constructor_validation():
    with pytest.raises(ValueError):
        et.CnlsModel(residuals=lambda x: x, nb_parameters=0, nb_residuals=3)
    with pytest.raises(ValueError):
        et.CnlsModel(residuals=lambda x: x, nb_parameters=3, nb_residuals=3)
    with pytest.raises(ValueError):  # incoherent ineq count
        et.CnlsModel(residuals=lambda x: x, nb_parameters=3, nb_residuals=3,
                     ineq_constraints=lambda x: x[:1], nb_ineqcons=0)


def test_default_starting_point_zeros():
    m = et.CnlsModel(residuals=lambda x: x, nb_parameters=3, nb_residuals=3,
                     x_low=np.zeros(3) - 1.0)
    np.testing.assert_array_equal(m.starting_point, np.zeros(3))


def test_counting_accessors():
    m = _mk()
    assert et.nb_equality_constraints(m) == 0
    assert et.nb_inequality_constraints(m) == 1
    assert et.nb_lower_bounds(m) == 3
    assert et.nb_upper_bounds(m) == 3
    assert et.total_nb_constraints(m) == 7


def test_partial_bounds_counting():
    m = _mk(x_low=np.array([-np.inf, -4.5, -np.inf]))
    assert et.nb_lower_bounds(m) == 1
    assert et.total_nb_constraints(m) == 5


def test_constraint_stacking_order():
    """Constraint vector must stack [ineq; x - lb; ub - x] (HS65 has no
    equalities), matching cnls_model.jl:410-496."""
    m = _mk()
    cons, jac = build_constraint_functions(m)
    x = jnp.asarray(HS65["starting_point"])
    got = np.asarray(cons(x))
    expect = np.concatenate([
        np.asarray(HS65["ineq_constraints"](x)),
        np.asarray(x) - HS65["x_low"],
        HS65["x_upp"] - np.asarray(x)])
    np.testing.assert_allclose(got, expect)
    # Jacobian stacks the same order with +-I rows for bounds
    Jg = np.asarray(jac(x))
    assert Jg.shape == (7, 3)
    np.testing.assert_allclose(Jg[1:4], np.eye(3))
    np.testing.assert_allclose(Jg[4:7], -np.eye(3))


def test_constraints_values_at_solution():
    m = _mk()
    vals = et.constraints_values(m)
    assert vals.shape == (7,)


def test_status_codes():
    assert et.convert_exit_code(10040) == 1
    assert et.convert_exit_code(-2) == -2
    assert et.convert_exit_code(-11) == -11
    assert et.convert_exit_code(-6) == -1
    assert et.dict_status_codes[0] == "unsolved"
