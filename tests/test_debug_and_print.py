"""NaN guards and the diagnostic printer."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

import enlsip_tpu as et
from enlsip_tpu.core.driver import Functions
from enlsip_tpu.utils.debug import first_nonfinite_report, guarded_functions

from problems import HS65


def test_guarded_functions_catch_nan():
    def bad_res(x):
        return jnp.array([x[0], jnp.sqrt(x[1])])  # NaN for x[1] < 0

    fns = Functions(res=bad_res, jac_res=jax.jacfwd(bad_res),
                    cons=lambda x: x, jac_cons=jax.jacfwd(lambda x: x))
    g = guarded_functions(fns)
    err, out = checkify.checkify(g.res)(jnp.array([1.0, -1.0]))
    with pytest.raises(Exception, match="residuals"):
        err.throw()
    # clean input passes
    err, out = checkify.checkify(g.res)(jnp.array([1.0, 4.0]))
    err.throw()
    np.testing.assert_allclose(np.asarray(out), [1.0, 2.0])


def test_first_nonfinite_report():
    model = et.CnlsModel(**HS65)
    et.solve(model)
    assert first_nonfinite_report(model) is None


def test_print_cnls_model():
    model = et.CnlsModel(**HS65)
    et.solve(model)
    buf = io.StringIO()
    et.print_cnls_model(model, out=buf)
    text = buf.getvalue()
    assert "Number of parameters" in text
    assert "Iteration steps information" in text
    assert "found_first_order_stationary_point" in text
    assert "Number of function evaluations" in text


def test_print_unsolved_model():
    model = et.CnlsModel(**HS65)
    buf = io.StringIO()
    et.print_cnls_model(model, out=buf)
    assert "Model has been initialized" in buf.getvalue()