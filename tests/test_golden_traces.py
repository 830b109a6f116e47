"""Golden trajectory traces.

Guards the decision trees (GNDCHK / WRKSET / LINEC / TERCRI) against
behavioral drift: the per-iteration (method code, working-set size,
rankA) sequences and final exit codes for two reference problems are
pinned to the currently-audited implementation (every routine
line-checked against the reference, see PARITY.md).  A legitimate
algorithm change must update these records consciously.

Reference-derived parity (not just drift) is pinned separately by
``test_reference_oracle.py``, which compares the same trajectories
against a plain-numpy transliteration of the reference loop.
"""

import jax
import jax.numpy as jnp
import numpy as np

import enlsip_tpu as et
from enlsip_tpu.core.driver import Functions, init_carry, iterate_body, \
    _working_set_round
from enlsip_tpu.core.types import Dims, Options, Tols
from enlsip_tpu.models.model import _model_functions, total_nb_constraints

from problems import HS65


def _trace(model, dims, opts, max_steps=40):
    r_, jr_, c_, jc_ = _model_functions(model, jnp.float64)
    fns = Functions(res=r_, jac_res=jr_, cons=c_, jac_cons=jc_)
    eps = float(jnp.finfo(jnp.float64).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.float64(v) for v in (1e-10, rel, rel, rel, rel)))
    from functools import partial
    step = jax.jit(partial(iterate_body, fns=fns, dims=dims, opts=opts,
                           tols=tols))
    carry = init_carry(fns, jnp.asarray(model.starting_point), dims, opts,
                       jnp.float64)
    rows = []
    for _ in range(max_steps):
        if int(carry.exit_code) != 0:
            break
        new = step(carry)
        rows.append((int(new.prev.code), int(new.prev.t),
                     int(new.prev.rankA)))
        carry = new
    return rows, int(carry.exit_code)


def test_hs65_golden_trace():
    model = et.CnlsModel(**HS65)
    dims = Dims(n=3, m=3, q=0, l=7)
    rows, exit_code = _trace(model, dims, Options())
    # (code, t, rankA) per iteration; recorded from the audited build.
    # Iter 0: actives = {ineq, lb1, ub2} (all nonpositive at x0), whose
    # gradients span only {e1, e2} -> rankA = 2 < t = 3.
    assert rows[0] == (1, 3, 2), rows[0]
    assert all(c == 1 for c, _, _ in rows), rows   # pure GN trajectory
    assert exit_code > 0
    assert len(rows) <= 15, len(rows)
    # the final working set holds only the ball constraint
    assert rows[-1][1] == 1, rows[-1]


def test_chained_wood_golden_trace():
    from problems import chained_wood
    kw = chained_wood(20)
    model = et.CnlsModel(**kw)
    dims = Dims(n=20, m=kw["nb_residuals"], q=kw["nb_eqcons"],
                l=kw["nb_eqcons"])
    rows, exit_code = _trace(model, dims, Options(), max_steps=60)
    codes = [c for c, _, _ in rows]
    # The Newton path must engage on this problem (its purpose in the
    # reference suite) and equality constraints stay active throughout.
    assert 2 in codes or -1 in codes, codes
    assert all(t == kw["nb_eqcons"] for _, t, _ in rows)
    assert exit_code != 0
