"""Checkpoint/resume: saving mid-solve state and resuming must reach
the same answer as an uninterrupted solve."""

import jax
import jax.numpy as jnp
import numpy as np

import enlsip_tpu as et
from enlsip_tpu.core.driver import Functions, init_carry, iterate_body
from enlsip_tpu.core.types import Dims, Options, Tols
from enlsip_tpu.models.model import build_constraint_functions
from enlsip_tpu.utils import load_carry, save_carry

from problems import HS65


def _setup():
    model = et.CnlsModel(**HS65)
    cons, jac_cons = build_constraint_functions(model)
    fns = Functions(res=HS65["residuals"],
                    jac_res=HS65["jacobian_residuals"],
                    cons=cons, jac_cons=jac_cons)
    dims = Dims(n=3, m=3, q=0, l=7)
    eps = float(jnp.finfo(jnp.float64).eps)
    rel = float(np.sqrt(eps))
    tols = Tols(*(jnp.float64(v) for v in (1e-10, rel, rel, rel, rel)))
    return fns, dims, Options(), tols


def test_checkpoint_roundtrip(tmp_path):
    from functools import partial
    fns, dims, opts, tols = _setup()
    step = jax.jit(partial(iterate_body, fns=fns, dims=dims, opts=opts,
                           tols=tols))
    x0 = jnp.asarray(HS65["starting_point"], jnp.float64)
    carry = init_carry(fns, x0, dims, opts, jnp.float64)
    # run 3 iterations, checkpoint, run to completion
    for _ in range(3):
        carry = step(carry)
    path = str(tmp_path / "state.npz")
    save_carry(path, carry)

    resumed = load_carry(path, like=carry)
    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def finish(c):
        while int(c.exit_code) == 0:
            c = step(c)
        return c

    c1 = finish(carry)
    c2 = finish(resumed)
    np.testing.assert_array_equal(np.asarray(c1.x), np.asarray(c2.x))
    assert int(c1.exit_code) == int(c2.exit_code)


def test_load_without_like(tmp_path):
    fns, dims, opts, tols = _setup()
    x0 = jnp.asarray(HS65["starting_point"], jnp.float64)
    carry = init_carry(fns, x0, dims, opts, jnp.float64)
    path = str(tmp_path / "state.npz")
    save_carry(path, carry)
    resumed = load_carry(path)
    np.testing.assert_array_equal(np.asarray(resumed.x), np.asarray(carry.x))


def test_load_v1_format_migrates(tmp_path):
    """A pre-version file (v1: trailing time_exceeded leaf, no
    __format_version__ entry) loads by dropping the obsolete leaf."""
    fns, dims, opts, tols = _setup()
    x0 = jnp.asarray(HS65["starting_point"], jnp.float64)
    carry = init_carry(fns, x0, dims, opts, jnp.float64)
    leaves = [np.asarray(l) for l in jax.tree.leaves(carry)]
    leaves.append(np.asarray(False))  # v1 time_exceeded
    path = str(tmp_path / "v1.npz")
    np.savez(path, **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    resumed = load_carry(path, like=carry)
    np.testing.assert_array_equal(np.asarray(resumed.x), np.asarray(carry.x))
    assert len(jax.tree.leaves(resumed)) == len(jax.tree.leaves(carry))


def test_load_wrong_leaf_count_errors(tmp_path):
    fns, dims, opts, tols = _setup()
    x0 = jnp.asarray(HS65["starting_point"], jnp.float64)
    carry = init_carry(fns, x0, dims, opts, jnp.float64)
    leaves = [np.asarray(l) for l in jax.tree.leaves(carry)][:-3]
    path = str(tmp_path / "bad.npz")
    np.savez(path, **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    import pytest
    with pytest.raises(ValueError, match="incompatible"):
        load_carry(path, like=carry)
