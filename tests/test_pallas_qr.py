"""Fused Pallas CPQR (interpret mode on CPU) vs the XLA-loop version."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enlsip_tpu.ops.blocked_qr import cpqr_blocked, q_apply
from enlsip_tpu.ops.pallas_qr import cpqr_pallas


@pytest.mark.parametrize("shape", [(16, 12), (33, 20), (24, 40)])
def test_pallas_matches_xla(shape):
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=shape))
    fp = cpqr_pallas(M, interpret=True)
    fx = cpqr_blocked(M)
    np.testing.assert_array_equal(np.asarray(fp.perm), np.asarray(fx.perm))
    np.testing.assert_allclose(np.asarray(fp.R), np.asarray(fx.R),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(fp.V), np.asarray(fx.V),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(fp.tau), np.asarray(fx.tau),
                               atol=1e-10)


def test_pallas_reconstruction():
    rng = np.random.default_rng(1)
    M = np.asarray(rng.normal(size=(20, 14)))
    M[:, 10:] = 0.0  # masked columns
    f = cpqr_pallas(jnp.asarray(M), interpret=True)
    Q = np.asarray(q_apply(f, jnp.eye(20)))
    R = np.zeros((20, 14))
    R[:14] = np.asarray(f.R)
    np.testing.assert_allclose(Q @ R, M[:, np.asarray(f.perm)], atol=1e-10)
    np.testing.assert_allclose(Q.T @ Q, np.eye(20), atol=1e-10)
