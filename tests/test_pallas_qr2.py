"""v2 fused Pallas CPQR (transposed layout + dynamic nsteps) vs XLA."""

import jax.numpy as jnp
import numpy as np
import pytest

from enlsip_tpu.ops.blocked_qr import cpqr_blocked, q_apply
from enlsip_tpu.ops.pallas_qr2 import cpqr_pallas2


@pytest.mark.parametrize("shape", [(16, 12), (33, 20), (24, 40)])
def test_v2_matches_xla(shape):
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=shape))
    fp = cpqr_pallas2(M, interpret=True)
    fx = cpqr_blocked(M)
    np.testing.assert_array_equal(np.asarray(fp.perm), np.asarray(fx.perm))
    np.testing.assert_allclose(np.asarray(fp.R), np.asarray(fx.R),
                               atol=1e-10)
    kmax = min(shape)
    np.testing.assert_allclose(np.asarray(fp.V)[:, :kmax],
                               np.asarray(fx.V)[:, :kmax], atol=1e-10)
    np.testing.assert_allclose(np.asarray(fp.tau)[:kmax],
                               np.asarray(fx.tau)[:kmax], atol=1e-10)


def test_v2_nsteps_matches_masked():
    """With trailing zero columns, running only the live steps must
    reproduce the full factorization."""
    rng = np.random.default_rng(1)
    M = np.asarray(rng.normal(size=(20, 14)))
    M[:, 9:] = 0.0
    fp = cpqr_pallas2(jnp.asarray(M), nsteps=9, interpret=True)
    fx = cpqr_blocked(jnp.asarray(M), nsteps=jnp.int32(9))
    np.testing.assert_array_equal(np.asarray(fp.perm), np.asarray(fx.perm))
    np.testing.assert_allclose(np.asarray(fp.R), np.asarray(fx.R),
                               atol=1e-10)
    Q = np.asarray(q_apply(fp, jnp.eye(20)))
    R = np.zeros((20, 14))
    R[:14] = np.asarray(fp.R)
    np.testing.assert_allclose(Q @ R, M[:, np.asarray(fp.perm)], atol=1e-10)