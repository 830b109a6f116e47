"""Fused batched Pallas CPQR vs the vmapped XLA loop.

The kernel (ops/pallas_batched_qr.py) factorizes a whole block of lanes
in one Pallas program; it must reproduce ``jax.vmap(cpqr_blocked)``
bit-compatibly (same pivot order, same no-op semantics on masked
columns) so the batched solver can dispatch to it transparently through
the ``custom_vmap`` rule in ops/blocked_qr.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enlsip_tpu.ops import blocked_qr as bq
from enlsip_tpu.ops import pallas_batched_qr as pbq
from enlsip_tpu.ops.blocked_qr import _cpqr_small, cpqr_blocked


def _assert_cpqrf_close(f1, f2, atol):
    np.testing.assert_array_equal(np.asarray(f1.perm), np.asarray(f2.perm))
    for name in ("R", "V", "tau", "T", "diag"):
        np.testing.assert_allclose(np.asarray(getattr(f1, name)),
                                   np.asarray(getattr(f2, name)),
                                   atol=atol, err_msg=name)


@pytest.mark.parametrize("rows,cols,live", [(3, 7, 2), (7, 3, 3),
                                            (16, 20, 9), (5, 5, 5)])
def test_batched_kernel_matches_vmapped_loop(rows, cols, live):
    """Masked trailing columns + per-lane nsteps: the fused kernel runs
    all kmax steps, the XLA loop only ``live`` — results must agree
    (dead steps are tau = 0 no-ops)."""
    rng = np.random.default_rng(0)
    B = 9
    M = rng.normal(size=(B, rows, cols))
    M[:, :, live:] = 0.0
    M = jnp.asarray(M, jnp.float32)
    ns = jnp.full((B,), live, jnp.int32)
    f1 = pbq.cpqr_blocked_batched(M, interpret=True)
    f2 = jax.vmap(lambda m, n: cpqr_blocked(m, nsteps=n))(M, ns)
    _assert_cpqrf_close(f1, f2, atol=5e-5)


def test_custom_vmap_dispatch(monkeypatch):
    """vmap of _cpqr_small routes through the fused kernel (interpret
    mode stands in for the TPU kernel on CPU) and matches the loop."""
    calls = []
    real = pbq.cpqr_blocked_batched

    def fake_batched(M):
        calls.append(M.shape)
        return real(M, interpret=True)

    monkeypatch.setattr(pbq, "cpqr_blocked_batched", fake_batched)
    rng = np.random.default_rng(1)
    M = jnp.asarray(rng.normal(size=(6, 8, 5)), jnp.float32)
    ns = jnp.full((6,), 5, jnp.int32)
    f1 = jax.vmap(_cpqr_small)(M, ns)
    assert calls == [(6, 8, 5)]
    f2 = jax.vmap(lambda m, n: bq._cpqr_xla(m, bq.NB, n))(M, ns)
    _assert_cpqrf_close(f1, f2, atol=5e-5)


def test_unbatched_small_path_unchanged():
    """Outside vmap, _cpqr_small is exactly the XLA loop."""
    rng = np.random.default_rng(2)
    M = jnp.asarray(rng.normal(size=(8, 5)), jnp.float32)
    f1 = _cpqr_small(M, jnp.int32(5))
    f2 = bq._cpqr_xla(M, bq.NB, jnp.int32(5))
    _assert_cpqrf_close(f1, f2, atol=0.0)


def test_gate_rejects_cpu_and_big_shapes(monkeypatch):
    assert not bq._use_batched_pallas(8, 8, jnp.float32)  # cpu backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert bq._use_batched_pallas(8, 8, jnp.float32)
    assert not bq._use_batched_pallas(8, 8, jnp.float64)
    assert not bq._use_batched_pallas(64, 64, jnp.float32)   # kmax > 32
    assert not bq._use_batched_pallas(2048, 2, jnp.float32)  # elems
    monkeypatch.setenv("ENLSIP_DISABLE_PALLAS", "1")
    assert not bq._use_batched_pallas(8, 8, jnp.float32)


@pytest.mark.parametrize("B", [513, 650, 1100])
def test_batched_cpqr_partial_block(B):
    """B > LANE_BLOCK with B % LANE_BLOCK != 0: the trailing partial
    block must be processed (regression: the grid was bp // lb with bp
    only 128-aligned, so lanes past the last full 512-block returned
    uninitialized garbage — observed as NaN solves at B = 10000 in the
    ODE-fit bench, round 3)."""
    rng = np.random.default_rng(B)
    rows, cols = 6, 5
    M = jnp.asarray(rng.normal(size=(B, rows, cols)), jnp.float32)
    f1 = pbq.cpqr_blocked_batched(M, interpret=True)
    f2 = jax.vmap(lambda m: cpqr_blocked(m))(M)
    assert np.isfinite(np.asarray(f1.R)).all()
    # the tail lanes specifically
    _assert_cpqrf_close(
        jax.tree.map(lambda a: a[-64:], f1),
        jax.tree.map(lambda a: a[-64:], f2), atol=5e-5)
    _assert_cpqrf_close(f1, f2, atol=5e-5)
