"""Fused WY right-apply kernels (ops/pallas_wy.py): parity with the
plain compact-WY GEMM chain (apply, Gram, projection), block-divisor
logic, and dispatch gate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from enlsip_tpu.ops import blocked_qr as bq
from enlsip_tpu.ops.pallas_wy import (_row_block, _wy_gram_kernel,
                                      _wy_kernel, use_wy_pallas,
                                      wy_right_apply)


def _ref(J, V, T):
    return J - ((J @ V) @ T) @ V.T


def _factors(rng, n, k):
    f = bq.cpqr_blocked(jnp.asarray(rng.normal(size=(n, k))))
    return f.V, f.T[0]


def test_wy_kernel_parity_interpret():
    from jax.experimental import pallas as pl
    rng = np.random.default_rng(0)
    rows, n, k = 4096, 100, 50
    V, T = _factors(rng, n, k)
    J = jnp.asarray(rng.normal(size=(rows, n)))
    rb = _row_block(rows)
    W = T @ V.T
    out = pl.pallas_call(
        _wy_kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                  pl.BlockSpec((n, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rb, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, n), J.dtype),
        interpret=True,
    )(J, V, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(J, V, T)),
                               rtol=1e-12, atol=1e-12)


def test_wy_gram_kernel_parity_interpret():
    from jax.experimental import pallas as pl
    rng = np.random.default_rng(2)
    rows, n, k = 2048, 60, 24
    V, T = _factors(rng, n, k)
    J = jnp.asarray(rng.normal(size=(rows, n)))
    rx = jnp.asarray(rng.normal(size=(rows,)))
    rb = 256
    W = T @ V.T
    JQ1, G, jtrx = pl.pallas_call(
        _wy_gram_kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                  pl.BlockSpec((n, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0)),
                  pl.BlockSpec((8, rb), lambda i: (i // 8, 0))],
        out_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                   pl.BlockSpec((n, n), lambda i: (0, 0)),
                   pl.BlockSpec((1, n), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, n), J.dtype),
                   jax.ShapeDtypeStruct((n, n), J.dtype),
                   jax.ShapeDtypeStruct((1, n), J.dtype)],
        interpret=True,
    )(J, V, W, rx.reshape(rows // rb, rb))
    ref = _ref(J, V, T)
    np.testing.assert_allclose(np.asarray(JQ1), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(G), np.asarray(ref.T @ ref),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jtrx[0]), np.asarray(ref.T @ rx),
                               rtol=1e-10, atol=1e-10)


def test_row_block_divisors():
    assert _row_block(5_000_000) == 2000
    assert _row_block(4096) == 2048
    assert _row_block(8 * 3) == 24
    assert _row_block(100) is None   # not a multiple of 8
    assert _row_block(8 * 251) == 2008   # fits in one max-size block
    assert _row_block(8 * 1009) == 8     # prime tail: smallest block


def test_dispatch_gate():
    # CPU backend: never dispatches (the conftest forces cpu).
    assert not use_wy_pallas(5_000_000, 100, 50, jnp.float32)
    # Shape/dtype legs of the gate, independent of backend:
    from enlsip_tpu.ops import pallas_wy as pw
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        assert pw.use_wy_pallas(5_000_000, 100, 50, jnp.float32)
        assert not pw.use_wy_pallas(5_000_000, 100, 50, jnp.float64)
        assert not pw.use_wy_pallas(2000, 100, 50, jnp.float32)  # not tall
        assert not pw.use_wy_pallas(5_000_001, 100, 50, jnp.float32)  # %8
    finally:
        jax.default_backend = orig


def test_right_q_apply_unchanged_on_cpu():
    # On CPU the dispatch gate is closed; right_q_apply must equal the
    # original chain bit-for-bit (it IS the original chain).
    rng = np.random.default_rng(1)
    f = bq.cpqr_blocked(jnp.asarray(rng.normal(size=(12, 8))))
    J = jnp.asarray(rng.normal(size=(64, 12)))
    out = bq.right_q_apply(f, J)
    ref = J
    for Vi, Ti in bq._panels(f):
        ref = ref - ((ref @ Vi) @ Ti) @ Vi.T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_wy_gram_scale_kernel_parity_interpret():
    """Row-scaled variant (factored-Jacobian mode): JQ1 = s * (BQ1)."""
    from jax.experimental import pallas as pl

    from enlsip_tpu.ops.pallas_wy import _wy_gram_scale_kernel
    rng = np.random.default_rng(5)
    rows, n, k = 2048, 60, 24
    V, T = _factors(rng, n, k)
    B = jnp.asarray(rng.normal(size=(rows, n)))
    rx = jnp.asarray(rng.normal(size=(rows,)))
    s = jnp.asarray(rng.normal(size=(rows,)) + 2.0)
    rb = 256
    W = T @ V.T
    stripe = pl.BlockSpec((8, rb), lambda i: (i // 8, 0))
    JQ1, G, jtrx = pl.pallas_call(
        _wy_gram_scale_kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                  pl.BlockSpec((n, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0)), stripe, stripe],
        out_specs=[pl.BlockSpec((rb, n), lambda i: (i, 0)),
                   pl.BlockSpec((n, n), lambda i: (0, 0)),
                   pl.BlockSpec((1, n), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, n), B.dtype),
                   jax.ShapeDtypeStruct((n, n), B.dtype),
                   jax.ShapeDtypeStruct((1, n), B.dtype)],
        interpret=True,
    )(B, V, W, rx.reshape(rows // rb, rb), s.reshape(rows // rb, rb))
    ref = np.asarray(s)[:, None] * np.asarray(_ref(B, V, T))
    np.testing.assert_allclose(np.asarray(JQ1), ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(G), ref.T @ ref,
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jtrx[0]), ref.T @ np.asarray(rx),
                               rtol=1e-10, atol=1e-10)
