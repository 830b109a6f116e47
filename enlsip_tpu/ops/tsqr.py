"""TSQR-style two-stage column-pivoted QR for row-sharded tall matrices.

The giant-m configuration (SURVEY.md §5.7) shards the m residual rows
over the device mesh.  The default path lets GSPMD partition the
sequential pivoted-QR loop of ops/blocked_qr.py — correct, and cheap on
ICI (every collective is O(n) per step) — but each of the ~n steps
synchronizes, which hurts when the mesh spans hosts (DCN latency).
This module provides the classic communication-optimal alternative:

  stage 1 (local, zero communication): each shard factors its own
    (m/D, n) row panel with an unpivoted thin QR,
  stage 2 (replicated, one gather): the stacked local R factors
    (D*n, n) — whose columns have exactly the full matrix's column
    norms — are factored by the existing blocked *pivoted* QR.

  M P = blockdiag(Qloc_d) . embed(Q_S) . [R; 0]

R, perm and diag equal the direct CPQR's mathematically (pivoting
decisions depend only on column norms, which stage 1 preserves), so
rank logic and triangular solves are unchanged.  Q stays implicit as
the two-level composition; ``qt_apply_tsqr`` applies it with one local
GEMV + one small replicated apply — ONE gather per application instead
of one per factorization step.

Total communication per factorization: one (D*n, n) gather + one (D*n,)
gather, independent of the number of pivot steps.

No reference counterpart (the reference is single-process,
enlsip_functions.jl:223 ``qr(J2, ColumnNorm())``); the BASELINE's
"row-sharded Jacobian with Schur/TSQR reduction across hosts" names
this component.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .blocked_qr import CPQRF, cpqr_blocked, qt_apply


@jax.tree_util.register_pytree_node_class
class TSQRF:
    """Two-stage implicit-Q pivoted QR of a row-sharded (m, n) matrix.

    qloc: (m, n) row-sharded block-diagonal thin local Q factors;
    f2: replicated CPQR of the stacked local Rs ((D*n, n) buffer);
    axis: mesh axis name the rows are sharded over (static aux data);
    ``axis=None`` is the SINGLE-CHIP tall-skinny variant (D = 1): one
    unpivoted thin QR of the whole matrix + pivoted QR of its (n, n)
    R — one blocked MXU pass over the tall data instead of the
    sequential per-column pivot loop (the auto-dispatch for
    m >> n in core/subproblem.gn_search_direction).
    Exposes R/perm/diag with the shapes the direct CPQRF would have for
    m >= n, so FactorJ2's properties are oblivious."""

    def __init__(self, qloc, f2: CPQRF, axis: str | None):
        self.qloc = qloc
        self.f2 = f2
        self.axis = axis

    def tree_flatten(self):
        return (self.qloc, self.f2), self.axis

    @classmethod
    def tree_unflatten(cls, axis, children):
        return cls(children[0], children[1], axis)

    @property
    def R(self):
        return self.f2.R[: self.qloc.shape[1]]

    @property
    def perm(self):
        return self.f2.perm

    @property
    def diag(self):
        return self.f2.diag[: self.qloc.shape[1]]


def _axis_size(axis: str) -> int:
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or axis not in mesh.shape:
        raise ValueError(
            f"tsqr requires an ambient mesh with axis {axis!r}; "
            "wrap the solve in jax.set_mesh(mesh)")
    return mesh.shape[axis]


def tsqr_cpqr(M: jax.Array, nsteps, axis: str | None) -> TSQRF:
    """Column-pivoted QR of the row-sharded ``M`` ((m, n), m % D == 0,
    m/D >= n) via local thin QRs + replicated pivoted QR of the stacked
    R factors.  ``nsteps`` bounds stage 2's pivot steps (live columns).

    ``axis=None``: single-chip tall-skinny path — one thin
    ``jnp.linalg.qr`` of the whole matrix, then CPQR of its (n, n) R.
    Column norms (hence pivoting and rank decisions) are preserved
    exactly as in the sharded case."""
    m, n = M.shape
    if axis is None:
        q, r = jnp.linalg.qr(M, mode="reduced")
        return TSQRF(qloc=q, f2=cpqr_blocked(r, nsteps=nsteps), axis=None)
    D = _axis_size(axis)
    assert m % D == 0 and m // D >= n, (m, n, D)
    P = jax.sharding.PartitionSpec

    def local_qr(Md):
        q, r = jnp.linalg.qr(Md, mode="reduced")
        return tuple((q, r))  # plain tuple (QRResult confuses out_specs)

    qloc, r_stack = jax.shard_map(
        local_qr, in_specs=P(axis, None),
        out_specs=(P(axis, None), P(axis, None)))(M)
    # r_stack is (D*n, n): shard d's rows [d*n, (d+1)*n) hold its local R.
    f2 = cpqr_blocked(r_stack, nsteps=nsteps)
    return TSQRF(qloc=qloc, f2=f2, axis=axis)


def qt_apply_tsqr(f: TSQRF, v: jax.Array) -> jax.Array:
    """Q^T v embedded in an (m,) buffer whose leading D*n entries are
    the stacked-basis coefficients (exact for every consumer: the
    triangular solves and prefix norms all read < n leading entries)
    and whose entry [D*n] carries the orthogonal-complement norm, so
    ``sum(out**2) == ||v||**2`` like the direct transform.  (Entries in
    (n, D*n) differ from the direct CPQR's by an orthogonal rotation of
    the complement — no consumer reads them individually.)"""
    m, n = f.qloc.shape
    dn = f.f2.V.shape[0]
    if f.axis is None:
        w = f.qloc.T @ v                               # (n,)
    else:
        P = jax.sharding.PartitionSpec

        def local_qt(qd, vd):
            return qd.T @ vd  # (n,) per shard

        w = jax.shard_map(local_qt, in_specs=(P(f.axis, None), P(f.axis)),
                          out_specs=P(f.axis))(f.qloc, v)  # (D*n,) stacked
    u = qt_apply(f.f2, w)                              # (D*n,) replicated
    v2 = jnp.sum(v * v)
    rest2 = jnp.maximum(v2 - jnp.sum(w * w), 0.0)
    out = jnp.zeros(m, v.dtype)
    out = out.at[:dn].set(u)
    out = out.at[dn].set(jnp.sqrt(rest2))
    return out
