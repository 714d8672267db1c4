"""MD (mixed-dimension) embedding tables: low-rank row storage + a learned
projection to the model dimension.

Complement to QR compression (`qr.py`): rare/long-tail features don't earn
a full-width row. An MD table stores rows at a small intrinsic dim and
projects up on lookup (Ginart et al., "Mixed Dimension Embeddings", 2021 —
standard alongside QR in memory-tight DLRM deployments):

    data: (V, d_small)      proj: (d_small, D)
    row(v) = data[v] @ proj

Memory: V*d_small + d_small*D vs V*D — compression ~ D/d_small.

TPU-native: the lookup is a gather (at the measured-fastest path) followed
by an MXU matmul over the BATCH (B, d_small) @ (d_small, D) — the
projection costs MXU flops, not HBM, so it is nearly free at DLRM batch
sizes. Training: the pullback splits into a lazy `SparseEmbeddingUpdate`
against the small table (delta @ proj^T with the original indices) and a
DENSE gradient for the shared projection (rows^T @ delta — a tiny matrix
that rides the regular dense-optimizer path).

`MDEmbedding` implements the table protocol (usable in `lookup`/ensembles/
serving); `md_lookup_vjp` is the training entry.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.sparse_update import SparseEmbeddingUpdate
from .types import Dynamic, TableSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MDEmbedding:
    """Low-rank `(vocab, dim)` table: `(V, d_small)` rows x shared
    `(d_small, dim)` projection."""

    data: jax.Array            # (V, d_small)
    proj: jax.Array            # (d_small, dim)
    spec: TableSpec = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(cls, key: jax.Array, vocab: int, dim: int, d_small: int, *,
               dtype=jnp.float32, name: Optional[str] = None
               ) -> "MDEmbedding":
        if not 0 < d_small <= dim:
            raise ValueError(f"d_small must be in (0, {dim}], got {d_small}")
        kd, kp = jax.random.split(key)
        data = (jax.random.normal(kd, (vocab, d_small), dtype)
                / (d_small ** 0.5))
        proj = jax.random.normal(kp, (d_small, dim), dtype) / (dim ** 0.25)
        spec = TableSpec(vocab=vocab, dim=dim, dtype=dtype, lookup=Dynamic(),
                         name=name)
        return cls(data=data, proj=proj, spec=spec)

    # --- EmbeddingTable protocol -------------------------------------------
    @property
    def shape(self):
        return (self.spec.vocab, self.spec.dim)

    @property
    def dtype(self):
        return self.spec.dtype

    @property
    def d_small(self) -> int:
        return self.data.shape[1]

    def example(self) -> jax.Array:
        return self.data

    def rows(self, idx: jax.Array) -> jax.Array:
        small = jnp.take(self.data, jnp.asarray(idx), axis=0)
        return small @ self.proj

    def materialize(self) -> jax.Array:
        return self.data @ self.proj

    def compression(self) -> float:
        dense = self.spec.vocab * self.spec.dim
        return dense / (self.data.size + self.proj.size)

    def scatter_apply(self, idx: jax.Array, delta: jax.Array) -> "MDEmbedding":
        """Protocol fallback: apply a full-width row delta to the small
        table only (projected back through proj^T); proj is left for the
        dense optimizer."""
        small_delta = delta @ self.proj.T.astype(delta.dtype)
        new = self.data.at[jnp.asarray(idx)].add(
            small_delta.astype(self.data.dtype))
        return dataclasses.replace(self, data=new)


def md_lookup_vjp(table: MDEmbedding, indices) -> Tuple[jax.Array, Callable]:
    """MD lookup plus the split pullback:
    `pullback(delta) -> (upd_small, proj_grad)` — a lazy
    `SparseEmbeddingUpdate` against `table.data` (indices shared with the
    lookup) and a DENSE `(d_small, dim)` gradient for the projection."""
    indices = jnp.asarray(indices)
    if indices.ndim != 1:
        raise ValueError("md_lookup_vjp takes (B,) indices; reduce bags "
                         "outside the projection")
    small = jnp.take(table.data, indices, axis=0)        # (B, d_small)
    out = small @ table.proj

    def pullback(delta: jax.Array):
        upd_small = SparseEmbeddingUpdate(
            delta=delta @ table.proj.T.astype(delta.dtype), indices=indices)
        proj_grad = small.astype(delta.dtype).T @ delta  # (d_small, dim)
        return upd_small, proj_grad

    return out, pullback
