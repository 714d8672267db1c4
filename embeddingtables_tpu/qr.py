"""QR (quotient-remainder) compressed embedding tables.

Production vocabularies outgrow HBM long before they outgrow the model:
a 500M-row table at D=128 f32 is 256 GB. The quotient-remainder trick
(Shi et al., "Compositional Embeddings Using Complementary Partitions",
KDD 2020 — the standard DLRM memory-compression technique) represents row
`v` of a `(V, D)` table by combining rows of two SMALL tables:

    q_table: (ceil(V / Q), D)   row v // Q
    r_table: (Q, D)             row v % Q
    row(v) = combine(q_table[v // Q], r_table[v % Q])

`combine` is "mult" (elementwise product — the paper's best), "add", or
"concat" (each table carries D/2). Memory drops from V*D to
(V/Q + Q)*D — minimized at Q ≈ sqrt(V), giving O(sqrt(V)) rows.

TPU-native realization: a QR lookup is TWO dense gathers on small tables
(often VMEM/cache-friendly head sizes) + one VPU combine — no new kernel
needed; both gathers ride the measured-fastest lookup path. Gradients flow
through the combine to BOTH tables; the lazy-update discipline applies per
sub-table: the pullback of a QR lookup is two `SparseEmbeddingUpdate`s
(delta scaled by the partner's rows for "mult") with the quotient/remainder
index streams.

`QREmbedding` implements the EmbeddingTable protocol (`spec`/`rows`/
`example`), so `lookup`, `maplookup`, ensembles, and serving accept it
anywhere a table goes; `qr_lookup_vjp` is the fused training entry.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.sparse_update import SparseEmbeddingUpdate
from .types import Dynamic, TableSpec, cdiv


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QREmbedding:
    """Compositional `(vocab, dim)` table backed by two O(sqrt(V)) tables."""

    q_data: jax.Array          # (ceil(vocab / Q), dim_q)
    r_data: jax.Array          # (Q, dim_r)
    spec: TableSpec = dataclasses.field(metadata=dict(static=True))
    num_remainder: int = dataclasses.field(metadata=dict(static=True))
    combine: str = dataclasses.field(metadata=dict(static=True),
                                     default="mult")

    @classmethod
    def create(cls, key: jax.Array, vocab: int, dim: int, *,
               num_remainder: Optional[int] = None, combine: str = "mult",
               dtype=jnp.float32, name: Optional[str] = None
               ) -> "QREmbedding":
        if combine not in ("mult", "add", "concat"):
            raise ValueError(f"combine must be mult|add|concat, got {combine}")
        q = num_remainder or max(2, int(vocab ** 0.5))
        nq = cdiv(vocab, q)
        dq = dr = dim
        if combine == "concat":
            if dim % 2 != 0:
                raise ValueError("concat combine needs an even dim")
            dq = dr = dim // 2
        kq, kr = jax.random.split(key)
        scale = 1.0 / (dim ** 0.5)
        if combine == "mult":
            # Product of two ~N(0, s) factors has scale s^2: seed around 1
            # so products start near a plain table's init scale.
            q_data = 1.0 + scale * jax.random.normal(kq, (nq, dq), dtype)
            r_data = scale * jax.random.normal(kr, (q, dr), dtype)
        else:
            q_data = scale * jax.random.normal(kq, (nq, dq), dtype)
            r_data = scale * jax.random.normal(kr, (q, dr), dtype)
        spec = TableSpec(vocab=vocab, dim=dim, dtype=q_data.dtype,
                         lookup=Dynamic(), name=name)
        return cls(q_data=q_data, r_data=r_data, spec=spec,
                   num_remainder=q, combine=combine)

    # --- EmbeddingTable protocol -------------------------------------------
    @property
    def shape(self):
        return (self.spec.vocab, self.spec.dim)

    @property
    def dtype(self):
        return self.spec.dtype

    def example(self) -> jax.Array:
        return self.q_data

    def split_indices(self, idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
        idx = jnp.asarray(idx)
        q = self.num_remainder
        return (idx // q).astype(jnp.int32), (idx % q).astype(jnp.int32)

    def rows(self, idx: jax.Array) -> jax.Array:
        """Gather + combine: `(..., dim)` for any index shape."""
        qi, ri = self.split_indices(idx)
        qrow = jnp.take(self.q_data, qi, axis=0)
        rrow = jnp.take(self.r_data, ri, axis=0)
        if self.combine == "mult":
            return qrow * rrow
        if self.combine == "add":
            return qrow + rrow
        return jnp.concatenate([qrow, rrow], axis=-1)

    def materialize(self) -> jax.Array:
        """Dense `(vocab, dim)` view (test oracle only)."""
        return self.rows(jnp.arange(self.spec.vocab))

    def compression(self) -> float:
        """Dense-table bytes / QR bytes."""
        dense = self.spec.vocab * self.spec.dim
        return dense / (self.q_data.size + self.r_data.size)

    def scatter_apply(self, idx: jax.Array, delta: jax.Array) -> "QREmbedding":
        """Protocol fallback (SGD-style): route the row delta to both
        sub-tables via the chain rule of the combine."""
        upd_q, upd_r = self._sub_updates(jnp.asarray(idx), delta)
        new_q = self.q_data.at[upd_q.indices].add(
            upd_q.delta.astype(self.q_data.dtype))
        new_r = self.r_data.at[upd_r.indices].add(
            upd_r.delta.astype(self.r_data.dtype))
        return dataclasses.replace(self, q_data=new_q, r_data=new_r)

    # --- training ----------------------------------------------------------
    def _sub_updates(self, idx, delta):
        """Chain rule: per-occurrence deltas for (q_table, r_table)."""
        qi, ri = self.split_indices(idx)
        if self.combine == "mult":
            qrow = jnp.take(self.q_data, qi, axis=0).astype(delta.dtype)
            rrow = jnp.take(self.r_data, ri, axis=0).astype(delta.dtype)
            dq, dr = delta * rrow, delta * qrow
        elif self.combine == "add":
            dq = dr = delta
        else:
            h = self.q_data.shape[1]
            dq, dr = delta[..., :h], delta[..., h:]
        return (SparseEmbeddingUpdate(delta=dq, indices=qi),
                SparseEmbeddingUpdate(delta=dr, indices=ri))


def qr_lookup_vjp(table: QREmbedding, indices) -> Tuple[
        jax.Array, Callable]:
    """QR lookup plus the lazy pullback: `pullback(delta) -> (upd_q, upd_r)`
    — one `SparseEmbeddingUpdate` per sub-table, each flowing through the
    standard fused sparse optimizers against `q_data` / `r_data`.

    Non-reducing `(B,)` indices only (bags reduce AFTER the combine, which
    is not expressible as per-sub-table bag weights for "mult"; reduce
    outside or use non-reduced lookups).
    """
    indices = jnp.asarray(indices)
    if indices.ndim != 1:
        raise ValueError("qr_lookup_vjp takes (B,) indices; reduce bags "
                         "outside the QR combine")
    out = table.rows(indices)

    def pullback(delta: jax.Array):
        return table._sub_updates(indices, delta)

    return out, pullback
