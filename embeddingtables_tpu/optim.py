"""Sparse optimizers: fused, dedup-correct row updates for embedding tables.

Reference parity (citations into /root/reference):
  - `Flux.Optimise.update!(opt::Descent, table, upd::SparseEmbeddingUpdate)`
    (`src/sparseupdate.jl:160-189`)      -> `SparseSGD`
  - the accumulate-per-unique-row-then-one-write discipline
    (`src/sparseupdate.jl:97-129`)       -> dedup path used by stateful
    optimizers here (a requirement, not an optimization, once per-row state
    exists: each unique row's state must advance exactly once per step).

The reference specializes only SGD. Production DLRM training (the workload
this engine serves, `README.md:174-176` in the reference) uses row-wise
AdaGrad for embeddings, so that is provided as well — `SparseRowWiseAdaGrad`
keeps ONE scalar accumulator per vocab row (V floats, not V*D), the standard
memory-frugal variant.

Dense (MLP) parameters use plain optax; these classes exist only for the
sparse/lazy-gradient path where materializing a table-sized gradient would
defeat the point (SURVEY.md §2.4 item 5).

All updates are functional: `apply` returns (new_table_data, new_state).
Under jit with donated buffers XLA performs them in place.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ops.indexer import IndexerResult, flatten_indices, index
from .ops.sparse_update import SparseEmbeddingUpdate


class SparseOptState(NamedTuple):
    """Per-table optimizer state. `accum` is `(vocab,)` for row-wise AdaGrad,
    or a zero-size placeholder for stateless SGD."""

    accum: jax.Array


def _occurrence_grads(upd: SparseEmbeddingUpdate, row_offset: int = 0):
    """Per-occurrence (rows, grad) streams; `row_offset` shifts local table
    rows into a stacked-ensemble global row space. Streaming-repeat bag
    fan-out + optional weights (ops.sparse_update.occurrence_values)."""
    from .ops.sparse_update import occurrence_values
    rows, vals = occurrence_values(upd)
    return rows + row_offset, vals


@dataclasses.dataclass(frozen=True)
class SparseSGD:
    """Stateless sparse SGD: `table[r] -= lr * Σ_{occ of r} delta` — the
    reference's only specialized optimizer (`src/sparseupdate.jl:42-129`).

    SGD is linear in the gradient, so a duplicate-accumulating scatter-add is
    bit-equivalent to the dedup path; the direct scatter is used (one XLA op,
    no sort)."""

    lr: float = 0.01

    def init(self, data: jax.Array) -> SparseOptState:
        return SparseOptState(accum=jnp.zeros((0,), data.dtype))

    def apply(self, data: jax.Array, upd: SparseEmbeddingUpdate,
              state: SparseOptState, *, row_offset: int = 0, lr=None):
        lr = self.lr if lr is None else lr
        rows, g = _occurrence_grads(upd, row_offset)
        new = data.at[rows].add((-lr * g).astype(data.dtype))
        return new, state


@dataclasses.dataclass(frozen=True)
class SparseRowWiseAdaGrad:
    """Row-wise AdaGrad: one scalar accumulator per vocab row.

        G_r   += mean(g_r^2)            (g_r = deduped row gradient)
        row_r -= lr * g_r / sqrt(G_r + eps)

    Stateful, so the dedup discipline is mandatory: all occurrences of a row
    are segment-summed first, then the row and its accumulator are each
    written exactly once (the reference's unique-row single-write contract,
    `src/sparseupdate.jl:97-129`, SURVEY.md §2.4 item 8)."""

    lr: float = 0.01
    eps: float = 1e-8
    initial_accum: float = 0.0
    # Dedup realization: "auto" | "dense" | "indexer".
    #   dense  : scatter-add deltas into a (V, D) f32 gradient buffer, then
    #            ONE fused elementwise table pass applies the row/state
    #            update — exactly-deduped by construction (untouched rows
    #            see g = 0 -> no state advance, no row step), ZERO sorts.
    #            Measured v5e (docs/DESIGN.md §1e): cuts the stacked-DLRM
    #            AdaGrad step from 196 ms to ~its scatter+pass floor.
    #   indexer: the round-1 sort-based path (index + segment_sum +
    #            drop-scatter) — O(n log n) and V-independent; right when
    #            the touched set is tiny relative to the vocabulary or the
    #            (V, D) scratch does not fit.
    #   auto   : dense when the occurrence count is a non-trivial fraction
    #            of the vocab (n * 16 >= V), else indexer.
    method: str = "auto"

    def init(self, data: jax.Array) -> SparseOptState:
        return SparseOptState(
            accum=jnp.full((data.shape[0],), self.initial_accum, jnp.float32))

    def apply(self, data: jax.Array, upd: SparseEmbeddingUpdate,
              state: SparseOptState, *, row_offset: int = 0, lr=None,
              idx_result: Optional[IndexerResult] = None,
              method: str | None = None):
        lr = self.lr if lr is None else lr
        rows, g = _occurrence_grads(upd, row_offset)
        method = method or self.method
        if method == "auto":
            # An explicit idx_result means the caller amortized the sort.
            if idx_result is not None:
                method = "indexer"
            else:
                method = ("dense" if rows.size * 16 >= data.shape[0]
                          else "indexer")
        if method == "dense":
            return self._apply_dense(data, rows, g, state, lr)
        if idx_result is None:
            # Dedup over the (possibly shifted) occurrence stream.
            idx_result = index(rows.reshape(-1))
        n = idx_result.capacity
        acc_g = jax.ops.segment_sum(g.astype(jnp.float32), idx_result.group_of,
                                    num_segments=n)
        active = jnp.arange(n) < idx_result.num_unique
        # Out-of-bounds row id + mode="drop" disables padding lanes.
        target = jnp.where(active, idx_result.unique, data.shape[0])
        g2 = jnp.mean(jnp.square(acc_g), axis=-1)
        new_accum_rows = state.accum[jnp.clip(target, 0, data.shape[0] - 1)] + g2
        step = -lr * acc_g * jax.lax.rsqrt(new_accum_rows + self.eps)[:, None]
        new_data = data.at[target].add(step.astype(data.dtype), mode="drop")
        new_accum = state.accum.at[target].set(new_accum_rows, mode="drop")
        return new_data, SparseOptState(accum=new_accum)

    def _apply_dense(self, data, rows, g, state, lr):
        """Sort-free dedup: one duplicate-accumulating scatter into a dense
        (V, D) f32 gradient, then one fused elementwise pass.

        The accumulate-per-unique-row-then-single-write contract
        (`/root/reference/src/sparseupdate.jl:97-129`) holds exactly: the
        scatter performs the accumulation; the elementwise pass writes each
        row and its state once. Rows with zero gradient are fixed points
        (g = 0 -> accum += 0, row -= 0)."""
        grad = jnp.zeros(data.shape, jnp.float32).at[rows].add(
            g.astype(jnp.float32))
        g2 = jnp.mean(jnp.square(grad), axis=-1)          # (V,)
        new_accum = state.accum + g2
        denom = jax.lax.rsqrt(new_accum + self.eps)
        new_data = (data.astype(jnp.float32)
                    - lr * grad * denom[:, None]).astype(data.dtype)
        return new_data, SparseOptState(accum=new_accum)
