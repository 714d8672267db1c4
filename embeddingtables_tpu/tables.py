"""Embedding table containers.

Reference parity map (all citations into /root/reference):
  - `AbstractEmbeddingTable{S,T}`           -> the `EmbeddingTable` protocol here
    (`src/EmbeddingTables.jl:49-156`)
  - `SimpleEmbedding{S,T,A}`                -> `SimpleEmbedding` (`src/simple.jl:1-57`)
  - `SplitEmbedding{S,T}`                   -> `SplitEmbedding` (`src/split.jl:1-87`)
  - `example` / `destination`               -> `example` / `destination`
    (`src/EmbeddingTables.jl:93`, `src/lookup.jl:19-22`)
  - `columnpointer`/`columnview` row access -> `rows()` (functional gather of
    one-or-more rows; pointer arithmetic has no TPU analog — row access is a
    gather from an HBM-resident array)

Layout note: the reference stores tables column-major `(dim, vocab)` and looks
up *columns*. TPU-native layout is row-major `(vocab, dim)` with the feature
dim last so it maps onto the 128-wide lane dimension. Everything in this
package uses `(vocab, dim)`; `lookup(A, I)[i, :] == A[I[i], :]`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .types import Dynamic, Static, TableSpec, cdiv


def _as_spec(data: jax.Array, lookup: Static | Dynamic | None, name: Optional[str]) -> TableSpec:
    vocab, dim = data.shape
    if lookup is None:
        lookup = Dynamic()
    if isinstance(lookup, Static) and lookup.n != dim:
        # Mirrors the reference constructor validation (`simple.jl:19-26`).
        raise ValueError(
            f"Static feature size {lookup.n} does not match array feature size {dim}"
        )
    return TableSpec(vocab=vocab, dim=dim, dtype=data.dtype, lookup=lookup, name=name)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimpleEmbedding:
    """Minimal table: a thin wrapper over one `(vocab, dim)` array.

    Reference: `SimpleEmbedding` (`src/simple.jl:1-57`). The `Static{N}` /
    `Dynamic` distinction is carried in `spec.lookup` and selects the kernel
    specialization path; results are identical (`test/lookup.jl:70-108`).
    """

    data: jax.Array
    spec: TableSpec = dataclasses.field(metadata=dict(static=True))

    def __init__(self, data, lookup: Static | Dynamic | None = None, *,
                 spec: TableSpec | None = None, name: Optional[str] = None):
        data = jnp.asarray(data) if not isinstance(data, jax.Array) else data
        self.data = data
        self.spec = spec if spec is not None else _as_spec(data, lookup, name)

    # --- EmbeddingTable protocol -------------------------------------------
    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def example(self) -> jax.Array:
        """Prototype array for allocation placement (reference `example`,
        `src/simple.jl:37`). Under XLA, output placement/sharding follows from
        this array's sharding."""
        return self.data

    def rows(self, idx: jax.Array) -> jax.Array:
        """Gather rows `idx` -> `(..., dim)` (reference `columnview` /
        `columnpointer`, `src/simple.jl:40-55`, reinterpreted as a gather)."""
        return jnp.take(self.data, idx, axis=0)

    def replace_data(self, data: jax.Array) -> "SimpleEmbedding":
        return SimpleEmbedding(data, spec=self.spec)

    def scatter_apply(self, idx: jax.Array, delta: jax.Array) -> "SimpleEmbedding":
        """Row-wise add `delta` into rows `idx` (duplicates accumulate)."""
        return self.replace_data(self.data.at[idx].add(delta))

    def zeros_like(self) -> "SimpleEmbedding":
        """Same-shape zero table (reference `zeros`, `src/simple.jl:30-34`)."""
        return self.replace_data(jnp.zeros_like(self.data))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SplitEmbedding:
    """Row-sharded table: a list of equal-height row chunks, last chunk ragged.

    Reference: `SplitEmbedding` (`src/split.jl:1-87`) shards *columns* (its
    storage is `(dim, vocab)`); in our `(vocab, dim)` layout the same
    vocabulary sharding becomes *row* chunks. `rows_per_shard` corresponds to
    the reference's `cols_per_shard` (`src/split.jl:11`).

    The reference's undef-initializer `array` kwarg — its hook for placing
    shards in alternative memory (`src/split.jl:29-46`) — maps to the
    `devices` argument here: each shard may be `jax.device_put` to a
    different device/memory-kind (e.g. `TpuMemorySpace` host offload).
    The true multi-chip path is `parallel.ShardedEmbedding`, which holds one
    array with a `NamedSharding` instead of a Python list.
    """

    shards: List[jax.Array]
    spec: TableSpec = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True), default=0)

    def __init__(self, data=None, rows_per_shard: int | None = None, *,
                 shards: Sequence[jax.Array] | None = None,
                 spec: TableSpec | None = None, devices: Sequence[Any] | None = None,
                 name: Optional[str] = None):
        if shards is not None:
            # Pytree unflatten / internal path.
            self.shards = list(shards)
            self.spec = spec
            self.rows_per_shard = rows_per_shard if rows_per_shard else self.shards[0].shape[0]
            return
        data = jnp.asarray(data)
        vocab, dim = data.shape
        if rows_per_shard is None:
            rows_per_shard = vocab
        if rows_per_shard <= 0:
            raise ValueError("rows_per_shard must be positive")
        nshards = cdiv(vocab, rows_per_shard)
        chunks = []
        for s in range(nshards):
            lo = s * rows_per_shard
            hi = min(vocab, lo + rows_per_shard)
            chunk = data[lo:hi]
            if devices is not None:
                chunk = jax.device_put(chunk, devices[s % len(devices)])
            chunks.append(chunk)
        self.shards = chunks
        self.rows_per_shard = rows_per_shard
        # The reference forces Static for SplitEmbedding (`src/split.jl:20-24`).
        self.spec = spec if spec is not None else TableSpec(
            vocab=vocab, dim=dim, dtype=data.dtype, lookup=Static(dim), name=name)

    # --- EmbeddingTable protocol -------------------------------------------
    @property
    def shape(self):
        return (self.spec.vocab, self.spec.dim)

    @property
    def dtype(self):
        return self.spec.dtype

    @property
    def nshards(self) -> int:
        return len(self.shards)

    def chunkindex(self, idx):
        """Map global row id -> (shard, local row) (reference `chunkindex` /
        `_divrem_index`, `src/split.jl:59-74`)."""
        return idx // self.rows_per_shard, idx % self.rows_per_shard

    def example(self) -> jax.Array:
        # Reference: `example(S) = first(S.data)` (`src/split.jl:57`).
        return self.shards[0]

    def materialize(self) -> jax.Array:
        """Dense `(vocab, dim)` view (test oracle only)."""
        return jnp.concatenate(self.shards, axis=0)

    def rows(self, idx: jax.Array) -> jax.Array:
        """Gather rows across shards: divrem-route each index to its owning
        shard, gather locally, select. Each shard's gather runs where the
        shard lives — the single-host seed of the all-to-all sharded lookup
        (`parallel/sharded.py`)."""
        shard_id, local = self.chunkindex(idx)
        out = None
        for s, chunk in enumerate(self.shards):
            safe_local = jnp.clip(local, 0, chunk.shape[0] - 1)
            got = jnp.take(chunk, safe_local, axis=0)
            mask = (shard_id == s)[..., None]
            picked = jnp.where(mask, got, jnp.zeros_like(got))
            out = picked if out is None else out + picked
        return out

    def replace_shards(self, shards: Sequence[jax.Array]) -> "SplitEmbedding":
        return SplitEmbedding(shards=list(shards), spec=self.spec,
                              rows_per_shard=self.rows_per_shard)

    def scatter_apply(self, idx: jax.Array, delta: jax.Array) -> "SplitEmbedding":
        shard_id, local = self.chunkindex(idx)
        new_shards = []
        for s, chunk in enumerate(self.shards):
            mask = (shard_id == s)[..., None]
            contrib = jnp.where(mask, delta, jnp.zeros_like(delta))
            safe_local = jnp.where(shard_id == s, local, 0)
            new_shards.append(chunk.at[safe_local].add(contrib))
        return self.replace_shards(new_shards)

    def zeros_like(self) -> "SplitEmbedding":
        return self.replace_shards([jnp.zeros_like(s) for s in self.shards])


def is_table(x) -> bool:
    """True for anything implementing the EmbeddingTable protocol: `spec`,
    `rows`, `example` (the minimal surface the reference's `DummyEmbedding`
    extension test exercises, `test/constructors.jl:34-54`)."""
    return hasattr(x, "spec") and hasattr(x, "rows") and hasattr(x, "example")


def as_table(x):
    """Coerce raw `(vocab, dim)` arrays into `SimpleEmbedding` (the reference's
    plain-`AbstractMatrix` oracle path accepts raw matrices, `lookup.jl:5-13`)."""
    if is_table(x):
        return x
    return SimpleEmbedding(jnp.asarray(x))


def example(table) -> jax.Array:
    t = as_table(table)
    return t.example()


def destination(table, indices) -> jax.ShapeDtypeStruct:
    """Output shape for a lookup (reference `destination`, `src/lookup.jl:19-22`).

    Non-reducing `(B,)` indices -> `(B, dim)`; reducing `(B, bag)` -> `(B, dim)`.
    XLA owns allocation, so this returns a ShapeDtypeStruct rather than a
    buffer; placement follows `example(table)`'s sharding."""
    t = as_table(table)
    indices = jnp.asarray(indices)
    if indices.ndim == 1:
        batch = indices.shape[0]
    elif indices.ndim == 2:
        batch = indices.shape[0]
    else:
        raise ValueError(f"indices must be 1-D or 2-D, got {indices.ndim}-D")
    from .types import featuresize
    return jax.ShapeDtypeStruct((batch, featuresize(t)), t.dtype)
