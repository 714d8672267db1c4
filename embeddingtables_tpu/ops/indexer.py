"""Indexer: gradient-index deduplication into a CSR-like structure.

Reference parity (citations into /root/reference/src/utils.jl):
  - `Indexer` + `index!` (histogram!/prefixsum!/remap!)  -> `index` here
    (`utils.jl:65-314`)
  - `SparseIndexer` (Dictionary histogram, huge vocab)    -> `SparseIndexer`:
    sort-based dedup, cost O(n log n), vocab-independent
  - `DenseIndexer` (vocab-sized Vector histogram)         -> `DenseIndexer`:
    vocab-sized scatter histogram, cost O(V log V + n)
  - `columns()` iterator (matrix indices fan out one delta column to many
    rows, `utils.jl:69-83`)                               -> flattening of
    `(B, bag)` indices with per-occurrence delta-column ids
  - `IndexerView` (disjoint unique-row partitions for parallel update,
    `utils.jl:320-338`)                                    -> `indexer_view`

Behavioral contract (SURVEY.md §2.4 item 11): unique rows are ordered by
*first occurrence* in the index stream, and within a row, occurrences keep
stream order (`utils.jl:178-180`, `test/misc.jl:74-109`).

TPU reinterpretation: the reference's hash/array histogram is a CPU idiom;
here everything is static-shaped, jit-compiled XLA (stable sort + scatter-min
+ rank). Output arrays are padded to `n = total occurrences` (the max possible
number of unique rows); `num_unique` carries the dynamic count.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..types import cdiv


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IndexerResult:
    """CSR-like dedup structure. With `n` = total index occurrences:

    unique:     (n,) int32 — unique row ids in first-occurrence order;
                entries >= num_unique are the padding sentinel -1.
    num_unique: ()  int32 — dynamic number of unique rows.
    offsets:    (n+1,) int32 — CSR offsets: occurrences of unique[g] live at
                map[offsets[g]:offsets[g+1]] (reference `cumulative`,
                `utils.jl:170-239`).
    map:        (n,) int32 — occurrence -> gradient-column id, grouped by
                unique row, stream order within a row (reference `map`,
                `utils.jl:242-272`).
    group_of:   (n,) int32 — per-occurrence (stream order) insertion-rank
                group id; the inverse view of `map`, used for segment-sum
                accumulation on TPU.
    """

    unique: jax.Array
    num_unique: jax.Array
    offsets: jax.Array
    map: jax.Array
    group_of: jax.Array

    @property
    def capacity(self) -> int:
        return self.unique.shape[0]


def flatten_indices(indices: jax.Array):
    """Flatten a `(B,)` or `(B, bag)` index container into per-occurrence
    `(rows, cols)` streams, where `cols[o]` is the gradient-column (output
    row, in our layout) that occurrence `o` fans out from.

    Mirrors the reference `columns()` iterator (`utils.jl:69-83`): with matrix
    indices, one delta column touches every row in its bag. Stream order is
    the reference's column-major iteration order: all bag entries of output 0,
    then output 1, ... (`utils.jl:74-79`).
    """
    indices = jnp.asarray(indices)
    if indices.ndim == 1:
        n = indices.shape[0]
        cols = jnp.arange(n, dtype=jnp.int32)
        return indices.astype(jnp.int32), cols
    if indices.ndim == 2:
        b, bag = indices.shape
        rows = indices.reshape(-1).astype(jnp.int32)
        cols = jnp.repeat(jnp.arange(b, dtype=jnp.int32), bag)
        return rows, cols
    raise ValueError(f"indices must be 1-D or 2-D, got shape {indices.shape}")


def _index_from_value_groups(rows, cols, gid_val, perm, is_start, sorted_rows):
    """Shared tail: given value-ordered group ids over the sorted stream,
    re-rank groups by first occurrence and emit the CSR structure."""
    n = rows.shape[0]
    arange = jnp.arange(n, dtype=jnp.int32)

    num_unique = is_start.sum().astype(jnp.int32)

    # First stream position of each value-ordered group (scatter-min; the
    # stable sort guarantees perm is ascending within a group).
    firstpos_val = jnp.full((n,), n, dtype=jnp.int32).at[gid_val].min(perm.astype(jnp.int32))

    # Insertion rank of each value-ordered group: sort groups by first stream
    # position (padding groups have firstpos == n and sink to the end).
    order = jnp.argsort(firstpos_val)
    rank = jnp.argsort(order).astype(jnp.int32)

    gid_ins = rank[gid_val]                        # sorted-occurrence -> insertion group

    # unique row ids in insertion order, padded with -1.
    unique = jnp.full((n,), -1, dtype=jnp.int32).at[gid_ins].max(sorted_rows)
    unique = jnp.where(arange < num_unique, unique, -1)

    # counts per insertion group -> CSR offsets.
    counts = jnp.zeros((n,), dtype=jnp.int32).at[gid_ins].add(1)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])

    # Position of each sorted occurrence inside its group (stream order kept
    # by stability), then scatter its gradient-column id to the CSR slot.
    start_sorted = jnp.full((n,), n, dtype=jnp.int32).at[gid_val].min(arange)
    within = arange - start_sorted[gid_val]
    dest = offsets[gid_ins] + within
    map_ = jnp.zeros((n,), dtype=jnp.int32).at[dest].set(cols[perm])

    # Per-occurrence group id back in stream order.
    group_of = jnp.zeros((n,), dtype=jnp.int32).at[perm].set(gid_ins)

    return IndexerResult(unique=unique, num_unique=num_unique, offsets=offsets,
                         map=map_, group_of=group_of)


@dataclasses.dataclass(frozen=True)
class SparseIndexer:
    """Sort-based dedup — vocab-size independent (reference `SparseIndexer`'s
    Dictionary histogram role, `utils.jl:285-295`)."""

    def __call__(self, indices: jax.Array, vocab: int | None = None) -> IndexerResult:
        rows, cols = flatten_indices(indices)
        n = rows.shape[0]
        perm = jnp.argsort(rows, stable=True)
        sorted_rows = rows[perm]
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_rows[1:] != sorted_rows[:-1]])
        gid_val = (jnp.cumsum(is_start) - 1).astype(jnp.int32)
        return _index_from_value_groups(rows, cols, gid_val, perm, is_start, sorted_rows)


@dataclasses.dataclass(frozen=True)
class DenseIndexer:
    """Vocab-sized scatter histogram — good for small vocab (reference
    `DenseIndexer`, `utils.jl:296-304`). Requires `vocab`."""

    def __call__(self, indices: jax.Array, vocab: int) -> IndexerResult:
        rows, cols = flatten_indices(indices)
        n = rows.shape[0]
        arange = jnp.arange(n, dtype=jnp.int32)
        # Histogram over the full vocab (the DenseIndexer idea), then assign
        # each row a dense value-ordered group id via cumsum over the vocab.
        hist = jnp.zeros((vocab,), jnp.int32).at[rows].add(1)
        appeared = hist > 0
        gid_of_row = (jnp.cumsum(appeared) - 1).astype(jnp.int32)  # row -> value group
        perm = jnp.argsort(rows, stable=True)
        sorted_rows = rows[perm]
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_rows[1:] != sorted_rows[:-1]])
        gid_val = gid_of_row[sorted_rows]
        return _index_from_value_groups(rows, cols, gid_val, perm, is_start, sorted_rows)


# Default indexer (the reference's `Indexer()` constructor defaults to the
# dictionary-backed sparse flavor, `utils.jl:285-291`).
Indexer = SparseIndexer


def index(indices: jax.Array, vocab: int | None = None,
          indexer: SparseIndexer | DenseIndexer | None = None) -> IndexerResult:
    """Build the dedup structure for an index container (reference `index!`,
    `utils.jl:306-314`). Functional: no preallocated state to reuse — XLA owns
    buffers (the reference's `shallow_empty!` reuse dance is allocator work
    jit does for us)."""
    if indexer is None:
        indexer = SparseIndexer()
    if isinstance(indexer, DenseIndexer):
        if vocab is None:
            raise ValueError("DenseIndexer requires vocab")
        return indexer(indices, vocab)
    return indexer(indices, vocab)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IndexerView:
    """A contiguous slice of the unique-row range — the unit of intra-table
    parallel update in the reference (`IndexerView`, `utils.jl:320-338`):
    split by unique rows so writers never collide.

    On TPU this partitioning happens inside the scatter kernel's grid; the
    view exists for API parity and for the partition-equivalence test
    (`test/update.jl:90-120`).
    """

    parent: IndexerResult
    lo: jax.Array  # inclusive unique-group index
    hi: jax.Array  # exclusive


def indexer_view(result: IndexerResult, num_splits: int, j: int) -> IndexerView:
    """Split the (dynamic) unique range into `num_splits` chunks; chunk `j`.
    Chunk boundaries follow the reference's `cdiv` split of the unique count
    (`utils.jl:326-333`)."""
    per = cdiv_dynamic(result.num_unique, num_splits)
    lo = jnp.minimum(per * j, result.num_unique)
    hi = jnp.minimum(per * (j + 1), result.num_unique)
    return IndexerView(parent=result, lo=lo, hi=hi)


def cdiv_dynamic(a, b):
    return -(-a // b)
