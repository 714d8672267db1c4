"""Ensemble (multi-table) lookup: `maplookup` + execution strategies.

Reference parity (citations into /root/reference/src/lookup.jl):
  - `maplookup` / `maplookup!`              -> `maplookup` (`lookup.jl:186-371`)
  - `DefaultStrategy` (sequential map)       -> `DefaultStrategy` (`lookup.jl:219-241`)
  - `SimpleParallelStrategy` (thread/table)  -> `SimpleParallelStrategy`
    (`lookup.jl:262-276`): on TPU the per-table lookups are independent XLA
    ops inside one jitted program — XLA's scheduler IS the thread pool; for
    the real single-kernel win use `StackedTables` below.
  - `PreallocationStrategy{U}(prependrows)`  -> `PreallocationStrategy`
    (`lookup.jl:279-371`): one fused `(B, prependrows + Σ dim_i)` output with
    per-table feature-offset slices; the prepend region is reserved for the
    DLRM dense-tower output (zero-filled here — XLA has no "uninitialized").
  - `ColumnWrap` / `colwrap` index-container polymorphism -> `normalize_indices`
    (`lookup.jl:194-213`)
  - `Slicer`                                 -> `Slicer` (`src/utils.jl:50-63`)
  - rrules for maplookup                     -> `maplookup_vjp`
    (`lookup.jl:246-258,374-389`)

TPU-native addition: `StackedTables` — same-width tables concatenated along
the vocab axis at construction time, so an N-table ensemble lookup is ONE
offset-shifted gather (the survey's "batch all same-shape tables into one
stacked kernel" mapping, SURVEY.md §2.3). This is the analog of the
reference's inter-table parallelism, redesigned for XLA rather than threads.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..tables import SimpleEmbedding, as_table
from ..types import featuresize
from .lookup import effective_weights, lookup
from .sparse_update import SparseEmbeddingUpdate


# ---------------------------------------------------------------------------
# Execution strategies (reference `AbstractExecutionStrategy`, lookup.jl:186-192)
# ---------------------------------------------------------------------------

class AbstractExecutionStrategy:
    pass


@dataclasses.dataclass(frozen=True)
class DefaultStrategy(AbstractExecutionStrategy):
    """Sequential per-table map (`lookup.jl:219-241`)."""


@dataclasses.dataclass(frozen=True)
class SimpleParallelStrategy(AbstractExecutionStrategy):
    """One task per table (`lookup.jl:262-276`). Under jit all per-table
    gathers are already independent; XLA schedules them concurrently."""


@dataclasses.dataclass(frozen=True)
class PreallocationStrategy(AbstractExecutionStrategy):
    """Fused-output strategy (`lookup.jl:279-314`).

    prependrows: number of feature slots reserved at the *front* of the fused
    output (the reference reserves leading rows in its column-major layout,
    `lookup.jl:288-291`; in our row-major layout these are leading features).
    dtype: optional output eltype override (reference `PreallocationStrategy{U}`
    `_select_eltype`, `lookup.jl:293-294`).
    """

    prependrows: int = 0
    dtype: Optional[jnp.dtype] = None


# ---------------------------------------------------------------------------
# Index-container normalization (reference ColumnWrap/colwrap)
# ---------------------------------------------------------------------------

def normalize_indices(indices, ntables: int) -> List[jax.Array]:
    """Accepts the reference's four index container shapes (`README.md:103-109`,
    `lookup.jl:211-213`, SURVEY.md §2.4 item 3), transposed to row-major:

      - list/tuple of `(B,)` vectors          (vec-of-vec)
      - list/tuple of `(B, bag)` matrices     (vec-of-matrix)
      - one `(T, B)` array: row t -> table t  (reference: matrix, column j ->
        table j; Julia columns are our rows)
      - one `(T, B, bag)` array: slice t -> table t (reference: 3-D array)
    """
    if isinstance(indices, (list, tuple)):
        if len(indices) != ntables:
            raise ValueError(f"got {len(indices)} index sets for {ntables} tables")
        return [jnp.asarray(i) for i in indices]
    arr = jnp.asarray(indices)
    if arr.ndim == 2:
        if arr.shape[0] != ntables:
            raise ValueError(
                f"index array has leading dim {arr.shape[0]}, expected {ntables}")
        return [arr[t] for t in range(ntables)]
    if arr.ndim == 3:
        if arr.shape[0] != ntables:
            raise ValueError(
                f"index array has leading dim {arr.shape[0]}, expected {ntables}")
        return [arr[t] for t in range(ntables)]
    raise ValueError(f"unsupported index container with ndim={arr.ndim}")


def normalize_weights(weights, ntables: int) -> List[Optional[jax.Array]]:
    """Per-table bag weights in the same container shapes as the indices:
    None, a list/tuple of per-table `(B, bag)` arrays (None entries allowed),
    or one `(T, B, bag)` array."""
    if weights is None:
        return [None] * ntables
    if isinstance(weights, (list, tuple)):
        if len(weights) != ntables:
            raise ValueError(
                f"got {len(weights)} weight sets for {ntables} tables")
        return [None if w is None else jnp.asarray(w) for w in weights]
    arr = jnp.asarray(weights)
    if arr.ndim != 3 or arr.shape[0] != ntables:
        raise ValueError(
            f"weights array must be (T, B, bag) with T={ntables}, "
            f"got shape {arr.shape}")
    return [arr[t] for t in range(ntables)]


class Slicer:
    """Stateful feature-offset slicer used to carve the fused delta back into
    per-table slices (reference `Slicer`, `src/utils.jl:50-63`; exported,
    `EmbeddingTables.jl:18`)."""

    def __init__(self, start: int = 0, step: int = 1):
        self.offset = start
        self.step = step

    def __call__(self, width: int, arr: jax.Array) -> jax.Array:
        sl = jax.lax.slice_in_dim(arr, self.offset, self.offset + width, axis=-1)
        self.offset += width * self.step
        return sl


# ---------------------------------------------------------------------------
# maplookup
# ---------------------------------------------------------------------------

def maplookup(strategy_or_tables, tables_or_indices=None, maybe_indices=None,
              *, combiner: str = "sum", weights=None,
              pad_idx: int | None = None):
    """`maplookup([strategy], tables, indices)` (reference `lookup.jl:186-371`).

    Without a strategy, DefaultStrategy is used (`lookup.jl:219`).
    Returns: list of `(B, dim_i)` for Default/SimpleParallel; a single fused
    `(B, prependrows + Σ dim_i)` array for PreallocationStrategy.

    combiner/weights/pad_idx extend the single-table `lookup` contract to the
    ensemble entry point (the reference is sum-only fixed bags,
    `README.md:22-25`): `combiner` applies to every table's bags; `weights`
    accepts the same per-table container shapes as the indices (see
    `normalize_weights`); `pad_idx` is the shared padding sentinel for
    variable-length bags (see `lookup`).
    """
    strategy, tables, indices = _parse_args(strategy_or_tables, tables_or_indices,
                                            maybe_indices)
    if isinstance(tables, StackedTables):
        return _maplookup_stacked(strategy, tables, indices,
                                  combiner=combiner, weights=weights,
                                  pad_idx=pad_idx)
    tables = list(tables)
    idx = normalize_indices(indices, len(tables))
    w = normalize_weights(weights, len(tables))
    outs = [lookup(t, i, combiner=combiner, weights=wt, pad_idx=pad_idx)
            for t, i, wt in zip(tables, idx, w)]
    if isinstance(strategy, PreallocationStrategy):
        return _fuse_outputs(strategy, tables, outs)
    return outs


def _parse_args(a, b, c):
    if isinstance(a, AbstractExecutionStrategy):
        return a, b, c
    return DefaultStrategy(), a, b


def _fuse_outputs(strategy: PreallocationStrategy, tables, outs):
    dtype = strategy.dtype or jnp.result_type(*[o.dtype for o in outs])
    batch = outs[0].shape[0]
    pieces = []
    if strategy.prependrows:
        # Reference leaves these *uninitialized* (`lookup.jl:336-340`) for the
        # caller (DLRM dense tower) to fill; we zero-fill — in the fused DLRM
        # model the dense output is written here instead (models/dlrm.py).
        pieces.append(jnp.zeros((batch, strategy.prependrows), dtype=dtype))
    pieces.extend(o.astype(dtype) for o in outs)
    return jnp.concatenate(pieces, axis=-1)


def maplookup_vjp(strategy_or_tables, tables_or_indices=None, maybe_indices=None,
                  *, combiner: str = "sum", weights=None,
                  pad_idx: int | None = None
                  ) -> Tuple[object, Callable]:
    """Ensemble lookup plus the lazy pullback.

    - Default/SimpleParallel (`rrule`, `lookup.jl:247-258`): pullback maps the
      per-table deltas to a list of `SparseEmbeddingUpdate`s.
    - Preallocation (`rrule`, `lookup.jl:374-389`): pullback carves the fused
      delta into per-table feature slices with a `Slicer` starting at
      `prependrows` — views in the reference; XLA slices fuse to views here.

    combiner/weights match `maplookup`; each table's combiner folds into its
    update's per-occurrence weights (`lookup.effective_weights`), so the
    ensemble pullback contract matches the single-table `lookup_vjp`.
    """
    strategy, tables, indices = _parse_args(strategy_or_tables, tables_or_indices,
                                            maybe_indices)
    out = maplookup(strategy, tables, indices, combiner=combiner,
                    weights=weights, pad_idx=pad_idx)
    if isinstance(tables, StackedTables):
        ntables = tables.ntables
        dims = [tables.dim] * ntables
    else:
        ntables = len(tables)
        dims = [featuresize(as_table(t)) for t in tables]
    idx = normalize_indices(indices, ntables)
    w = normalize_weights(weights, ntables)
    effs = [effective_weights(i, combiner, wt, pad_idx)
            for i, wt in zip(idx, w)]

    if isinstance(strategy, PreallocationStrategy):
        def pullback(delta: jax.Array) -> List[SparseEmbeddingUpdate]:
            slicer = Slicer(strategy.prependrows)
            return [SparseEmbeddingUpdate(delta=slicer(d, delta), indices=i,
                                          weights=e)
                    for d, i, e in zip(dims, idx, effs)]
    else:
        def pullback(deltas: Sequence[jax.Array]) -> List[SparseEmbeddingUpdate]:
            return [SparseEmbeddingUpdate(delta=d, indices=i, weights=e)
                    for d, i, e in zip(deltas, idx, effs)]

    return out, pullback


# ---------------------------------------------------------------------------
# StackedTables: the TPU-native ensemble container
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedTables:
    """N same-width tables concatenated along the vocab axis into one
    `(Σ vocab_i, dim)` array, with static per-table row offsets.

    An ensemble lookup becomes ONE gather with offset-shifted indices — the
    idiomatic XLA replacement for the reference's thread-per-table
    `SimpleParallelStrategy` (SURVEY.md §2.3 row 1), and the layout that the
    sharded all-to-all path (parallel/sharded.py) shards row-wise.
    """

    data: jax.Array
    offsets: tuple = dataclasses.field(metadata=dict(static=True))  # len T+1
    dim: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def stack(cls, tables: Sequence) -> "StackedTables":
        ts = [as_table(t) for t in tables]
        dims = {t.spec.dim for t in ts}
        if len(dims) != 1:
            raise ValueError(f"StackedTables requires equal feature dims, got {dims}")
        datas = [t.data if isinstance(t, SimpleEmbedding) else
                 t.rows(jnp.arange(t.spec.vocab)) for t in ts]
        offs, acc = [0], 0
        for d in datas:
            acc += d.shape[0]
            offs.append(acc)
        return cls(data=jnp.concatenate(datas, axis=0), offsets=tuple(offs),
                   dim=ts[0].spec.dim)

    @property
    def ntables(self) -> int:
        return len(self.offsets) - 1

    @property
    def vocabs(self) -> tuple:
        return tuple(self.offsets[i + 1] - self.offsets[i]
                     for i in range(self.ntables))

    def shift_indices(self, idx_list: Sequence[jax.Array]) -> jax.Array:
        """Per-table local indices -> global rows in the stacked array.
        Stacks to `(T, B[, bag])`."""
        shifted = [jnp.asarray(i) + self.offsets[t] for t, i in enumerate(idx_list)]
        return jnp.stack(shifted, axis=0)

    def table(self, t: int) -> SimpleEmbedding:
        return SimpleEmbedding(self.data[self.offsets[t]:self.offsets[t + 1]])


def _maplookup_stacked(strategy, st: StackedTables, indices, *,
                       combiner: str = "sum", weights=None,
                       pad_idx: int | None = None):
    idx = normalize_indices(indices, st.ntables)
    pad_mask_1d = None
    if pad_idx is not None:
        # Pad detection must precede the offset shift (a shifted pad value
        # would no longer match the sentinel). Remap pads to local row 0 so
        # the shifted gather stays in-bounds, then mask them out: folded
        # into the bag weights (2-D) or applied to the gathered rows (1-D).
        valid = [jnp.asarray(i) != pad_idx for i in idx]
        idx = [jnp.where(v, jnp.asarray(i), 0) for v, i in zip(valid, idx)]
        w0 = normalize_weights(weights, st.ntables)
        if idx[0].ndim == 2:
            weights = [v.astype(jnp.float32) if wt is None
                       else jnp.asarray(wt).astype(jnp.float32) *
                       v.astype(jnp.float32)
                       for v, wt in zip(valid, w0)]
        else:
            pad_mask_1d = jnp.stack(
                [v.astype(jnp.float32) for v in valid], axis=0)  # (T, B)
    g = st.shift_indices(idx)  # (T, B) or (T, B, bag)
    w = normalize_weights(weights, st.ntables)
    flat_w = None
    if g.ndim == 2:
        flat = g.reshape(-1)
    else:
        flat = g.reshape(-1, g.shape[-1])
        if any(wt is not None for wt in w):
            flat_w = jnp.concatenate(
                [jnp.asarray(wt) if wt is not None
                 else jnp.ones(g.shape[1:], jnp.float32) for wt in w], axis=0)
    out = lookup(SimpleEmbedding(st.data), flat, combiner=combiner,
                 weights=flat_w)  # (T*B, dim) in ONE gather
    if pad_mask_1d is not None:
        out = out * pad_mask_1d.reshape(-1, 1).astype(out.dtype)
    b = g.shape[1]
    per_table = out.reshape(st.ntables, b, st.dim)
    if isinstance(strategy, PreallocationStrategy):
        dtype = strategy.dtype or out.dtype
        fused = jnp.transpose(per_table, (1, 0, 2)).reshape(b, st.ntables * st.dim)
        if strategy.prependrows:
            fused = jnp.concatenate(
                [jnp.zeros((b, strategy.prependrows), dtype=dtype),
                 fused.astype(dtype)], axis=-1)
        return fused.astype(dtype)
    return [per_table[t] for t in range(st.ntables)]
