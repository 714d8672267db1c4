"""Lazy sparse gradients and the fused sparse-SGD update.

Reference parity (citations into /root/reference):
  - `SparseEmbeddingUpdate{S,A,I}`       -> `SparseEmbeddingUpdate`
    (`src/sparseupdate.jl:5-16`)
  - `uncompress`                          -> `uncompress` (`src/sparseupdate.jl:18-32`)
  - `update!(opt::Flux.Descent, table, upd, indexer)` fused SGD
                                          -> `sgd_update` (`src/sparseupdate.jl:42-178`)
  - ensemble `update!` two-phase (index all, then update all, disjoint-row
    partitioning)                         -> `ensemble_sgd_update`
    (`src/sparseupdate.jl:191-238`)
  - Flux `Optimise.update!` overload      -> `optim.sparse_descent` optax-style
    transform (`src/sparseupdate.jl:180-189`)

Semantics (SURVEY.md §2.4 items 5, 6, 8, 9):
  - the cotangent of a lookup is `(delta, indices)`, NO scatter at pullback time;
  - duplicate indices accumulate;
  - SGD math: `table[k] -= lr * Σ_{occurrences of k} delta[col]`, with exactly
    one write per unique row on the dedup path;
  - partitioned (IndexerView) updates match the unsplit update.

TPU reinterpretation: the "accumulate in registers then one nontemporal store
per row" CPU kernel becomes (a) a single XLA scatter-add (`.at[idx].add`) —
the measured production path on v5e ("auto", docs/DESIGN.md §1b), (b) the
dedup path: indexer + `segment_sum` + one row-write per unique row
(drop-padded scatter) — required for row-state optimizers, or (c) the Pallas
run-scatter kernel (ops/pallas/scatter.py) realizing the reference's
1-load+1-store-per-unique-row discipline — correct and forceable, but slower
than XLA's scatter on v5e as shipped in round 1 (111 vs 33.6 ms).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .. import config
from ..tables import SimpleEmbedding, SplitEmbedding, as_table, is_table
from .indexer import (DenseIndexer, IndexerResult, IndexerView, SparseIndexer,
                      flatten_indices, index, indexer_view)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseEmbeddingUpdate:
    """Lazy lookup cotangent: `(delta, indices[, weights])` (reference
    `SparseEmbeddingUpdate`, `src/sparseupdate.jl:5-16`).

    delta:   `(B, dim)` per-output gradient rows.
    indices: the original lookup indices — `(B,)` (non-reducing) or `(B, bag)`
             (reducing; one delta row fans out to every row in its bag).
    weights: optional `(B, bag)` per-occurrence scale applied during the
             scatter — carries weighted-bag / mean-combiner gradients
             (beyond the reference's sum-only bags).
    """

    delta: jax.Array
    indices: jax.Array
    weights: Optional[jax.Array] = None

    @property
    def reducing(self) -> bool:
        return self.indices.ndim == 2


def occurrence_values(upd: SparseEmbeddingUpdate) -> tuple:
    """Per-occurrence (rows, values) streams in reference `columns()` order
    (`src/utils.jl:69-83`). Values expand via streaming `jnp.repeat` for bag
    indices (a delta[cols] gather would run at the random-DMA rate); the
    optional per-occurrence weights scale in the same pass."""
    if upd.indices.ndim == 1:
        vals = upd.delta
        if upd.weights is not None:
            vals = vals * upd.weights.reshape(-1, 1).astype(vals.dtype)
        return upd.indices.astype(jnp.int32), vals
    b, bag = upd.indices.shape
    vals = jnp.repeat(upd.delta, bag, axis=0)
    if upd.weights is not None:
        vals = vals * upd.weights.reshape(-1, 1).astype(vals.dtype)
    return upd.indices.reshape(-1).astype(jnp.int32), vals


def accumulate_updates(upds: Sequence[SparseEmbeddingUpdate]
                       ) -> SparseEmbeddingUpdate:
    """Merge K lazy updates into one (gradient accumulation / microbatching).

    Laziness makes this a pure concatenation along the batch axis — no
    scatter, no table-sized buffer, O(Σ B_k · D) — so larger-than-memory
    effective batches cost exactly their occurrence streams. Mixed bag
    widths are not merged (pad externally); mixed weighted/unweighted
    updates promote missing weights to ones.
    """
    if len(upds) == 1:
        return upds[0]
    ndims = {u.indices.ndim for u in upds}
    if len(ndims) != 1:
        raise ValueError("cannot merge reducing and non-reducing updates")
    if ndims == {2} and len({u.indices.shape[1] for u in upds}) != 1:
        raise ValueError("bag widths differ; pad to a common width first")
    delta = jnp.concatenate([u.delta for u in upds], axis=0)
    indices = jnp.concatenate([u.indices for u in upds], axis=0)
    weights = None
    if any(u.weights is not None for u in upds):
        weights = jnp.concatenate(
            [u.weights if u.weights is not None
             else jnp.ones(u.indices.shape, jnp.float32) for u in upds],
            axis=0)
    return SparseEmbeddingUpdate(delta=delta, indices=indices,
                                 weights=weights)


def uncompress(upd: SparseEmbeddingUpdate, num_rows: int,
               dtype=None) -> jax.Array:
    """Scatter-add the lazy update into a dense `(num_rows, dim)` matrix — the
    test oracle (reference `uncompress`, `src/sparseupdate.jl:18-32`, incl.
    the `_maybe_columnview` matrix-index fan-out, `src/utils.jl:85-86`)."""
    rows, vals = occurrence_values(upd)
    if dtype is not None:
        vals = vals.astype(dtype)
    dense = jnp.zeros((num_rows, vals.shape[-1]), dtype=vals.dtype)
    return dense.at[rows].add(vals)


# ---------------------------------------------------------------------------
# Fused SGD update paths
# ---------------------------------------------------------------------------

def _sgd_scatter(data: jax.Array, upd: SparseEmbeddingUpdate, lr) -> jax.Array:
    """Direct scatter path: one XLA scatter-add with duplicate accumulation.
    Mathematically equal to the dedup path for SGD (linear update).

    Measured v5e (loop-variant indices, docs/DESIGN.md §1b): this IS the fast
    path — 33.6 ms at n=1.7M D=128. Pre-sorting does NOT pay (46.1 ms once
    the per-step sort actually executes; an earlier "sorted wins" readout was
    an artifact of XLA hoisting a loop-invariant sort), and the per-occurrence
    Pallas run-scatter measured 111 ms (serialized accumulator)."""
    rows, vals = occurrence_values(upd)
    return data.at[rows].add((-lr * vals).astype(data.dtype))


def _sgd_dedup(data: jax.Array, upd: SparseEmbeddingUpdate, lr,
               idx_result: Optional[IndexerResult] = None,
               view: Optional[IndexerView] = None,
               indexer=None) -> jax.Array:
    """Dedup path: accumulate all gradient columns per *unique* row, then one
    write per unique row (the reference's `_update_specialized_impl!`
    accumulate-then-single-store discipline, `src/sparseupdate.jl:97-129`).

    Required (beyond SGD) for row-state optimizers (AdaGrad etc.), where the
    per-row update must be applied once with the accumulated gradient.
    """
    rows, vals = occurrence_values(upd)
    if idx_result is None:
        idx_result = index(upd.indices, vocab=data.shape[0], indexer=indexer)
    n = idx_result.capacity
    # Segment-accumulate delta columns by insertion-order unique group.
    acc = jax.ops.segment_sum(vals, idx_result.group_of, num_segments=n)
    target = idx_result.unique
    active = jnp.arange(n) < idx_result.num_unique
    if view is not None:
        gidx = jnp.arange(n)
        active = active & (gidx >= view.lo) & (gidx < view.hi)
    # Padding / out-of-view groups scatter with an out-of-bounds row id and
    # mode="drop" (NOT -1: negative indices wrap under JAX semantics).
    target = jnp.where(active, target, data.shape[0])
    return data.at[target].add((-lr * acc).astype(data.dtype), mode="drop")


def sgd_update(table, upd: SparseEmbeddingUpdate, lr, *,
               indexer=None, idx_result: Optional[IndexerResult] = None,
               view: Optional[IndexerView] = None, method: str | None = None):
    """Fused sparse SGD step: returns the updated table (functional analog of
    the reference's in-place `update!`, `src/sparseupdate.jl:160-178`; under
    jit with donated table buffers XLA performs this in place).

    method: None/"auto" -> config; "scatter" | "dedup" | "pallas".
    `view`: restrict to a unique-row partition (IndexerView semantics).
    """
    method = method or config.update_impl()
    t = as_table(table)
    if view is not None and method in ("auto", "scatter"):
        method = "dedup"  # views are defined over unique-row partitions

    if isinstance(t, SimpleEmbedding):
        data = t.data
        # Measured on v5e (2026-08): the direct XLA scatter-add (131 GB/s
        # effective at B=1.7M, D=128) beats the sort-based dedup paths (87
        # GB/s) for SGD on uniform-random indices, so "auto" takes it; the
        # Pallas scatter-FMA stays available by explicit request only — the
        # round-2 probes found no v5e regime where it wins (run-scatter's
        # VMEM accumulator serializes, 111 ms vs scatter's 33.6; skew does
        # NOT help it, docs/DESIGN.md §1b/§1d); kept for other chips.
        if method == "pallas" and upd.weights is not None:
            method = "scatter"  # the legacy pallas entry has no weight path
        if method == "pallas":
            try:
                from .pallas.scatter import scatter_sgd
                if idx_result is None:
                    idx_result = index(upd.indices, vocab=data.shape[0], indexer=indexer)
                rows, cols = flatten_indices(upd.indices)
                new = scatter_sgd(data, upd.delta, idx_result, cols, lr)
                out = t.replace_data(new)
                return out if is_table(table) else out.data
            except NotImplementedError:
                method = "scatter"
        if method in ("auto", "scatter"):
            new = _sgd_scatter(data, upd, lr)
        else:
            new = _sgd_dedup(data, upd, lr, idx_result=idx_result, view=view,
                             indexer=indexer)
        out = t.replace_data(new)
        return out if is_table(table) else out.data

    # Generic protocol tables (SplitEmbedding, user tables): fan the
    # per-occurrence delta through the table's scatter_apply.
    rows, vals = occurrence_values(upd)
    return table.scatter_apply(rows, -lr * vals)


def _split_stateful_apply(opt, t: SplitEmbedding, u: SparseEmbeddingUpdate,
                          state):
    """Stateful optimizer on a SplitEmbedding WITHOUT materializing the
    (V, D) table: route each occurrence to its owning shard (the
    reference's divrem discipline, `src/split.jl:81-86`) and run
    `opt.apply` shard-locally — the reference's disjoint-partition update
    (`src/utils.jl:320-338`) realized as per-shard applies. Peak extra
    memory is O(rows_per_shard * D), never O(V * D).

    Non-owned occurrences can't simply be dropped (static shapes) or
    zero-masked to row 0 (a zero-delta TOUCH still advances stateful
    optimizers — lazy Adam decays a touched row's moments). They are
    instead routed to one SENTINEL padding row appended to the shard
    (fresh zero state), which absorbs every foreign occurrence and is
    stripped after the apply — exact for ANY optimizer semantics.

    State convention: `state` is the full-table pytree (leaves with
    leading dim == vocab are row-wise and get shard-sliced; anything else
    — Adam's scalar count — is passed whole to every shard and taken back
    from the first shard's output, all shards computing the same value).

    Cost: the Python loop traces S (= num_shards) optimizer-apply programs
    into one jit, and every shard's apply consumes the FULL occurrence
    stream (foreign occurrences routed to its sentinel row) — O(S · n_occ)
    stream work plus S scatter programs. Fine at the reference's test
    widths (S ≤ 50); for production sharding use
    `parallel.ShardedStackedTables`, where disjoint ownership comes from
    the mesh and each shard processes the stream once.
    """
    vocab, dim = t.spec.vocab, t.spec.dim
    rps = t.rows_per_shard
    # One shard-id divmod for the whole stream (the reference's
    # `_divrem_index` discipline, `src/split.jl:81-86`) instead of a
    # two-comparison range mask per shard.
    shard_of = (u.indices // rps).astype(jnp.int32)

    def rowwise(leaf):
        shape = getattr(leaf, "shape", ())
        return len(shape) >= 1 and shape[0] == vocab and vocab > 1

    new_shards, out_state_slices = [], []
    first_out_state = None
    for si, shard in enumerate(t.shards):
        lo = si * rps
        nrows = shard.shape[0]
        sentinel = nrows  # one appended padding row absorbs foreign occs
        lidx = jnp.where(shard_of == si, u.indices - lo,
                         sentinel).astype(jnp.int32)
        lupd = SparseEmbeddingUpdate(delta=u.delta, indices=lidx,
                                     weights=u.weights)
        pad_row = jnp.zeros((1, dim), shard.dtype)
        sdata = jnp.concatenate([shard, pad_row], axis=0)
        sstate = jax.tree_util.tree_map(
            lambda l: jnp.concatenate(
                [l[lo:lo + nrows],
                 jnp.zeros((1,) + l.shape[1:], l.dtype)], axis=0)
            if rowwise(l) else l, state)
        new_data, ns = opt.apply(sdata, lupd, sstate)
        new_shards.append(new_data[:nrows])
        out_state_slices.append(jax.tree_util.tree_map(
            lambda nl, ol: nl[:nrows] if rowwise(ol) else nl, ns, state))
        if first_out_state is None:
            first_out_state = out_state_slices[-1]
    new_state = jax.tree_util.tree_map(
        lambda ol, first, *slices: (jnp.concatenate(slices, axis=0)
                                    if rowwise(ol) else first),
        state, first_out_state, *out_state_slices)
    nt = SplitEmbedding(shards=new_shards, rows_per_shard=rps, spec=t.spec)
    return nt, new_state


def ensemble_update(opt, tables: Sequence, upds: Sequence[SparseEmbeddingUpdate],
                    states: Sequence | None = None, *, telemetry_cb=None):
    """Multi-table sparse update with ANY sparse optimizer (`optim.SparseSGD`,
    `SparseRowWiseAdaGrad`, ...) — the generic form of the reference's
    ensemble `update!` (`src/sparseupdate.jl:191-238`), which only
    specializes SGD. Returns (new_tables, new_states).

    Keeps the reference's two-phase shape: all per-table work is independent
    ops in one jitted program (XLA schedules them concurrently), with the
    `telemetry_cb` hook preserved between phases.
    """
    from ..optim import SparseOptState
    if len(tables) != len(upds):
        raise ValueError("tables and updates must have equal length")
    ts = [as_table(t) for t in tables]
    if states is None:
        states = [opt.init(t.data if isinstance(t, SimpleEmbedding)
                           else t.rows(jnp.arange(t.spec.vocab)))
                  for t in ts]
    if telemetry_cb is not None:
        telemetry_cb()
    new_tables, new_states = [], []
    for t, u, s in zip(ts, upds, states):
        if isinstance(t, SimpleEmbedding):
            new_data, ns = opt.apply(t.data, u, s)
            nt = t.replace_data(new_data)
        else:
            # Protocol tables (SplitEmbedding, user tables) expose only a
            # scatter — safe for PLAIN stateless SGD (linear update), but a
            # stateful optimizer routed through it would silently run plain
            # SGD with unchanged state, and a REGULARIZED SGD would
            # silently drop its decay/clip (both wrong math).
            stateless = getattr(getattr(s, "accum", None), "size", None) == 0
            plain = (stateless and hasattr(opt, "lr")
                     and getattr(opt, "weight_decay", 0.0) == 0.0
                     and getattr(opt, "clipnorm", None) is None)
            if plain:
                rows, vals = occurrence_values(u)
                nt = t.scatter_apply(rows, -opt.lr * vals)
                ns = s
            elif isinstance(t, SplitEmbedding):
                nt, ns = _split_stateful_apply(opt, t, u, s)
            else:
                raise TypeError(
                    f"{type(opt).__name__} is stateful or regularized; "
                    f"applying it through {type(t).__name__}'s scatter "
                    "protocol would silently degrade to plain SGD. Use a "
                    "SimpleEmbedding/SplitEmbedding, or "
                    "parallel.ShardedStackedTables for sharded tables.")
        new_tables.append(nt)
        new_states.append(ns)
    return new_tables, new_states


def ensemble_sgd_update(tables: Sequence, upds: Sequence[SparseEmbeddingUpdate],
                        lr, *, indexer=None, num_splits: int = 4,
                        telemetry_cb=None, method: str | None = None):
    """Multi-table sparse SGD (reference ensemble `update!`,
    `src/sparseupdate.jl:191-238`).

    Reference structure: phase 1 indexes every table, `telemetry_cb()` fires,
    phase 2 applies partitioned updates with disjoint unique-row ownership.
    Here phase parallelism is XLA's job — all per-table updates are
    independent ops in one jitted program — but the two-phase shape and the
    telemetry hook are preserved. `num_splits` is accepted for API parity
    (partitioning happens inside the kernels' grids).
    """
    if len(tables) != len(upds):
        raise ValueError("tables and updates must have equal length")
    idx_results = None
    if (method or config.update_impl()) in ("dedup", "pallas"):
        idx_results = [index(u.indices, vocab=as_table(t).spec.vocab, indexer=indexer)
                       for t, u in zip(tables, upds)]
    if telemetry_cb is not None:
        telemetry_cb()
    out = []
    for i, (t, u) in enumerate(zip(tables, upds)):
        ir = idx_results[i] if idx_results is not None else None
        out.append(sgd_update(t, u, lr, idx_result=ir, method=method))
    return out
