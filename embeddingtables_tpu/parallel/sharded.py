"""Sharded tables: vocab-row sharding + all-to-all-style exchange.

The reference's only sharding seed is the single-node `SplitEmbedding`
(`/root/reference/src/split.jl`) and its disjoint-ownership update discipline
(`src/utils.jl:320-338`). This module is the multi-chip realization
(SURVEY.md §2.3 "TP"/"EP" rows and §5 "Distributed communication backend"):

  - Tables (or a whole ensemble, stacked) are **mod-row-sharded** over a mesh
    axis: global row `r` lives on device `r % n` at local slot `r // n`.
    Mod (round-robin) sharding load-balances skewed vocabularies — every
    device owns `1/n` of every table — which block sharding does not.
  - Lookup exchange (v1 scheme): `all_gather` the batch's indices along the
    axis, gather owned rows locally (non-owned rows contribute zeros), then
    `psum_scatter` the partial embeddings so each device ends with exactly
    its batch shard. Communication = one index all-gather + one (B, D)
    reduce-scatter, all over ICI.
  - Update: `all_gather` the (delta, indices) lazy update, then each device
    scatter-adds only the rows it owns. Disjoint ownership gives race-freedom
    by construction — the same philosophy as the reference's IndexerView
    partitioning, with the partition now being the physical shard.

Everything here is `shard_map`-based and jit-compatible; tests run it on the
8-device virtual CPU mesh.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ensemble import StackedTables, normalize_indices, normalize_weights
from ..ops.sparse_update import SparseEmbeddingUpdate
from ..tables import SimpleEmbedding, as_table
from ..types import cdiv


# ---------------------------------------------------------------------------
# Sharded container
# ---------------------------------------------------------------------------

def _axes_tuple(axis) -> tuple:
    return (axis,) if isinstance(axis, str) else tuple(axis)


def _flat_axis_index(axes: tuple):
    """Flattened device id over one or more mesh axes (row-major)."""
    me = jax.lax.axis_index(axes[0])
    for a in axes[1:]:
        me = me * jax.lax.axis_size(a) + jax.lax.axis_index(a)
    return me


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedStackedTables:
    """A (stacked) table mod-row-sharded over one or more mesh axes.

    data:    `(n_shards, rows_per_shard, dim)` with the leading axis sharded
             `P(axes)` — flattened device d holds `data[d]`, which stores
             every global row `r` with `r % n == d` at local slot `r // n`.
    offsets: per-table global row offsets into the stacked vocab (static).
    vocab:   total (unpadded) stacked vocab.
    axis:    mesh axis name (or tuple of names) the shards live on. A tuple
             realizes the 2-D (data x model) decomposition: vocab rows are
             sharded over the *product* of the axes while the batch stays
             sharded over just the data axis.
    """

    data: jax.Array
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    vocab: int = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))
    axis: str | tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def axes(self) -> tuple:
        return _axes_tuple(self.axis)

    @property
    def n_shards(self) -> int:
        return self.data.shape[0]

    @property
    def ntables(self) -> int:
        return len(self.offsets) - 1

    @classmethod
    def shard(cls, mesh: Mesh, axis: str, tables, pad_value=0.0
              ) -> "ShardedStackedTables":
        """Stack `tables` (a list of tables/arrays, a StackedTables, or one
        table) along the vocab axis and mod-shard the rows over `mesh[axis]`."""
        if isinstance(tables, StackedTables):
            st = tables
        elif isinstance(tables, (list, tuple)):
            st = StackedTables.stack(tables)
        else:
            t = as_table(tables)
            st = StackedTables(data=t.data if isinstance(t, SimpleEmbedding)
                               else t.rows(jnp.arange(t.spec.vocab)),
                               offsets=(0, t.spec.vocab), dim=t.spec.dim)
        axes = _axes_tuple(axis)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        vocab, dim = st.data.shape
        v_pad = cdiv(vocab, n) * n
        data = jnp.pad(st.data, ((0, v_pad - vocab), (0, 0)),
                       constant_values=pad_value)
        # Row permutation: global row r -> (r % n, r // n).
        data = data.reshape(v_pad // n, n, dim).transpose(1, 0, 2)
        data = jax.device_put(data, NamedSharding(mesh, P(axes)))
        return cls(data=data, offsets=st.offsets, vocab=vocab, dim=dim,
                   axis=axis if isinstance(axis, str) else tuple(axis))

    @classmethod
    def init_sharded(cls, mesh: Mesh, axis, vocab_sizes, dim: int,
                     key: jax.Array, *, scale: float | None = None,
                     dtype=jnp.float32) -> "ShardedStackedTables":
        """Initialize DIRECTLY sharded: each device generates its own shard
        under jit (`out_shardings`), so the full `(ΣV, D)` table never exists
        on any single device — required for beyond-HBM vocabularies. (The
        keras_rs/TPU-embedding stacks initialize per shard the same way.)

        The init is iid uniform(+-scale), so the mod-row permutation needs no
        special handling. Default scale = 1/sqrt(dim) (DLRM convention).
        """
        axes = _axes_tuple(axis)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        offs, acc = [0], 0
        for v in vocab_sizes:
            acc += v
            offs.append(acc)
        vocab = acc
        rows_local = cdiv(vocab, n)
        if scale is None:
            scale = 1.0 / (dim ** 0.5)

        def gen(key):
            u = jax.random.uniform(key, (n, rows_local, dim),
                                   minval=-1.0, maxval=1.0)
            return (u * scale).astype(dtype)

        data = jax.jit(gen, out_shardings=NamedSharding(mesh, P(axes)))(key)
        return cls(data=data, offsets=tuple(offs), vocab=vocab, dim=dim,
                   axis=axis if isinstance(axis, str) else tuple(axis))

    def unshard(self) -> jax.Array:
        """Dense `(vocab, dim)` view (test oracle only)."""
        n, rows, dim = self.data.shape
        return self.data.transpose(1, 0, 2).reshape(n * rows, dim)[:self.vocab]

    def table(self, t: int) -> jax.Array:
        """Dense view of one member table (test oracle only)."""
        return self.unshard()[self.offsets[t]:self.offsets[t + 1]]


def shard_table(mesh: Mesh, axis: str, table) -> ShardedStackedTables:
    """Shard a single table (reference `SplitEmbedding`'s role at pod scale)."""
    return ShardedStackedTables.shard(mesh, axis, table)


def shard_row_accum(mesh: Mesh, axis, st: ShardedStackedTables, state,
                    sparse_opt):
    """Mod-shard a single-chip sparse-optimizer state exactly like the table
    rows (pad, then global row r -> shard r % n, slot r // n). The ONE home
    of this layout transform — `shard_dlrm`/`shard_dcn`/`shard_deepfm` all
    route through it, so the ownership rule cannot silently diverge across
    families. Returns the sharded state in the layout `_sharded_sparse_apply`
    consumes:

      - `SparseSGD` (stateless): the `(n, 0)` placeholder array.
      - `SparseRowWiseAdaGrad`: `(n, rows_local)` f32 accumulator.
      - `SparseLazyAdam`: `(m, v, count)` tuple — `(n, rows_local, dim)`
        moments + replicated scalar count (`shard_adam_state`).
      - `SparseFTRL`: `(z, n)` tuple of `(n, rows_local, dim)` f32
        (`shard_ftrl_state`).
    """
    from ..optim import SparseAdamState, SparseFTRLState
    axes = _axes_tuple(axis)
    n, rows_local, _ = st.data.shape
    if isinstance(state, SparseAdamState):
        return shard_adam_state(mesh, st, state)
    if isinstance(state, SparseFTRLState):
        return shard_ftrl_state(mesh, st, state)
    # Dispatch on the STATE's contents, not the opt type: a populated
    # row-wise accumulator must survive the placement even when the caller
    # omits sparse_opt (whose default is SGD) — dropping trained state
    # silently is exactly the class of bug the loud-guard discipline
    # exists to prevent.
    from ..optim import SparseRowWiseAdaGrad
    if state is not None and state.accum.size:
        acc = state.accum.astype(jnp.float32)
        v_pad = n * rows_local
        acc = jnp.pad(acc, (0, v_pad - acc.shape[0]))
        acc = acc.reshape(rows_local, n).T
    elif isinstance(sparse_opt, SparseRowWiseAdaGrad):
        # Fresh accumulator (e.g. switching an SGD-trained model to
        # AdaGrad at placement time).
        acc = jnp.full((n, rows_local), float(sparse_opt.initial_accum),
                       jnp.float32)
    else:
        acc = jnp.zeros((n, 0), jnp.float32)
    return jax.device_put(acc, NamedSharding(mesh, P(axes)))


def init_sharded_row_state(mesh: Mesh, st: ShardedStackedTables, sparse_opt):
    """Fresh sharded optimizer state for a stack initialized directly on the
    mesh (no single-chip state to reshard): the per-optimizer counterpart of
    `shard_row_accum`, generated shard-locally under jit so no full-table
    buffer ever materializes."""
    from ..optim import SparseFTRL, SparseLazyAdam, SparseRowWiseAdaGrad
    axes = st.axes
    n, rows_local, _ = st.data.shape
    if isinstance(sparse_opt, SparseLazyAdam):
        return init_sharded_adam_state(mesh, st)
    if isinstance(sparse_opt, SparseFTRL):
        return init_sharded_ftrl_state(mesh, st, sparse_opt)
    if isinstance(sparse_opt, SparseRowWiseAdaGrad):
        init_val = float(sparse_opt.initial_accum)
        return jax.jit(lambda: jnp.full((n, rows_local), init_val,
                                        jnp.float32),
                       out_shardings=NamedSharding(mesh, P(axes)))()
    return jax.device_put(jnp.zeros((n, 0), jnp.float32),
                          NamedSharding(mesh, P(axes)))


def unshard_row_state(st: ShardedStackedTables, accum):
    """Single-chip sparse-optimizer state back from the sharded layout (the
    inverse of `shard_row_accum`): `SparseOptState` from the `(n, rows)`
    accumulator or `(n, 0)` placeholder, `SparseAdamState` from the
    `(m, v, count)` tuple, `SparseFTRLState` from the `(z, n)` tuple."""
    from ..optim import SparseFTRLState, SparseOptState
    if isinstance(accum, tuple) and len(accum) == 3:
        return unshard_adam_state(st, *accum)
    if isinstance(accum, tuple) and len(accum) == 2:
        z, n_state = accum
        n, rows, dim = z.shape

        def un(x):
            return x.transpose(1, 0, 2).reshape(n * rows, dim)[:st.vocab]

        return SparseFTRLState(z=un(z), n=un(n_state))
    if accum.shape[1] == 0:
        return SparseOptState(accum=jnp.zeros((0,), jnp.float32))
    n, rows = accum.shape
    return SparseOptState(accum=accum.T.reshape(n * rows)[:st.vocab])


# ---------------------------------------------------------------------------
# Lookup
# ---------------------------------------------------------------------------

def _local_gather(shard: jax.Array, flat_gidx: jax.Array, me, n: int):
    """Gather owned rows; non-owned positions contribute zeros."""
    mine = (flat_gidx % n) == me
    lrow = jnp.where(mine, flat_gidx // n, 0)
    rows = jnp.take(shard, lrow, axis=0)
    return jnp.where(mine[:, None], rows, jnp.zeros_like(rows))


def _fold_combiner(idx: jax.Array, combiner: str, weights, pad_idx):
    """Normalize (combiner, weights, pad_idx) into (safe_idx, scale) where
    `scale` is a per-occurrence f32 multiplier (or None for plain sum) such
    that a weighted SUM with `scale` realizes the requested semantics —
    the single-chip `lookup` contract (ops/lookup.py) expressed in the form
    the sharded exchange wants. Pads are remapped to row 0 (every remap
    carries scale 0, so no device's contribution survives); mean weights
    are pre-normalized per example so the exchange stays a pure sum."""
    if combiner not in ("sum", "mean"):
        raise ValueError(f"combiner must be 'sum' or 'mean', got {combiner!r}")
    scale = None if weights is None else jnp.asarray(weights).astype(jnp.float32)
    if pad_idx is not None:
        valid = (idx != pad_idx).astype(jnp.float32)
        idx = jnp.where(idx != pad_idx, idx, 0)
        scale = valid if scale is None else scale * valid
    # Non-reducing (B,) streams have no bag: mean is a no-op (the `lookup`
    # 1-D contract) and weights stay a per-row scale.
    if combiner == "mean" and idx.ndim >= 2:
        if scale is None:
            scale = jnp.full(idx.shape, 1.0 / idx.shape[-1], jnp.float32)
        else:
            scale = scale / jnp.maximum(scale.sum(axis=-1, keepdims=True),
                                        1e-12)
    return idx, scale


def sharded_lookup(mesh: Mesh, st: ShardedStackedTables, idx: jax.Array,
                   *, batch_sharded: bool = True, combiner: str = "sum",
                   weights=None, pad_idx: int | None = None) -> jax.Array:
    """Lookup on a sharded (stacked) table.

    idx: `(B,)` or `(B, bag)` *global stacked* row ids, sharded along the
    batch over the first table axis (the data axis) when `batch_sharded`
    (the DLRM configuration) or replicated otherwise. Returns `(B, dim)`
    batch-sharded the same way.

    combiner / weights `(B, bag)` / pad_idx: the single-chip `lookup`
    contract on the mesh — mean weights pre-normalize per example and pads
    fold in as zero-scale occurrences, so the exchange itself stays ONE
    weighted-sum gather (no extra collectives). With pad_idx, `idx` must
    carry the sentinel pre-shift (a shifted pad would not match); the
    ensemble entry below handles that ordering.

    Multi-axis tables (2-D mesh): rows are owned over the flattened axes;
    indices all-gather over the data axis only, partial embeddings
    psum_scatter over data and psum over the remaining (model) axes.
    """
    axes = st.axes
    baxis = axes[0]
    n = st.n_shards
    reducing = idx.ndim == 2
    idx, scale = _fold_combiner(idx, combiner, weights, pad_idx)

    def body(shard, lidx, *lscale):
        # shard: (1, rows, dim) local; lidx: local batch slice of indices.
        gidx = jax.lax.all_gather(lidx, baxis, tiled=True) if batch_sharded else lidx
        flat = gidx.reshape(-1)
        me = _flat_axis_index(axes)
        part = _local_gather(shard[0], flat, me, n)
        part = part.reshape(gidx.shape + (st.dim,))
        if lscale:
            gs = (jax.lax.all_gather(lscale[0], baxis, tiled=True)
                  if batch_sharded else lscale[0])
            part = part * gs[..., None].astype(part.dtype)
        if reducing:
            part = part.sum(axis=1)
        if batch_sharded:
            part = jax.lax.psum_scatter(part, baxis, scatter_dimension=0,
                                        tiled=True)
            if len(axes) > 1:
                part = jax.lax.psum(part, axes[1:])
            return part
        return jax.lax.psum(part, axes)

    idx_spec = P(baxis) if batch_sharded else P()
    out_spec = P(baxis) if batch_sharded else P()
    operands = (st.data, idx) + (() if scale is None else (scale,))
    in_specs = (P(axes), idx_spec) + (() if scale is None else (idx_spec,))
    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_spec)(*operands)


def sharded_ensemble_lookup(mesh: Mesh, st: ShardedStackedTables,
                            indices, *, batch_sharded: bool = True,
                            fused: bool = False, prependrows: int = 0,
                            stacked: bool = False, combiner: str = "sum",
                            weights=None, pad_idx: int | None = None):
    """Ensemble lookup over the sharded stack: per-table local indices are
    shifted by the static stacked offsets, all T tables are looked up in ONE
    exchange, and results return per-table (or fused concat, the
    PreallocationStrategy analog).

    combiner / weights (per-table containers, `normalize_weights`) / pad_idx
    match the single-chip `maplookup` contract: pads are detected on the
    LOCAL indices before the offset shift and fold in as zero-scale
    occurrences; mean pre-normalizes per (table, example), so the exchange
    stays the same single weighted-sum gather."""
    idx_list = normalize_indices(indices, st.ntables)
    scale = None
    if weights is not None or pad_idx is not None or combiner != "sum":
        w_list = normalize_weights(weights, st.ntables)
        folded = [_fold_combiner(jnp.asarray(i), combiner, wt, pad_idx)
                  for i, wt in zip(idx_list, w_list)]
        idx_list = [f[0] for f in folded]
        scales = [f[1] for f in folded]
        if any(s is not None for s in scales):
            scale = jnp.stack([s if s is not None
                               else jnp.ones(jnp.asarray(i).shape, jnp.float32)
                               for s, i in zip(scales, idx_list)])
    shifted = jnp.stack([i + st.offsets[t] for t, i in enumerate(idx_list)])
    b = shifted.shape[1]
    # The (T, B) layout is kept (sharded on dim 1) — a flattened (T*B) view
    # would not be batch-sharded contiguously.
    axes = st.axes
    baxis = axes[0]
    n = st.n_shards
    reducing = shifted.ndim == 3

    def body(shard, lidx, *lscale):
        # lidx: (T, B/n[, bag]) local
        gidx = (jax.lax.all_gather(lidx, baxis, axis=1, tiled=True)
                if batch_sharded else lidx)
        me = _flat_axis_index(axes)
        part = _local_gather(shard[0], gidx.reshape(-1), me, n)
        part = part.reshape(gidx.shape + (st.dim,))
        if lscale:
            gs = (jax.lax.all_gather(lscale[0], baxis, axis=1, tiled=True)
                  if batch_sharded else lscale[0])
            part = part * gs[..., None].astype(part.dtype)
        if reducing:
            part = part.sum(axis=2)  # (T, B, dim)
        if batch_sharded:
            part = jax.lax.psum_scatter(part, baxis, scatter_dimension=1,
                                        tiled=True)
            if len(axes) > 1:
                part = jax.lax.psum(part, axes[1:])
            return part
        return jax.lax.psum(part, axes)

    spec = P(None, baxis) if batch_sharded else P()
    operands = (st.data, shifted) + (() if scale is None else (scale,))
    in_specs = (P(axes), spec) + (() if scale is None else (spec,))
    out = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                        out_specs=spec)(*operands)
    # out: (T, B, dim) batch-sharded on dim 1.
    if stacked:
        return out
    if fused:
        fusedout = out.transpose(1, 0, 2).reshape(b, st.ntables * st.dim)
        if prependrows:
            zeros = jnp.zeros((b, prependrows), fusedout.dtype)
            fusedout = jnp.concatenate([zeros, fusedout], axis=-1)
        return fusedout
    return [out[t] for t in range(st.ntables)]


# ---------------------------------------------------------------------------
# Update
# ---------------------------------------------------------------------------

def sharded_sgd_update(mesh: Mesh, st: ShardedStackedTables,
                       upd: SparseEmbeddingUpdate, lr, *,
                       batch_sharded: bool = True) -> ShardedStackedTables:
    """Sparse SGD on a sharded table: all-gather the lazy `(delta, indices)`
    update, scatter-add owned rows locally. One write per owned row region;
    ownership disjointness = race-freedom (the reference's IndexerView
    discipline realized as physical sharding)."""
    axes = st.axes
    baxis = axes[0]
    n = st.n_shards
    reducing = upd.indices.ndim == 2
    # Per-occurrence weights (ones when absent) ride the same exchange so
    # weighted-bag / mean-combiner updates stay correct under sharding.
    w = (upd.weights if upd.weights is not None
         else jnp.ones(upd.indices.shape, jnp.float32))

    def body(shard, lidx, ldelta, lw):
        if batch_sharded:
            gidx = jax.lax.all_gather(lidx, baxis, tiled=True)
            gdelta = jax.lax.all_gather(ldelta, baxis, tiled=True)
            gw = jax.lax.all_gather(lw, baxis, tiled=True)
        else:
            gidx, gdelta, gw = lidx, ldelta, lw
        flat = gidx.reshape(-1)
        if reducing:
            bag = gidx.shape[1]
            gdelta = jnp.repeat(gdelta, bag, axis=0)
        gdelta = gdelta * gw.reshape(-1)[:, None].astype(gdelta.dtype)
        me = _flat_axis_index(axes)
        mine = (flat % n) == me
        rows_local = shard.shape[1]
        # Non-owned occurrences are routed out of bounds and dropped.
        lrow = jnp.where(mine, flat // n, rows_local)
        new = shard[0].at[lrow].add((-lr * gdelta).astype(shard.dtype),
                                    mode="drop")
        return new[None]

    spec = P(baxis) if batch_sharded else P()
    data = jax.shard_map(body, mesh=mesh,
                         in_specs=(P(axes), spec, spec, spec),
                         out_specs=P(axes))(st.data, upd.indices, upd.delta, w)
    return dataclasses.replace(st, data=data)


def sharded_ensemble_update(mesh: Mesh, st: ShardedStackedTables,
                            upds: Sequence[SparseEmbeddingUpdate], lr, *,
                            batch_sharded: bool = True) -> ShardedStackedTables:
    """Apply per-table lazy updates to the sharded stack in ONE exchange:
    indices are shifted to stacked ids and concatenated along the batch."""
    shifted = jnp.stack([u.indices + st.offsets[t] for t, u in enumerate(upds)])
    deltas = jnp.stack([u.delta for u in upds])  # (T, B, dim)
    weights = jnp.stack([u.weights if u.weights is not None
                         else jnp.ones(u.indices.shape, jnp.float32)
                         for u in upds])
    axes = st.axes
    baxis = axes[0]
    n = st.n_shards
    reducing = shifted.ndim == 3

    def body(shard, lidx, ldelta, lw):
        if batch_sharded:
            gidx = jax.lax.all_gather(lidx, baxis, axis=1, tiled=True)
            gdelta = jax.lax.all_gather(ldelta, baxis, axis=1, tiled=True)
            gw = jax.lax.all_gather(lw, baxis, axis=1, tiled=True)
        else:
            gidx, gdelta, gw = lidx, ldelta, lw
        flat = gidx.reshape(-1)
        d = gdelta.reshape(-1, st.dim)
        if reducing:
            bag = gidx.shape[2]
            d = jnp.repeat(gdelta.reshape(-1, st.dim), bag, axis=0)
        d = d * gw.reshape(-1)[:, None].astype(d.dtype)
        me = _flat_axis_index(axes)
        mine = (flat % n) == me
        rows_local = shard.shape[1]
        lrow = jnp.where(mine, flat // n, rows_local)
        new = shard[0].at[lrow].add((-lr * d).astype(shard.dtype), mode="drop")
        return new[None]

    spec = P(None, baxis) if batch_sharded else P()
    data = jax.shard_map(body, mesh=mesh,
                         in_specs=(P(axes), spec, spec, spec),
                         out_specs=P(axes))(st.data, shifted, deltas, weights)
    return dataclasses.replace(st, data=data)


# ---------------------------------------------------------------------------
# Sharded lazy Adam: full-moment optimizer state on the mesh
# ---------------------------------------------------------------------------

def init_sharded_adam_state(mesh: Mesh, st: ShardedStackedTables):
    """Zero (m, v, count) for a sharded stack: moments are mod-row-sharded
    `(n, rows_local, dim)` exactly like the table; `count` is a replicated
    global-step scalar (bias correction uses the global count)."""
    n, rows_local, dim = st.data.shape
    axes = st.axes
    zeros = jax.jit(lambda: jnp.zeros((n, rows_local, dim), jnp.float32),
                    out_shardings=NamedSharding(mesh, P(axes)))
    return zeros(), zeros(), jnp.zeros((), jnp.int32)


def shard_adam_state(mesh: Mesh, st: ShardedStackedTables, state):
    """Mod-shard a single-chip `SparseAdamState` ((ΣV, D) moments) onto the
    stack's layout."""
    n, rows_local, dim = st.data.shape
    axes = st.axes

    def reshard(x):
        v_pad = n * rows_local
        x = jnp.pad(x, ((0, v_pad - x.shape[0]), (0, 0)))
        x = x.reshape(rows_local, n, dim).transpose(1, 0, 2)
        return jax.device_put(x, NamedSharding(mesh, P(axes)))

    return reshard(state.m), reshard(state.v), jnp.asarray(state.count)


def sharded_adam_apply(mesh: Mesh, st: ShardedStackedTables, m, v, count,
                       shifted_idx: jax.Array, delta_t: jax.Array, opt, *,
                       batch_sharded: bool = True, scale_t=None, lr=None,
                       key=None):
    """Lazy Adam on the sharded stack: ONE exchange (all-gather of the
    occurrence stream), then each shard advances the moments and rows it
    owns through the shared `optim.adam_dense_body` — single-write-per-
    owned-row, bit-matching the single-chip `SparseLazyAdam.apply`.

    shifted_idx: (T, B[, bag]) stacked global rows; delta_t: (T, B, dim).
    scale_t: optional (T, B[, bag]) f32 per-occurrence gradient scale
    (pad masks / mean normalization — the lazy update's `weights` on the
    mesh); rides the same all-gather. lr: optional traced scalar
    overriding `opt.lr` this step (lr schedules).
    Returns (new_st, new_m, new_v, new_count).
    """
    from ..optim import adam_dense_body
    axes = st.axes
    baxis = axes[0]
    n = st.n_shards
    dim = st.dim
    t_next = count + 1

    has_scale = scale_t is not None
    has_lr = lr is not None
    has_key = key is not None

    def body(shard, lm, lv, lidx, ldelta, *extra):
        # extra layout: [scale?] [lr?] [key-data?] (flags are static).
        pos = 0
        lscale = None
        if has_scale:
            lscale, pos = extra[0], 1
        lr_val = opt.lr
        if has_lr:
            lr_val, pos = extra[pos], pos + 1
        kd = extra[pos] if has_key else None
        if batch_sharded:
            gidx = jax.lax.all_gather(lidx, baxis, axis=1, tiled=True)
            gdelta = jax.lax.all_gather(ldelta, baxis, axis=1, tiled=True)
            gscale = (jax.lax.all_gather(lscale, baxis, axis=1,
                                         tiled=True)
                      if lscale is not None else None)
        else:
            gidx, gdelta = lidx, ldelta
            gscale = lscale
        flat_idx = gidx.reshape((-1,) + gidx.shape[2:])
        g = gdelta.reshape(-1, dim).astype(jnp.float32)
        if flat_idx.ndim == 2:
            rows = flat_idx.reshape(-1).astype(jnp.int32)
            g = jnp.repeat(g, flat_idx.shape[1], axis=0)
        else:
            rows = flat_idx.astype(jnp.int32)
        if gscale is not None:
            g = g * gscale.reshape(-1)[:, None]
        me = _flat_axis_index(axes)
        mine = (rows % n) == me
        rows_local = shard.shape[1]
        lrow = jnp.where(mine, rows // n, rows_local)   # OOB -> drop
        rkey = (jax.random.fold_in(jax.random.wrap_key_data(kd), me)
                if has_key else None)
        new_data, new_m, new_v = adam_dense_body(
            shard[0], lm[0], lv[0], t_next, lrow, g, lr_val, opt.b1,
            opt.b2, opt.eps, opt.weight_decay, opt.clipnorm,
            rounding_key=rkey,
            grad_dtype=getattr(opt, "dense_grad_dtype", None))
        return new_data[None], new_m[None], new_v[None]

    spec = P(None, baxis) if batch_sharded else P()
    extra = () if scale_t is None else (scale_t,)
    extra_spec = () if scale_t is None else (spec,)
    if has_lr:
        extra = extra + (jnp.asarray(lr, jnp.float32),)
        extra_spec = extra_spec + (P(),)
    if has_key:
        extra = extra + (jax.random.key_data(key),)
        extra_spec = extra_spec + (P(),)
    new_data, new_m, new_v = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), spec, spec) + extra_spec,
        out_specs=(P(axes), P(axes), P(axes)))(
            st.data, m, v, shifted_idx, delta_t, *extra)
    return (dataclasses.replace(st, data=new_data), new_m, new_v, t_next)


def unshard_adam_state(st: ShardedStackedTables, m, v, count):
    """Single-chip `SparseAdamState` back from the sharded moments."""
    from ..optim import SparseAdamState
    n, rows, dim = m.shape

    def un(x):
        return x.transpose(1, 0, 2).reshape(n * rows, dim)[:st.vocab]

    return SparseAdamState(m=un(m), v=un(v), count=jnp.asarray(count))


# ---------------------------------------------------------------------------
# Sharded FTRL-Proximal: per-coordinate (z, n) state on the mesh
# ---------------------------------------------------------------------------

def init_sharded_ftrl_state(mesh: Mesh, st: ShardedStackedTables, opt):
    """(z, n) for a sharded stack, mod-row-sharded like the table. The z
    init solves for the current weights (shared `optim.ftrl_init_arrays`,
    the one source of that invariant) — computed per shard under jit, so
    no full-table buffer materializes."""
    from ..optim import ftrl_init_arrays
    axes = st.axes

    def gen(data):
        return ftrl_init_arrays(data, opt.lr, opt.beta, opt.l1, opt.l2,
                                opt.initial_accum)
    sharding = NamedSharding(mesh, P(axes))
    return jax.jit(gen, out_shardings=(sharding, sharding))(st.data)


def shard_ftrl_state(mesh: Mesh, st: ShardedStackedTables, state):
    """Mod-shard a single-chip `SparseFTRLState` ((ΣV, D) z/n buffers) onto
    the stack's layout: `(n_shards, rows_local, dim)` with `P(axes)` — the
    FTRL counterpart of `shard_adam_state`."""
    n, rows_local, dim = st.data.shape
    axes = st.axes

    def reshard(x):
        v_pad = n * rows_local
        x = jnp.pad(x, ((0, v_pad - x.shape[0]), (0, 0)))
        x = x.reshape(rows_local, n, dim).transpose(1, 0, 2)
        return jax.device_put(x, NamedSharding(mesh, P(axes)))

    return reshard(state.z), reshard(state.n)


def sharded_ftrl_apply(mesh: Mesh, st: ShardedStackedTables, z, n_state,
                       shifted_idx: jax.Array, delta_t: jax.Array, opt, *,
                       batch_sharded: bool = True, scale_t=None):
    """FTRL-Proximal on the sharded stack: ONE exchange (all-gather of the
    occurrence stream), then each shard advances the (z, n) state and rows
    it owns through the shared `optim.ftrl_dense_body` — matching the
    single-chip `SparseFTRL.apply` per owned row.

    shifted_idx: (T, B[, bag]) stacked global rows. scale_t: optional
    (T, B[, bag]) f32 per-occurrence gradient scale (pad masks / mean
    normalization — the lazy update's `weights` on the mesh); rides the
    same all-gather. Returns (new_st, new_z, new_n).
    """
    from ..optim import ftrl_dense_body
    axes = st.axes
    baxis = axes[0]
    n = st.n_shards
    dim = st.dim

    def body(shard, lz, ln, lidx, ldelta, *lscale):
        if batch_sharded:
            gidx = jax.lax.all_gather(lidx, baxis, axis=1, tiled=True)
            gdelta = jax.lax.all_gather(ldelta, baxis, axis=1, tiled=True)
            gscale = (jax.lax.all_gather(lscale[0], baxis, axis=1,
                                         tiled=True) if lscale else None)
        else:
            gidx, gdelta = lidx, ldelta
            gscale = lscale[0] if lscale else None
        flat_idx = gidx.reshape((-1,) + gidx.shape[2:])
        g = gdelta.reshape(-1, dim).astype(jnp.float32)
        if flat_idx.ndim == 2:
            rows = flat_idx.reshape(-1).astype(jnp.int32)
            g = jnp.repeat(g, flat_idx.shape[1], axis=0)
        else:
            rows = flat_idx.astype(jnp.int32)
        if gscale is not None:
            g = g * gscale.reshape(-1)[:, None]
        me = _flat_axis_index(axes)
        mine = (rows % n) == me
        rows_local = shard.shape[1]
        lrow = jnp.where(mine, rows // n, rows_local)   # OOB -> drop
        new_data, new_z, new_n = ftrl_dense_body(
            shard[0], lz[0], ln[0], lrow, g, opt.lr, opt.beta, opt.l1,
            opt.l2, opt.clipnorm,
            grad_dtype=getattr(opt, "dense_grad_dtype", None))
        return new_data[None], new_z[None], new_n[None]

    spec = P(None, baxis) if batch_sharded else P()
    extra = () if scale_t is None else (scale_t,)
    extra_spec = () if scale_t is None else (spec,)
    new_data, new_z, new_n = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), spec, spec) + extra_spec,
        out_specs=(P(axes), P(axes), P(axes)))(
            st.data, z, n_state, shifted_idx, delta_t, *extra)
    return dataclasses.replace(st, data=new_data), new_z, new_n
