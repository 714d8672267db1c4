"""All-to-all "butterfly" exchange: the bandwidth-optimal sharded lookup.

The v1 exchange (sharded.py) all-gathers the batch's indices and
psum_scatters (T, B, D) partials in which each device contributed only the
1/n of rows it owns — i.e. it sums mostly-zeros and moves ~(n-1)/n of the
FULL activation over ICI. The classic DLRM butterfly (SURVEY.md §2.3 EP row)
moves only real rows:

  1. bucket each device's local indices by owner shard (`owner = row % n`);
  2. `all_to_all` the index buckets (tiny);
  3. owners gather their rows locally;
  4. `all_to_all` the gathered rows back (exactly B_local x D per device);
  5. scatter rows to their original positions (+ bag reduce).

ICI volume per device: ~B_local*D both ways, vs ~B*D for the psum_scatter
scheme — an ~n/2x saving that grows with the mesh.

Capacity: buckets are static-shaped at `C = ceil(B_local/n * capacity_factor)`
(the ragged-routing hard part, SURVEY.md §7). Overflowing occurrences beyond
C for one owner are DROPPED from the exchange (their outputs read zero, their
updates are lost) and counted in the returned `overflow` scalar — the
standard capacity-factor contract from MoE/embedding routing; size
`capacity_factor` for the observed skew or use the exact v1 exchange.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.sparse_update import SparseEmbeddingUpdate
from ..types import cdiv
from .sharded import (ShardedStackedTables, _axes_tuple, _fold_combiner,
                      _flat_axis_index)


def suggest_capacity_factor(current: float, overflow_fraction: float,
                            target: float = 0.0, headroom: float = 1.5
                            ) -> float:
    """Retuning policy for the capacity factor (a compile-time constant —
    applying a new value recompiles the step).

    overflow_fraction: dropped / routed occurrences observed over a window.
    Returns an increased factor when drops exceed `target` (scaled by the
    observed overflow plus headroom), or the current factor unchanged.
    """
    if overflow_fraction <= target:
        return current
    return current * (1.0 + overflow_fraction) * headroom


class CapacityAutoTuner:
    """Feedback controller closing the loop around `suggest_capacity_factor`.

    The capacity factor is a compile-time constant: raising it means
    rebuilding (recompiling) the train step. This controller consumes the
    overflow counts a `with_overflow=True` step reports, and tells the
    training loop when (and to what) to retune:

        tuner = CapacityAutoTuner(2.0, occurrences_per_step=2 * B * T * bag)
        ...
        new_cf = tuner.observe(int(overflow))
        if new_cf is not None:   # rebuild the step at new_cf
            step = make_sharded_train_step(..., capacity_factor=new_cf, ...)

    `observe` returns the new factor when the observed drop fraction exceeds
    `target`, else None. `cooldown` observations must pass between retunes so
    one skewed batch can't trigger a recompile storm.
    """

    def __init__(self, initial: float, occurrences_per_step: int, *,
                 target: float = 0.0, headroom: float = 1.5,
                 cooldown: int = 5, max_factor: float = 64.0):
        if occurrences_per_step <= 0:
            raise ValueError("occurrences_per_step must be positive")
        self.factor = float(initial)
        self.occ = int(occurrences_per_step)
        self.target = target
        self.headroom = headroom
        self.cooldown = cooldown
        self.max_factor = max_factor
        self.retunes = 0          # (factor history length - 1)
        self._since = cooldown    # allow an immediate first retune

    def observe(self, overflow: int):
        """Feed one step's overflow count; returns the new capacity factor
        to rebuild at, or None to keep going."""
        self._since += 1
        frac = overflow / self.occ
        if frac <= self.target or self._since <= self.cooldown:
            return None
        new = min(suggest_capacity_factor(self.factor, frac, self.target,
                                          self.headroom), self.max_factor)
        if new <= self.factor:
            return None
        self.factor = new
        self.retunes += 1
        self._since = 0
        return new


def _bucket_by_owner(flat: jax.Array, n: int, cap: int, valid=None):
    """Route a local occurrence stream into per-owner buckets.

    flat: (m,) global row ids. valid: optional (m,) bool — False entries
    (padding sentinels) are dropped WITHOUT consuming capacity ranks and
    WITHOUT counting as overflow (they are intentional absences, not
    capacity losses). Returns:
      send_slot: (n, cap) LOCAL row ids on the owner (row // n), sentinel -1;
      send_pos:  (n, cap) position in the local stream, sentinel -1;
      overflow:  () int32 count of occurrences dropped (rank >= cap).
    """
    m = flat.shape[0]
    owner = (flat % n).astype(jnp.int32)
    if valid is not None:
        owner = jnp.where(valid, owner, n)  # pads sort into a trailing bucket
    # Rank of each occurrence within its owner bucket (stable by position):
    # sort by owner, positions within equal owners stay ascending.
    order = jnp.argsort(owner, stable=True)
    sowner = owner[order]
    start = jnp.full((n + 1,), m, jnp.int32).at[sowner].min(
        jnp.arange(m, dtype=jnp.int32))
    rank_sorted = jnp.arange(m, dtype=jnp.int32) - start[sowner]
    rank = jnp.zeros((m,), jnp.int32).at[order].set(rank_sorted)

    ok = rank < cap
    if valid is not None:
        ok = ok & valid
        overflow = (~ok & valid).sum().astype(jnp.int32)
    else:
        overflow = (~ok).sum().astype(jnp.int32)
    dest = jnp.where(ok, owner * cap + rank, n * cap)  # OOB -> dropped
    send_slot = jnp.full((n * cap,), -1, jnp.int32).at[dest].set(
        (flat // n).astype(jnp.int32), mode="drop").reshape(n, cap)
    send_pos = jnp.full((n * cap,), -1, jnp.int32).at[dest].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop").reshape(n, cap)
    return send_slot, send_pos, overflow


def sharded_lookup_a2a(mesh: Mesh, st: ShardedStackedTables, idx: jax.Array,
                       *, capacity_factor: float = 2.0,
                       reducing: bool | None = None, combiner: str = "sum",
                       weights=None, pad_idx: int | None = None,
                       wire_dtype=None) -> Tuple[jax.Array, jax.Array]:
    """Butterfly lookup on a mod-row-sharded (stacked) table.

    idx: `(B,)` or `(B, bag)` global stacked row ids, batch-sharded over the
    table's (single) mesh axis. Returns `(out, overflow)`: out `(B, D)`
    batch-sharded; occurrences dropped by capacity read as zero rows.

    reducing: override bag detection — pass False for 2-D index streams that
    are NOT bags (e.g. an ensemble's `(B, T)` layout, which then returns
    `(B, T, D)`).

    combiner / weights `(B, bag)` / pad_idx: the single-chip `lookup`
    contract on the butterfly. Pads never enter the exchange — they are
    dropped at the routing stage (no capacity rank consumed, not counted as
    overflow) and their stream positions stay zero rows; mean weights
    pre-normalize per example (mass = valid weights only), applied to the
    reassembled rows before the bag sum. `pad_idx` here is a GLOBAL stacked
    sentinel (e.g. -1 or st.vocab) — shift per-table indices first, keeping
    the sentinel unshifted.

    wire_dtype: cast the ROW payload to this dtype for the return
    all_to_all (e.g. jnp.bfloat16 halves the f32 wire traffic). The rows
    are pure data movement here — no reduction happens on the wire — so
    the only precision cost is ONE rounding of each looked-up element;
    indices stay int32. None = no cast (bit-exact).

    2-D meshes (`axis=("data", "model")`): the batch is sharded over `data`
    (replicated across `model`); each model column routes a 1/n_model slice
    of its data shard's occurrence stream over the FLATTENED axes, and the
    returned rows all_gather over `model` to reassemble — no duplicate
    requests across replicas.
    """
    axes = _axes_tuple(st.axis)
    axis0 = axes[0]
    n = st.n_shards
    if reducing is None:
        reducing = idx.ndim == 2
    dim = st.dim
    n_model = 1 if len(axes) == 1 else mesh.shape[axes[1]]
    # The scale folds mean normalization / bag weights / (for the masked
    # combiners) pad exclusion. Plain sum with pads needs NO scale: the
    # routing drop already zeroes pad positions.
    scale = None
    if weights is not None or combiner != "sum":
        _, scale = _fold_combiner(idx, combiner, weights, pad_idx)

    def body(shard, lidx, *lscale):
        flat = lidx.reshape(-1)
        m_all = flat.shape[0]
        if n_model > 1:
            # Column-slice the (model-replicated) stream so each replica
            # routes a disjoint 1/n_model share.
            assert m_all % n_model == 0, \
                "local occurrence count must divide the model axis"
            sub = m_all // n_model
            col = jax.lax.axis_index(axes[1])
            flat_part = jax.lax.dynamic_slice_in_dim(flat, col * sub, sub)
        else:
            sub = m_all
            flat_part = flat
        cap = max(1, int(-(-cdiv(sub, n) * capacity_factor // 1)))
        valid = None if pad_idx is None else (flat_part != pad_idx)
        send_slot, send_pos, overflow = _bucket_by_owner(flat_part, n, cap,
                                                         valid)

        # 2. all_to_all the index buckets over the flattened owner axes.
        recv_slot = jax.lax.all_to_all(send_slot, axes, split_axis=0,
                                       concat_axis=0, tiled=True)
        # 3. local gather (sentinel -1 -> zero row via drop-mask).
        safe = jnp.maximum(recv_slot.reshape(-1), 0)
        rows = jnp.take(shard[0], safe, axis=0)
        rows = jnp.where((recv_slot.reshape(-1) >= 0)[:, None], rows,
                         jnp.zeros_like(rows)).reshape(n, cap, dim)
        if wire_dtype is not None:
            rows = rows.astype(wire_dtype)
        # 4. rows back to the requesters.
        back = jax.lax.all_to_all(rows, axes, split_axis=0, concat_axis=0,
                                  tiled=True)
        if wire_dtype is not None:
            back = back.astype(shard.dtype)
        # 5. un-permute to this column's stream positions.
        pos = send_pos.reshape(-1)
        target = jnp.where(pos >= 0, pos, sub)
        part = jnp.zeros((sub, dim), back.dtype).at[target].set(
            back.reshape(-1, dim), mode="drop")
        if n_model > 1:
            # Reassemble the full data-shard stream across model columns.
            out = jax.lax.all_gather(part, axes[1], axis=0, tiled=True)
            overflow = jax.lax.psum(overflow, axes[1])
        else:
            out = part
        out = out.reshape(lidx.shape + (dim,))
        if lscale:
            out = out * lscale[0][..., None].astype(out.dtype)
        if reducing:
            out = out.sum(axis=1)
        return out, overflow.reshape(1)

    idx_spec = P(axis0)
    operands = (st.data, idx) + (() if scale is None else (scale,))
    in_specs = (P(axes), idx_spec) + (() if scale is None else (idx_spec,))
    out, ovf = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs,
        out_specs=(idx_spec, P(axis0)),
        check_vma=False,   # model-column reassembly is replicated by
                           # construction (all_gather), unprovable statically
    )(*operands)
    return out, jnp.sum(ovf)


def _route_update_stream(lidx, ldelta, lw, *, n, axes, n_model, dim,
                         reducing, capacity_factor, pad_idx, wire_dtype,
                         rows_local):
    """Shard-local half of every butterfly UPDATE: slice the (model-
    replicated) occurrence stream on 2-D meshes, bucket by owner, and
    all_to_all the (slot, delta-row) buckets so each owner receives exactly
    the occurrences landing on its rows. Shared by the SGD / AdaGrad /
    Adam / FTRL butterflies below — one home for the routing math.

    Returns `(lrow, recv_vals, overflow)`: per-received-occurrence local
    row ids carrying the `rows_local` OOB drop sentinel, the f32
    `(n*cap, dim)` delta rows (weights pre-folded, wire-compressed if
    `wire_dtype`), and the scalar count of capacity-dropped occurrences
    (psum'd over the model axis on 2-D meshes)."""
    flat = lidx.reshape(-1)
    vals = ldelta.astype(jnp.float32)
    if reducing:
        vals = jnp.repeat(vals, lidx.shape[1], axis=0)
    vals = vals * lw.reshape(-1)[:, None]
    flat, vals, sub = _column_slice(flat, vals, n_model, axes)
    cap = max(1, int(-(-cdiv(sub, n) * capacity_factor // 1)))
    valid = None if pad_idx is None else (flat != pad_idx)
    send_slot, send_pos, overflow = _bucket_by_owner(flat, n, cap, valid)

    # Stage the value rows bucket-shaped (dropped slots carry zeros, and
    # their received row ids carry the OOB sentinel).
    safe_pos = jnp.maximum(send_pos.reshape(-1), 0)
    staged = jnp.take(vals, safe_pos, axis=0)
    staged = jnp.where((send_pos.reshape(-1) >= 0)[:, None], staged,
                       jnp.zeros_like(staged)).reshape(n, cap, dim)
    if wire_dtype is not None:
        # Delta rows are pure payload on the wire (the dedup accumulation
        # happens owner-side in f32): one rounding each.
        staged = staged.astype(wire_dtype)

    recv_slot = jax.lax.all_to_all(send_slot, axes, split_axis=0,
                                   concat_axis=0, tiled=True)
    recv_vals = jax.lax.all_to_all(staged, axes, split_axis=0,
                                   concat_axis=0, tiled=True
                                   ).astype(jnp.float32).reshape(-1, dim)
    slot = recv_slot.reshape(-1)
    lrow = jnp.where(slot >= 0, slot, rows_local)    # sentinel -> dropped
    if n_model > 1:
        overflow = jax.lax.psum(overflow, axes[1])
    return lrow, recv_vals, overflow


def sharded_adagrad_update_a2a(mesh: Mesh, st: ShardedStackedTables,
                               accum: jax.Array, upd: SparseEmbeddingUpdate,
                               opt, *, capacity_factor: float = 2.0,
                               pad_idx: int | None = None, wire_dtype=None,
                               lr=None, key=None):
    """Butterfly row-wise-AdaGrad update: route occurrences to their owners,
    then each owner dedups its received stream into a shard-sized dense
    gradient (sort-free; docs/DESIGN.md §1e) and advances every owned row
    and its accumulator exactly once — the reference's single-write contract
    (`src/sparseupdate.jl:97-129`) applied after routing.
    Returns (new_tables, new_accum, overflow).

    accum: `(n_shards, rows_local)` f32, sharded like the table rows.
    pad_idx: global padding sentinel in `upd.indices` (kept UNSHIFTED) —
    pad occurrences drop at routing, consuming no capacity.
    """
    axes = _axes_tuple(st.axis)
    axis0 = axes[0]
    n = st.n_shards
    dim = st.dim
    reducing = upd.indices.ndim == 2
    n_model = 1 if len(axes) == 1 else mesh.shape[axes[1]]

    w = (upd.weights if upd.weights is not None
         else jnp.ones(upd.indices.shape, jnp.float32))

    def body(shard, acc, lidx, ldelta, lw, *kd):
        lrow, recv_vals, overflow = _route_update_stream(
            lidx, ldelta, lw, n=n, axes=axes, n_model=n_model, dim=dim,
            reducing=reducing, capacity_factor=capacity_factor,
            pad_idx=pad_idx, wire_dtype=wire_dtype,
            rows_local=shard.shape[1])
        # Dense-grad dedup, shared with the single-chip optimizer
        # (optim.adagrad_dense_body, docs/DESIGN.md §1e) so clip/decay and
        # numerical guards stay in one place.
        from ..optim import adagrad_dense_body
        rkey = (jax.random.fold_in(jax.random.wrap_key_data(kd[0]),
                                   _flat_axis_index(axes)) if kd else None)
        new_shard, new_acc = adagrad_dense_body(
            shard[0], acc[0], lrow, recv_vals,
            opt.lr if lr is None else lr, opt.eps,
            opt.weight_decay, opt.clipnorm, rounding_key=rkey,
            grad_dtype=getattr(opt, "dense_grad_dtype", None))
        return new_shard[None], new_acc[None], overflow.reshape(1)

    spec = P(axis0)
    extra = () if key is None else (jax.random.key_data(key),)
    extra_spec = () if key is None else (P(),)
    new_data, new_accum, ovf = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes), P(axes), spec, spec, spec) + extra_spec,
        out_specs=(P(axes), P(axes), spec), check_vma=False,
    )(st.data, accum, upd.indices, upd.delta, w, *extra)
    return dataclasses.replace(st, data=new_data), new_accum, jnp.sum(ovf)


def _column_slice(flat, vals, n_model: int, axes):
    """On a 2-D mesh, give each model column a disjoint 1/n_model share of
    the (model-replicated) occurrence stream."""
    m_all = flat.shape[0]
    if n_model == 1:
        return flat, vals, m_all
    assert m_all % n_model == 0, \
        "local occurrence count must divide the model axis"
    sub = m_all // n_model
    col = jax.lax.axis_index(axes[1])
    return (jax.lax.dynamic_slice_in_dim(flat, col * sub, sub),
            jax.lax.dynamic_slice_in_dim(vals, col * sub, sub),
            sub)


def sharded_sgd_update_a2a(mesh: Mesh, st: ShardedStackedTables,
                           upd: SparseEmbeddingUpdate, lr, *,
                           capacity_factor: float = 2.0,
                           weight_decay: float = 0.0,
                           clipnorm=None, pad_idx: int | None = None,
                           wire_dtype=None, key=None, grad_dtype=None
                           ) -> Tuple[ShardedStackedTables, jax.Array]:
    """Butterfly sparse-SGD update: route (row, delta) occurrences to their
    owner shards via all_to_all; owners scatter-add locally. ICI volume
    ~B_local x D per device (the all-gather scheme moves B x D).

    Returns (new_tables, overflow). Occurrences beyond capacity are dropped
    (gradient lost) and counted. 2-D meshes: each model column routes its
    disjoint share of the stream (every occurrence routed exactly once).
    pad_idx: global padding sentinel in `upd.indices` (kept UNSHIFTED) —
    pad occurrences drop at routing, consuming no capacity.
    """
    axes = _axes_tuple(st.axis)
    axis0 = axes[0]
    n = st.n_shards
    dim = st.dim
    reducing = upd.indices.ndim == 2
    n_model = 1 if len(axes) == 1 else mesh.shape[axes[1]]

    w = (upd.weights if upd.weights is not None
         else jnp.ones(upd.indices.shape, jnp.float32))

    def body(shard, lidx, ldelta, lw, *kd):
        target, recv_vals, overflow = _route_update_stream(
            lidx, ldelta, lw, n=n, axes=axes, n_model=n_model, dim=dim,
            reducing=reducing, capacity_factor=capacity_factor,
            pad_idx=pad_idx, wire_dtype=wire_dtype,
            rows_local=shard.shape[1])
        rkey = (jax.random.fold_in(jax.random.wrap_key_data(kd[0]),
                                   _flat_axis_index(axes)) if kd else None)
        if weight_decay == 0.0 and clipnorm is None and rkey is None:
            new = shard[0].at[target].add(
                (-lr * recv_vals).astype(shard.dtype), mode="drop")
        else:
            # Regularized SGD shares the single-chip dense-grad body — each
            # row is fully owned by one shard, so the accumulated-row clip
            # and touched-row decay are exact after routing.
            from ..optim import sgd_dense_body
            new = sgd_dense_body(shard[0], target, recv_vals, lr,
                                 weight_decay, clipnorm, rounding_key=rkey,
                                 grad_dtype=grad_dtype)
        return new[None], overflow.reshape(1)

    spec = P(axis0)
    extra = () if key is None else (jax.random.key_data(key),)
    extra_spec = () if key is None else (P(),)
    new_data, ovf = jax.shard_map(
        body, mesh=mesh, in_specs=(P(axes), spec, spec, spec) + extra_spec,
        out_specs=(P(axes), spec), check_vma=False,
    )(st.data, upd.indices, upd.delta, w, *extra)
    return dataclasses.replace(st, data=new_data), jnp.sum(ovf)


def sharded_adam_update_a2a(mesh: Mesh, st: ShardedStackedTables, m, v,
                            count, upd: SparseEmbeddingUpdate, opt, *,
                            capacity_factor: float = 2.0,
                            pad_idx: int | None = None, wire_dtype=None,
                            lr=None, key=None):
    """Butterfly lazy-Adam update: route occurrences to their owners
    (shared `_route_update_stream`), then each owner advances the moments
    and rows it owns through `optim.adam_dense_body` — the same shard math
    as the gather exchange's `sharded_adam_apply`, after routing. Moments
    `m`/`v` are `(n_shards, rows_local, dim)` f32, sharded like the table;
    `count` is the replicated global step (bias correction uses the global
    count). Returns (new_st, new_m, new_v, new_count, overflow). Capacity-
    dropped occurrences lose their gradient AND their moment advance —
    the standard capacity-factor contract.
    """
    from ..optim import adam_dense_body
    axes = _axes_tuple(st.axis)
    axis0 = axes[0]
    n = st.n_shards
    dim = st.dim
    reducing = upd.indices.ndim == 2
    n_model = 1 if len(axes) == 1 else mesh.shape[axes[1]]
    t_next = count + 1

    w = (upd.weights if upd.weights is not None
         else jnp.ones(upd.indices.shape, jnp.float32))

    def body(shard, lm, lv, lidx, ldelta, lw, *kd):
        lrow, recv_vals, overflow = _route_update_stream(
            lidx, ldelta, lw, n=n, axes=axes, n_model=n_model, dim=dim,
            reducing=reducing, capacity_factor=capacity_factor,
            pad_idx=pad_idx, wire_dtype=wire_dtype,
            rows_local=shard.shape[1])
        rkey = (jax.random.fold_in(jax.random.wrap_key_data(kd[0]),
                                   _flat_axis_index(axes)) if kd else None)
        new_shard, new_m, new_v = adam_dense_body(
            shard[0], lm[0], lv[0], t_next, lrow, recv_vals,
            opt.lr if lr is None else lr,
            opt.b1, opt.b2, opt.eps, opt.weight_decay, opt.clipnorm,
            rounding_key=rkey,
            grad_dtype=getattr(opt, "dense_grad_dtype", None))
        return new_shard[None], new_m[None], new_v[None], \
            overflow.reshape(1)

    spec = P(axis0)
    extra = () if key is None else (jax.random.key_data(key),)
    extra_spec = () if key is None else (P(),)
    new_data, new_m, new_v, ovf = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), spec, spec, spec) + extra_spec,
        out_specs=(P(axes), P(axes), P(axes), spec), check_vma=False,
    )(st.data, m, v, upd.indices, upd.delta, w, *extra)
    return (dataclasses.replace(st, data=new_data), new_m, new_v, t_next,
            jnp.sum(ovf))


def sharded_ftrl_update_a2a(mesh: Mesh, st: ShardedStackedTables, z,
                            n_state, upd: SparseEmbeddingUpdate, opt, *,
                            capacity_factor: float = 2.0,
                            pad_idx: int | None = None, wire_dtype=None):
    """Butterfly FTRL-Proximal update: route occurrences to their owners
    (shared `_route_update_stream`), then each owner advances the (z, n)
    state and rows it owns through `optim.ftrl_dense_body` — the same
    shard math as the gather exchange's `sharded_ftrl_apply`, after
    routing. `z`/`n_state` are `(n_shards, rows_local, dim)` f32, sharded
    like the table. Returns (new_st, new_z, new_n, overflow).
    """
    from ..optim import ftrl_dense_body
    axes = _axes_tuple(st.axis)
    axis0 = axes[0]
    n = st.n_shards
    dim = st.dim
    reducing = upd.indices.ndim == 2
    n_model = 1 if len(axes) == 1 else mesh.shape[axes[1]]

    w = (upd.weights if upd.weights is not None
         else jnp.ones(upd.indices.shape, jnp.float32))

    def body(shard, lz, ln, lidx, ldelta, lw):
        lrow, recv_vals, overflow = _route_update_stream(
            lidx, ldelta, lw, n=n, axes=axes, n_model=n_model, dim=dim,
            reducing=reducing, capacity_factor=capacity_factor,
            pad_idx=pad_idx, wire_dtype=wire_dtype,
            rows_local=shard.shape[1])
        new_shard, new_z, new_n = ftrl_dense_body(
            shard[0], lz[0], ln[0], lrow, recv_vals, opt.lr, opt.beta,
            opt.l1, opt.l2, opt.clipnorm,
            grad_dtype=getattr(opt, "dense_grad_dtype", None))
        return new_shard[None], new_z[None], new_n[None], \
            overflow.reshape(1)

    spec = P(axis0)
    new_data, new_z, new_n, ovf = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), spec, spec, spec),
        out_specs=(P(axes), P(axes), P(axes), spec), check_vma=False,
    )(st.data, z, n_state, upd.indices, upd.delta, w)
    return (dataclasses.replace(st, data=new_data), new_z, new_n,
            jnp.sum(ovf))
