"""Sharded two-tower retrieval: corpus-scale serving over a mesh.

Production retrieval corpora (10^8-10^9 items) exceed one chip: both the
item table (training) and the serving index shard over the mesh. This module
provides the serving side:

  - `build_sharded_item_index`: each device embeds the corpus rows it owns
    (block row sharding via NamedSharding — XLA partitions the item-tower
    matmuls automatically, no shard_map needed).
  - `sharded_retrieve`: queries replicated, index row-sharded; each device
    scores its shard and takes a LOCAL top-k, then the (n_shards * k)
    candidates are all-gathered and reduced to the global top-k — the
    standard distributed-ANN merge, k*n candidates instead of V over ICI.

Training with a sharded item table reuses `ShardedStackedTables` +
`sharded_lookup`/`sharded_sgd_update` (parallel/sharded.py) unchanged —
an item table IS a one-table ensemble.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.two_tower import (TwoTower, item_embed_from_rows,
                                query_embed_from_rows, _query_rows)
from .sharded import ShardedStackedTables, sharded_ensemble_lookup


def build_sharded_item_index(model: TwoTower, mesh: Mesh,
                             axis: str = "data") -> jax.Array:
    """`(item_vocab_padded, embed_dim)` corpus index, block-row-sharded
    `P(axis)`. Padding rows (if vocab % n != 0) repeat the last row and are
    masked out at retrieval by id bounds.

    The item TABLE is block-row-sharded for the build as well — each device
    embeds only the rows it owns, so the full `(item_vocab, dim)` table is
    never replicated (corpora beyond one chip's HBM build fine; only the
    embedded `(v_pad/n, embed_dim)` shard and `(v_pad/n, dim)` table shard
    live per device)."""
    cfg = model.config
    n = mesh.shape[axis]
    v = cfg.item_vocab
    v_pad = -(-v // n) * n

    data = model.item_table.data
    if v_pad != v:
        data = jnp.concatenate(
            [data, jnp.repeat(data[-1:], v_pad - v, axis=0)], axis=0)
    data = jax.device_put(data, NamedSharding(mesh, P(axis)))
    mlp = jax.device_put(model.item_mlp, NamedSharding(mesh, P()))

    def build(mlp, data_shard):
        # data_shard: this device's (v_pad/n, dim) block — embed in place.
        return item_embed_from_rows(mlp, cfg, data_shard)

    fn = jax.shard_map(build, mesh=mesh, in_specs=(P(), P(axis)),
                       out_specs=P(axis))
    return jax.jit(fn)(mlp, data)


def make_sharded_retriever(model: TwoTower, mesh: Mesh, k: int = 10,
                           axis: str = "data"):
    """Serving factory: build the jitted sharded top-k retriever ONCE and
    call it per request — `sharded_retrieve` re-traces on every call (it
    constructs fresh shard_map/jit wrappers), which costs tracing/lowering
    on the hot path.

    Returns `retrieve_fn(index, dense, q_cat[, query_mlp, query_tables_data])
    -> (scores (B,k), ids (B,k))`; the optional trailing args serve updated
    parameters without rebuilding."""
    cfg = model.config
    offsets = model.query_tables.offsets
    dim = model.query_tables.dim
    v = cfg.item_vocab
    n = mesh.shape[axis]

    @jax.jit
    def run(index, dense, q_cat, qmlp, qdata):
        t = len(offsets) - 1
        g = jnp.stack([q_cat[i] + offsets[i] for i in range(t)])
        rows = jnp.take(qdata, g.reshape(-1), axis=0)
        q_rows = rows.reshape(t, g.shape[1], dim).transpose(1, 0, 2)
        rows_local = index.shape[0] // n

        def body(idx_shard, q, mlp_dense):
            qmlp_, dense_x = mlp_dense
            qe = query_embed_from_rows(qmlp_, cfg, dense_x, q)
            scores = qe @ idx_shard.T
            shard = jax.lax.axis_index(axis)
            gids = shard * rows_local + jnp.arange(rows_local,
                                                   dtype=jnp.int32)
            scores = jnp.where((gids < v)[None, :], scores, -jnp.inf)
            ls, li = jax.lax.top_k(scores, k)
            lids = gids[li]
            cs = jax.lax.all_gather(ls, axis, axis=1, tiled=True)
            ci = jax.lax.all_gather(lids, axis, axis=1, tiled=True)
            gs, gi = jax.lax.top_k(cs, k)
            return gs, jnp.take_along_axis(ci, gi, axis=1)

        return jax.shard_map(body, mesh=mesh,
                             in_specs=(P(axis), P(), P()),
                             out_specs=(P(), P()),
                             check_vma=False)(index, q_rows, (qmlp, dense))

    def retrieve_fn(index, dense, q_cat, query_mlp=None,
                    query_tables_data=None):
        return run(index, jnp.asarray(dense), jnp.asarray(q_cat),
                   query_mlp if query_mlp is not None else model.query_mlp,
                   query_tables_data if query_tables_data is not None
                   else model.query_tables.data)

    return retrieve_fn


def sharded_retrieve(model: TwoTower, index: jax.Array, mesh: Mesh,
                     dense, q_cat, k: int = 10,
                     axis: str = "data") -> Tuple[jax.Array, jax.Array]:
    """Top-k over a row-sharded index: local top-k per shard + global merge.

    dense/q_cat: replicated query batch. Returns (scores (B,k), ids (B,k));
    ids >= item_vocab never appear (padding is masked).

    NOTE: one-shot convenience — re-traces per call. For serving loops use
    `make_sharded_retriever` (build once, call per request)."""
    cfg = model.config
    v = cfg.item_vocab
    n = mesh.shape[axis]
    rows_local = index.shape[0] // n

    q_rows = _query_rows(model, jnp.asarray(q_cat))

    def body(idx_shard, q, qmlp_and_dense):
        qmlp, dense_x = qmlp_and_dense
        qe = query_embed_from_rows(qmlp, cfg, dense_x, q)      # (B, E)
        scores = qe @ idx_shard.T                              # (B, V/n)
        shard = jax.lax.axis_index(axis)
        base = shard * rows_local
        gids = base + jnp.arange(rows_local, dtype=jnp.int32)
        # Mask padding rows (global id >= v).
        scores = jnp.where((gids < v)[None, :], scores, -jnp.inf)
        ls, li = jax.lax.top_k(scores, k)                      # local top-k
        lids = gids[li]
        # Merge: gather all shards' candidates, global top-k.
        cs = jax.lax.all_gather(ls, axis, axis=1, tiled=True)  # (B, n*k)
        ci = jax.lax.all_gather(lids, axis, axis=1, tiled=True)
        gs, gi = jax.lax.top_k(cs, k)
        return gs, jnp.take_along_axis(ci, gi, axis=1)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P()),
        # Outputs ARE replicated (every shard computes the same merged top-k
        # after the all_gather), but the static checker can't prove it
        # through axis_index-derived ids.
        check_vma=False)
    return jax.jit(fn)(index, q_rows, (model.query_mlp, jnp.asarray(dense)))


# ---------------------------------------------------------------------------
# Sharded training
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedTwoTower:
    """Two-tower parameter pytree over a mesh: replicated MLPs, mod-row-
    sharded query/item tables, row-sharded sparse-optimizer accumulators
    (same decomposition as `dlrm.ShardedDLRM`)."""

    query_tables: "ShardedStackedTables"
    item_table: "ShardedStackedTables"
    query_mlp: list
    item_mlp: list
    # Sharded sparse-optimizer state per table (shard_row_accum's layout:
    # (n_shards, rows_local) accumulator / (n, 0) placeholder / Adam
    # (m, v, count) tuple / FTRL (z, n) tuple).
    q_accum: object
    i_accum: object
    config: object = dataclasses.field(metadata=dict(static=True))


def shard_two_tower(model: TwoTower, mesh: Mesh, axis="data",
                    sparse_opt=None) -> ShardedTwoTower:
    """Place a single-chip TwoTower onto a mesh (replicate the MLPs,
    mod-shard both tables and their row state). `axis` may be an axis tuple
    for the 2-D (data x model) decomposition."""
    from ..optim import SparseSGD
    from .sharded import ShardedStackedTables, shard_row_accum
    sparse_opt = sparse_opt or SparseSGD(0.05)
    st_q = ShardedStackedTables.shard(mesh, axis, model.query_tables)
    st_i = ShardedStackedTables.shard(mesh, axis, model.item_table)
    repl = NamedSharding(mesh, P())
    return ShardedTwoTower(
        query_tables=st_q, item_table=st_i,
        query_mlp=jax.device_put(model.query_mlp, repl),
        item_mlp=jax.device_put(model.item_mlp, repl),
        q_accum=shard_row_accum(mesh, axis, st_q, model.q_state,
                                sparse_opt),
        i_accum=shard_row_accum(mesh, axis, st_i, model.i_state,
                                sparse_opt),
        config=model.config)


def tt_batch_shardings(mesh: Mesh, axis="data"):
    """NamedShardings for a (dense, q_cat, item_ids) training batch."""
    from .sharded import _axes_tuple
    baxis = _axes_tuple(axis)[0]
    return (NamedSharding(mesh, P(baxis)),          # dense (B, nd)
            NamedSharding(mesh, P(None, baxis)),    # q_cat (T, B)
            NamedSharding(mesh, P(baxis)))          # item_ids (B,)


def make_sharded_tt_train_step(cfg, mesh: Mesh, axis="data", sparse_opt=None,
                               dense_lr: float = 0.05, jit: bool = True):
    """Sharded contrastive train step: `step(model, dense, q_cat, item_ids)
    -> (model, (loss, accuracy))`.

    Decomposition (TPU-first):
      - batch sharded over the data axis; MLPs replicated (GSPMD inserts the
        gradient psum);
      - the in-batch-negatives softmax couples the WHOLE batch: q and i stay
        batch-sharded and XLA partitions the (B, B) logits matmul, gathering
        item embeddings across the axis and psum-ing their cotangents — the
        standard DP contrastive pattern, written as plain jnp under jit;
      - both tables are mod-row-sharded; their lazy sparse updates ride the
        gather exchange with per-shard dedup + single-write optimizer-state
        advance (`dlrm._sharded_sparse_apply`).

    Matches the single-chip `models.two_tower.make_train_step` numerically
    (parity-tested on the 8-device CPU mesh).
    """
    from ..models.two_tower import in_batch_softmax_loss
    from ..optim import SparseSGD
    from .dlrm import _check_sharded_opt, _sharded_sparse_apply
    sparse_opt = sparse_opt or SparseSGD(0.05)
    _check_sharded_opt(sparse_opt, allow_sr=True)
    t = cfg.num_query_tables

    def step(model: ShardedTwoTower, dense, q_cat, item_ids, key=None):
        st_q, st_i = model.query_tables, model.item_table
        q_rows = sharded_ensemble_lookup(
            mesh, st_q, q_cat, stacked=True).transpose(1, 0, 2)  # (B, T, dim)
        i_rows = sharded_ensemble_lookup(
            mesh, st_i, item_ids[None], stacked=True)[0]         # (B, dim)

        def loss_fn(mlps, q_act, i_act):
            qmlp, imlp = mlps
            q = query_embed_from_rows(qmlp, cfg, dense, q_act)
            i = item_embed_from_rows(imlp, cfg, i_act)
            return in_batch_softmax_loss(q, i, cfg.temperature)

        (loss, acc), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
            (model.query_mlp, model.item_mlp), q_rows, i_rows)
        mlp_grads, q_delta, i_delta = grads
        new_qmlp, new_imlp = jax.tree.map(
            lambda p, g: (p - dense_lr * g).astype(p.dtype),
            (model.query_mlp, model.item_mlp), mlp_grads)

        shifted_q = jnp.stack([q_cat[i] + st_q.offsets[i] for i in range(t)])
        key_i = jax.random.fold_in(key, 1) if key is not None else None
        new_st_q, new_qacc = _sharded_sparse_apply(
            mesh, st_q, model.q_accum, shifted_q,
            q_delta.transpose(1, 0, 2).astype(jnp.float32), sparse_opt,
            key=key)
        new_st_i, new_iacc = _sharded_sparse_apply(
            mesh, st_i, model.i_accum, item_ids[None],
            i_delta[None].astype(jnp.float32), sparse_opt, key=key_i)
        return ShardedTwoTower(
            query_tables=new_st_q, item_table=new_st_i,
            query_mlp=new_qmlp, item_mlp=new_imlp,
            q_accum=new_qacc, i_accum=new_iacc, config=cfg), (loss, acc)

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def unshard_two_tower(model: ShardedTwoTower) -> TwoTower:
    """Dense single-chip view (checkpoint export / test oracle)."""
    from ..models.two_tower import TwoTower as TT
    from ..ops.ensemble import StackedTables
    from ..tables import SimpleEmbedding

    from .sharded import unshard_row_state
    st_q, st_i = model.query_tables, model.item_table
    return TT(
        query_tables=StackedTables(data=st_q.unshard(), offsets=st_q.offsets,
                                   dim=st_q.dim),
        item_table=SimpleEmbedding(st_i.unshard()),
        query_mlp=model.query_mlp, item_mlp=model.item_mlp,
        q_state=unshard_row_state(st_q, model.q_accum),
        i_state=unshard_row_state(st_i, model.i_accum),
        config=model.config)
