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


def build_sharded_item_index(model: TwoTower, mesh: Mesh,
                             axis: str = "data") -> jax.Array:
    """`(item_vocab_padded, embed_dim)` corpus index, block-row-sharded
    `P(axis)`. Padding rows (if vocab % n != 0) embed row 0 and are masked
    out at retrieval by id bounds."""
    cfg = model.config
    n = mesh.shape[axis]
    v = cfg.item_vocab
    v_pad = -(-v // n) * n

    ids = jnp.minimum(jnp.arange(v_pad, dtype=jnp.int32), v - 1)
    ids = jax.device_put(ids, NamedSharding(mesh, P(axis)))
    data = jax.device_put(model.item_table.data, NamedSharding(mesh, P()))
    mlp = jax.device_put(model.item_mlp, NamedSharding(mesh, P()))

    @jax.jit
    def build(mlp, data, ids):
        rows = jnp.take(data, ids, axis=0)
        out = item_embed_from_rows(mlp, cfg, rows)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(axis)))

    return build(mlp, data, ids)


def sharded_retrieve(model: TwoTower, index: jax.Array, mesh: Mesh,
                     dense, q_cat, k: int = 10,
                     axis: str = "data") -> Tuple[jax.Array, jax.Array]:
    """Top-k over a row-sharded index: local top-k per shard + global merge.

    dense/q_cat: replicated query batch. Returns (scores (B,k), ids (B,k));
    ids >= item_vocab never appear (padding is masked)."""
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
