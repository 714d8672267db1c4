"""Multi-chip DCN-v2: the same hybrid decomposition as the sharded DLRM.

Cross/deep/head parameters are tiny and replicate; the stacked embedding
table mod-row-shards over the mesh axis and rides the exact
all_gather + psum_scatter exchange (parallel/sharded.py); the lazy sparse
update applies per shard through the shared `_sharded_sparse_apply`
(parallel/dlrm.py — one source of truth for the shard-body math, so
optimizer fixes land on every model family at once). Batch shardings are
`batch_shardings(mesh, axis)`, identical to DLRM's.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dcn import DCN, DCNConfig, forward_from_embeddings
from ..models.dlrm import bce_loss
from ..optim import SparseRowWiseAdaGrad, SparseSGD
from .dlrm import _sharded_sparse_apply, batch_shardings  # noqa: F401
from .sharded import (ShardedStackedTables, _axes_tuple, shard_row_accum,
                      sharded_ensemble_lookup)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedDCN:
    """DCN parameter pytree over a mesh: replicated dense parts, mod-row-
    sharded stacked embedding table, row-sharded optimizer state."""

    cross: list
    deep: list
    head: tuple
    tables: ShardedStackedTables
    emb_accum: jax.Array
    config: DCNConfig = dataclasses.field(metadata=dict(static=True))


def shard_dcn(model: DCN, mesh: Mesh, axis="data",
              sparse_opt=None) -> ShardedDCN:
    """Place a single-chip DCN onto a mesh (same placement rules as
    `parallel.dlrm.shard_dlrm`)."""
    sparse_opt = sparse_opt or SparseSGD()
    st = ShardedStackedTables.shard(mesh, axis, model.tables)
    repl = NamedSharding(mesh, P())
    cross = jax.device_put(model.cross, repl)
    deep = jax.device_put(model.deep, repl)
    head = jax.device_put(model.head, repl)
    acc = shard_row_accum(mesh, axis, st, model.emb_state, sparse_opt)
    return ShardedDCN(cross=cross, deep=deep, head=head, tables=st,
                      emb_accum=acc, config=model.config)


def make_sharded_dcn_train_step(cfg: DCNConfig, mesh: Mesh,
                                axis: str = "data", sparse_opt=None,
                                dense_lr: float = 0.01, jit: bool = True):
    """`step(model: ShardedDCN, dense, cat, label) -> (model, loss)` with
    `batch_shardings(mesh, axis)` on the batch arrays. Gather exchange
    (exact); the DLRM module remains the reference for the a2a variant."""
    sparse_opt = sparse_opt or SparseSGD()
    if not isinstance(sparse_opt, (SparseSGD, SparseRowWiseAdaGrad)):
        raise NotImplementedError(
            f"sharded train step supports SparseSGD / SparseRowWiseAdaGrad, "
            f"got {type(sparse_opt).__name__}")

    def step(model: ShardedDCN, dense, cat, label):
        st = model.tables
        emb_t = sharded_ensemble_lookup(mesh, st, cat, stacked=True)
        if cfg.combiner == "mean" and cat.ndim == 3:
            emb_t = emb_t / cat.shape[2]

        def loss_fn(dense_params, emb_act):
            cross, deep, head = dense_params
            logits = forward_from_embeddings(cross, deep, head, cfg,
                                             dense, emb_act)
            return bce_loss(logits, label)

        params = (model.cross, model.deep, model.head)
        loss, (dense_grads, delta_t) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(params, emb_t)
        if cfg.combiner == "mean" and cat.ndim == 3:
            delta_t = delta_t / cat.shape[2]
        new_cross, new_deep, new_head = jax.tree.map(
            lambda p, g: (p - dense_lr * g).astype(p.dtype),
            params, dense_grads)

        shifted = jnp.stack([cat[t] + st.offsets[t]
                             for t in range(st.ntables)])
        new_st, new_accum = _sharded_sparse_apply(
            mesh, st, model.emb_accum, shifted, delta_t, sparse_opt)
        return ShardedDCN(cross=new_cross, deep=new_deep, head=new_head,
                          tables=new_st, emb_accum=new_accum,
                          config=cfg), loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_sharded_dcn_eval_step(cfg: DCNConfig, mesh: Mesh,
                               axis: str = "data", jit: bool = True):
    def step(model: ShardedDCN, dense, cat):
        emb_t = sharded_ensemble_lookup(mesh, model.tables, cat, stacked=True)
        if cfg.combiner == "mean" and cat.ndim == 3:
            emb_t = emb_t / cat.shape[2]
        return forward_from_embeddings(model.cross, model.deep, model.head,
                                       cfg, dense, emb_t)
    if jit:
        step = jax.jit(step)
    return step


def unshard_dcn(model: ShardedDCN) -> DCN:
    """Dense single-chip DCN from the sharded one (checkpoint export,
    quantized serving via `quant.quantize_dcn`, test oracle)."""
    from ..ops.ensemble import StackedTables
    from ..optim import SparseOptState

    st = model.tables
    acc = model.emb_accum
    if acc.shape[1] == 0:
        accum = jnp.zeros((0,), jnp.float32)
    else:
        n, rows = acc.shape
        accum = acc.T.reshape(n * rows)[:st.vocab]
    return DCN(cross=model.cross, deep=model.deep, head=model.head,
               tables=StackedTables(data=st.unshard(), offsets=st.offsets,
                                    dim=st.dim),
               emb_state=SparseOptState(accum=accum), config=model.config)
