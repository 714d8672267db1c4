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
from ..optim import SparseSGD, apply_dense_tx
from .dlrm import (_padded_stack_inputs, _sharded_sparse_apply,  # noqa: F401
                   batch_shardings)
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
    # Sharded sparse-optimizer state (shard_row_accum's layout; see
    # parallel.dlrm.ShardedDLRM.emb_accum).
    emb_accum: object
    config: DCNConfig = dataclasses.field(metadata=dict(static=True))
    # Replicated optax state for the dense parts (dense_tx steps).
    dense_opt_state: object = None


def shard_dcn(model: DCN, mesh: Mesh, axis="data",
              sparse_opt=None, dense_tx=None) -> ShardedDCN:
    """Place a single-chip DCN onto a mesh (same placement rules as
    `parallel.dlrm.shard_dlrm`; `dense_tx` initializes a replicated tower
    state when the model has none)."""
    sparse_opt = sparse_opt or SparseSGD()
    st = ShardedStackedTables.shard(mesh, axis, model.tables)
    repl = NamedSharding(mesh, P())
    cross = jax.device_put(model.cross, repl)
    deep = jax.device_put(model.deep, repl)
    head = jax.device_put(model.head, repl)
    acc = shard_row_accum(mesh, axis, st, model.emb_state, sparse_opt)
    dstate = getattr(model, "dense_opt_state", None)
    if dstate is None and dense_tx is not None:
        dstate = dense_tx.init((cross, deep, head))
    if dstate is not None:
        dstate = jax.device_put(dstate, repl)
    return ShardedDCN(cross=cross, deep=deep, head=head, tables=st,
                      emb_accum=acc, config=model.config,
                      dense_opt_state=dstate)


def make_sharded_dcn_train_step(cfg: DCNConfig, mesh: Mesh,
                                axis: str = "data", sparse_opt=None,
                                dense_lr: float = 0.01, jit: bool = True,
                                dense_tx=None, microbatch=None):
    """`step(model: ShardedDCN, dense, cat, label) -> (model, loss)` with
    `batch_shardings(mesh, axis)` on the batch arrays. Gather exchange
    (exact); the DLRM module remains the reference for the a2a variant.
    microbatch=k: gradient accumulation over k `lax.scan` slices (see
    `parallel.dlrm.make_sharded_train_step` — same grouping-independent
    math, one full-batch sparse update)."""
    sparse_opt = sparse_opt or SparseSGD()
    from .dlrm import _check_sharded_opt
    _check_sharded_opt(sparse_opt, allow_sr=True)

    def step(model: ShardedDCN, dense, cat, label, lr=None, key=None):
        st = model.tables

        def lookup_fn(c):
            if cfg.pad_idx is not None:
                return sharded_ensemble_lookup(mesh, st, c, stacked=True,
                                               combiner=cfg.combiner,
                                               pad_idx=cfg.pad_idx)
            e = sharded_ensemble_lookup(mesh, st, c, stacked=True)
            if cfg.combiner == "mean" and c.ndim == 3:
                e = e / c.shape[2]
            return e

        params = (model.cross, model.deep, model.head)
        if microbatch and microbatch > 1:
            from ..models.microbatch import microbatch_grads

            def slice_grads(d_i, c_i, l_i):
                emb_i = lookup_fn(c_i)

                def loss_fn(dense_params, emb_act):
                    cross, deep, head = dense_params
                    logits = forward_from_embeddings(cross, deep, head,
                                                     cfg, d_i, emb_act)
                    return bce_loss(logits, l_i)

                loss_i, (dg_i, delta_i) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(params, emb_i)
                return loss_i, dg_i, (delta_i,)

            loss, dense_grads, (delta_t,) = microbatch_grads(
                params, dense, cat, label, microbatch, slice_grads)
        else:
            emb_t = lookup_fn(cat)

            def loss_fn(dense_params, emb_act):
                cross, deep, head = dense_params
                logits = forward_from_embeddings(cross, deep, head, cfg,
                                                 dense, emb_act)
                return bce_loss(logits, label)

            loss, (dense_grads, delta_t) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, emb_t)
        if cfg.pad_idx is None and cfg.combiner == "mean" and cat.ndim == 3:
            delta_t = delta_t / cat.shape[2]
        (new_cross, new_deep, new_head), new_dstate = apply_dense_tx(
            params, dense_grads, dense_tx, model.dense_opt_state, dense_lr)

        shifted, scale_t = _padded_stack_inputs(st, cat, cfg.combiner,
                                                cfg.pad_idx)
        new_st, new_accum = _sharded_sparse_apply(
            mesh, st, model.emb_accum, shifted, delta_t, sparse_opt,
            scale_t=scale_t, lr=lr, key=key)
        return ShardedDCN(cross=new_cross, deep=new_deep, head=new_head,
                          tables=new_st, emb_accum=new_accum,
                          config=cfg, dense_opt_state=new_dstate), loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_sharded_dcn_eval_step(cfg: DCNConfig, mesh: Mesh,
                               axis: str = "data", jit: bool = True):
    def step(model: ShardedDCN, dense, cat):
        if cfg.pad_idx is not None:
            emb_t = sharded_ensemble_lookup(mesh, model.tables, cat,
                                            stacked=True,
                                            combiner=cfg.combiner,
                                            pad_idx=cfg.pad_idx)
        else:
            emb_t = sharded_ensemble_lookup(mesh, model.tables, cat,
                                            stacked=True)
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
    from .sharded import unshard_row_state

    st = model.tables
    return DCN(cross=model.cross, deep=model.deep, head=model.head,
               tables=StackedTables(data=st.unshard(), offsets=st.offsets,
                                    dim=st.dim),
               emb_state=unshard_row_state(st, model.emb_accum),
               config=model.config,
               dense_opt_state=model.dense_opt_state)
