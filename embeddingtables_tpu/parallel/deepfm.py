"""Multi-chip DeepFM: the same hybrid decomposition as the sharded DLRM/DCN.

Deep tower / head / dense-linear parameters replicate; the stacked
ensemble(s) mod-row-shard over the mesh axis and ride the all_gather +
psum_scatter exchange (parallel/sharded.py). With the folded layout
(`cfg.folded`, the default — models/deepfm.py module docstring) there is
ONE fused (ΣV, D+1) stack and therefore ONE gather exchange and ONE
update exchange per step; the legacy layout keeps two stacks, each with
its own row-sharded optimizer state. Every lazy update applies through
the shared `_sharded_sparse_apply` (parallel/dlrm.py — one source of
truth for the shard-body math, so optimizer fixes land on every model
family at once). Batch shardings are `batch_shardings(mesh, axis)`,
identical to DLRM's.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.deepfm import (DeepFM, DeepFMConfig, forward_from_embeddings,
                             fuse_delta, split_fused)
from ..models.dlrm import bce_loss
from ..optim import SparseSGD, apply_dense_tx
from .dlrm import (_padded_stack_inputs, _sharded_sparse_apply,  # noqa: F401
                   batch_shardings)
from .sharded import (ShardedStackedTables, shard_row_accum,
                      sharded_ensemble_lookup)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedDeepFM:
    """DeepFM parameter pytree over a mesh: replicated dense parts, two
    mod-row-sharded stacks with their row-sharded optimizer states."""

    deep: list
    head: tuple
    dense_w: jax.Array
    bias: jax.Array
    tables: ShardedStackedTables    # FM vectors (dim D, fused dim D+1)
    fm_w: object                    # dim-1 stack (None when cfg.folded)
    # Sharded sparse-optimizer state per stack (shard_row_accum's layout;
    # see parallel.dlrm.ShardedDLRM.emb_accum).
    emb_accum: object
    fm_accum: object
    config: DeepFMConfig = dataclasses.field(metadata=dict(static=True))
    # Replicated optax state for the dense parts (dense_tx steps).
    dense_opt_state: object = None


def shard_deepfm(model: DeepFM, mesh: Mesh, axis="data",
                 sparse_opt=None, dense_tx=None) -> ShardedDeepFM:
    """Place a single-chip DeepFM onto a mesh (same placement rules as
    `parallel.dlrm.shard_dlrm`, applied to both stacks; `dense_tx`
    initializes a replicated tower state when the model has none)."""
    sparse_opt = sparse_opt or SparseSGD()
    st = ShardedStackedTables.shard(mesh, axis, model.tables)
    sw = (ShardedStackedTables.shard(mesh, axis, model.fm_w)
          if model.fm_w is not None else None)
    repl = NamedSharding(mesh, P())
    deep = jax.device_put(model.deep, repl)
    head = jax.device_put(model.head, repl)
    dense_w = jax.device_put(model.dense_w, repl)
    bias = jax.device_put(model.bias, repl)
    dstate = model.dense_opt_state
    if dstate is None and dense_tx is not None:
        dstate = dense_tx.init((deep, head, dense_w, bias))
    if dstate is not None:
        dstate = jax.device_put(dstate, repl)
    return ShardedDeepFM(
        deep=deep, head=head, dense_w=dense_w, bias=bias,
        tables=st, fm_w=sw,
        emb_accum=shard_row_accum(mesh, axis, st, model.emb_state,
                                  sparse_opt),
        fm_accum=(shard_row_accum(mesh, axis, sw, model.fm_state,
                                  sparse_opt) if sw is not None else None),
        config=model.config, dense_opt_state=dstate)


def make_sharded_deepfm_train_step(cfg: DeepFMConfig, mesh: Mesh,
                                   axis: str = "data", sparse_opt=None,
                                   dense_lr: float = 0.01, jit: bool = True,
                                   dense_tx=None, microbatch=None):
    """`step(model: ShardedDeepFM, dense, cat, label) -> (model, loss)` with
    `batch_shardings(mesh, axis)` on the batch arrays. Folded layout: ONE
    gather exchange and ONE fused lazy update per step; legacy layout: two
    of each (one per stack).
    microbatch=k: gradient accumulation over k `lax.scan` slices of the
    lookups + dense fwd/bwd (see `parallel.dlrm.make_sharded_train_step` —
    same grouping-independent math; BOTH stacks still take ONE full-batch
    update each)."""
    sparse_opt = sparse_opt or SparseSGD()
    from .dlrm import _check_sharded_opt
    _check_sharded_opt(sparse_opt, allow_sr=True)

    def _lookups(model, cat):
        # use_fm=False: the fm_w stack's exchange is skipped entirely — the
        # deep-only ablation pays ONE exchange per step, not two. Folded:
        # ONE exchange serves both activation sets (split_fused).
        if cfg.pad_idx is not None:
            kw = dict(stacked=True, combiner=cfg.combiner,
                      pad_idx=cfg.pad_idx)
            g_t = sharded_ensemble_lookup(mesh, model.tables, cat, **kw)
            if cfg.folded:
                w_t, emb_t = split_fused(g_t)
                return emb_t, w_t
            w_t = (sharded_ensemble_lookup(mesh, model.fm_w, cat, **kw)
                   if cfg.use_fm else None)
            return g_t, w_t
        g_t = sharded_ensemble_lookup(mesh, model.tables, cat, stacked=True)
        if cfg.folded:
            if cfg.combiner == "mean" and cat.ndim == 3:
                g_t = g_t / cat.shape[2]
            w_t, emb_t = split_fused(g_t)
            return emb_t, w_t
        emb_t = g_t
        w_t = (sharded_ensemble_lookup(mesh, model.fm_w, cat, stacked=True)
               if cfg.use_fm else None)
        if cfg.combiner == "mean" and cat.ndim == 3:
            emb_t = emb_t / cat.shape[2]
            if w_t is not None:
                w_t = w_t / cat.shape[2]
        return emb_t, w_t

    def step(model: ShardedDeepFM, dense, cat, label, lr=None,
             key=None):
        params = (model.deep, model.head, model.dense_w, model.bias)
        if microbatch and microbatch > 1:
            from ..models.microbatch import microbatch_grads

            def slice_grads(d_i, c_i, l_i):
                emb_i, w_i = _lookups(model, c_i)

                def loss_fn(dense_params, emb_act, w_act):
                    logits = forward_from_embeddings(dense_params, cfg,
                                                     d_i, emb_act, w_act)
                    return bce_loss(logits, l_i)

                if cfg.use_fm:
                    loss_i, (dg_i, de_i, dw_i) = jax.value_and_grad(
                        loss_fn, argnums=(0, 1, 2))(params, emb_i, w_i)
                    return loss_i, dg_i, (de_i, dw_i)
                loss_i, (dg_i, de_i) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(params, emb_i, None)
                return loss_i, dg_i, (de_i,)

            loss, dense_grads, deltas = microbatch_grads(
                params, dense, cat, label, microbatch, slice_grads)
            delta_emb = deltas[0]
            delta_w = deltas[1] if cfg.use_fm else None
        else:
            emb_t, w_t = _lookups(model, cat)

            def loss_fn(dense_params, emb_act, w_act):
                logits = forward_from_embeddings(dense_params, cfg, dense,
                                                 emb_act, w_act)
                return bce_loss(logits, label)

            if cfg.use_fm:
                loss, (dense_grads, delta_emb, delta_w) = \
                    jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                        params, emb_t, w_t)
            else:
                loss, (dense_grads, delta_emb) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(params, emb_t, None)
                delta_w = None
        if (cfg.pad_idx is None and cfg.combiner == "mean"
                and cat.ndim == 3):
            delta_emb = delta_emb / cat.shape[2]
            if delta_w is not None:
                delta_w = delta_w / cat.shape[2]
        (new_deep, new_head, new_dw, new_bias), new_dstate = apply_dense_tx(
            params, dense_grads, dense_tx, model.dense_opt_state, dense_lr)

        if cfg.folded:
            # One fused update exchange (fuse_delta == adjoint of the
            # forward's split_fused) — the second exchange disappears.
            delta_emb = fuse_delta(delta_w, delta_emb)
        shifted, scale_t = _padded_stack_inputs(model.tables, cat,
                                                cfg.combiner, cfg.pad_idx)
        new_st, new_acc = _sharded_sparse_apply(
            mesh, model.tables, model.emb_accum, shifted, delta_emb,
            sparse_opt, scale_t=scale_t, lr=lr, key=key)
        if cfg.use_fm and not cfg.folded:
            # Independent rounding noise for the second stack.
            key_w = (jax.random.fold_in(key, 1) if key is not None
                     else None)
            new_sw, new_wacc = _sharded_sparse_apply(
                mesh, model.fm_w, model.fm_accum, shifted, delta_w,
                sparse_opt, scale_t=scale_t, lr=lr, key=key_w)
        else:
            new_sw, new_wacc = model.fm_w, model.fm_accum
        return ShardedDeepFM(deep=new_deep, head=new_head, dense_w=new_dw,
                             bias=new_bias, tables=new_st, fm_w=new_sw,
                             emb_accum=new_acc, fm_accum=new_wacc,
                             config=cfg, dense_opt_state=new_dstate), loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_sharded_deepfm_eval_step(cfg: DeepFMConfig, mesh: Mesh,
                                  axis: str = "data", jit: bool = True):
    def step(model: ShardedDeepFM, dense, cat):
        if cfg.pad_idx is not None:
            kw = dict(stacked=True, combiner=cfg.combiner,
                      pad_idx=cfg.pad_idx)
            g_t = sharded_ensemble_lookup(mesh, model.tables, cat, **kw)
            if cfg.folded:
                w_t, emb_t = split_fused(g_t)
            else:
                emb_t = g_t
                w_t = (sharded_ensemble_lookup(mesh, model.fm_w, cat, **kw)
                       if cfg.use_fm else None)
        else:
            g_t = sharded_ensemble_lookup(mesh, model.tables, cat,
                                          stacked=True)
            if cfg.combiner == "mean" and cat.ndim == 3:
                g_t = g_t / cat.shape[2]
            if cfg.folded:
                w_t, emb_t = split_fused(g_t)
            else:
                emb_t = g_t
                w_t = (sharded_ensemble_lookup(mesh, model.fm_w, cat,
                                               stacked=True)
                       if cfg.use_fm else None)
                if (cfg.combiner == "mean" and cat.ndim == 3
                        and w_t is not None):
                    w_t = w_t / cat.shape[2]
        return forward_from_embeddings(
            (model.deep, model.head, model.dense_w, model.bias), cfg,
            dense, emb_t, w_t)
    if jit:
        step = jax.jit(step)
    return step


def unshard_deepfm(model: ShardedDeepFM) -> DeepFM:
    """Dense single-chip DeepFM from the sharded one (checkpoint export,
    quantized serving via `quant.quantize_deepfm`, test oracle)."""
    from ..ops.ensemble import StackedTables
    from .sharded import unshard_row_state

    st, sw = model.tables, model.fm_w
    return DeepFM(
        deep=model.deep, head=model.head, dense_w=model.dense_w,
        bias=model.bias,
        tables=StackedTables(data=st.unshard(), offsets=st.offsets,
                             dim=st.dim),
        fm_w=(StackedTables(data=sw.unshard(), offsets=sw.offsets, dim=1)
              if sw is not None else None),
        emb_state=unshard_row_state(st, model.emb_accum),
        fm_state=(unshard_row_state(sw, model.fm_accum)
                  if sw is not None else None),
        config=model.config, dense_opt_state=model.dense_opt_state)
