"""Multi-chip DLRM: hybrid data-parallel dense + model-parallel embeddings.

This is the pod-scale realization of the classic DLRM decomposition the
reference never had (SURVEY.md §2.3 DP/TP/EP rows; the reference is
single-host threads, `/root/reference/src/lookup.jl:262-276`):

  - Dense towers (bottom/top MLP): **replicated** params, batch sharded over
    the mesh axis. XLA inserts the gradient `psum` automatically from sharding
    propagation (replicated params x sharded batch -> replicated grads).
  - Embedding ensemble: the stacked `(ΣV, D)` table is **mod-row-sharded**
    over the *same* axis (every chip is both a data-parallel worker and an
    embedding shard owner — the standard DLRM "butterfly"). Lookup and update
    ride ICI collectives (`all_gather` of indices / lazy deltas +
    `psum_scatter` of partial embeddings) inside `shard_map`
    (parallel/sharded.py).
  - Sparse optimizer state (row-wise AdaGrad accumulators) is sharded
    identically to the rows it describes: `(n_shards, rows_local)` with
    `P(axis)`. Disjoint row ownership makes the update race-free by
    construction — the reference's IndexerView discipline
    (`src/utils.jl:320-338`) realized as physical sharding.

Tests run on the 8-device virtual CPU mesh; the driver's `dryrun_multichip`
compiles and executes one step of this path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dlrm import (DLRM, DLRMConfig, bce_loss, forward_from_embeddings,
                           init_dlrm)
from ..optim import SparseRowWiseAdaGrad, SparseSGD, apply_dense_tx
from .sharded import (ShardedStackedTables, _axes_tuple, _flat_axis_index,
                      shard_row_accum, sharded_ensemble_lookup)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedDLRM:
    """DLRM parameter pytree over a mesh: replicated dense towers, mod-row-
    sharded stacked embedding table, row-sharded sparse-optimizer state."""

    bottom: list
    top: list
    tables: ShardedStackedTables
    # Sharded sparse-optimizer state (shard_row_accum's layout): the
    # (n_shards, rows_local) AdaGrad accumulator or (n_shards, 0)
    # placeholder, the Adam (m, v, count) tuple, or the FTRL (z, n) tuple.
    emb_accum: object
    config: DLRMConfig = dataclasses.field(metadata=dict(static=True))
    # Replicated optax state for the towers when the step was built with
    # dense_tx (towers are replicated, so their optimizer state is too).
    dense_opt_state: object = None


def shard_dlrm(model: DLRM, mesh: Mesh, axis="data",
               sparse_opt=None, dense_tx=None) -> ShardedDLRM:
    """Place a single-chip DLRM onto a mesh (replicate dense, mod-shard the
    stacked table and its row state). `axis` may be a tuple of mesh axes for
    the 2-D decomposition (rows over data x model, batch over data).
    dense_tx: pass the step's optax tower transform so a model that was
    initialized without one still gets a replicated state here."""
    sparse_opt = sparse_opt or SparseSGD()
    st = ShardedStackedTables.shard(mesh, axis, model.tables)
    repl = NamedSharding(mesh, P())
    bottom = jax.device_put(model.bottom, repl)
    top = jax.device_put(model.top, repl)
    acc = shard_row_accum(mesh, axis, st, model.emb_state, sparse_opt)
    dstate = getattr(model, "dense_opt_state", None)
    if dstate is None and dense_tx is not None:
        dstate = dense_tx.init((bottom, top))
    if dstate is not None:
        dstate = jax.device_put(dstate, repl)
    return ShardedDLRM(bottom=bottom, top=top, tables=st, emb_accum=acc,
                       config=model.config, dense_opt_state=dstate)


def init_sharded_dlrm(key: jax.Array, cfg: DLRMConfig, mesh: Mesh,
                      axis: str = "data", sparse_opt=None,
                      dense_tx=None) -> ShardedDLRM:
    """Initialize DIRECTLY onto the mesh: each device generates its own table
    shard (never materializing the full (ΣV, D) array anywhere) — the path
    for beyond-single-HBM vocabularies. Dense towers are tiny and init
    replicated."""
    from ..models.dlrm import _init_mlp
    sparse_opt = sparse_opt or SparseSGD()
    kd, ke = jax.random.split(key)
    st = ShardedStackedTables.init_sharded(
        mesh, axis, cfg.vocab_sizes, cfg.dim, ke,
        dtype=getattr(cfg, "tables_dtype", cfg.param_dtype))
    n, rows_local, _ = st.data.shape
    repl = NamedSharding(mesh, P())
    kb, kt = jax.random.split(kd)
    bottom = jax.device_put(
        _init_mlp(kb, (cfg.num_dense,) + cfg.bottom_mlp, cfg.param_dtype),
        repl)
    top = jax.device_put(
        _init_mlp(kt, (cfg.interaction_features,) + cfg.top_mlp,
                  cfg.param_dtype), repl)
    from .sharded import init_sharded_row_state
    acc = init_sharded_row_state(mesh, st, sparse_opt)
    dstate = (jax.device_put(dense_tx.init((bottom, top)), repl)
              if dense_tx is not None else None)
    return ShardedDLRM(bottom=bottom, top=top, tables=st, emb_accum=acc,
                       config=cfg, dense_opt_state=dstate)


def batch_shardings(mesh: Mesh, axis="data"):
    """NamedShardings for a (dense, cat, label) batch: batch-dim sharded over
    the data axis (the first axis when the table spans several)."""
    baxis = _axes_tuple(axis)[0]
    return (NamedSharding(mesh, P(baxis)),          # dense (B, F)
            NamedSharding(mesh, P(None, baxis)),    # cat   (T, B[, bag])
            NamedSharding(mesh, P(baxis)))          # label (B,)


# ---------------------------------------------------------------------------
# Sharded sparse-optimizer application
# ---------------------------------------------------------------------------

def _sharded_sparse_apply(mesh: Mesh, st: ShardedStackedTables,
                          accum: jax.Array, shifted_idx: jax.Array,
                          delta_t: jax.Array, sparse_opt, *,
                          batch_sharded: bool = True, scale_t=None,
                          lr=None, key=None):
    """Apply per-table lazy updates `(delta_t[(T,B,D)], shifted_idx[(T,B[,bag])])`
    to the mod-sharded stack in ONE exchange.

    Each device all-gathers the occurrence stream, keeps the rows it owns
    (disjoint ownership = race-freedom), locally dedups (dense-grad, sort-free),
    and advances each owned row and its optimizer state exactly once —
    the reference's accumulate-then-single-write contract
    (`/root/reference/src/sparseupdate.jl:97-129`) per shard.

    scale_t: optional (T, B[, bag]) f32 per-occurrence gradient scale
    (mean-combiner normalization / pad masks — the lazy update's `weights`
    on the mesh); it rides the same all-gather.

    lr: optional TRACED scalar overriding `sparse_opt.lr` this step (the
    train loops' `lr_schedule=`; None keeps the baked-in constant and the
    exact pre-existing program). FTRL rejects it — alpha is baked into
    the accumulated z state (`SparseFTRL.apply`'s contract).

    `accum` is whatever `shard_row_accum` produced for this optimizer:
    the `(n, rows_local)` AdaGrad accumulator (or `(n, 0)` placeholder),
    the Adam `(m, v, count)` tuple, or the FTRL `(z, n)` tuple. Adam and
    FTRL route to their dedicated shard primitives (sharded.py), which
    share the same exchange and the same `optim.*_dense_body` math.
    Returns `(new_st, new_accum)` with `new_accum` in the same layout.

    key: per-step PRNG key when `sparse_opt.stochastic_rounding` is on
    (bf16 tables, rounding.py) — threaded as replicated raw key data and
    folded with the shard index inside the exchange, so every device
    rounds with independent noise.
    """
    from ..optim import SparseFTRL, SparseLazyAdam
    from .sharded import sharded_adam_apply, sharded_ftrl_apply
    if isinstance(sparse_opt, SparseLazyAdam):
        m, v, count = accum
        new_st, new_m, new_v, new_count = sharded_adam_apply(
            mesh, st, m, v, count, shifted_idx, delta_t, sparse_opt,
            batch_sharded=batch_sharded, scale_t=scale_t, lr=lr, key=key)
        return new_st, (new_m, new_v, new_count)
    if isinstance(sparse_opt, SparseFTRL):
        if key is not None:
            raise ValueError("SparseFTRL has no stochastic-rounding mode")
        if lr is not None:
            raise ValueError(
                "SparseFTRL cannot change lr per step: alpha is baked "
                "into the accumulated z state (drop lr_schedule or use "
                "another optimizer)")
        z, n_state = accum
        new_st, new_z, new_n = sharded_ftrl_apply(
            mesh, st, z, n_state, shifted_idx, delta_t, sparse_opt,
            batch_sharded=batch_sharded, scale_t=scale_t)
        return new_st, (new_z, new_n)
    axes = st.axes
    baxis = axes[0]
    n = st.n_shards
    adagrad = isinstance(sparse_opt, SparseRowWiseAdaGrad)
    dim = st.dim

    has_scale = scale_t is not None
    has_lr = lr is not None
    has_key = key is not None

    def body(shard, acc, lidx, ldelta, *extra):
        # extra layout: [scale?] [lr?] [key-data?] (flags are static).
        pos = 0
        lscale = None
        if has_scale:
            lscale, pos = extra[0], 1
        # Traced per-step lr (replicated scalar operand) or the Python
        # constant: lr_val is whatever multiplies the deduped gradient.
        lr_val = sparse_opt.lr
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
        # Per-occurrence (global row, delta row) stream; (T,B,bag) indices fan
        # one delta row out over the bag (reference `columns()` iterator,
        # `src/utils.jl:69-83`). Streaming repeat, not a delta[cols] gather
        # (identity/repeat gathers run at the random-DMA rate — optim.py).
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
        lrow = jnp.where(mine, rows // n, rows_local)  # sentinel = OOB -> drop
        # Independent rounding noise per shard: fold the device index in.
        rkey = (jax.random.fold_in(jax.random.wrap_key_data(kd), me)
                if has_key else None)

        # Shard bodies share the single-chip dense-grad math (optim.py
        # `sgd_dense_body`/`adagrad_dense_body`), so weight_decay/clipnorm
        # and numerical guards behave identically on and off the mesh.
        # Non-owned occurrences carry the OOB sentinel and drop.
        if not adagrad:
            if sparse_opt.weight_decay == 0.0 and sparse_opt.clipnorm is None \
                    and rkey is None:
                new = shard[0].at[lrow].add(
                    (-lr_val * g).astype(shard.dtype), mode="drop")
                return new[None], acc
            from ..optim import sgd_dense_body
            new = sgd_dense_body(shard[0], lrow, g, lr_val,
                                 sparse_opt.weight_decay,
                                 sparse_opt.clipnorm, rounding_key=rkey,
                                 grad_dtype=getattr(
                                     sparse_opt, "dense_grad_dtype", None))
            return new[None], acc
        from ..optim import adagrad_dense_body
        new_shard, new_acc = adagrad_dense_body(
            shard[0], acc[0], lrow, g, lr_val, sparse_opt.eps,
            sparse_opt.weight_decay, sparse_opt.clipnorm, rounding_key=rkey,
            grad_dtype=getattr(sparse_opt, "dense_grad_dtype", None))
        return new_shard[None], new_acc[None]

    spec = P(None, baxis) if batch_sharded else P()
    extra = () if scale_t is None else (scale_t,)
    extra_spec = () if scale_t is None else (spec,)
    if has_lr:
        extra = extra + (jnp.asarray(lr, jnp.float32),)
        extra_spec = extra_spec + (P(),)
    if has_key:
        # Raw (replicated) key data; re-wrapped + shard-folded in body.
        extra = extra + (jax.random.key_data(key),)
        extra_spec = extra_spec + (P(),)
    if not adagrad:
        # Stateless: don't thread the (n, 0) placeholder through the
        # exchange — XLA canonicalizes zero-size arrays to a replicated
        # sharding, which would fight the P(axes) spec in eager shard_map.
        new_data = jax.shard_map(
            lambda shard, lidx, ldelta, *ls: body(shard, None, lidx,
                                                  ldelta, *ls)[0],
            mesh=mesh, in_specs=(P(axes), spec, spec) + extra_spec,
            out_specs=P(axes))(st.data, shifted_idx, delta_t, *extra)
        return dataclasses.replace(st, data=new_data), accum
    new_data, new_accum = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes), P(axes), spec, spec) + extra_spec,
        out_specs=(P(axes), P(axes)))(st.data, accum, shifted_idx, delta_t,
                                      *extra)
    return dataclasses.replace(st, data=new_data), new_accum


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


def _padded_stack_inputs(st: ShardedStackedTables, cat: jax.Array,
                         combiner: str, pad_idx, *,
                         global_sentinel: bool = False):
    """(shifted (T, B[, bag]) global ids, per-occurrence eff scale or None).

    Pad handling happens pre-shift (a shifted pad no longer matches the
    sentinel): pads remap to each table's global row 0 carrying scale 0
    (the gather exchange's zero-weight discipline), or — with
    `global_sentinel` — to the canonical global sentinel -1 (no real
    stacked row is negative), which the butterfly exchange drops at the
    ROUTING stage via its native `pad_idx=-1` support (no capacity rank,
    no wire traffic). The scale is the lazy update's effective weights —
    the pad mask, mean-normalized per (table, example) when
    combiner='mean'."""
    t = st.ntables
    if pad_idx is None:
        return jnp.stack([cat[i] + st.offsets[i] for i in range(t)]), None
    valid = cat != pad_idx
    if global_sentinel:
        shifted = jnp.stack([jnp.where(valid[i], cat[i] + st.offsets[i], -1)
                             for i in range(t)])
    else:
        shifted = jnp.stack([jnp.where(valid[i], cat[i], 0) + st.offsets[i]
                             for i in range(t)])
    w = valid.astype(jnp.float32)
    if combiner == "mean" and cat.ndim == 3:
        w = w / jnp.maximum(w.sum(axis=2, keepdims=True), 1e-12)
    return shifted, w


def _check_sharded_opt(sparse_opt, exchange: str = "gather",
                       allow_sr: bool = False):
    """Reject optimizer/exchange combinations the sharded steps don't
    implement — loudly, never silently running the wrong math (cf. the
    round-1 ensemble_update bug). Shared by the DLRM/DCN/DeepFM builders.

    Both exchanges take SGD / row-wise AdaGrad / lazy Adam / FTRL: gather
    routes through `_sharded_sparse_apply`'s one exchange, a2a through the
    butterfly update primitives (alltoall.py) — all sharing the
    `optim.*_dense_body` shard math. Stochastic rounding (bf16 tables)
    rides EVERY placement — all family exchanges, column sharding, and
    the planner's three groups (per-step key as replicated key data,
    folded with the shard index so devices round independently)."""
    from ..optim import SparseFTRL, SparseLazyAdam
    allowed = (SparseSGD, SparseRowWiseAdaGrad, SparseLazyAdam, SparseFTRL)
    if not isinstance(sparse_opt, allowed):
        raise NotImplementedError(
            f"sharded train step (exchange={exchange!r}) supports "
            f"{' / '.join(c.__name__ for c in allowed)}, "
            f"got {type(sparse_opt).__name__}")
    if getattr(sparse_opt, "stochastic_rounding", False) and not allow_sr:
        raise NotImplementedError(
            "this path does not thread a per-device rounding key")


def make_sharded_train_step(cfg: DLRMConfig, mesh: Mesh, axis: str = "data",
                            sparse_opt=None, dense_lr: float = 0.01,
                            jit: bool = True, exchange: str = "gather",
                            capacity_factor: float = 2.0,
                            with_overflow: bool = False, dense_tx=None,
                            wire_dtype=None, microbatch=None):
    """Build the multi-chip fused train step.

    `step(model: ShardedDLRM, dense, cat, label) -> (model, loss)` where the
    batch arrays carry `batch_shardings(mesh, axis)`. One jitted program:
    sharded ensemble lookup -> local dense fwd/bwd (grad psum by XLA) ->
    sharded fused sparse update + replicated dense SGD.

    exchange: "gather" = exact all_gather + psum_scatter (sharded.py);
    "a2a" = the butterfly all-to-all (alltoall.py) — ~n/2x less ICI traffic,
    but occurrences beyond `capacity_factor` headroom per owner are dropped.
    Pass `with_overflow=True` to have the a2a step return
    `(model, (loss, overflow))` — feed the observed drop fraction to
    `alltoall.suggest_capacity_factor` and rebuild the step when nonzero.

    microbatch=k (gather exchange): gradient accumulation — the lookup +
    dense fwd/bwd scan over k equal batch slices so only B/k examples'
    activations are live at once, exactly like the single-chip
    `models.dlrm.make_train_step(microbatch=)`; the ONE fused sparse update
    still applies the full-batch (T, B, dim) lazy delta. Slicing is
    grouping-independent math (pointwise BCE, mean-of-means loss, 1/B
    per-example delta scale), so this bit-matches the monolithic step up
    to float re-association.
    """
    sparse_opt = sparse_opt or SparseSGD()
    if exchange not in ("gather", "a2a"):
        raise ValueError(exchange)
    if microbatch and microbatch > 1 and exchange != "gather":
        raise NotImplementedError(
            "microbatch accumulation rides the gather exchange only (the "
            "a2a butterfly's per-slice capacity buckets would change the "
            "drop semantics); pass exchange='gather' or drop microbatch")
    if wire_dtype is not None and exchange != "a2a":
        raise ValueError(
            "wire_dtype applies to the a2a butterfly's row payloads only "
            "(the gather exchange reduces on the wire via psum_scatter, "
            "where a cast would change the accumulation dtype); pass "
            "exchange='a2a' or drop wire_dtype")
    _check_sharded_opt(sparse_opt, exchange=exchange, allow_sr=True)
    def step_a2a(model: ShardedDLRM, dense, cat, label, lr=None, key=None):
        from ..optim import SparseFTRL as _FT
        if lr is not None and isinstance(sparse_opt, _FT):
            raise ValueError(
                "SparseFTRL cannot change lr per step: alpha is baked "
                "into the accumulated z state (drop lr_schedule or use "
                "another optimizer)")
        from .alltoall import (sharded_adagrad_update_a2a, sharded_lookup_a2a,
                               sharded_sgd_update_a2a)
        from ..ops.sparse_update import SparseEmbeddingUpdate
        st = model.tables
        t = st.ntables
        bag = cat.shape[2] if cat.ndim == 3 else None
        # (B, T[, bag]) batch-major stream, batch-sharded on dim 0. Pads
        # map to the GLOBAL sentinel -1 pre-shift (shared
        # _padded_stack_inputs) and ride the butterfly's native pad_idx
        # support: dropped at the ROUTING stage — no capacity rank, no
        # wire traffic, stream positions come back as zero rows.
        shifted_tb, scale_tb = _padded_stack_inputs(
            st, cat, cfg.combiner, cfg.pad_idx, global_sentinel=True)
        shifted_bt = jnp.swapaxes(shifted_tb, 0, 1)
        a2a_pad = None if cfg.pad_idx is None else -1
        if bag is None:
            emb_bt, ovf_fwd = sharded_lookup_a2a(
                mesh, st, shifted_bt, capacity_factor=capacity_factor,
                reducing=False, pad_idx=a2a_pad,
                wire_dtype=wire_dtype)                       # (B, T, D)
        else:
            b = shifted_bt.shape[0]
            flat_bt = shifted_bt.reshape(b, t * bag)
            rows, ovf_fwd = sharded_lookup_a2a(
                mesh, st, flat_bt, capacity_factor=capacity_factor,
                reducing=False, pad_idx=a2a_pad,
                wire_dtype=wire_dtype)                       # (B, T*bag, D)
            emb_bt = rows.reshape(b, t, bag, cfg.dim).sum(axis=2)
            if cfg.combiner == "mean":
                if a2a_pad is not None:
                    denom = jnp.maximum((shifted_bt >= 0).sum(axis=2),
                                        1e-12)               # (B, T)
                    emb_bt = emb_bt / denom[..., None].astype(emb_bt.dtype)
                else:
                    emb_bt = emb_bt / bag
        emb_t = jnp.swapaxes(emb_bt, 0, 1)

        def loss_fn(dense_params, emb_act):
            bottom, top = dense_params
            logits = forward_from_embeddings(bottom, top, cfg, dense,
                                             emb_act)
            return bce_loss(logits, label)

        loss, (dense_grads, delta_t) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))((model.bottom, model.top), emb_t)
        (new_bottom, new_top), new_dstate = apply_dense_tx(
            (model.bottom, model.top), dense_grads, dense_tx,
            model.dense_opt_state, dense_lr)
        delta_bt = jnp.swapaxes(delta_t, 0, 1).reshape(-1, cfg.dim)
        upd_w = None
        if scale_tb is not None:
            # Effective per-occurrence weights (pad mask, mean-normalized
            # over valid bag mass) from the shared helper; pads also drop
            # at the update's routing via the -1 sentinel.
            scale_bt = jnp.swapaxes(scale_tb, 0, 1)
            upd_w = scale_bt.reshape((-1,) if bag is None
                                     else (scale_bt.shape[0] * t, bag))
        elif bag is not None and cfg.combiner == "mean":
            delta_bt = delta_bt / bag
        upd = SparseEmbeddingUpdate(
            delta=delta_bt,
            indices=shifted_bt.reshape((-1,) if bag is None
                                       else (shifted_bt.shape[0] * t, bag)),
            weights=upd_w)
        from ..optim import SparseFTRL, SparseLazyAdam
        kw = dict(capacity_factor=capacity_factor, pad_idx=a2a_pad,
                  wire_dtype=wire_dtype)
        if getattr(sparse_opt, "stochastic_rounding", False):
            # Per-step SR key rides the routed update as replicated key
            # data (per-shard fold inside) — same contract as the gather
            # exchange's step.
            kw["key"] = key
        if isinstance(sparse_opt, SparseRowWiseAdaGrad):
            new_st, new_accum, ovf_bwd = sharded_adagrad_update_a2a(
                mesh, st, model.emb_accum, upd, sparse_opt, lr=lr, **kw)
        elif isinstance(sparse_opt, SparseLazyAdam):
            from .alltoall import sharded_adam_update_a2a
            m_, v_, count_ = model.emb_accum
            new_st, new_m, new_v, new_count, ovf_bwd = \
                sharded_adam_update_a2a(mesh, st, m_, v_, count_, upd,
                                        sparse_opt, lr=lr, **kw)
            new_accum = (new_m, new_v, new_count)
        elif isinstance(sparse_opt, SparseFTRL):
            from .alltoall import sharded_ftrl_update_a2a
            z_, n_ = model.emb_accum
            new_st, new_z, new_n, ovf_bwd = sharded_ftrl_update_a2a(
                mesh, st, z_, n_, upd, sparse_opt, **kw)
            new_accum = (new_z, new_n)
        else:
            new_st, ovf_bwd = sharded_sgd_update_a2a(
                mesh, st, upd, sparse_opt.lr if lr is None else lr,
                weight_decay=sparse_opt.weight_decay,
                clipnorm=sparse_opt.clipnorm,
                grad_dtype=getattr(sparse_opt, "dense_grad_dtype", None),
                **kw)
            new_accum = model.emb_accum
        new_model = ShardedDLRM(bottom=new_bottom, top=new_top,
                                tables=new_st, emb_accum=new_accum,
                                config=cfg, dense_opt_state=new_dstate)
        if with_overflow:
            return new_model, (loss, ovf_fwd + ovf_bwd)
        return new_model, loss

    if exchange == "a2a":
        return jax.jit(step_a2a, donate_argnums=(0,)) if jit else step_a2a

    def step(model: ShardedDLRM, dense, cat, label, lr=None, key=None):
        st = model.tables

        def lookup_fn(c):
            # (T, b, D), batch-sharded: indices shift to stacked global
            # rows inside, one all-gather + psum_scatter exchange. With
            # pad_idx the combiner/pad fold rides the exchange as a weight
            # scale (sharded_ensemble_lookup's contract).
            if cfg.pad_idx is not None:
                return sharded_ensemble_lookup(mesh, st, c, stacked=True,
                                               combiner=cfg.combiner,
                                               pad_idx=cfg.pad_idx)
            e = sharded_ensemble_lookup(mesh, st, c, stacked=True)
            if cfg.combiner == "mean" and c.ndim == 3:
                # mean = sum / bag (linear), so the same scale applies to
                # the backward delta below.
                e = e / c.shape[2]
            return e

        params = (model.bottom, model.top)
        if microbatch and microbatch > 1:
            from ..models.microbatch import microbatch_grads

            def slice_grads(d_i, c_i, l_i):
                emb_i = lookup_fn(c_i)

                def loss_fn(dense_params, emb_act):
                    bottom, top = dense_params
                    logits = forward_from_embeddings(bottom, top, cfg,
                                                     d_i, emb_act)
                    return bce_loss(logits, l_i)

                loss_i, (dg_i, delta_i) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(params, emb_i)
                return loss_i, dg_i, (delta_i,)

            loss, dense_grads, (delta_t,) = microbatch_grads(
                params, dense, cat, label, microbatch, slice_grads)
        else:
            emb_t = lookup_fn(cat)

            def loss_fn(dense_params, emb_act):
                bottom, top = dense_params
                logits = forward_from_embeddings(bottom, top, cfg, dense,
                                                 emb_act)
                return bce_loss(logits, label)

            loss, (dense_grads, delta_t) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, emb_t)
        if cfg.pad_idx is None and cfg.combiner == "mean" and cat.ndim == 3:
            delta_t = delta_t / cat.shape[2]

        (new_bottom, new_top), new_dstate = apply_dense_tx(
            (model.bottom, model.top), dense_grads, dense_tx,
            model.dense_opt_state, dense_lr)

        shifted, scale_t = _padded_stack_inputs(st, cat, cfg.combiner,
                                                cfg.pad_idx)
        new_st, new_accum = _sharded_sparse_apply(
            mesh, st, model.emb_accum, shifted, delta_t, sparse_opt,
            scale_t=scale_t, lr=lr, key=key)
        new_model = ShardedDLRM(bottom=new_bottom, top=new_top,
                                tables=new_st, emb_accum=new_accum,
                                config=cfg, dense_opt_state=new_dstate)
        return new_model, loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_sharded_eval_step(cfg: DLRMConfig, mesh: Mesh, axis: str = "data",
                           jit: bool = True):
    def step(model: ShardedDLRM, dense, cat):
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
        return forward_from_embeddings(model.bottom, model.top, cfg, dense,
                                       emb_t)
    if jit:
        step = jax.jit(step)
    return step


def unshard_dlrm(model: ShardedDLRM) -> DLRM:
    """Dense single-chip DLRM from the sharded one (checkpoint export,
    quantized serving via `quant.quantize_dlrm`, test oracle). Inverts the
    mod-row layout for the table and whatever optimizer state the model
    carries (accumulator / Adam moments / FTRL z-n, via
    `sharded.unshard_row_state`)."""
    from ..models.dlrm import DLRM as _DLRM
    from ..ops.ensemble import StackedTables
    from .sharded import unshard_row_state

    st = model.tables
    return _DLRM(
        bottom=model.bottom, top=model.top,
        tables=StackedTables(data=st.unshard(), offsets=st.offsets,
                             dim=st.dim),
        emb_state=unshard_row_state(st, model.emb_accum),
        config=model.config,
        dense_opt_state=model.dense_opt_state)
