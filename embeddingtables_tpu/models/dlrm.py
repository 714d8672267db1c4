"""DLRM: the flagship model family on top of the embedding engine.

The reference is the kernel library used *under* a DLRM: its
`PreallocationStrategy(prependrows)` exists to fuse the bottom-MLP output into
the ensemble-lookup concat (`/root/reference/src/lookup.jl:279-291`,
`README.md:164-176`). This module is that DLRM, built TPU-first:

  - Embedding ensemble = `StackedTables`: all 26 tables in ONE `(ΣV, D)` HBM
    array; the ensemble lookup is ONE gather (the XLA-native replacement for
    the reference's thread-per-table `SimpleParallelStrategy`).
  - Dense towers (bottom/top MLP) run on the MXU in a configurable compute
    dtype (bfloat16 by default, f32 accumulation — XLA default for TPU).
  - Dot interaction = one batched `Z @ Zᵀ` matmul (B, T+1, D)x(B, D, T+1) —
    MXU-shaped, no gather/scatter.
  - Concat fusion: the bottom-MLP output occupies the leading `dim` features
    of the fused activation, i.e. the reference's `prependrows` region is
    *written by the dense tower* rather than left uninitialized
    (`src/lookup.jl:336-340` reserves it for exactly this).
  - Training uses the lazy-sparse-gradient discipline (SURVEY.md §2.4 item 5):
    the loss is differentiated w.r.t. the *looked-up activations*, giving the
    `(delta, indices)` cotangent directly; no table-sized dense gradient ever
    exists. Table rows then take a fused sparse-optimizer step
    (`optim.SparseSGD` / `SparseRowWiseAdaGrad`).

Everything is functional and jit-compatible; the multi-chip version lives in
`parallel/dlrm.py`.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.ensemble import StackedTables
from ..ops.lookup import lookup
from ..ops.sparse_update import SparseEmbeddingUpdate
from ..optim import (SparseOptState, SparseRowWiseAdaGrad, SparseSGD,
                     apply_dense_tx)
from ..tables import SimpleEmbedding


@dataclasses.dataclass(frozen=True)
class DLRMConfig:
    vocab_sizes: Tuple[int, ...]
    num_dense: int = 13
    dim: int = 128                          # embedding feature size (lane-aligned)
    bottom_mlp: Tuple[int, ...] = (512, 256, 128)   # last entry must == dim
    top_mlp: Tuple[int, ...] = (1024, 1024, 512, 256, 1)
    interaction: str = "dot"                # "dot" | "cat"
    self_interaction: bool = False          # include diagonal of Z Zᵀ
    bag: Optional[int] = None               # multi-hot bag size (None = one-hot)
    combiner: str = "sum"                   # bag reduction: "sum" | "mean"
    # Padding sentinel for VARIABLE-LENGTH bags (fixed-width bags
    # right-padded with this id): pads contribute zero rows, are excluded
    # from mean denominators, and carry no gradient (ops/lookup.py pad
    # contract, end to end through train/eval, single-chip and mesh).
    pad_idx: Optional[int] = None
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16  # MXU dtype for the dense towers
    # Storage dtype for the EMBEDDING TABLES only (None = param_dtype).
    # The production bf16 recipe: tables bf16 (the capacity lever — they
    # ARE the model's memory) + towers f32 (tiny, and tower SGD has no
    # stochastic-rounding path, so bf16 towers stall at small steps; the
    # round-3 on-chip sweep measured exactly that, docs/DESIGN.md §7).
    table_dtype: Optional[jnp.dtype] = None

    def __post_init__(self):
        if self.bottom_mlp[-1] != self.dim:
            raise ValueError(
                f"bottom_mlp must end at dim={self.dim}, got {self.bottom_mlp}")
        if self.interaction not in ("dot", "cat"):
            raise ValueError(self.interaction)
        if self.combiner not in ("sum", "mean"):
            raise ValueError(self.combiner)

    @property
    def num_tables(self) -> int:
        return len(self.vocab_sizes)

    @property
    def tables_dtype(self):
        """Embedding-table storage dtype (table_dtype or param_dtype)."""
        return self.table_dtype if self.table_dtype is not None \
            else self.param_dtype

    @property
    def interaction_features(self) -> int:
        t1 = self.num_tables + 1
        if self.interaction == "cat":
            return self.dim * t1
        pairs = t1 * (t1 - 1) // 2 + (t1 if self.self_interaction else 0)
        return self.dim + pairs


def dlrm_small_config(vocab: int = 100_000, **kw) -> DLRMConfig:
    """Criteo-Kaggle-shaped small config (26 tables)."""
    kw.setdefault("vocab_sizes", tuple([vocab] * 26))
    return DLRMConfig(**kw)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DLRM:
    """Parameter pytree: dense towers + the stacked embedding ensemble +
    sparse-optimizer row state (+ optional optax state for the towers)."""

    bottom: list            # [(W, b), ...]
    top: list               # [(W, b), ...]
    tables: StackedTables   # (ΣV, dim) single HBM array
    emb_state: SparseOptState
    config: DLRMConfig = dataclasses.field(metadata=dict(static=True))
    # optax state for the dense towers when a dense_tx is used (None = the
    # default plain-SGD tower update, the reference's Flux.Descent parity).
    dense_opt_state: object = None


def _init_mlp(key, sizes, dtype):
    layers = []
    for i in range(len(sizes) - 1):
        key, k1 = jax.random.split(key)
        fan_in, fan_out = sizes[i], sizes[i + 1]
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        w = (std * jax.random.normal(k1, (fan_in, fan_out))).astype(dtype)
        layers.append((w, jnp.zeros((fan_out,), dtype)))
    return layers


def init_dlrm(key: jax.Array, cfg: DLRMConfig,
              sparse_opt=None, dense_tx=None) -> DLRM:
    """dense_tx: optional optax GradientTransformation for the towers (e.g.
    `optax.adam(1e-3)`); None keeps the plain-SGD tower update."""
    kb, kt, ke = jax.random.split(key, 3)
    bottom = _init_mlp(kb, (cfg.num_dense,) + cfg.bottom_mlp, cfg.param_dtype)
    top = _init_mlp(kt, (cfg.interaction_features,) + cfg.top_mlp,
                    cfg.param_dtype)
    # One stacked array for the whole ensemble; per-table uniform init
    # scaled by 1/sqrt(dim) (standard DLRM embedding init).
    total_v = sum(cfg.vocab_sizes)
    data = (jax.random.uniform(ke, (total_v, cfg.dim), minval=-1.0, maxval=1.0)
            / jnp.sqrt(float(cfg.dim))).astype(cfg.tables_dtype)
    offs, acc = [0], 0
    for v in cfg.vocab_sizes:
        acc += v
        offs.append(acc)
    tables = StackedTables(data=data, offsets=tuple(offs), dim=cfg.dim)
    sparse_opt = sparse_opt or SparseSGD()
    dense_state = dense_tx.init((bottom, top)) if dense_tx is not None else None
    return DLRM(bottom=bottom, top=top, tables=tables,
                emb_state=sparse_opt.init(data), config=cfg,
                dense_opt_state=dense_state)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _mlp(layers, x, compute_dtype, final_activation=True):
    x = x.astype(compute_dtype)
    for i, (w, b) in enumerate(layers):
        x = x @ w.astype(compute_dtype) + b.astype(compute_dtype)
        if i < len(layers) - 1 or final_activation:
            x = jax.nn.relu(x)
    return x


# Triangle extraction: advanced indexing `zzt[:, li, lj]` lowers to a
# B*pairs-element gather whose BACKWARD is a scatter-add — measured ~6 ms
# of the 78 ms headline step at B=64Ki, T=26 (scratch/probe_bwd.py W1-W7:
# step 78.1 -> 72.3 ms with the selection matmul). A constant 0/1
# selection-matrix matmul extracts the same entries on the MXU with a
# matmul backward, and is EXACT (each output column has ONE nonzero, so
# the accumulation adds zeros to one product). Guarded by size: the
# (t1², pairs) constant is ~2 MB at T=26 but grows ~t1⁴/2.
_SEL_MAX_ENTRIES = 8 << 20


@functools.lru_cache(maxsize=8)
def _tril_selection_np(t1: int, offset: int):
    import numpy as _np
    li, lj = _np.tril_indices(t1, k=offset)
    sel = _np.zeros((t1 * t1, li.size), _np.float32)
    sel[li * t1 + lj, _np.arange(li.size)] = 1.0
    return sel


@functools.lru_cache(maxsize=8)
def _tri_interaction_fn(t1: int, offset: int):
    """Gram + triangle-selection `flat = (z zᵀ).reshape @ SEL` with a
    hand-fused VJP (round 5, docs/DESIGN.md §12).

    Default AD materializes `dzzt = reshape(dflat @ SELᵀ)` and runs TWO
    batched (t1, t1) @ (t1, D) matmuls (`dzzt @ z + dzztᵀ @ z`). Because
    the Gram's adjoint symmetrizes (`dz = (dzzt + dzztᵀ) @ z`) and SEL has
    exactly one nonzero per column at flat index (i·t1+j), the symmetrized
    cotangent is itself ONE selection matmul with `SS = SEL + SEL_swap`
    (the 1 moved to (j·t1+i); a diagonal pair under self-interaction gets
    2 — its own symmetrization). So the backward is one (B, pairs) @
    (pairs, t1²) matmul plus ONE batched matmul — half the batched-matmul
    work, no dzzt/transpose pass. Element-exact on the cotangent assembly
    (disjoint nonzeros), differing from default AD only by matmul
    re-association (measured 1.2e-7 max). Measured v5e at bench shapes
    (scratch/probe_sel_vjp.py): fwd+bwd 39.5 -> 32.5 ms, full SGD step
    72.2 -> 65.7 ms."""
    import numpy as _np
    sel_np = _tril_selection_np(t1, offset)
    li, lj = _np.tril_indices(t1, k=offset)
    ss_np = sel_np.copy()
    ss_np[lj * t1 + li, _np.arange(li.size)] += 1.0
    ss_t = _np.ascontiguousarray(ss_np.T)

    @jax.custom_vjp
    def tri(z):
        zzt = jnp.einsum("bij,bkj->bik", z, z)
        return zzt.reshape(z.shape[0], t1 * t1) @ jnp.asarray(sel_np,
                                                              z.dtype)

    def tri_fwd(z):
        return tri(z), z

    def tri_bwd(z, dflat):
        m = (dflat @ jnp.asarray(ss_t, dflat.dtype)).reshape(
            z.shape[0], t1, t1)
        return (jnp.einsum("bij,bjd->bid", m, z),)

    tri.defvjp(tri_fwd, tri_bwd)
    return tri


@functools.lru_cache(maxsize=8)
def _block_interaction_fn(t: int, offset: int):
    """Block-Gram interaction on TABLE-MAJOR embeddings (round 5,
    docs/DESIGN.md §14): the same pairwise dots as `dot_interaction`, but
    assembled from Gram BLOCKS computed directly on `(T, B, D)` —
    `G_ee = einsum(ibd,jbd->bij)` over the T embedding rows, `G_be =
    einsum(bd,jbd->bj)` against the bottom output (+ `G_bb` under
    self-interaction) — so the `(B, T+1, D)` z concat never exists and the
    batched Gram runs on (T, T) instead of (T+1, T+1). Output is in BLOCK
    order `[bb? | be | ee-tril]`; the consumer compensates by permuting
    the top MLP's first-matmul ROWS (`_block_w1_perm`, a (dim+pairs, H)
    take — ~free), which is EXACT (same products; probe gate measured
    0.0 loss diff vs the canonical path on-chip shapes).

    Backward: the same symmetrized-selection trick as
    `_tri_interaction_fn`, on the (T, T) block and in (T, B, D) layout end
    to end — the cotangent never transposes. Measured v5e at bench shapes
    (scratch/probe_blockconfirm.py, A/B/A/B interleaved): full SGD step
    65.8 -> 65.0 ms, stable across trials. (The z-assembly itself is NOT
    the win — probe_fwdfat F1 vs F2 measured transpose+concat fusion
    free; the saving is the smaller Gram/selection and the dropped
    (B, T+1, D) cotangent assembly.)"""
    import numpy as _np
    li, lj = _np.tril_indices(t, k=offset)
    sel_np = _np.zeros((t * t, li.size), _np.float32)
    sel_np[li * t + lj, _np.arange(li.size)] = 1.0
    ss_np = sel_np.copy()
    ss_np[lj * t + li, _np.arange(li.size)] += 1.0
    ss_t = _np.ascontiguousarray(ss_np.T)
    with_bb = offset == 0

    @jax.custom_vjp
    def tri(bot, emb_t):
        gee = jnp.einsum("ibd,jbd->bij", emb_t, emb_t)
        flat_ee = gee.reshape(bot.shape[0], t * t) @ jnp.asarray(
            sel_np, bot.dtype)
        gbe = jnp.einsum("bd,jbd->bj", bot, emb_t)
        parts = [gbe, flat_ee]
        if with_bb:
            parts.insert(0, jnp.sum(bot * bot, axis=-1, keepdims=True))
        return jnp.concatenate(parts, axis=-1)

    def tri_fwd(bot, emb_t):
        return tri(bot, emb_t), (bot, emb_t)

    def tri_bwd(res, dflat):
        bot, emb_t = res
        nbb = 1 if with_bb else 0
        dgbe = dflat[:, nbb:nbb + t]
        dflat_ee = dflat[:, nbb + t:]
        m = (dflat_ee @ jnp.asarray(ss_t, dflat.dtype)).reshape(
            bot.shape[0], t, t)
        demb = jnp.einsum("bij,jbd->ibd", m, emb_t) + \
            jnp.einsum("bj,bd->jbd", dgbe, bot)
        dbot = jnp.einsum("bj,jbd->bd", dgbe, emb_t)
        if with_bb:
            dbot = dbot + 2.0 * dflat[:, :1] * bot
        return dbot, demb

    tri.defvjp(tri_fwd, tri_bwd)
    return tri


@functools.lru_cache(maxsize=8)
def _block_w1_perm(t: int, offset: int, dim: int):
    """Inverse row-permutation for the top MLP's first matmul so
    `[bot | flat_block] @ W1[perm]` equals the canonical
    `[bot | flat_canonical] @ W1`: canonical feature k sits at block
    position P[k], so W1_eff[j] = W1[P^-1(j)]."""
    import numpy as _np
    t1 = t + 1
    li, lj = _np.tril_indices(t1, k=offset)
    li26, lj26 = _np.tril_indices(t, k=offset)
    ee_pos = {(a, b): k for k, (a, b) in enumerate(zip(li26, lj26))}
    nbb = 1 if offset == 0 else 0
    p = _np.empty(li.size, _np.int64)
    for k, (a, b) in enumerate(zip(li, lj)):
        if b == 0:
            p[k] = (0 if a == 0 else nbb + (a - 1)) if offset == 0 \
                else (a - 1)
        else:
            p[k] = nbb + t + ee_pos[(a - 1, b - 1)]
    return _np.argsort(_np.concatenate([_np.arange(dim), dim + p]))


def dot_interaction(bottom_out: jax.Array, emb: jax.Array,
                    self_interaction: bool) -> jax.Array:
    """Pairwise feature interactions: Z = [bottom; emb] (B, T+1, D);
    one batched matmul Z Zᵀ, then the (strict) lower triangle, concatenated
    after the bottom output. MXU-shaped by construction — including the
    triangle extraction (selection-matrix matmul, see above)."""
    z = jnp.concatenate([bottom_out[:, None, :], emb], axis=1)  # (B, T+1, D)
    t1 = z.shape[1]
    offset = 0 if self_interaction else -1
    npairs = t1 * (t1 + 1) // 2 if self_interaction \
        else t1 * (t1 - 1) // 2
    if t1 * t1 * npairs <= _SEL_MAX_ENTRIES:
        # Gram + selection with the fused VJP (see _tri_interaction_fn).
        flat = _tri_interaction_fn(t1, offset)(z)               # (B, pairs)
    else:
        zzt = jnp.einsum("bij,bkj->bik", z, z)                  # (B,T+1,T+1)
        li, lj = jnp.tril_indices(t1, k=offset)
        flat = zzt[:, li, lj]                                   # (B, pairs)
    return jnp.concatenate([bottom_out, flat], axis=-1)


def stacked_flat_indices(tables: StackedTables, cat: jax.Array,
                         pad_idx: Optional[int] = None):
    """(T, B[, bag]) local ids -> (flat global ids, valid mask or None).

    Pad detection MUST precede the stacked-offset shift (a shifted pad no
    longer matches the sentinel), so pads are remapped to local row 0 here
    and reported via the mask; downstream they carry weight 0."""
    t = tables.ntables
    if pad_idx is None:
        g = tables.shift_indices([cat[i] for i in range(t)])
        return g.reshape((-1,) + g.shape[2:]), None
    valid = cat != pad_idx
    g = tables.shift_indices([jnp.where(valid[i], cat[i], 0)
                              for i in range(t)])
    flat = g.reshape((-1,) + g.shape[2:])
    return flat, valid.reshape(flat.shape)


def stacked_update_weights(valid, combiner: str, shape):
    """Per-occurrence update weights matching `embedding_forward`'s output
    scale (lookup_vjp's effective-weights discipline on the flat stacked
    stream): None for plain sum, 1/bag for padless mean, and the
    (mean-normalized) validity mask with pads."""
    if valid is None:
        if combiner == "mean" and len(shape) == 2:
            return jnp.full(shape, 1.0 / shape[1], jnp.float32)
        return None
    w = valid.astype(jnp.float32)
    if combiner == "mean" and valid.ndim == 2:
        w = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w


def embedding_forward(tables: StackedTables, cat: jax.Array,
                      combiner: str = "sum",
                      pad_idx: Optional[int] = None) -> jax.Array:
    """Ensemble lookup as ONE gather on the stacked array.

    cat: (T, B) or (T, B, bag) per-table local ids -> (T, B, dim).
    pad_idx: variable-length-bag sentinel (ops/lookup.py contract); pads
    fold in as zero-weight occurrences on the stacked gather.
    """
    flat, valid = stacked_flat_indices(tables, cat, pad_idx)
    w = None if valid is None else valid.astype(jnp.float32)
    out = lookup(SimpleEmbedding(tables.data), flat, combiner=combiner,
                 weights=w)
    return out.reshape(tables.ntables, cat.shape[1], tables.dim)


def forward_from_embeddings(bottom, top, cfg: DLRMConfig, dense: jax.Array,
                            emb_t: jax.Array) -> jax.Array:
    """Dense towers given already-looked-up embeddings `(T, B, dim)`.
    Split out so training can differentiate w.r.t. `emb_t` (the lazy
    sparse-gradient boundary)."""
    cd = cfg.compute_dtype
    bot = _mlp(bottom, dense, cd)                        # (B, dim)
    if cfg.interaction == "dot":
        t = emb_t.shape[0]
        t1 = t + 1
        offset = 0 if cfg.self_interaction else -1
        npairs = t1 * (t1 + 1) // 2 if cfg.self_interaction \
            else t1 * (t1 - 1) // 2
        if t1 * t1 * npairs <= _SEL_MAX_ENTRIES:
            # Block-Gram on the table-major embeddings (round 5, §14):
            # no z concat/transpose; top-W1 rows permuted to compensate
            # for the block feature order — exact vs the canonical path.
            flat = _block_interaction_fn(t, offset)(bot, emb_t.astype(cd))
            feat = jnp.concatenate([bot, flat], axis=-1)
            w1, b1 = top[0]
            perm = jnp.asarray(_block_w1_perm(t, offset, bot.shape[1]))
            top = [(jnp.take(w1, perm, axis=0), b1)] + list(top[1:])
        else:
            emb = jnp.transpose(emb_t, (1, 0, 2)).astype(cd)
            feat = dot_interaction(bot, emb, cfg.self_interaction)
    else:
        emb = jnp.transpose(emb_t, (1, 0, 2)).astype(cd)     # (B, T, dim)
        # "cat": plain concat fusion — the PreallocationStrategy layout, with
        # the bottom output occupying the prepend region (reference
        # `lookup.jl:288-291,336-340`).
        feat = jnp.concatenate(
            [bot, emb.reshape(emb.shape[0], -1)], axis=-1)
    logits = _mlp(top, feat, cd, final_activation=False)  # (B, 1)
    return logits[:, 0].astype(jnp.float32)


def dlrm_forward(model: DLRM, dense: jax.Array, cat: jax.Array) -> jax.Array:
    emb_t = embedding_forward(model.tables, cat, model.config.combiner,
                              model.config.pad_idx)
    return forward_from_embeddings(model.bottom, model.top, model.config,
                                   dense, emb_t)


def bce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable sigmoid binary cross-entropy, mean over batch."""
    z, y = logits, labels.astype(jnp.float32)
    return jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))


# ---------------------------------------------------------------------------
# Training step
# ---------------------------------------------------------------------------

def make_train_step(cfg: DLRMConfig, sparse_opt=None, dense_lr: float = 0.01,
                    jit: bool = True, dense_tx=None,
                    microbatch: Optional[int] = None):
    """Build the single-chip fused train step.

    Returns `step(model, dense, cat, label) -> (model, loss)`. The embedding
    gradient is captured lazily as `(delta, indices)` (never a (ΣV, D) dense
    array) and applied through the fused sparse optimizer; dense towers take
    a plain SGD step, or any optax transform via `dense_tx` (init the model
    with the same transform). Donating `model` lets XLA update the stacked
    table (and the big MLP weights) in place.

    microbatch=k: gradient accumulation — the forward/backward runs as a
    `lax.scan` over k equal slices, so MLP/interaction activations for only
    B/k examples are live at once (the way to push B past the activation
    HBM limit; the (T, B, dim) lazy delta itself is still materialized for
    the ONE fused optimizer application). Bit-identical semantics to the
    monolithic step up to float re-association: one optimizer step on the
    mean-of-means loss.
    """
    sparse_opt = sparse_opt or SparseSGD()

    def _grads(model, dense, cat, label):
        emb_t = embedding_forward(model.tables, cat, cfg.combiner,
                                  cfg.pad_idx)

        def loss_fn(dense_params, emb_act):
            bottom, top = dense_params
            logits = forward_from_embeddings(bottom, top, cfg, dense, emb_act)
            return bce_loss(logits, label)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            (model.bottom, model.top), emb_t)
        return loss, grads

    def _grads_micro(model, dense, cat, label, k):
        from .microbatch import microbatch_grads
        params = (model.bottom, model.top)

        def slice_grads(d_i, c_i, l_i):
            emb_t = embedding_forward(model.tables, c_i, cfg.combiner,
                                      cfg.pad_idx)

            def loss_fn(dense_params, emb_act):
                bottom, top = dense_params
                logits = forward_from_embeddings(bottom, top, cfg, d_i,
                                                 emb_act)
                return bce_loss(logits, l_i)

            loss_i, (dg_i, delta_i) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, emb_t)
            return loss_i, dg_i, (delta_i,)

        loss, dense_grads, (delta_t,) = microbatch_grads(
            params, dense, cat, label, k, slice_grads)
        return loss, (dense_grads, delta_t)

    use_sr = bool(getattr(sparse_opt, "stochastic_rounding", False))

    def step(model: DLRM, dense, cat, label, lr=None, key=None):
        if use_sr and key is None:
            raise ValueError(
                "sparse_opt.stochastic_rounding=True: pass a fresh PRNG "
                "key per step (train_dlrm folds one in automatically)")
        if microbatch and microbatch > 1:
            loss, grads = _grads_micro(model, dense, cat, label, microbatch)
        else:
            loss, grads = _grads(model, dense, cat, label)
        dense_grads, delta_t = grads           # delta_t: (T, B, dim) lazy delta

        # Dense towers: plain SGD (parity with the reference's Flux.Descent)
        # or an optax transform.
        (new_bottom, new_top), new_dense_state = apply_dense_tx(
            (model.bottom, model.top), dense_grads, dense_tx,
            model.dense_opt_state, dense_lr)

        # Embedding ensemble: ONE fused sparse step on the stacked array.
        # Per-table (delta, indices) merge into a single occurrence stream via
        # the static stacked offsets (the ensemble_update in stacked form).
        flat_idx, valid = stacked_flat_indices(model.tables, cat,
                                               cfg.pad_idx)
        flat_delta = delta_t.reshape(-1, cfg.dim).astype(jnp.float32)
        # Combiner/pad fold into per-occurrence update weights
        # (lookup_vjp's discipline).
        w = stacked_update_weights(valid, cfg.combiner, flat_idx.shape)
        upd = SparseEmbeddingUpdate(delta=flat_delta, indices=flat_idx,
                                    weights=w)
        # lr: optional traced scalar overriding sparse_opt.lr this step
        # (train loops' lr_schedule=; zero recompiles). key: per-step PRNG
        # for stochastic rounding on bf16 tables (rounding.py).
        new_data, new_state = sparse_opt.apply(
            model.tables.data, upd, model.emb_state, lr=lr,
            **({"key": key} if use_sr else {}))
        new_tables = dataclasses.replace(model.tables, data=new_data)
        new_model = DLRM(bottom=new_bottom, top=new_top, tables=new_tables,
                         emb_state=new_state, config=cfg,
                         dense_opt_state=new_dense_state)
        return new_model, loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_eval_step(cfg: DLRMConfig, jit: bool = True):
    def step(model: DLRM, dense, cat):
        return dlrm_forward(model, dense, cat)
    if jit:
        step = jax.jit(step)
    return step
