"""DeepFM: third CTR model family on the engine.

Guo et al., "DeepFM: A Factorization-Machine based Neural Network for CTR
Prediction" (IJCAI 2017) — FM + deep tower sharing ONE set of field
embeddings. Like DLRM/DCN-v2, the model sits on the same embedding-table
kernel layer the reference provides (`README.md:174-176` in
/root/reference); what differs is the interaction:

    logit = <w, x>                      (FM first order: one weight/category)
          + Σ_{i<j} <v_i, v_j>          (FM second order over field vectors)
          + MLP([v_1; ...; v_T; dense]) (deep component)

TPU-first realization:
  - Field vectors v: the same ONE-gather `StackedTables` ensemble as
    DLRM/DCN (dim D).
  - First-order weights: FOLDED into the main stack as column 0 of a
    fused `(ΣV, D+1)` array (`fold_fm_w=True`, the default). Random-row
    access on v5e is DMA-issue-bound, not byte-bound (docs/DESIGN.md §1b):
    a separate dim-1 gather pays the SAME per-row cost as the dim-D one
    despite moving 1/128th the bytes, while the fused stack's extra
    column is free-to-cheap (scratch/probe_fmfold.py: at D=64 fused ==
    main-only 0.609 ms/batch vs 1.140 separate; at D=128 fused 0.698 vs
    1.118, -38%). Training likewise folds both deltas into ONE lazy
    update — one scatter/exchange per step instead of two.
    `fold_fm_w=False` keeps the legacy two-stack layout (a second
    stacked ensemble of dim 1 sharing the indices, with its own state).
  - Second order via the sum-square identity
        Σ_{i<j} <v_i, v_j> = 0.5 · Σ_d [(Σ_i v_id)² - Σ_i v_id²]
    — O(T·D) elementwise/VPU work, no pairwise materialization (the
    (T², D) expansion DLRM's dot_interaction builds is exactly what FM's
    algebra avoids).
  - Deep tower: plain MXU matmuls on the flattened embeddings + dense.

Training differentiates the loss w.r.t. BOTH looked-up activation sets;
each stacked ensemble gets its own lazy update + sparse-optimizer state.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.ensemble import StackedTables
from ..ops.sparse_update import SparseEmbeddingUpdate
from ..optim import SparseSGD, apply_dense_tx
from .dlrm import (_init_mlp, _mlp, bce_loss, embedding_forward,
                   stacked_flat_indices, stacked_update_weights)


@dataclasses.dataclass(frozen=True)
class DeepFMConfig:
    vocab_sizes: Tuple[int, ...]
    num_dense: int = 13
    dim: int = 128                       # FM embedding size
    deep_mlp: Tuple[int, ...] = (400, 400)
    use_fm: bool = True                  # ablations: FM-only / deep-only
    use_deep: bool = True
    bag: Optional[int] = None
    combiner: str = "sum"
    # Variable-length-bag padding sentinel (ops/lookup.py pad contract).
    pad_idx: Optional[int] = None
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Embedding-table storage dtype (None = param_dtype); the production
    # bf16 recipe keeps towers f32 (docs/DESIGN.md §7).
    table_dtype: Optional[jnp.dtype] = None
    # Store the first-order weights as column 0 of the FM-vector stack
    # (one fused (ΣV, D+1) array -> one gather, one lazy update). See the
    # module docstring for the measured rationale. With row-wise
    # optimizers (SparseRowWiseAdaGrad) the fused row shares ONE
    # accumulator across w and v — mean(g²) over D+1 columns — instead of
    # the legacy layout's two independent row accumulators; elementwise
    # optimizers (SGD/Adam/FTRL) are bitwise-equivalent either way.
    fold_fm_w: bool = True

    @property
    def tables_dtype(self):
        return self.table_dtype if self.table_dtype is not None \
            else self.param_dtype

    @property
    def folded(self) -> bool:
        """True when the first-order weights live inside the FM stack."""
        return self.use_fm and self.fold_fm_w

    @property
    def stack_dim(self) -> int:
        """Storage width of `tables` (D, or D+1 with the folded column)."""
        return self.dim + (1 if self.folded else 0)

    def __post_init__(self):
        if self.combiner not in ("sum", "mean"):
            raise ValueError(self.combiner)
        if not (self.use_fm or self.use_deep):
            raise ValueError("at least one of use_fm/use_deep must be on")
        if self.use_deep and not self.deep_mlp:
            raise ValueError("use_deep=True requires a non-empty deep_mlp "
                             "(pass use_deep=False for a plain FM)")

    @property
    def num_tables(self) -> int:
        return len(self.vocab_sizes)

    @property
    def deep_features(self) -> int:
        return self.num_tables * self.dim + self.num_dense


def deepfm_small_config(vocab: int = 100_000, **kw) -> DeepFMConfig:
    """Criteo-Kaggle-shaped small config (26 tables)."""
    kw.setdefault("vocab_sizes", tuple([vocab] * 26))
    return DeepFMConfig(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeepFM:
    """Parameter pytree: deep tower + dense-feature linear term + the
    stacked ensemble(s). Folded layout (`config.folded`): `tables` is the
    fused (ΣV, D+1) stack (column 0 = first-order weight) and
    `fm_w`/`fm_state` are None. Legacy layout: two stacks (D-dim FM
    vectors, 1-dim first-order weights), each with its own state."""

    deep: list               # [(W, b), ...] tower
    head: tuple              # (W, b): deep output -> 1 logit contribution
    dense_w: jax.Array       # (num_dense,) first-order dense weights
    bias: jax.Array          # () global bias
    tables: StackedTables    # FM vectors (dim D, or fused dim D+1)
    fm_w: Optional[StackedTables]   # first-order weights, dim 1 (unfolded)
    emb_state: object
    fm_state: object
    config: DeepFMConfig = dataclasses.field(metadata=dict(static=True))
    dense_opt_state: object = None


def _stack_offsets(vocab_sizes):
    offs, acc = [0], 0
    for v in vocab_sizes:
        acc += v
        offs.append(acc)
    return tuple(offs), acc


def init_deepfm(key: jax.Array, cfg: DeepFMConfig,
                sparse_opt=None, dense_tx=None) -> DeepFM:
    kd, kh, ke, kw = jax.random.split(key, 4)
    if cfg.use_deep:
        deep = _init_mlp(kd, (cfg.deep_features,) + cfg.deep_mlp,
                         cfg.param_dtype)
        head = _init_mlp(kh, (cfg.deep_mlp[-1], 1), cfg.param_dtype)[0]
    else:
        # Plain FM: no tower. Tiny placeholders keep the pytree structure
        # stable (forward never reads them; their grads are zero).
        deep = []
        head = (jnp.zeros((1, 1), cfg.param_dtype),
                jnp.zeros((1,), cfg.param_dtype))
    offs, total_v = _stack_offsets(cfg.vocab_sizes)
    vecs = (jax.random.uniform(ke, (total_v, cfg.dim), minval=-1.0,
                               maxval=1.0)
            / jnp.sqrt(float(cfg.dim))).astype(cfg.tables_dtype)
    sparse_opt = sparse_opt or SparseSGD()
    # First-order weights start at zero (the standard FM linear-term init;
    # the global bias learns the base rate).
    if cfg.folded:
        data = jnp.concatenate(
            [jnp.zeros((total_v, 1), cfg.tables_dtype), vecs], axis=1)
        tables = StackedTables(data=data, offsets=offs, dim=cfg.stack_dim)
        fm_w, fm_state = None, None
    else:
        data = vecs
        tables = StackedTables(data=data, offsets=offs, dim=cfg.dim)
        fm_w = StackedTables(data=jnp.zeros((total_v, 1), cfg.tables_dtype),
                             offsets=offs, dim=1)
        fm_state = sparse_opt.init(fm_w.data)
    dense_params = (deep, head, jnp.zeros((cfg.num_dense,), cfg.param_dtype),
                    jnp.zeros((), cfg.param_dtype))
    dense_state = dense_tx.init(dense_params) if dense_tx is not None else None
    return DeepFM(deep=deep, head=head, dense_w=dense_params[2],
                  bias=dense_params[3], tables=tables, fm_w=fm_w,
                  emb_state=sparse_opt.init(data),
                  fm_state=fm_state, config=cfg,
                  dense_opt_state=dense_state)


def split_fused(g_t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Fused activations `(T, B, D+1)` -> `(w_t (T,B,1), emb_t (T,B,D))`.
    Column 0 is the first-order weight; the VJP of these slices is the
    concat of the two cotangents, so `fuse_delta` is its exact adjoint."""
    return g_t[..., :1], g_t[..., 1:]


def fuse_delta(delta_w: jax.Array, delta_emb: jax.Array) -> jax.Array:
    """Adjoint of `split_fused`: one (T, B, D+1) cotangent for the fused
    stack — BOTH parameter groups ride one lazy update / one scatter."""
    return jnp.concatenate([delta_w, delta_emb], axis=-1)


def lookup_acts(tables: StackedTables, cfg: DeepFMConfig, cat: jax.Array):
    """One-gather activation fetch: `(emb_t, w_t)` — w_t is None when
    use_fm=False; with the folded layout both come from ONE gather of the
    fused stack (the whole point of `fold_fm_w`, module docstring)."""
    g_t = embedding_forward(tables, cat, cfg.combiner, cfg.pad_idx)
    if cfg.folded:
        w_t, emb_t = split_fused(g_t)
        return emb_t, w_t
    return g_t, None


def fm_second_order(emb_t: jax.Array) -> jax.Array:
    """Σ_{i<j} <v_i, v_j> per example via the sum-square identity.
    emb_t: (T, B, D) -> (B,). O(T·D), no pairwise expansion."""
    s = emb_t.sum(axis=0)                 # (B, D): Σ_i v_i
    sq = jnp.square(emb_t).sum(axis=0)    # (B, D): Σ_i v_i²
    return 0.5 * (jnp.square(s) - sq).sum(axis=-1)


def forward_from_embeddings(dense_params, cfg: DeepFMConfig,
                            dense: jax.Array, emb_t: jax.Array,
                            w_t) -> jax.Array:
    """Forward given looked-up activations — `emb_t` (T, B, D) FM vectors
    and `w_t` (T, B, 1) first-order weights (None iff use_fm=False) —
    split out so training can differentiate w.r.t. both (the lazy-gradient
    boundary). use_fm gates the ENTIRE FM component (first order, dense
    linear term, second order), so use_fm=False is a true deep-only
    ablation; use_deep gates the tower."""
    deep, head, dense_w, bias = dense_params
    cd = cfg.compute_dtype
    b = emb_t.shape[1]
    logit = jnp.broadcast_to(bias.astype(jnp.float32), (b,))
    if cfg.use_fm:
        # First order + dense linear term (f32: scalar accumulations are
        # cheap and the logit sum should not round in bf16).
        logit = logit + w_t[..., 0].astype(jnp.float32).sum(axis=0)
        logit = logit + dense.astype(jnp.float32) @ dense_w.astype(
            jnp.float32)
        logit = logit + fm_second_order(emb_t.astype(jnp.float32))
    if cfg.use_deep:
        flat = jnp.transpose(emb_t, (1, 0, 2)).reshape(b, -1)
        x = jnp.concatenate([flat.astype(cd), dense.astype(cd)], axis=-1)
        hw, hb = head
        out = _mlp(deep, x, cd) @ hw.astype(cd) + hb.astype(cd)
        logit = logit + out[:, 0].astype(jnp.float32)
    return logit


def _fm_weight_forward(fm_w: StackedTables, cat: jax.Array,
                       combiner: str, pad_idx=None) -> jax.Array:
    """(T, B, 1) first-order weight lookup (same one-gather ensemble path)."""
    return embedding_forward(fm_w, cat, combiner, pad_idx)


def deepfm_forward(model: DeepFM, dense: jax.Array, cat: jax.Array
                   ) -> jax.Array:
    cfg = model.config
    emb_t, w_t = lookup_acts(model.tables, cfg, cat)
    if cfg.use_fm and not cfg.folded:
        w_t = _fm_weight_forward(model.fm_w, cat, cfg.combiner, cfg.pad_idx)
    return forward_from_embeddings(
        (model.deep, model.head, model.dense_w, model.bias), cfg, dense,
        emb_t, w_t)


def _lazy_update(tables: StackedTables, cat: jax.Array, delta_t: jax.Array,
                 dim: int, combiner: str,
                 pad_idx=None) -> SparseEmbeddingUpdate:
    """(T, B[, bag]) ids + (T, B, dim) deltas -> one stacked lazy update."""
    flat_idx, valid = stacked_flat_indices(tables, cat, pad_idx)
    flat_delta = delta_t.reshape(-1, dim).astype(jnp.float32)
    w = stacked_update_weights(valid, combiner, flat_idx.shape)
    return SparseEmbeddingUpdate(delta=flat_delta, indices=flat_idx,
                                 weights=w)


def make_train_step(cfg: DeepFMConfig, sparse_opt=None,
                    dense_lr: float = 0.01, jit: bool = True,
                    dense_tx=None, microbatch=None):
    """Fused single-chip train step, same lazy-sparse discipline as the
    DLRM/DCN steps: the loss is differentiated w.r.t. BOTH looked-up
    activation sets, each becoming a lazy `(delta, indices)` update on its
    stacked ensemble (FM vectors and first-order weights share indices but
    carry independent states). Returns
    `step(model, dense, cat, label) -> (model, loss)`.

    microbatch=k: gradient accumulation over k `lax.scan` slices — the
    DLRM/DCN pattern applied to BOTH activation sets (one fused optimizer
    application per stack; exact monolithic parity up to float
    re-association)."""
    sparse_opt = sparse_opt or SparseSGD()

    def _grads(model, dense, cat, label):
        # use_fm=False: the fm_w stack neither looks up nor updates — the
        # deep-only ablation really removes the FM lookup/exchange cost.
        # Folded: ONE gather feeds both activation sets (lookup_acts).
        emb_t, w_t = lookup_acts(model.tables, cfg, cat)
        if cfg.use_fm and not cfg.folded:
            w_t = _fm_weight_forward(model.fm_w, cat, cfg.combiner,
                                     cfg.pad_idx)

        def loss_fn(dense_params, emb_act, w_act):
            logits = forward_from_embeddings(dense_params, cfg, dense,
                                             emb_act, w_act)
            return bce_loss(logits, label)

        params = (model.deep, model.head, model.dense_w, model.bias)
        if cfg.use_fm:
            loss, (dense_grads, delta_emb, delta_w) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(params, emb_t, w_t)
        else:
            loss, (dense_grads, delta_emb) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, emb_t, None)
            delta_w = None
        return loss, dense_grads, delta_emb, delta_w

    def _grads_micro(model, dense, cat, label, k):
        from .microbatch import microbatch_grads
        params = (model.deep, model.head, model.dense_w, model.bias)

        def slice_grads(d_i, c_i, l_i):
            emb_i, w_i = lookup_acts(model.tables, cfg, c_i)
            if cfg.use_fm and not cfg.folded:
                w_i = _fm_weight_forward(model.fm_w, c_i, cfg.combiner,
                                         cfg.pad_idx)

            def loss_fn(dense_params, emb_act, w_act):
                logits = forward_from_embeddings(dense_params, cfg, d_i,
                                                 emb_act, w_act)
                return bce_loss(logits, l_i)

            if cfg.use_fm:
                loss_i, (dg_i, de_i, dw_i) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2))(params, emb_i, w_i)
                return loss_i, dg_i, (de_i, dw_i)
            loss_i, (dg_i, de_i) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, emb_i, None)
            return loss_i, dg_i, (de_i,)

        loss, dense_grads, deltas = microbatch_grads(
            params, dense, cat, label, k, slice_grads)
        if cfg.use_fm:
            return loss, dense_grads, deltas[0], deltas[1]
        return loss, dense_grads, deltas[0], None

    use_sr = bool(getattr(sparse_opt, "stochastic_rounding", False))

    def step(model: DeepFM, dense, cat, label, lr=None, key=None):
        if use_sr and key is None:
            raise ValueError(
                "sparse_opt.stochastic_rounding=True: pass a fresh PRNG "
                "key per step (train_deepfm folds one in automatically)")
        if microbatch and microbatch > 1:
            loss, dense_grads, delta_emb, delta_w = _grads_micro(
                model, dense, cat, label, microbatch)
        else:
            loss, dense_grads, delta_emb, delta_w = _grads(
                model, dense, cat, label)

        params = (model.deep, model.head, model.dense_w, model.bias)
        (new_deep, new_head, new_dw, new_bias), new_dense_state = \
            apply_dense_tx(params, dense_grads, dense_tx,
                           model.dense_opt_state, dense_lr)

        if cfg.folded:
            # One fused lazy update: both deltas concat back into the
            # (T, B, D+1) cotangent of the one gather (fuse_delta ==
            # adjoint of split_fused) -> ONE scatter, ONE state advance.
            delta_emb = fuse_delta(delta_w, delta_emb)
        upd_e = _lazy_update(model.tables, cat, delta_emb, cfg.stack_dim,
                             cfg.combiner, cfg.pad_idx)
        new_data, new_estate = sparse_opt.apply(
            model.tables.data, upd_e, model.emb_state, lr=lr,
            **({"key": key} if use_sr else {}))
        if cfg.use_fm and not cfg.folded:
            upd_w = _lazy_update(model.fm_w, cat, delta_w, 1, cfg.combiner,
                                 cfg.pad_idx)
            # Independent rounding noise for the second stack.
            new_wdata, new_wstate = sparse_opt.apply(
                model.fm_w.data, upd_w, model.fm_state, lr=lr,
                **({"key": jax.random.fold_in(key, 1)} if use_sr else {}))
            new_fm_w = dataclasses.replace(model.fm_w, data=new_wdata)
        else:
            new_fm_w, new_wstate = model.fm_w, model.fm_state
        new_model = DeepFM(
            deep=new_deep, head=new_head, dense_w=new_dw, bias=new_bias,
            tables=dataclasses.replace(model.tables, data=new_data),
            fm_w=new_fm_w,
            emb_state=new_estate, fm_state=new_wstate, config=cfg,
            dense_opt_state=new_dense_state)
        return new_model, loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_eval_step(cfg: DeepFMConfig, jit: bool = True):
    def step(model: DeepFM, dense, cat):
        return deepfm_forward(model, dense, cat)
    if jit:
        step = jax.jit(step)
    return step


# ---------------------------------------------------------------------------
# Layout conversion (checkpoint migration between fold_fm_w layouts)
# ---------------------------------------------------------------------------

def _fuse_states(emb_state, fm_state, dim: int):
    """Exact fused-state from the legacy pair, for every sparse optimizer:
    elementwise states (Adam m/v, FTRL z/n) concat along the feature axis;
    SGD's empty accum passes through; row-wise AdaGrad's (V,) accumulators
    merge EXACTLY because the accumulator is a running mean over columns —
    fused = (D·acc_v + acc_w) / (D+1)."""
    from ..optim import SparseAdamState, SparseFTRLState, SparseOptState

    if isinstance(emb_state, SparseAdamState):
        return SparseAdamState(
            m=jnp.concatenate([fm_state.m, emb_state.m], axis=1),
            v=jnp.concatenate([fm_state.v, emb_state.v], axis=1),
            count=emb_state.count)
    if isinstance(emb_state, SparseFTRLState):
        return SparseFTRLState(
            z=jnp.concatenate([fm_state.z, emb_state.z], axis=1),
            n=jnp.concatenate([fm_state.n, emb_state.n], axis=1))
    if isinstance(emb_state, SparseOptState):
        if emb_state.accum.size == 0:       # SGD: stateless
            return emb_state
        return SparseOptState(accum=(dim * emb_state.accum
                                     + fm_state.accum) / (dim + 1))
    raise TypeError(f"unknown sparse-optimizer state {type(emb_state)}")


def fuse_deepfm(model: DeepFM) -> DeepFM:
    """Legacy two-stack DeepFM -> folded fused-stack layout (checkpoint
    migration; exact for every optimizer state — see `_fuse_states`)."""
    cfg = model.config
    if cfg.folded:
        return model
    if not cfg.use_fm:
        raise ValueError("use_fm=False has no first-order stack to fold")
    new_cfg = dataclasses.replace(cfg, fold_fm_w=True)
    data = jnp.concatenate([model.fm_w.data, model.tables.data], axis=1)
    return dataclasses.replace(
        model, config=new_cfg,
        tables=StackedTables(data=data, offsets=model.tables.offsets,
                             dim=new_cfg.stack_dim),
        fm_w=None, fm_state=None,
        emb_state=_fuse_states(model.emb_state, model.fm_state, cfg.dim))


def unfuse_deepfm(model: DeepFM, sparse_opt=None) -> DeepFM:
    """Folded DeepFM -> legacy two-stack layout. Exact for elementwise
    optimizer states (SGD/Adam/FTRL: column split); row-wise AdaGrad's
    fused (V,) accumulator cannot be split back into two (one equation,
    two unknowns) — both stacks inherit the fused accumulator, which
    preserves the v-stack's adaptive scale to within 1/(D+1) and is the
    honest best available."""
    from ..optim import SparseAdamState, SparseFTRLState, SparseOptState

    cfg = model.config
    if not cfg.folded:
        return model
    new_cfg = dataclasses.replace(cfg, fold_fm_w=False)
    wdata, vdata = model.tables.data[:, :1], model.tables.data[:, 1:]
    st = model.emb_state
    if isinstance(st, SparseAdamState):
        fm_state = SparseAdamState(m=st.m[:, :1], v=st.v[:, :1],
                                   count=st.count)
        emb_state = SparseAdamState(m=st.m[:, 1:], v=st.v[:, 1:],
                                    count=st.count)
    elif isinstance(st, SparseFTRLState):
        fm_state = SparseFTRLState(z=st.z[:, :1], n=st.n[:, :1])
        emb_state = SparseFTRLState(z=st.z[:, 1:], n=st.n[:, 1:])
    elif isinstance(st, SparseOptState):
        fm_state, emb_state = st, st     # SGD empty / shared AdaGrad accum
    else:
        raise TypeError(f"unknown sparse-optimizer state {type(st)}")
    return dataclasses.replace(
        model, config=new_cfg,
        tables=StackedTables(data=vdata, offsets=model.tables.offsets,
                             dim=cfg.dim),
        fm_w=StackedTables(data=wdata, offsets=model.tables.offsets, dim=1),
        emb_state=emb_state, fm_state=fm_state)
