"""DCN-v2 (Deep & Cross Network): second CTR model family on the engine.

Wang et al., "DCN V2: Improved Deep & Cross Network for Practical CTR
Prediction" (WWW 2021) — the other production-standard CTR architecture
next to DLRM, sharing the same embedding-table engine underneath (the
reference's role is exactly this kernel layer, `README.md:174-176` in
/root/reference). Where DLRM models feature interactions with one batched
Z·Zᵀ dot product, DCN-v2 learns BOUNDED-DEGREE polynomial crosses
explicitly:

    x_{l+1} = x0 ⊙ (W_l x_l + b_l) + x_l

After L layers the network represents all feature crosses up to degree
L+1. `W_l` is full `(F, F)` or low-rank `U_l V_lᵀ` with rank r («the
low-rank mixture variant is what deploys in practice»). TPU-first
realization: the cross layer is two dense `(B,F)x(F,r)` matmuls + one
elementwise product — all MXU/VPU work on static shapes, zero gathers;
the embedding path is the same ONE-gather `StackedTables` ensemble as
DLRM, and training uses the same lazy `(delta, indices)` discipline
(loss differentiated w.r.t. the looked-up activations, fused sparse
optimizer on the stacked array; never a (ΣV, D) dense gradient).

Structures: "stacked" (deep net consumes the cross output) and
"parallel" (cross and deep nets side by side, concatenated into the
final head) — both from the paper.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.ensemble import StackedTables
from ..ops.sparse_update import SparseEmbeddingUpdate
from ..optim import SparseOptState, SparseSGD, apply_dense_tx
from .dlrm import (_init_mlp, _mlp, bce_loss, embedding_forward,
                   stacked_flat_indices, stacked_update_weights)


@dataclasses.dataclass(frozen=True)
class DCNConfig:
    vocab_sizes: Tuple[int, ...]
    num_dense: int = 13
    dim: int = 128                      # embedding feature size
    num_cross: int = 3                  # cross layers (degree num_cross+1)
    cross_rank: Optional[int] = 64      # None = full (F, F) weights
    deep_mlp: Tuple[int, ...] = (512, 256)
    structure: str = "stacked"          # "stacked" | "parallel"
    bag: Optional[int] = None
    combiner: str = "sum"
    # Variable-length-bag padding sentinel (ops/lookup.py pad contract).
    pad_idx: Optional[int] = None
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Embedding-table storage dtype (None = param_dtype); the production
    # bf16 recipe keeps towers f32 (docs/DESIGN.md §7).
    table_dtype: Optional[jnp.dtype] = None

    @property
    def tables_dtype(self):
        return self.table_dtype if self.table_dtype is not None \
            else self.param_dtype

    def __post_init__(self):
        if self.structure not in ("stacked", "parallel"):
            raise ValueError(self.structure)
        if self.combiner not in ("sum", "mean"):
            raise ValueError(self.combiner)
        if self.num_cross < 1:
            raise ValueError("num_cross must be >= 1")

    @property
    def num_tables(self) -> int:
        return len(self.vocab_sizes)

    @property
    def input_features(self) -> int:
        """x0 width: all embeddings flattened + raw dense features."""
        return self.num_tables * self.dim + self.num_dense

    @property
    def head_features(self) -> int:
        if self.structure == "stacked":
            return self.deep_mlp[-1]
        return self.input_features + self.deep_mlp[-1]


def dcn_small_config(vocab: int = 100_000, **kw) -> DCNConfig:
    """Criteo-Kaggle-shaped small config (26 tables)."""
    kw.setdefault("vocab_sizes", tuple([vocab] * 26))
    return DCNConfig(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DCN:
    """Parameter pytree: cross layers + deep tower + head + the stacked
    embedding ensemble + sparse-optimizer row state."""

    cross: list             # [(U, V, b)] low-rank or [(W, b)] full
    deep: list              # [(W, b), ...]
    head: tuple             # (W, b) final linear -> 1 logit
    tables: StackedTables
    emb_state: SparseOptState
    config: DCNConfig = dataclasses.field(metadata=dict(static=True))
    dense_opt_state: object = None


def init_dense_params(key: jax.Array, cfg: DCNConfig):
    """(cross, deep, head) initializers — shared by `init_dcn` and the
    planner path (which must not materialize the full stacked table)."""
    kc, kd, kh = jax.random.split(key, 3)
    f = cfg.input_features
    cross = []
    for i in range(cfg.num_cross):
        kc, k1, k2 = jax.random.split(kc, 3)
        if cfg.cross_rank is None:
            std = (1.0 / f) ** 0.5
            w = (std * jax.random.normal(k1, (f, f))).astype(cfg.param_dtype)
            cross.append((w, jnp.zeros((f,), cfg.param_dtype)))
        else:
            r = cfg.cross_rank
            std_v = (1.0 / f) ** 0.5
            std_u = (1.0 / r) ** 0.5
            u = (std_u * jax.random.normal(k1, (f, r))).astype(cfg.param_dtype)
            v = (std_v * jax.random.normal(k2, (f, r))).astype(cfg.param_dtype)
            cross.append((u, v, jnp.zeros((f,), cfg.param_dtype)))
    # Cross layers preserve width, so the deep tower consumes
    # input_features in BOTH structures (stacked eats the cross output).
    deep = _init_mlp(kd, (cfg.input_features,) + cfg.deep_mlp,
                     cfg.param_dtype)
    head = _init_mlp(kh, (cfg.head_features, 1), cfg.param_dtype)[0]
    return cross, deep, head


def init_dcn(key: jax.Array, cfg: DCNConfig,
             sparse_opt=None, dense_tx=None) -> DCN:
    kdense, ke = jax.random.split(key)
    cross, deep, head = init_dense_params(kdense, cfg)
    total_v = sum(cfg.vocab_sizes)
    data = (jax.random.uniform(ke, (total_v, cfg.dim), minval=-1.0,
                               maxval=1.0)
            / jnp.sqrt(float(cfg.dim))).astype(cfg.tables_dtype)
    offs, acc = [0], 0
    for v in cfg.vocab_sizes:
        acc += v
        offs.append(acc)
    tables = StackedTables(data=data, offsets=tuple(offs), dim=cfg.dim)
    sparse_opt = sparse_opt or SparseSGD()
    dense_params = (cross, deep, head)
    dense_state = dense_tx.init(dense_params) if dense_tx is not None else None
    return DCN(cross=cross, deep=deep, head=head, tables=tables,
               emb_state=sparse_opt.init(data), config=cfg,
               dense_opt_state=dense_state)


def cross_layers(cross, x0: jax.Array, compute_dtype) -> jax.Array:
    """L applications of `x <- x0 * (W x + b) + x` (low-rank W = U Vᵀ)."""
    x0 = x0.astype(compute_dtype)
    x = x0
    for layer in cross:
        if len(layer) == 2:
            w, b = layer
            xw = x @ w.astype(compute_dtype)
        else:
            u, v, b = layer
            xw = (x @ v.astype(compute_dtype)) @ u.astype(compute_dtype).T
        x = x0 * (xw + b.astype(compute_dtype)) + x
    return x


def forward_from_embeddings(cross, deep, head, cfg: DCNConfig,
                            dense: jax.Array, emb_t: jax.Array) -> jax.Array:
    """Full forward given looked-up embeddings `(T, B, dim)` — split out so
    training can differentiate w.r.t. `emb_t` (the lazy-gradient boundary,
    same contract as models/dlrm.py)."""
    cd = cfg.compute_dtype
    b = emb_t.shape[1]
    emb = jnp.transpose(emb_t, (1, 0, 2)).reshape(b, -1)   # (B, T*dim)
    x0 = jnp.concatenate([emb.astype(cd), dense.astype(cd)], axis=-1)
    xc = cross_layers(cross, x0, cd)
    if cfg.structure == "stacked":
        feat = _mlp(deep, xc, cd)
    else:
        feat = jnp.concatenate([xc, _mlp(deep, x0, cd)], axis=-1)
    w, bh = head
    logits = feat @ w.astype(cd) + bh.astype(cd)
    return logits[:, 0].astype(jnp.float32)


def dcn_forward(model: DCN, dense: jax.Array, cat: jax.Array) -> jax.Array:
    emb_t = embedding_forward(model.tables, cat, model.config.combiner,
                              model.config.pad_idx)
    return forward_from_embeddings(model.cross, model.deep, model.head,
                                   model.config, dense, emb_t)


def make_train_step(cfg: DCNConfig, sparse_opt=None, dense_lr: float = 0.01,
                    jit: bool = True, dense_tx=None,
                    microbatch: Optional[int] = None):
    """Fused single-chip train step, same lazy-sparse discipline as the
    DLRM step (models/dlrm.py::make_train_step): `(delta, indices)` on the
    stacked ensemble, fused sparse-optimizer row update, plain-SGD or
    optax towers. Returns `step(model, dense, cat, label) -> (model, loss)`.
    microbatch=k: gradient accumulation over k `lax.scan` slices (see the
    DLRM step docstring — one optimizer application, B/k activations live).
    """
    sparse_opt = sparse_opt or SparseSGD()

    def _grads(model, dense, cat, label):
        emb_t = embedding_forward(model.tables, cat, cfg.combiner,
                                  cfg.pad_idx)

        def loss_fn(dense_params, emb_act):
            cross, deep, head = dense_params
            logits = forward_from_embeddings(cross, deep, head, cfg,
                                             dense, emb_act)
            return bce_loss(logits, label)

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(
            (model.cross, model.deep, model.head), emb_t)

    def _grads_micro(model, dense, cat, label, k):
        from .microbatch import microbatch_grads
        params = (model.cross, model.deep, model.head)

        def slice_grads(d_i, c_i, l_i):
            emb_t = embedding_forward(model.tables, c_i, cfg.combiner,
                                      cfg.pad_idx)

            def loss_fn(dense_params, emb_act):
                cross, deep, head = dense_params
                logits = forward_from_embeddings(cross, deep, head, cfg,
                                                 d_i, emb_act)
                return bce_loss(logits, l_i)

            loss_i, (dg_i, delta_i) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, emb_t)
            return loss_i, dg_i, (delta_i,)

        loss, dense_grads, (delta_t,) = microbatch_grads(
            params, dense, cat, label, k, slice_grads)
        return loss, (dense_grads, delta_t)

    use_sr = bool(getattr(sparse_opt, "stochastic_rounding", False))

    def step(model: DCN, dense, cat, label, lr=None, key=None):
        if use_sr and key is None:
            raise ValueError(
                "sparse_opt.stochastic_rounding=True: pass a fresh PRNG "
                "key per step (train_dcn folds one in automatically)")
        if microbatch and microbatch > 1:
            loss, grads = _grads_micro(model, dense, cat, label, microbatch)
        else:
            loss, grads = _grads(model, dense, cat, label)
        dense_grads, delta_t = grads

        params = (model.cross, model.deep, model.head)
        (new_cross, new_deep, new_head), new_dense_state = apply_dense_tx(
            params, dense_grads, dense_tx, model.dense_opt_state, dense_lr)

        flat_idx, valid = stacked_flat_indices(model.tables, cat,
                                               cfg.pad_idx)
        flat_delta = delta_t.reshape(-1, cfg.dim).astype(jnp.float32)
        w = stacked_update_weights(valid, cfg.combiner, flat_idx.shape)
        upd = SparseEmbeddingUpdate(delta=flat_delta, indices=flat_idx,
                                    weights=w)
        new_data, new_state = sparse_opt.apply(
            model.tables.data, upd, model.emb_state, lr=lr,
            **({"key": key} if use_sr else {}))
        new_tables = dataclasses.replace(model.tables, data=new_data)
        new_model = DCN(cross=new_cross, deep=new_deep, head=new_head,
                        tables=new_tables, emb_state=new_state, config=cfg,
                        dense_opt_state=new_dense_state)
        return new_model, loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_eval_step(cfg: DCNConfig, jit: bool = True):
    def step(model: DCN, dense, cat):
        return dcn_forward(model, dense, cat)
    if jit:
        step = jax.jit(step)
    return step
