"""Two-tower retrieval: the second model family on the embedding engine.

Embedding-table engines serve two canonical workloads: CTR ranking (DLRM,
dlrm.py) and candidate retrieval (this module). The two-tower model stresses
different parts of the engine than DLRM — a *large single item vocabulary*
(the item tower IS an embedding table), contrastive in-batch-negative
training (every step updates both the sampled item rows and the query-side
feature rows), and a serving path (brute-force MXU top-k over the item
corpus) — so it doubles as an integration test that the engine generalizes.

All embedding access goes through the same stacked-ensemble machinery as
DLRM (`StackedTables`, lazy sparse gradients, fused sparse optimizers).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.ensemble import StackedTables
from ..ops.lookup import lookup
from ..ops.sparse_update import SparseEmbeddingUpdate
from ..optim import SparseSGD
from ..tables import SimpleEmbedding
from .dlrm import _init_mlp, _mlp


@dataclasses.dataclass(frozen=True)
class TwoTowerConfig:
    query_vocab_sizes: Tuple[int, ...]      # query-side categorical features
    item_vocab: int                          # item corpus size
    num_dense: int = 0                       # query-side dense features
    dim: int = 64                            # table feature size
    embed_dim: int = 64                      # final tower output dim
    query_mlp: Tuple[int, ...] = (128, 64)
    item_mlp: Tuple[int, ...] = (128, 64)
    temperature: float = 0.05
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # Embedding-table storage dtype (None = param_dtype); the production
    # bf16 recipe keeps the MLPs f32 (docs/DESIGN.md §7).
    table_dtype: Optional[jnp.dtype] = None

    @property
    def tables_dtype(self):
        return self.table_dtype if self.table_dtype is not None \
            else self.param_dtype

    def __post_init__(self):
        if self.query_mlp[-1] != self.embed_dim:
            raise ValueError("query_mlp must end at embed_dim")
        if self.item_mlp[-1] != self.embed_dim:
            raise ValueError("item_mlp must end at embed_dim")

    @property
    def num_query_tables(self) -> int:
        return len(self.query_vocab_sizes)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TwoTower:
    query_tables: StackedTables      # query categorical features, stacked
    item_table: SimpleEmbedding      # (item_vocab, dim)
    query_mlp: list
    item_mlp: list
    # Sparse-optimizer state per table (whatever sparse_opt.init returns:
    # SparseOptState / SparseAdamState / SparseFTRLState).
    q_state: object
    i_state: object
    config: TwoTowerConfig = dataclasses.field(metadata=dict(static=True))


def init_two_tower(key: jax.Array, cfg: TwoTowerConfig,
                   sparse_opt=None) -> TwoTower:
    sparse_opt = sparse_opt or SparseSGD()
    kq, ki, kqm, kim = jax.random.split(key, 4)
    total_v = sum(cfg.query_vocab_sizes)
    qdata = (jax.random.uniform(kq, (total_v, cfg.dim), minval=-1.0,
                                maxval=1.0) / jnp.sqrt(float(cfg.dim))
             ).astype(cfg.tables_dtype)
    offs, acc = [0], 0
    for v in cfg.query_vocab_sizes:
        acc += v
        offs.append(acc)
    qtables = StackedTables(data=qdata, offsets=tuple(offs), dim=cfg.dim)
    idata = (jax.random.uniform(ki, (cfg.item_vocab, cfg.dim), minval=-1.0,
                                maxval=1.0) / jnp.sqrt(float(cfg.dim))
             ).astype(cfg.tables_dtype)
    q_in = cfg.num_dense + cfg.num_query_tables * cfg.dim
    return TwoTower(
        query_tables=qtables,
        item_table=SimpleEmbedding(idata),
        query_mlp=_init_mlp(kqm, (q_in,) + cfg.query_mlp, cfg.param_dtype),
        item_mlp=_init_mlp(kim, (cfg.dim,) + cfg.item_mlp, cfg.param_dtype),
        q_state=sparse_opt.init(qdata),
        i_state=sparse_opt.init(idata),
        config=cfg)


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def query_embed_from_rows(qmlp, cfg: TwoTowerConfig, dense, q_rows):
    """Query tower given already-looked-up feature rows `(B, T, dim)` —
    the lazy sparse-gradient boundary. Concat-fuses the features (the
    `PreallocationStrategy` layout: dense first, then per-table slices)."""
    b = q_rows.shape[0]
    feats = q_rows.reshape(b, -1).astype(cfg.compute_dtype)
    if cfg.num_dense:
        feats = jnp.concatenate(
            [dense.astype(cfg.compute_dtype), feats], axis=-1)
    return _l2norm(_mlp(qmlp, feats, cfg.compute_dtype,
                        final_activation=False).astype(jnp.float32))


def item_embed_from_rows(imlp, cfg: TwoTowerConfig, i_rows):
    """Item tower given looked-up item rows `(B, dim)`."""
    return _l2norm(_mlp(imlp, i_rows.astype(cfg.compute_dtype),
                        cfg.compute_dtype,
                        final_activation=False).astype(jnp.float32))


def _query_rows(model: TwoTower, q_cat: jax.Array) -> jax.Array:
    """(T, B) query feature ids -> (B, T, dim) via one stacked gather."""
    t = model.query_tables.ntables
    g = model.query_tables.shift_indices([q_cat[i] for i in range(t)])
    flat = g.reshape(-1)
    rows = lookup(SimpleEmbedding(model.query_tables.data), flat)
    return rows.reshape(t, g.shape[1], model.config.dim).transpose(1, 0, 2)


def two_tower_scores(model: TwoTower, dense, q_cat, item_ids) -> jax.Array:
    """Similarity q·i for aligned (query, item) pairs -> (B,)."""
    q = query_embed_from_rows(model.query_mlp, model.config, dense,
                              _query_rows(model, q_cat))
    i = item_embed_from_rows(model.item_mlp, model.config,
                             model.item_table.rows(item_ids))
    return jnp.sum(q * i, axis=-1)


def in_batch_softmax_loss(q: jax.Array, i: jax.Array, temp: float):
    """Contrastive in-batch-negatives softmax: row b's positive is item b,
    all other rows are negatives. Returns (loss, accuracy)."""
    logits = (q @ i.T) / temp                     # (B, B) — one MXU matmul
    labels = jnp.arange(q.shape[0])
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(logp[labels, labels])
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


def make_train_step(cfg: TwoTowerConfig, sparse_opt=None,
                    dense_lr: float = 0.05, jit: bool = True):
    """Contrastive train step with lazy sparse gradients on BOTH towers'
    tables: differentiate w.r.t. the looked-up rows, then fused sparse
    updates (the DLRM discipline, models/dlrm.py)."""
    sparse_opt = sparse_opt or SparseSGD(0.05)
    use_sr = bool(getattr(sparse_opt, "stochastic_rounding", False))

    def step(model: TwoTower, dense, q_cat, item_ids, key=None):
        if use_sr and key is None:
            raise ValueError(
                "sparse_opt.stochastic_rounding=True: pass a fresh PRNG "
                "key per step (train_two_tower folds one in automatically)")
        q_rows = _query_rows(model, q_cat)               # (B, T, dim)
        i_rows = model.item_table.rows(item_ids)         # (B, dim)

        def loss_fn(mlps, q_act, i_act):
            qmlp, imlp = mlps
            q = query_embed_from_rows(qmlp, cfg, dense, q_act)
            i = item_embed_from_rows(imlp, cfg, i_act)
            loss, acc = in_batch_softmax_loss(q, i, cfg.temperature)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
            (model.query_mlp, model.item_mlp), q_rows, i_rows)
        mlp_grads, q_delta, i_delta = grads

        new_qmlp, new_imlp = jax.tree.map(
            lambda p, g: (p - dense_lr * g).astype(p.dtype),
            (model.query_mlp, model.item_mlp), mlp_grads)

        # Query tables: one fused stream over the stacked array.
        t = cfg.num_query_tables
        g = model.query_tables.shift_indices([q_cat[i] for i in range(t)])
        q_upd = SparseEmbeddingUpdate(
            delta=q_delta.transpose(1, 0, 2).reshape(-1, cfg.dim)
            .astype(jnp.float32),
            indices=g.reshape(-1))
        new_qdata, new_qstate = sparse_opt.apply(
            model.query_tables.data, q_upd, model.q_state,
            **({"key": key} if use_sr else {}))
        # Item table.
        i_upd = SparseEmbeddingUpdate(delta=i_delta.astype(jnp.float32),
                                      indices=item_ids)
        new_idata, new_istate = sparse_opt.apply(
            model.item_table.data, i_upd, model.i_state,
            **({"key": jax.random.fold_in(key, 1)} if use_sr else {}))

        new_model = TwoTower(
            query_tables=dataclasses.replace(model.query_tables,
                                             data=new_qdata),
            item_table=model.item_table.replace_data(new_idata),
            query_mlp=new_qmlp, item_mlp=new_imlp,
            q_state=new_qstate, i_state=new_istate, config=cfg)
        return new_model, (loss, acc)

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


# ---------------------------------------------------------------------------
# Serving: corpus index + top-k retrieval
# ---------------------------------------------------------------------------

def build_item_index(model: TwoTower, batch: int = 65_536) -> jax.Array:
    """Materialize the `(item_vocab, embed_dim)` corpus index by running the
    item tower over all items (batched; jit-compiled once per shape)."""
    cfg = model.config
    v = cfg.item_vocab

    @jax.jit
    def tower(imlp, rows):
        return item_embed_from_rows(imlp, cfg, rows)

    outs = []
    for lo in range(0, v, batch):
        hi = min(v, lo + batch)
        ids = jnp.arange(lo, hi, dtype=jnp.int32)
        outs.append(tower(model.item_mlp, model.item_table.rows(ids)))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def make_retriever(model: TwoTower, k: int = 10):
    """Trace-once retriever factory for serving loops (the one-shot
    `retrieve` constructs a fresh jit wrapper per call, which re-traces on
    the hot path). Returns `fn(index, dense, q_cat[, query_mlp,
    query_tables_data]) -> (scores (B, k), ids (B, k))`; the optional
    trailing args serve updated parameters without rebuilding."""
    cfg = model.config
    offsets = model.query_tables.offsets
    dim = model.query_tables.dim
    t = len(offsets) - 1

    @jax.jit
    def run(qmlp, qdata, index, dense, q_cat):
        g = jnp.stack([q_cat[i] + offsets[i] for i in range(t)])
        rows = jnp.take(qdata, g.reshape(-1), axis=0)
        q_rows = rows.reshape(t, g.shape[1], dim).transpose(1, 0, 2)
        q = query_embed_from_rows(qmlp, cfg, dense, q_rows)
        scores = q @ index.T
        return jax.lax.top_k(scores, k)

    def fn(index, dense, q_cat, query_mlp=None, query_tables_data=None):
        return run(query_mlp if query_mlp is not None else model.query_mlp,
                   query_tables_data if query_tables_data is not None
                   else model.query_tables.data,
                   index, jnp.asarray(dense), jnp.asarray(q_cat))

    return fn


def retrieve(model: TwoTower, index: jax.Array, dense, q_cat,
             k: int = 10):
    """Top-k retrieval: query tower + one (B, V) MXU matmul + `lax.top_k`.
    Returns (scores (B, k), item_ids (B, k)). One-shot convenience — for
    serving loops use `make_retriever` (trace once, call per request)."""

    @jax.jit
    def run(qmlp, qtables_data, index, dense, q_cat):
        model2 = dataclasses.replace(model, query_mlp=qmlp,
                                     query_tables=dataclasses.replace(
                                         model.query_tables,
                                         data=qtables_data))
        q = query_embed_from_rows(qmlp, model.config, dense,
                                  _query_rows(model2, q_cat))
        scores = q @ index.T
        return jax.lax.top_k(scores, k)

    return run(model.query_mlp, model.query_tables.data, index, dense, q_cat)
