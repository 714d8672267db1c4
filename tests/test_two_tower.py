"""Two-tower retrieval model: shapes, contrastive training, top-k serving."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from embeddingtables_tpu.models.two_tower import (TwoTowerConfig,
                                                  build_item_index,
                                                  init_two_tower,
                                                  make_train_step, retrieve,
                                                  two_tower_scores)
from embeddingtables_tpu.optim import SparseSGD


def tiny_cfg(**kw):
    kw.setdefault("query_vocab_sizes", (40, 60))
    kw.setdefault("item_vocab", 200)
    kw.setdefault("num_dense", 3)
    kw.setdefault("dim", 16)
    kw.setdefault("embed_dim", 16)
    kw.setdefault("query_mlp", (32, 16))
    kw.setdefault("item_mlp", (32, 16))
    return TwoTowerConfig(**kw)


def synth_batch(cfg, b, rng, unique=False):
    """Planted structure: item j 'belongs to' query feature cluster
    j % vocab — queries with that feature click that item. `unique` samples
    items without replacement (duplicate items in a batch are false
    negatives under in-batch softmax)."""
    if unique:
        items = rng.choice(cfg.item_vocab, b, replace=False).astype(np.int32)
    else:
        items = rng.integers(0, cfg.item_vocab, b).astype(np.int32)
    q_cat = np.stack([items % v for v in cfg.query_vocab_sizes]).astype(np.int32)
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    return dense, q_cat, items


def test_shapes_and_scores():
    cfg = tiny_cfg()
    model = init_two_tower(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    dense, q_cat, items = synth_batch(cfg, 8, rng)
    s = two_tower_scores(model, jnp.asarray(dense), jnp.asarray(q_cat),
                         jnp.asarray(items))
    assert s.shape == (8,)
    assert np.all(np.abs(np.asarray(s)) <= 1.0 + 1e-5)  # normalized towers


def test_training_learns_and_retrieves():
    cfg = tiny_cfg()
    model = init_two_tower(jax.random.key(1), cfg,
                           sparse_opt=SparseSGD(0.2))
    step = make_train_step(cfg, sparse_opt=SparseSGD(0.2), dense_lr=0.2)
    rng = np.random.default_rng(1)
    accs = []
    for i in range(300):
        dense, q_cat, items = synth_batch(cfg, 64, rng, unique=True)
        model, (loss, acc) = step(model, jnp.asarray(dense),
                                  jnp.asarray(q_cat), jnp.asarray(items))
        accs.append(float(acc))
    assert np.mean(accs[-10:]) > np.mean(accs[:10]) + 0.2, (
        np.mean(accs[:10]), np.mean(accs[-10:]))

    # Serving path: the positive item should appear in top-10 far above
    # chance (10/200 = 5%).
    index = build_item_index(model, batch=64)
    assert index.shape == (cfg.item_vocab, cfg.embed_dim)
    dense, q_cat, items = synth_batch(cfg, 64, rng)
    scores, ids = retrieve(model, index, jnp.asarray(dense),
                           jnp.asarray(q_cat), k=10)
    assert ids.shape == (64, 10)
    hit = np.mean([items[b] in np.asarray(ids[b]) for b in range(64)])
    assert hit > 0.3, hit


def test_sparse_updates_touch_only_seen_rows():
    cfg = tiny_cfg()
    model = init_two_tower(jax.random.key(2), cfg)
    step = make_train_step(cfg, sparse_opt=SparseSGD(1.0), dense_lr=0.0,
                           jit=False)
    dense = np.zeros((4, cfg.num_dense), np.float32)
    q_cat = np.asarray([[1, 1, 2, 2], [3, 3, 4, 4]], np.int32)
    items = np.asarray([7, 8, 7, 9], np.int32)
    new_model, _ = step(model, jnp.asarray(dense), jnp.asarray(q_cat),
                        jnp.asarray(items))
    # Untouched item rows identical; touched rows changed.
    old = np.asarray(model.item_table.data)
    new = np.asarray(new_model.item_table.data)
    touched = {7, 8, 9}
    for r in range(cfg.item_vocab):
        if r in touched:
            assert not np.array_equal(old[r], new[r]), r
        else:
            np.testing.assert_array_equal(old[r], new[r])
