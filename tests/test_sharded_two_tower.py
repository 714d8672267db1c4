"""Sharded two-tower serving parity vs single-chip on the 8-device mesh."""
import numpy as np

import jax
import jax.numpy as jnp

from embeddingtables_tpu.models.two_tower import (TwoTowerConfig,
                                                  build_item_index,
                                                  init_two_tower, retrieve)
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.parallel.two_tower import (build_sharded_item_index,
                                                    sharded_retrieve)


def test_sharded_index_and_retrieval_match_single_chip():
    cfg = TwoTowerConfig(query_vocab_sizes=(30, 50), item_vocab=203,
                         num_dense=3, dim=16, embed_dim=16,
                         query_mlp=(32, 16), item_mlp=(32, 16))
    model = init_two_tower(jax.random.key(0), cfg)
    mesh = default_mesh(("data",))

    # Index parity (203 rows pad to 208 over 8 shards).
    idx1 = build_item_index(model, batch=64)
    idxN = build_sharded_item_index(model, mesh)
    assert idxN.shape[0] % 8 == 0
    np.testing.assert_allclose(np.asarray(idxN)[:cfg.item_vocab],
                               np.asarray(idx1), rtol=1e-5, atol=1e-6)

    # Retrieval parity.
    rng = np.random.default_rng(1)
    b = 16
    dense = rng.normal(size=(b, 3)).astype(np.float32)
    q_cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                      for v in cfg.query_vocab_sizes])
    s1, i1 = retrieve(model, idx1, jnp.asarray(dense), jnp.asarray(q_cat),
                      k=7)
    sN, iN = sharded_retrieve(model, idxN, mesh, dense, q_cat, k=7)
    np.testing.assert_allclose(np.asarray(sN), np.asarray(s1), rtol=1e-5,
                               atol=1e-6)
    assert (np.asarray(iN) < cfg.item_vocab).all()
    # Ties can reorder ids at equal scores; compare as sets per row.
    for r in range(b):
        assert set(np.asarray(iN[r]).tolist()) == \
            set(np.asarray(i1[r]).tolist()), r


def test_retriever_factory_matches_one_shot():
    """make_sharded_retriever (trace once, call per request) returns the same
    results as the one-shot sharded_retrieve, including with swapped-in
    updated parameters."""
    from embeddingtables_tpu.parallel.two_tower import make_sharded_retriever

    cfg = TwoTowerConfig(query_vocab_sizes=(30, 50), item_vocab=203,
                         num_dense=3, dim=16, embed_dim=16,
                         query_mlp=(32, 16), item_mlp=(32, 16))
    model = init_two_tower(jax.random.key(2), cfg)
    mesh = default_mesh(("data",))
    index = build_sharded_item_index(model, mesh)
    retrieve_fn = make_sharded_retriever(model, mesh, k=5)

    rng = np.random.default_rng(3)
    for trial in range(2):  # second call reuses the cached trace
        b = 8
        dense = rng.normal(size=(b, 3)).astype(np.float32)
        q_cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                          for v in cfg.query_vocab_sizes])
        s1, i1 = sharded_retrieve(model, index, mesh, dense, q_cat, k=5)
        s2, i2 = retrieve_fn(index, dense, q_cat)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))

    # Serving updated params without rebuilding the retriever.
    model2 = init_two_tower(jax.random.key(9), cfg)
    index2 = build_sharded_item_index(model2, mesh)
    dense = rng.normal(size=(4, 3)).astype(np.float32)
    q_cat = np.stack([rng.integers(0, v, 4).astype(np.int32)
                      for v in cfg.query_vocab_sizes])
    s1, i1 = sharded_retrieve(model2, index2, mesh, dense, q_cat, k=5)
    s2, i2 = retrieve_fn(index2, dense, q_cat,
                         query_mlp=model2.query_mlp,
                         query_tables_data=model2.query_tables.data)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def _tt_batch(cfg, b, seed):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    q_cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                      for v in cfg.query_vocab_sizes])
    item_ids = rng.permutation(cfg.item_vocab)[:b].astype(np.int32)
    return dense, q_cat, item_ids


def test_sharded_tt_train_matches_single_chip():
    """Three sharded contrastive steps track the single-chip trajectory
    (tables, MLPs, optimizer state) for SGD and row-wise AdaGrad."""
    import jax.numpy as jnp
    from embeddingtables_tpu.models.two_tower import make_train_step
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
    from embeddingtables_tpu.parallel.two_tower import (
        make_sharded_tt_train_step, shard_two_tower, tt_batch_shardings,
        unshard_two_tower)

    cfg = TwoTowerConfig(query_vocab_sizes=(40, 56), item_vocab=96,
                         num_dense=3, dim=8, embed_dim=8,
                         query_mlp=(16, 8), item_mlp=(16, 8))
    mesh = default_mesh(("data",))
    for make_opt in (lambda: SparseSGD(0.1),
                     lambda: SparseRowWiseAdaGrad(lr=0.1, eps=1e-6)):
        m1 = init_two_tower(jax.random.key(3), cfg, sparse_opt=make_opt())
        mN = shard_two_tower(init_two_tower(jax.random.key(3), cfg,
                                            sparse_opt=make_opt()),
                             mesh, sparse_opt=make_opt())
        step1 = make_train_step(cfg, sparse_opt=make_opt(), dense_lr=0.1,
                                jit=False)
        stepN = make_sharded_tt_train_step(cfg, mesh, sparse_opt=make_opt(),
                                           dense_lr=0.1)
        sd, sq, si = tt_batch_shardings(mesh)
        for s in range(3):
            dense, q_cat, item_ids = _tt_batch(cfg, 32, seed=50 + s)
            m1, (l1, a1) = step1(m1, jnp.asarray(dense), jnp.asarray(q_cat),
                                 jnp.asarray(item_ids))
            mN, (lN, aN) = stepN(mN, jax.device_put(dense, sd),
                                 jax.device_put(q_cat, sq),
                                 jax.device_put(item_ids, si))
            np.testing.assert_allclose(float(lN), float(l1), rtol=1e-4)
        back = unshard_two_tower(mN)
        np.testing.assert_allclose(np.asarray(back.query_tables.data),
                                   np.asarray(m1.query_tables.data),
                                   rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(back.item_table.data),
                                   np.asarray(m1.item_table.data),
                                   rtol=5e-4, atol=1e-5)
        for wN, w1 in zip(jax.tree.leaves(back.query_mlp + back.item_mlp),
                          jax.tree.leaves(m1.query_mlp + m1.item_mlp)):
            np.testing.assert_allclose(np.asarray(wN), np.asarray(w1),
                                       rtol=5e-4, atol=1e-5)
        if isinstance(make_opt(), SparseRowWiseAdaGrad):
            np.testing.assert_allclose(np.asarray(back.q_state.accum),
                                       np.asarray(m1.q_state.accum),
                                       rtol=5e-4, atol=1e-7)


def test_sharded_tt_trained_model_serves():
    """Sharded-trained model exports to the serving path: index build +
    retrieval see the updated tables."""
    from embeddingtables_tpu.optim import SparseSGD
    from embeddingtables_tpu.parallel.two_tower import (
        make_sharded_tt_train_step, shard_two_tower, tt_batch_shardings,
        unshard_two_tower)

    cfg = TwoTowerConfig(query_vocab_sizes=(30,), item_vocab=64,
                         num_dense=2, dim=8, embed_dim=8,
                         query_mlp=(16, 8), item_mlp=(16, 8))
    mesh = default_mesh(("data",))
    mN = shard_two_tower(init_two_tower(jax.random.key(4), cfg,
                                        sparse_opt=SparseSGD(0.1)),
                         mesh, sparse_opt=SparseSGD(0.1))
    stepN = make_sharded_tt_train_step(cfg, mesh, sparse_opt=SparseSGD(0.1),
                                       dense_lr=0.1)
    sd, sq, si = tt_batch_shardings(mesh)
    losses = []
    for s in range(20):
        dense, q_cat, item_ids = _tt_batch(cfg, 32, seed=s)
        mN, (loss, _) = stepN(mN, jax.device_put(dense, sd),
                              jax.device_put(q_cat, sq),
                              jax.device_put(item_ids, si))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    trained = unshard_two_tower(mN)
    idx = build_sharded_item_index(trained, mesh)
    dense, q_cat, _ = _tt_batch(cfg, 8, seed=99)
    s, ids = sharded_retrieve(trained, idx, mesh, dense, q_cat, k=5)
    assert ids.shape == (8, 5) and (np.asarray(ids) < cfg.item_vocab).all()
