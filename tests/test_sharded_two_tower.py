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
