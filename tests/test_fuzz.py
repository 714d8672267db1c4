"""Property fuzz: random shapes/dtypes/containers vs the dense oracles.

The reference's load-bearing pattern is oracle comparison across a
hand-picked matrix (SURVEY.md §4); this module widens it with seeded random
sweeps so shape edge cases (vocab 1, batch 1, odd dims, ragged shards, empty
bags of width 1) can't regress silently.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embeddingtables_tpu as et
from embeddingtables_tpu.ops.lookup import lookup_oracle


@pytest.mark.parametrize("trial", range(40))
def test_lookup_fuzz(trial):
    rng = np.random.default_rng(1000 + trial)
    vocab = int(rng.integers(1, 300))
    dim = int(rng.choice([1, 3, 8, 16, 65, 128, 130]))
    batch = int(rng.integers(1, 64))
    dtype = rng.choice([np.float32, np.float16])
    data = rng.standard_normal((vocab, dim)).astype(dtype)
    table = et.SimpleEmbedding(jnp.asarray(data))

    if rng.random() < 0.5:
        idx = rng.integers(0, vocab, (batch,)).astype(np.int32)
    else:
        bag = int(rng.integers(1, 6))
        idx = rng.integers(0, vocab, (batch, bag)).astype(np.int32)
    combiner = "mean" if (idx.ndim == 2 and rng.random() < 0.3) else "sum"
    weights = None
    if idx.ndim == 2 and rng.random() < 0.3:
        weights = rng.uniform(0.1, 2.0, idx.shape).astype(np.float32)

    out = et.lookup(table, jnp.asarray(idx), combiner=combiner,
                    weights=weights)
    expect = lookup_oracle(jnp.asarray(data), jnp.asarray(idx), combiner,
                           weights)
    assert out.shape == (batch, dim)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(expect, np.float32),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("trial", range(24))
def test_update_fuzz_matches_uncompress(trial):
    rng = np.random.default_rng(2000 + trial)
    vocab = int(rng.integers(2, 200))
    dim = int(rng.choice([4, 16, 128]))
    n = int(rng.integers(1, 80))
    data = jnp.asarray(rng.standard_normal((vocab, dim)).astype(np.float32))
    if rng.random() < 0.5:
        idx = rng.integers(0, vocab, (n,)).astype(np.int32)
    else:
        idx = rng.integers(0, vocab, (n, int(rng.integers(1, 4)))).astype(np.int32)
    delta = jnp.asarray(rng.standard_normal((n, dim)).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=jnp.asarray(idx))
    lr = float(rng.uniform(0.01, 2.0))
    expect = np.asarray(data) - lr * np.asarray(et.uncompress(upd, vocab))
    for method in ("scatter", "dedup"):
        got = et.sgd_update(data, upd, lr, method=method)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4,
                                   atol=2e-5, err_msg=method)


@pytest.mark.parametrize("trial", range(16))
def test_split_embedding_fuzz(trial):
    rng = np.random.default_rng(3000 + trial)
    vocab = int(rng.integers(3, 120))
    dim = int(rng.choice([4, 16]))
    rows_per_shard = int(rng.integers(1, vocab + 3))
    data = rng.standard_normal((vocab, dim)).astype(np.float32)
    split = et.SplitEmbedding(jnp.asarray(data), rows_per_shard)
    idx = rng.integers(0, vocab, (int(rng.integers(1, 40)),)).astype(np.int32)
    np.testing.assert_allclose(np.asarray(et.lookup(split, jnp.asarray(idx))),
                               data[idx], rtol=1e-6)


@pytest.mark.parametrize("trial", range(16))
def test_indexer_fuzz_contract(trial):
    """First-occurrence order + CSR structure on random streams, both
    backends (SURVEY.md §2.4 item 11)."""
    rng = np.random.default_rng(4000 + trial)
    vocab = int(rng.integers(2, 50))
    n = int(rng.integers(1, 60))
    idx = rng.integers(0, vocab, (n,)).astype(np.int32)
    for indexer in (et.SparseIndexer(), et.DenseIndexer()):
        res = et.index(jnp.asarray(idx), vocab=vocab, indexer=indexer)
        nu = int(res.num_unique)
        seen = list(dict.fromkeys(idx.tolist()))  # first-occurrence order
        assert nu == len(seen)
        np.testing.assert_array_equal(np.asarray(res.unique[:nu]), seen)
        offs = np.asarray(res.offsets)
        mp = np.asarray(res.map)
        for g, row in enumerate(seen):
            cols = mp[offs[g]:offs[g + 1]]
            expect_cols = [c for c, r in enumerate(idx) if r == row]
            np.testing.assert_array_equal(cols, expect_cols)
