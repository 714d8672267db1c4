"""PyTorch interop: weight round-trips + lookup semantics parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import embeddingtables_tpu as et
from embeddingtables_tpu.interop import (from_torch, stacked_from_torch,
                                         stacked_to_torch, to_torch_embedding)
from embeddingtables_tpu.models.dlrm import embedding_forward


def test_roundtrip_embedding():
    emb = torch.nn.Embedding(40, 16)
    t = from_torch(emb)
    assert t.shape == (40, 16)
    np.testing.assert_array_equal(np.asarray(t.data),
                                  emb.weight.detach().numpy())
    back = to_torch_embedding(t)
    np.testing.assert_array_equal(back.weight.detach().numpy(),
                                  emb.weight.detach().numpy())


def test_lookup_matches_torch_embedding():
    rng = np.random.default_rng(0)
    emb = torch.nn.Embedding(60, 8)
    t = from_torch(emb)
    idx = rng.integers(0, 60, 25).astype(np.int64)
    want = emb(torch.from_numpy(idx)).detach().numpy()
    got = np.asarray(et.lookup(t, jnp.asarray(idx.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("mode", ["sum", "mean"])
def test_reducing_lookup_matches_torch_embedding_bag(mode):
    rng = np.random.default_rng(1)
    bagmod = torch.nn.EmbeddingBag(50, 8, mode=mode)
    t = from_torch(bagmod)
    bags = rng.integers(0, 50, (12, 4)).astype(np.int64)
    want = bagmod(torch.from_numpy(bags)).detach().numpy()
    got = np.asarray(et.lookup(t, jnp.asarray(bags.astype(np.int32)),
                               combiner=mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_bag_module():
    t = et.SimpleEmbedding(jax.random.normal(jax.random.key(0), (30, 8)))
    bagmod = to_torch_embedding(t, bag=True, mode="sum")
    bags = np.array([[1, 2], [3, 3]], np.int64)
    want = np.asarray(et.lookup(t, jnp.asarray(bags.astype(np.int32))))
    got = bagmod(torch.from_numpy(bags)).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_materializing_table():
    # Compressed tables export through materialize().
    t = et.QREmbedding.create(jax.random.key(1), 40, 8, num_remainder=7)
    m = to_torch_embedding(t)
    np.testing.assert_allclose(m.weight.detach().numpy(),
                               np.asarray(t.materialize()), rtol=1e-6)


def test_stacked_roundtrip_and_ensemble_parity():
    rng = np.random.default_rng(2)
    embs = [torch.nn.Embedding(v, 8) for v in (20, 35, 15)]
    st = stacked_from_torch(embs)
    assert st.ntables == 3 and st.data.shape == (70, 8)
    # Ensemble forward == per-table torch lookups.
    cat = np.stack([rng.integers(0, e.num_embeddings, 10) for e in embs])
    got = np.asarray(embedding_forward(st, jnp.asarray(cat.astype(np.int32))))
    for i, e in enumerate(embs):
        want = e(torch.from_numpy(cat[i].astype(np.int64))).detach().numpy()
        np.testing.assert_allclose(got[i], want, rtol=1e-6)
    # Round-trip back to per-table modules.
    back = stacked_to_torch(st)
    for e, b in zip(embs, back):
        np.testing.assert_array_equal(b.weight.detach().numpy(),
                                      e.weight.detach().numpy())


def test_stacked_from_torch_rejects_mixed_dims():
    with pytest.raises(ValueError, match="one dim"):
        stacked_from_torch([torch.nn.Embedding(4, 8),
                            torch.nn.Embedding(4, 16)])
