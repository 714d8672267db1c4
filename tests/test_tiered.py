"""Tiered (HBM head + pinned-host tail) tables vs dense oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embeddingtables_tpu as et
from embeddingtables_tpu.offload import host_put
from embeddingtables_tpu.tiered import TieredEmbedding
from embeddingtables_tpu.utils.rowstats import (FrequencyTracker,
                                                inverse_permutation)


def _pinned_host_supported() -> bool:
    try:
        x = host_put(jnp.zeros((2, 2)))
        t = TieredEmbedding.from_array(jnp.zeros((4, 8)), 2)
        et.lookup(t, jnp.array([0, 3]))
        return x.sharding.memory_kind == "pinned_host"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _pinned_host_supported(),
                                reason="backend lacks pinned_host memory")


def test_tiered_lookup_matches_oracle():
    data = jax.random.normal(jax.random.key(0), (100, 16), jnp.float32)
    t = TieredEmbedding.from_array(data, 30)
    assert t.hot.shape == (30, 16) and t.cold.shape == (70, 16)
    assert t.cold.sharding.memory_kind == "pinned_host"
    np.testing.assert_array_equal(np.asarray(t.materialize()),
                                  np.asarray(data))
    # Indices spanning both tiers, duplicates included.
    idx = jnp.array([3, 99, 29, 30, 3, 77], jnp.int32)
    np.testing.assert_array_equal(np.asarray(et.lookup(t, idx)),
                                  np.asarray(data[idx]))
    # Reducing bags mixing tiers.
    bag = jnp.array([[1, 95], [31, 2]], jnp.int32)
    np.testing.assert_allclose(np.asarray(et.lookup(t, bag)),
                               np.asarray(data[bag].sum(1)), rtol=1e-6)


def test_tiered_update_duplicates_accumulate_across_tiers():
    t = TieredEmbedding.from_array(jnp.zeros((50, 8), jnp.float32), 10)
    idx = jnp.array([7, 7, 45, 9, 45, 45], jnp.int32)
    upd = et.SparseEmbeddingUpdate(delta=jnp.ones((6, 8)), indices=idx)
    t2 = et.sgd_update(t, upd, 1.0)
    got = np.asarray(t2.materialize())
    np.testing.assert_allclose(got[7], -2.0)    # hot tier, dup x2
    np.testing.assert_allclose(got[45], -3.0)   # cold tier, dup x3
    np.testing.assert_allclose(got[9], -1.0)
    np.testing.assert_allclose(got[0], 0.0)
    np.testing.assert_allclose(got[30], 0.0)


def test_tiered_vjp_laziness():
    t = TieredEmbedding.from_array(jnp.ones((10, 8)), 4)
    out, pullback = et.lookup_vjp(t, jnp.array([1, 7]))
    upd = pullback(jnp.ones_like(out))
    assert isinstance(upd, et.SparseEmbeddingUpdate)
    np.testing.assert_array_equal(np.asarray(upd.indices), [1, 7])


def test_tiered_retier_follows_traffic():
    rng = np.random.default_rng(1)
    V, D, H = 64, 8, 8
    data = jax.random.normal(jax.random.key(1), (V, D), jnp.float32)
    t = TieredEmbedding.from_array(data, H)
    # Skewed traffic concentrated on HIGH ids (currently all cold).
    stream = rng.choice(np.arange(V - 10, V), size=400).astype(np.int32)
    assert t.hot_fraction(stream) == 0.0

    tracker = FrequencyTracker(V)
    tracker.observe(stream)
    perm = tracker.frequency_permutation()
    t2 = t.retier(perm, hot_rows=16)
    # Contents preserved under the relabeling: new[rank] = old[perm[rank]].
    np.testing.assert_allclose(np.asarray(t2.materialize()),
                               np.asarray(data)[perm], rtol=1e-6)
    # The loader-side remap sends the hot stream into the HBM head.
    inv = inverse_permutation(perm)
    assert t2.hot_fraction(inv[stream]) == 1.0
    # Remapped lookups return the same vectors as before the retier.
    np.testing.assert_allclose(
        np.asarray(et.lookup(t2, jnp.asarray(inv[stream[:32]]))),
        np.asarray(et.lookup(t, jnp.asarray(stream[:32]))), rtol=1e-6)


def test_tiered_error_paths():
    with pytest.raises(ValueError, match="hot_rows"):
        TieredEmbedding.from_array(jnp.zeros((10, 4)), 0)
    with pytest.raises(ValueError, match="hot_rows"):
        TieredEmbedding.from_array(jnp.zeros((10, 4)), 10)
    t = TieredEmbedding.from_array(jnp.zeros((10, 4)), 5)
    with pytest.raises(ValueError, match="perm"):
        t.retier(np.arange(7))


def test_tiered_trains_through_fused_optimizer():
    # End-to-end: lazy vjp + AdaGrad protocol path (ensemble_update route).
    from embeddingtables_tpu.optim import SparseSGD
    rng = np.random.default_rng(2)
    V, D, B = 40, 8, 16
    target = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    t = TieredEmbedding.create(jax.random.key(2), V, D, 10)
    losses = []
    for _ in range(150):
        idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
        out, pull = et.lookup_vjp(t, idx)
        err = out - target[idx]
        losses.append(float((err ** 2).mean()))
        upd = pull(2 * err / err.size)
        t = et.sgd_update(t, upd, 4.0)
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
