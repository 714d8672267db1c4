"""Host-offloaded tables (pinned_host memory + compute_on host gather).

Verified on real TPU v5e (lookup/reducing/update, scratch history); these
tests exercise the same paths wherever the backend exposes pinned_host
(skipped if the virtual CPU backend does not).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embeddingtables_tpu as et
from embeddingtables_tpu.offload import HostOffloadEmbedding, host_put


def _pinned_host_supported() -> bool:
    try:
        x = host_put(jnp.zeros((2, 2)))
        t = HostOffloadEmbedding(jnp.zeros((4, 8)))
        et.lookup(t, jnp.array([0, 1]))
        return x.sharding.memory_kind == "pinned_host"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _pinned_host_supported(),
                                reason="backend lacks pinned_host memory")


def test_offload_lookup_matches_oracle():
    data = jax.random.normal(jax.random.key(0), (100, 16), jnp.float32)
    t = HostOffloadEmbedding(data)
    assert t.data.sharding.memory_kind == "pinned_host"
    idx = jnp.array([3, 99, 3, 17], jnp.int32)
    np.testing.assert_array_equal(np.asarray(et.lookup(t, idx)),
                                  np.asarray(data[idx]))
    idx2 = jnp.array([[1, 2], [5, 5]], jnp.int32)
    np.testing.assert_allclose(np.asarray(et.lookup(t, idx2)),
                               np.asarray(data[idx2].sum(1)), rtol=1e-6)


def test_offload_update_duplicates_accumulate():
    data = jnp.zeros((50, 8), jnp.float32)
    t = HostOffloadEmbedding(data)
    idx = jnp.array([7, 7, 3], jnp.int32)
    upd = et.SparseEmbeddingUpdate(delta=jnp.ones((3, 8)), indices=idx)
    t2 = et.sgd_update(t, upd, 1.0)
    got = np.asarray(t2.materialize())
    assert t2.data.sharding.memory_kind == "pinned_host"
    np.testing.assert_allclose(got[7], -2.0)
    np.testing.assert_allclose(got[3], -1.0)
    np.testing.assert_allclose(got[0], 0.0)


def test_offload_vjp_laziness():
    t = HostOffloadEmbedding(jnp.ones((10, 8)))
    out, pullback = et.lookup_vjp(t, jnp.array([1, 2]))
    upd = pullback(jnp.ones_like(out))
    assert isinstance(upd, et.SparseEmbeddingUpdate)
    np.testing.assert_array_equal(np.asarray(upd.indices), [1, 2])
