"""Constructor validation + extension-API tests — mirrors
/root/reference/test/constructors.jl.

The reference proves its abstract API is sufficient by building a
`DummyEmbedding` implementing only the minimal surface and running `lookup`
through it (constructors.jl:34-54). Our protocol surface is {spec, rows,
example}; the dummy below implements exactly that.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et


def test_static_validation_errors():
    # Static{N} validation (constructors.jl:13-15, simple.jl:19-26).
    data = np.zeros((10, 16), np.float32)
    with pytest.raises(ValueError):
        et.SimpleEmbedding(data, et.Static(8))
    with pytest.raises(ValueError):
        et.Static(0)
    with pytest.raises(ValueError):
        et.Static(3.5)  # must be an Int, like the reference's N::Int check
    # matching size works
    t = et.SimpleEmbedding(data, et.Static(16))
    assert t.spec.is_static and et.featuresize(t) == 16


def test_table_spec_padded_dim():
    s = et.TableSpec(vocab=10, dim=65)
    assert s.padded_dim == 128
    s2 = et.TableSpec(vocab=10, dim=128)
    assert s2.padded_dim == 128


def test_split_embedding_constructor():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((45, 8)).astype(np.float32)
    sp = et.SplitEmbedding(data, 20)
    assert sp.nshards == 3
    assert sp.shards[0].shape == (20, 8)
    assert sp.shards[2].shape == (5, 8)   # ragged last shard (split.jl:11-26)
    assert sp.spec.is_static              # SplitEmbedding forces Static
    np.testing.assert_array_equal(sp.materialize(), data)
    # chunkindex divrem routing (split.jl:59-74)
    s, l = sp.chunkindex(jnp.asarray(43))
    assert int(s) == 2 and int(l) == 3


@dataclasses.dataclass
class DummyEmbedding:
    """Third-party table implementing only the minimal protocol."""

    data: np.ndarray

    @property
    def spec(self):
        return et.TableSpec(vocab=self.data.shape[0], dim=self.data.shape[1],
                            dtype=jnp.float32)

    def rows(self, idx):
        return jnp.take(jnp.asarray(self.data), idx, axis=0)

    def example(self):
        return jnp.asarray(self.data)


def test_dummy_embedding_protocol():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((30, 16)).astype(np.float32)
    dummy = DummyEmbedding(data)
    assert et.is_table(dummy)

    idx = rng.integers(0, 30, size=12).astype(np.int32)
    expected = et.lookup_oracle(jnp.asarray(data), jnp.asarray(idx))
    assert (et.lookup(dummy, idx) == expected).all()

    bag = rng.integers(0, 30, size=(6, 4)).astype(np.int32)
    np.testing.assert_allclose(
        et.lookup(dummy, bag),
        et.lookup_oracle(jnp.asarray(data), jnp.asarray(bag)), rtol=1e-6)


def test_tables_are_pytrees():
    # Tables must traverse jit/grad boundaries as pytrees.
    t = et.SimpleEmbedding(np.ones((4, 8), np.float32))
    leaves, treedef = jax.tree_util.tree_flatten(t)
    assert len(leaves) == 1
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert (t2.data == t.data).all() and t2.spec == t.spec

    sp = et.SplitEmbedding(np.ones((10, 8), np.float32), 4)
    leaves, treedef = jax.tree_util.tree_flatten(sp)
    assert len(leaves) == 3
    sp2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert sp2.rows_per_shard == 4


def test_zeros_like():
    t = et.SimpleEmbedding(np.ones((4, 8), np.float32))
    z = t.zeros_like()
    assert (z.data == 0).all() and z.spec == t.spec
