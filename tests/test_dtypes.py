"""Storage-dtype coverage: bf16 tables through lookup / vjp / updates.

The reference is f32-only in tests but generic over eltype; on TPU bf16
tables halve HBM traffic, so first-class coverage matters.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embeddingtables_tpu as et
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD


@pytest.fixture
def bf16_table():
    data = jax.random.normal(jax.random.key(0), (64, 128), dtype=jnp.float32)
    return et.SimpleEmbedding(data.astype(jnp.bfloat16))


def test_lookup_bf16_matches_oracle(bf16_table):
    idx = jnp.array([3, 9, 3, 63], jnp.int32)
    out = et.lookup(bf16_table, idx)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray(et.lookup_oracle(bf16_table.data, idx), np.float32))


def test_reducing_lookup_bf16(bf16_table):
    idx = jnp.array([[3, 9], [1, 1]], jnp.int32)
    out = et.lookup(bf16_table, idx)
    ref = et.lookup_oracle(bf16_table.data, idx)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2)


def test_sgd_update_bf16_table_f32_grad(bf16_table):
    idx = jnp.array([5, 5, 7], jnp.int32)
    delta = jax.random.normal(jax.random.key(1), (3, 128), jnp.float32)
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)
    new = et.sgd_update(bf16_table, upd, 0.5)
    assert new.data.dtype == jnp.bfloat16
    expect = (bf16_table.data.astype(jnp.float32)
              - 0.5 * et.uncompress(upd, 64))
    np.testing.assert_allclose(np.asarray(new.data, np.float32),
                               np.asarray(expect), rtol=2e-2, atol=2e-2)


def test_adagrad_bf16_table_keeps_f32_state(bf16_table):
    opt = SparseRowWiseAdaGrad(lr=0.1)
    state = opt.init(bf16_table.data)
    assert state.accum.dtype == jnp.float32  # row state must stay f32
    idx = jnp.array([2, 2], jnp.int32)
    delta = jnp.ones((2, 128), jnp.float32)
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)
    new_data, new_state = opt.apply(bf16_table.data, upd, state)
    assert new_data.dtype == jnp.bfloat16
    np.testing.assert_allclose(float(new_state.accum[2]), 4.0)


def test_prealloc_dtype_override():
    """PreallocationStrategy{U} eltype override (reference `_select_eltype`,
    `src/lookup.jl:293-294`): bf16 tables fused into an f32 output."""
    tables = [et.SimpleEmbedding(
        jax.random.normal(jax.random.key(i), (32, 16)).astype(jnp.bfloat16))
        for i in range(3)]
    idx = [jnp.array([1, 2]), jnp.array([3, 4]), jnp.array([5, 6])]
    out = et.maplookup(et.PreallocationStrategy(prependrows=4,
                                                dtype=jnp.float32),
                       tables, idx)
    assert out.dtype == jnp.float32
    assert out.shape == (2, 4 + 3 * 16)
