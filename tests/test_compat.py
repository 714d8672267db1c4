"""Framework-compat shims: jax.grad parity with the dense oracle, and the
optax-style sparse GradientTransformation (reference L6 Flux/Zygote shims)."""
import numpy as np

import jax
import jax.numpy as jnp

import embeddingtables_tpu as et
from embeddingtables_tpu.compat import (apply_updates, split_sparse,
                                        sparse_gradient_transform)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD


def test_jax_grad_through_lookup_matches_uncompress():
    """Zygote-parity: plain jax.grad on a loss through lookup gives the
    dense scatter-add gradient (reference `test/update.jl:20-45`)."""
    data = jax.random.normal(jax.random.key(0), (50, 8), jnp.float32)
    idx = jnp.array([3, 3, 7, 1], jnp.int32)

    def loss(d):
        return (et.lookup(d, idx) ** 2).sum() / 2

    g = jax.grad(loss)(data)
    out, pull = et.lookup_vjp(data, idx)
    upd = pull(out)  # dL/d(out) = out for this loss
    expect = et.uncompress(upd, 50)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-6)


def test_sparse_gradient_transform_mixed_tree():
    params = {
        "table": jnp.zeros((20, 8), jnp.float32),
        "w": jnp.ones((4,), jnp.float32),
    }
    tx = sparse_gradient_transform(SparseSGD(lr=0.5))
    state = tx.init(params)
    grads = {
        "table": et.SparseEmbeddingUpdate(
            delta=jnp.ones((3, 8), jnp.float32),
            indices=jnp.array([2, 2, 5], jnp.int32)),
        "w": jnp.full((4,), 2.0),
    }
    updates, state = tx.update(grads, state, params)
    new = apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["table"][2]), -1.0)
    np.testing.assert_allclose(np.asarray(new["table"][5]), -0.5)
    np.testing.assert_allclose(np.asarray(new["table"][0]), 0.0)
    np.testing.assert_allclose(np.asarray(new["w"]), 0.0)  # 1 - 0.5*2


def test_sparse_gradient_transform_adagrad_state_advances():
    params = {"table": jnp.zeros((10, 4), jnp.float32)}
    tx = sparse_gradient_transform(SparseRowWiseAdaGrad(lr=1.0, eps=0.0))
    state = tx.init(params)
    grads = {"table": et.SparseEmbeddingUpdate(
        delta=jnp.ones((2, 4), jnp.float32),
        indices=jnp.array([1, 1], jnp.int32))}
    updates, state = tx.update(grads, state, params)
    new = apply_updates(params, updates)
    # summed grad 2 -> accum mean(4)=4 -> step -1*2/sqrt(4) = -1
    np.testing.assert_allclose(np.asarray(new["table"][1]), -1.0)
    np.testing.assert_allclose(float(state["table"].accum[1]), 4.0)


def test_split_sparse():
    grads = {"t": et.SparseEmbeddingUpdate(delta=jnp.ones((1, 2)),
                                           indices=jnp.array([0])),
             "w": jnp.ones((3,))}
    dense, sparse = split_sparse(grads)
    assert dense["t"] is None and sparse["w"] is None
    assert isinstance(sparse["t"], et.SparseEmbeddingUpdate)
    np.testing.assert_array_equal(np.asarray(dense["w"]), np.ones(3))
