"""Bag combiners beyond the reference's sum: mean and weighted bags, through
lookup, the lazy vjp, and the fused updates (gradient vs dense autodiff)."""
import numpy as np

import jax
import jax.numpy as jnp

import embeddingtables_tpu as et
from embeddingtables_tpu.ops.lookup import lookup_oracle


def setup(b=8, bag=3, v=40, d=16, seed=0):
    rng = np.random.default_rng(seed)
    data = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, v, (b, bag)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0.1, 2.0, (b, bag)).astype(np.float32))
    return data, idx, w


def test_mean_combiner_matches_oracle():
    data, idx, _ = setup()
    out = et.lookup(data, idx, combiner="mean")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(lookup_oracle(data, idx, "mean")),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(data)[np.asarray(idx)].mean(1),
                               rtol=1e-6)


def test_weighted_sum_and_weighted_mean():
    data, idx, w = setup()
    out = et.lookup(data, idx, weights=w)
    expect = (np.asarray(data)[np.asarray(idx)]
              * np.asarray(w)[..., None]).sum(1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)

    outm = et.lookup(data, idx, combiner="mean", weights=w)
    expectm = expect / np.asarray(w).sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(outm), expectm, rtol=1e-5)


def test_vjp_weights_match_dense_autodiff():
    """Lazy pullback (weights folded into the update) must equal jax.grad
    through the dense formulation, for every combiner flavor."""
    data, idx, w = setup(seed=3)
    v = data.shape[0]
    for combiner, weights in [("sum", None), ("mean", None),
                              ("sum", w), ("mean", w)]:
        def loss_dense(d):
            out = lookup_oracle(d, idx, combiner, weights)
            return (out ** 2).sum() / 2
        g_dense = jax.grad(loss_dense)(data)

        out, pull = et.lookup_vjp(data, idx, combiner=combiner,
                                  weights=weights)
        upd = pull(out)  # dL/dout = out for this loss
        g_lazy = et.uncompress(upd, v)
        np.testing.assert_allclose(np.asarray(g_lazy), np.asarray(g_dense),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"{combiner}, weighted={weights is not None}")


def test_sgd_update_with_weighted_update():
    data, idx, w = setup(seed=5)
    v = data.shape[0]
    delta = jnp.ones((idx.shape[0], data.shape[1]), jnp.float32)
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx, weights=w)
    new = et.sgd_update(data, upd, 0.5)
    expect = np.asarray(data) - 0.5 * np.asarray(et.uncompress(upd, v))
    np.testing.assert_allclose(np.asarray(new), expect, rtol=1e-5, atol=1e-6)


def test_protocol_table_combiners():
    data, idx, w = setup(seed=7)
    split = et.SplitEmbedding(data, rows_per_shard=13)
    out = et.lookup(split, idx, combiner="mean", weights=w)
    expect = lookup_oracle(data, idx, "mean", w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)
