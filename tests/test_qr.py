"""QR (quotient-remainder) compressed embeddings vs dense oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.qr import QREmbedding, qr_lookup_vjp
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD


@pytest.mark.parametrize("combine", ["mult", "add", "concat"])
def test_qr_lookup_matches_materialized(combine):
    rng = np.random.default_rng(0)
    V, D = 97, 16
    t = QREmbedding.create(jax.random.key(0), V, D, combine=combine,
                           num_remainder=7)
    dense = np.asarray(t.materialize())
    assert dense.shape == (V, D)
    assert t.compression() > 3.0

    idx = rng.integers(0, V, 40).astype(np.int32)
    np.testing.assert_allclose(np.asarray(t.rows(jnp.asarray(idx))),
                               dense[idx], rtol=1e-6)
    # Through the generic `lookup` protocol path, bags included.
    np.testing.assert_allclose(
        np.asarray(et.lookup(t, jnp.asarray(idx))), dense[idx], rtol=1e-6)
    bag = rng.integers(0, V, (10, 3)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(et.lookup(t, jnp.asarray(bag))),
        dense[bag].sum(axis=1), rtol=1e-5)


def test_qr_distinct_rows():
    # Complementary partitions: distinct vocab ids get distinct vectors
    # (q, r) pairs are unique — spot-check no two rows collide.
    t = QREmbedding.create(jax.random.key(1), 50, 8, num_remainder=7)
    dense = np.asarray(t.materialize())
    d = np.linalg.norm(dense[:, None, :] - dense[None, :, :], axis=-1)
    np.fill_diagonal(d, 1.0)
    assert d.min() > 1e-6


@pytest.mark.parametrize("combine", ["mult", "add", "concat"])
def test_qr_vjp_matches_dense_autodiff(combine):
    rng = np.random.default_rng(2)
    V, D, B = 60, 16, 25
    t = QREmbedding.create(jax.random.key(2), V, D, combine=combine,
                           num_remainder=8)
    idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    out, pull = qr_lookup_vjp(t, idx)
    upd_q, upd_r = pull(delta)

    def f(qd, rd):
        import dataclasses
        tt = dataclasses.replace(t, q_data=qd, r_data=rd)
        return (tt.rows(idx) * delta).sum()

    gq, gr = jax.grad(f, argnums=(0, 1))(t.q_data, t.r_data)
    np.testing.assert_allclose(
        np.asarray(et.uncompress(upd_q, t.q_data.shape[0])), np.asarray(gq),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(et.uncompress(upd_r, t.r_data.shape[0])), np.asarray(gr),
        rtol=1e-5, atol=1e-6)


def test_qr_trains_with_fused_optimizers():
    # QR table memorizes targets through the lazy pipeline with AdaGrad on
    # both sub-tables.
    rng = np.random.default_rng(3)
    V, D, B = 48, 8, 32
    t = QREmbedding.create(jax.random.key(3), V, D, num_remainder=7)
    target = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    opt = SparseRowWiseAdaGrad(lr=0.3)
    sq, sr = opt.init(t.q_data), opt.init(t.r_data)
    import dataclasses
    losses = []
    for _ in range(80):
        idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
        out, pull = qr_lookup_vjp(t, idx)
        err = out - target[idx]
        losses.append(float((err ** 2).mean()))
        uq, ur = pull(2 * err / err.size)
        new_q, sq = opt.apply(t.q_data, uq, sq)
        new_r, sr = opt.apply(t.r_data, ur, sr)
        t = dataclasses.replace(t, q_data=new_q, r_data=new_r)
    # QR capacity is structural: (V/Q + Q) = 14 free vectors cannot fit 48
    # arbitrary targets exactly — expect convergence toward the rank floor,
    # not memorization.
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_qr_scatter_apply_protocol():
    # SGD through the generic protocol path equals the vjp route.
    rng = np.random.default_rng(4)
    V, D, B = 30, 8, 10
    t = QREmbedding.create(jax.random.key(4), V, D, num_remainder=5)
    idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    t2 = t.scatter_apply(idx, -0.1 * delta)
    out, pull = qr_lookup_vjp(t, idx)
    uq, ur = pull(delta)
    import dataclasses
    t3 = dataclasses.replace(
        t,
        q_data=t.q_data - 0.1 * et.uncompress(uq, t.q_data.shape[0]),
        r_data=t.r_data - 0.1 * et.uncompress(ur, t.r_data.shape[0]))
    np.testing.assert_allclose(np.asarray(t2.q_data), np.asarray(t3.q_data),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2.r_data), np.asarray(t3.r_data),
                               rtol=1e-5, atol=1e-6)
