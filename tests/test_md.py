"""Mixed-dimension (low-rank) embeddings vs dense oracles."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.md import MDEmbedding, md_lookup_vjp
from embeddingtables_tpu.optim import SparseSGD


def test_md_lookup_matches_materialized():
    rng = np.random.default_rng(0)
    V, D, ds = 80, 32, 8
    t = MDEmbedding.create(jax.random.key(0), V, D, ds)
    dense = np.asarray(t.materialize())
    assert t.compression() > 2.5
    idx = rng.integers(0, V, 30).astype(np.int32)
    np.testing.assert_allclose(np.asarray(t.rows(jnp.asarray(idx))),
                               dense[idx], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(et.lookup(t, jnp.asarray(idx))),
                               dense[idx], rtol=1e-5, atol=1e-6)
    bag = rng.integers(0, V, (9, 4)).astype(np.int32)
    np.testing.assert_allclose(np.asarray(et.lookup(t, jnp.asarray(bag))),
                               dense[bag].sum(axis=1), rtol=1e-4, atol=1e-5)


def test_md_vjp_matches_dense_autodiff():
    rng = np.random.default_rng(1)
    V, D, ds, B = 50, 16, 4, 20
    t = MDEmbedding.create(jax.random.key(1), V, D, ds)
    idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    out, pull = md_lookup_vjp(t, idx)
    upd_small, proj_grad = pull(delta)
    assert (upd_small.indices == idx).all()

    def f(data, proj):
        tt = dataclasses.replace(t, data=data, proj=proj)
        return (tt.rows(idx) * delta).sum()

    gd, gp = jax.grad(f, argnums=(0, 1))(t.data, t.proj)
    np.testing.assert_allclose(np.asarray(et.uncompress(upd_small, V)),
                               np.asarray(gd), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(proj_grad), np.asarray(gp),
                               rtol=1e-5, atol=1e-6)


def test_md_trains_toward_low_rank_target():
    # A rank-ds target is exactly representable: training must drive the
    # loss far down (unlike arbitrary full-rank targets).
    rng = np.random.default_rng(2)
    V, D, ds, B = 40, 16, 4, 32
    t = MDEmbedding.create(jax.random.key(2), V, D, ds)
    tgt_small = rng.standard_normal((V, ds)).astype(np.float32)
    tgt_proj = rng.standard_normal((ds, D)).astype(np.float32) / np.sqrt(ds)
    target = jnp.asarray(tgt_small @ tgt_proj)
    opt = SparseSGD(0.2)
    losses = []
    for _ in range(150):
        idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
        out, pull = md_lookup_vjp(t, idx)
        err = out - target[idx]
        losses.append(float((err ** 2).mean()))
        upd_small, proj_grad = pull(2 * err / B)
        new_data, _ = opt.apply(t.data, upd_small, opt.init(t.data))
        t = dataclasses.replace(t, data=new_data,
                                proj=t.proj - 0.02 * proj_grad)
    assert losses[-1] < 0.15 * losses[0], (losses[0], losses[-1])


def test_md_validation():
    with pytest.raises(ValueError, match="d_small"):
        MDEmbedding.create(jax.random.key(0), 10, 8, 9)
    t = MDEmbedding.create(jax.random.key(0), 10, 8, 4)
    with pytest.raises(ValueError, match="indices"):
        md_lookup_vjp(t, jnp.zeros((3, 2), jnp.int32))
