"""TT-Rec (tensor-train) compressed embeddings vs dense oracles."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.tt import (TTEmbedding, _balanced_factors,
                                    _exact_factors, tt_lookup_vjp)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad


def test_factorizations():
    for n in (97, 1000, 123457):
        for k in (2, 3):
            vf = _balanced_factors(n, k)
            assert len(vf) == k
            assert np.prod(vf) >= n
            # Balanced: largest factor within ~4x of the k-th root.
            assert max(vf) <= 4 * int(np.ceil(n ** (1 / k))) + 4
    for n in (128, 60, 7):
        for k in (2, 3):
            df = _exact_factors(n, k)
            assert len(df) == k and int(np.prod(df)) == n


def test_tt_lookup_matches_materialized():
    rng = np.random.default_rng(0)
    V, D = 1003, 16
    t = TTEmbedding.create(jax.random.key(0), V, D, rank=4)
    assert t.compression() > 10.0
    dense = np.asarray(t.materialize())
    assert dense.shape == (V, D)

    idx = rng.integers(0, V, 40).astype(np.int32)
    np.testing.assert_allclose(np.asarray(t.rows(jnp.asarray(idx))),
                               dense[idx], rtol=1e-5, atol=1e-6)
    # Through the generic `lookup` protocol path, bags included.
    np.testing.assert_allclose(
        np.asarray(et.lookup(t, jnp.asarray(idx))), dense[idx],
        rtol=1e-5, atol=1e-6)
    bag = rng.integers(0, V, (10, 3)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(et.lookup(t, jnp.asarray(bag))),
        dense[bag].sum(axis=1), rtol=1e-5, atol=1e-5)


def test_tt_two_core_matches_explicit_product():
    # Hand-checkable 2-core case: row(v) = G1[i1] @ G2[i2] with
    # i1 = v // v2, i2 = v % v2 and kron-ordered dims.
    V, D = 12, 4
    t = TTEmbedding.create(jax.random.key(1), V, D, rank=3, num_cores=2,
                          vocab_factors=(4, 3), dim_factors=(2, 2))
    g1, g2 = [np.asarray(c) for c in t.cores]   # (4,1,2,3), (3,3,2,1)
    for v in range(V):
        i1, i2 = v // 3, v % 3
        m1 = g1[i1, 0]          # (2, 3)
        m2 = g2[i2, :, :, 0]    # (3, 2)
        expect = (m1 @ m2).reshape(-1)   # row-major (d1, d2) flatten
        np.testing.assert_allclose(
            np.asarray(t.rows(jnp.asarray([v]))[0]), expect,
            rtol=1e-6, atol=1e-7)


def test_tt_init_scale():
    # Row std should land near 1/sqrt(D) (same contract as the other
    # table types), within a loose factor.
    V, D = 5000, 64
    t = TTEmbedding.create(jax.random.key(2), V, D, rank=8)
    std = float(np.asarray(t.materialize()).std())
    assert 0.2 / np.sqrt(D) < std < 5.0 / np.sqrt(D), std


def test_tt_vjp_matches_dense_autodiff():
    rng = np.random.default_rng(2)
    V, D, B = 60, 16, 25
    t = TTEmbedding.create(jax.random.key(3), V, D, rank=4, num_cores=3)
    idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    out, pull = tt_lookup_vjp(t, idx)
    upds = pull(delta)
    assert len(upds) == len(t.cores)

    def f(*cores):
        tt = dataclasses.replace(t, cores=cores)
        return (tt.rows(idx) * delta).sum()

    grads = jax.grad(f, argnums=tuple(range(len(t.cores))))(*t.cores)
    for u, g, c in zip(upds, grads, t.cores):
        np.testing.assert_allclose(
            np.asarray(et.uncompress(u, c.shape[0])),
            np.asarray(g).reshape(c.shape[0], -1),
            rtol=1e-5, atol=1e-6)


def test_tt_trains_with_fused_optimizers():
    # TT table fits targets through the lazy per-core pipeline with AdaGrad.
    rng = np.random.default_rng(3)
    V, D, B = 48, 8, 32
    t = TTEmbedding.create(jax.random.key(4), V, D, rank=4)
    target = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    opt = SparseRowWiseAdaGrad(lr=0.3)
    states = [opt.init(c) for c in t.core_tables()]
    losses = []
    for _ in range(120):
        idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
        out, pull = tt_lookup_vjp(t, idx)
        err = out - target[idx]
        losses.append(float((err ** 2).mean()))
        upds = pull(2 * err / err.size)
        flats = []
        for k, (c, u) in enumerate(zip(t.core_tables(), upds)):
            new_c, states[k] = opt.apply(c, u, states[k])
            flats.append(new_c)
        t = t.replace_core_tables(flats)
    # TT capacity is structural (rank floor), expect convergence not
    # memorization.
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_tt_scatter_apply_protocol():
    # SGD through the generic protocol path equals vjp + uncompress.
    rng = np.random.default_rng(4)
    V, D, B = 30, 8, 10
    t = TTEmbedding.create(jax.random.key(5), V, D, rank=3)
    idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    t2 = t.scatter_apply(idx, -0.1 * delta)
    _, pull = tt_lookup_vjp(t, idx)
    upds = pull(delta)
    flats = [c - 0.1 * et.uncompress(u, c.shape[0])
             for c, u in zip(t.core_tables(), upds)]
    t3 = t.replace_core_tables(flats)
    for a, b in zip(t2.cores, t3.cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_tt_in_ensemble_maplookup():
    # A TT table mixes with plain tables through every maplookup strategy.
    rng = np.random.default_rng(5)
    V, D, B = 40, 8, 12
    tt = TTEmbedding.create(jax.random.key(6), V, D, rank=3)
    plain = et.SimpleEmbedding(
        jnp.asarray(rng.standard_normal((V, D)).astype(np.float32)))
    tables = [tt, plain]
    idx = jnp.asarray(rng.integers(0, V, (2, B)).astype(np.int32))
    want = np.concatenate(
        [np.asarray(tt.materialize())[np.asarray(idx[0])],
         np.asarray(plain.data)[np.asarray(idx[1])]], axis=1)
    for strat in (et.DefaultStrategy(), et.SimpleParallelStrategy(),
                  et.PreallocationStrategy()):
        got = et.maplookup(strat, tables, idx)
        if isinstance(got, (list, tuple)):
            got = np.concatenate([np.asarray(g) for g in got], axis=1)
        else:
            got = np.asarray(got)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
