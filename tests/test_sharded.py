"""Sharded-table tests on the 8-device virtual CPU mesh.

New obligation beyond the reference (SURVEY.md §4): the reference is
single-process; its `SplitEmbedding` + disjoint-ownership discipline become
mesh sharding + collectives here. Every sharded op is checked against the
single-device oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.parallel import (ShardedStackedTables, default_mesh,
                                          sharded_ensemble_lookup,
                                          sharded_ensemble_update,
                                          sharded_lookup, sharded_sgd_update,
                                          shard_table)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return default_mesh(("data",))


def test_mesh_has_8_devices(mesh):
    assert mesh.shape["data"] == N_DEV


def test_shard_roundtrip(mesh):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((100, 16)).astype(np.float32)
    st = shard_table(mesh, "data", data)
    assert st.n_shards == N_DEV
    np.testing.assert_array_equal(st.unshard(), data)


def test_mod_sharding_balances_rows(mesh):
    # Row r lives on device r % n at slot r // n.
    data = np.arange(32, dtype=np.float32)[:, None] * np.ones((1, 8), np.float32)
    st = shard_table(mesh, "data", data)
    local0 = np.asarray(st.data[0])  # shard of device 0
    np.testing.assert_array_equal(local0[:, 0], np.arange(0, 32, 8, dtype=np.float32))


@pytest.mark.parametrize("batch_sharded", [True, False])
@pytest.mark.parametrize("reducing", [False, True])
def test_sharded_lookup_matches_oracle(mesh, batch_sharded, reducing):
    rng = np.random.default_rng(1)
    V, D, B = 333, 32, 64
    data = rng.standard_normal((V, D)).astype(np.float32)
    st = shard_table(mesh, "data", data)
    if reducing:
        idx = jnp.asarray(rng.integers(0, V, size=(B, 4)).astype(np.int32))
    else:
        idx = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))
    expected = et.lookup_oracle(jnp.asarray(data), idx)
    out = sharded_lookup(mesh, st, idx, batch_sharded=batch_sharded)
    # summation order differs across devices for reducing bags -> ULP-bounded
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_sharded_lookup_under_jit(mesh):
    rng = np.random.default_rng(2)
    V, D, B = 96, 16, 32
    data = rng.standard_normal((V, D)).astype(np.float32)
    st = shard_table(mesh, "data", data)
    idx = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))

    f = jax.jit(lambda s, i: sharded_lookup(mesh, s, i))
    out = f(st, idx)
    np.testing.assert_allclose(out, et.lookup_oracle(jnp.asarray(data), idx),
                               rtol=1e-6)


@pytest.mark.parametrize("reducing", [False, True])
def test_sharded_update_matches_oracle(mesh, reducing):
    rng = np.random.default_rng(3)
    V, D, B = 120, 16, 40
    lr = 10.0
    data = rng.standard_normal((V, D)).astype(np.float32)
    st = shard_table(mesh, "data", data)
    if reducing:
        idx = jnp.asarray(rng.integers(0, V, size=(B, 3)).astype(np.int32))
    else:
        idx = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)

    expected = jnp.asarray(data) - lr * et.uncompress(upd, V)
    new = sharded_sgd_update(mesh, st, upd, lr)
    np.testing.assert_allclose(new.unshard(), expected, rtol=1e-4, atol=1e-4)


def test_sharded_ensemble_lookup_and_update(mesh):
    rng = np.random.default_rng(4)
    T, D, B = 3, 16, 32
    vocabs = [50, 200, 77]
    lr = 5.0
    tables = [rng.standard_normal((v, D)).astype(np.float32) for v in vocabs]
    st = ShardedStackedTables.shard(mesh, "data", [et.SimpleEmbedding(t) for t in tables])
    assert st.ntables == T

    idx = [jnp.asarray(rng.integers(0, v, size=B).astype(np.int32)) for v in vocabs]
    expected = [et.lookup_oracle(jnp.asarray(t), i) for t, i in zip(tables, idx)]

    outs = sharded_ensemble_lookup(mesh, st, idx)
    for o, e in zip(outs, expected):
        np.testing.assert_allclose(o, e, rtol=1e-6)

    # Fused (PreallocationStrategy analog) with prependrows.
    fused = sharded_ensemble_lookup(mesh, st, idx, fused=True, prependrows=8)
    want = jnp.concatenate([jnp.zeros((B, 8), jnp.float32)] + expected, axis=-1)
    np.testing.assert_allclose(fused, want, rtol=1e-6)

    # Ensemble update vs per-table dense oracle.
    deltas = [jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
              for _ in range(T)]
    upds = [et.SparseEmbeddingUpdate(delta=d, indices=i)
            for d, i in zip(deltas, idx)]
    new = sharded_ensemble_update(mesh, st, upds, lr)
    for t in range(T):
        exp = jnp.asarray(tables[t]) - lr * et.uncompress(upds[t], vocabs[t])
        np.testing.assert_allclose(new.table(t), exp, rtol=1e-4, atol=1e-4)


def test_sharded_train_step_jit_end_to_end(mesh):
    # One jitted train step over the sharded stack: fused lookup -> loss ->
    # lazy grads -> sharded update. Loss must decrease.
    rng = np.random.default_rng(5)
    T, D, B, V = 2, 16, 32, 64
    tables = [rng.standard_normal((V, D)).astype(np.float32) for _ in range(T)]
    st = ShardedStackedTables.shard(mesh, "data",
                                    [et.SimpleEmbedding(t) for t in tables])
    target = jnp.asarray(rng.standard_normal((B, T * D)).astype(np.float32))
    idx = jnp.asarray(np.stack([rng.permutation(V)[:B] for _ in range(T)])
                      .astype(np.int32))

    @jax.jit
    def step(st, idx):
        fused = sharded_ensemble_lookup(mesh, st, idx, fused=True)
        loss, dfused = jax.value_and_grad(
            lambda y: ((y - target) ** 2).mean())(fused)
        slicer = et.Slicer(0)
        upds = [et.SparseEmbeddingUpdate(delta=slicer(D, dfused), indices=idx[t])
                for t in range(T)]
        st = sharded_ensemble_update(mesh, st, upds, B * T * D / 4.0)
        return st, loss

    losses = []
    for _ in range(10):
        st, loss = step(st, idx)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.05, losses


@pytest.mark.parametrize("reducing", [False, True])
def test_sharded_weighted_update_matches_oracle(mesh, reducing):
    """Per-occurrence weights ride the gather exchange (weighted bags /
    mean-combiner gradients under sharding)."""
    rng = np.random.default_rng(6)
    V, D, B = 120, 16, 40
    lr = 2.0
    data = rng.standard_normal((V, D)).astype(np.float32)
    st = shard_table(mesh, "data", data)
    shape = (B, 3) if reducing else (B,)
    idx = jnp.asarray(rng.integers(0, V, size=shape).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.1, 2.0, size=shape).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx, weights=w)

    expected = jnp.asarray(data) - lr * et.uncompress(upd, V)
    new = sharded_sgd_update(mesh, st, upd, lr)
    np.testing.assert_allclose(new.unshard(), expected, rtol=1e-4, atol=1e-4)


def test_sharded_weighted_ensemble_update(mesh):
    """Mixed weighted/unweighted per-table updates through the single fused
    ensemble exchange (missing weights promote to ones)."""
    rng = np.random.default_rng(7)
    D, B = 8, 24
    vocabs = [40, 72]
    lr = 1.0
    tables = [rng.standard_normal((v, D)).astype(np.float32) for v in vocabs]
    st = ShardedStackedTables.shard(mesh, "data",
                                    [et.SimpleEmbedding(t) for t in tables])
    idx = [jnp.asarray(rng.integers(0, v, size=(B, 2)).astype(np.int32))
           for v in vocabs]
    deltas = [jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
              for _ in vocabs]
    w0 = jnp.asarray(rng.uniform(0.0, 3.0, size=(B, 2)).astype(np.float32))
    upds = [et.SparseEmbeddingUpdate(delta=deltas[0], indices=idx[0],
                                     weights=w0),
            et.SparseEmbeddingUpdate(delta=deltas[1], indices=idx[1])]

    new = sharded_ensemble_update(mesh, st, upds, lr)
    for t, v in enumerate(vocabs):
        exp = jnp.asarray(tables[t]) - lr * et.uncompress(upds[t], v)
        np.testing.assert_allclose(new.table(t), exp, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Sharded lazy Adam
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bag,reg", [(None, {}), (2, dict(weight_decay=0.01,
                                                          clipnorm=1.0))])
def test_sharded_adam_matches_single_chip(bag, reg):
    from embeddingtables_tpu.ops.ensemble import StackedTables
    from embeddingtables_tpu.ops.sparse_update import SparseEmbeddingUpdate
    from embeddingtables_tpu.optim import SparseLazyAdam
    from embeddingtables_tpu.parallel.sharded import (init_sharded_adam_state,
                                                      sharded_adam_apply,
                                                      unshard_adam_state)
    mesh = default_mesh(("data",))
    rng = np.random.default_rng(31)
    vocabs = (60, 90)
    dim = 8
    arrs = [jnp.asarray(rng.normal(size=(v, dim)).astype(np.float32))
            for v in vocabs]
    stacked = StackedTables.stack([et.SimpleEmbedding(a) for a in arrs])
    opt = SparseLazyAdam(lr=0.1, **reg)

    st = ShardedStackedTables.shard(mesh, "data", stacked)
    m, v, count = init_sharded_adam_state(mesh, st)
    state1 = opt.init(stacked.data)

    b = 32
    shape = (b,) if bag is None else (b, bag)
    data1 = stacked.data
    for it in range(3):                      # multi-step: count/bias corr.
        idx = [rng.integers(0, vv, shape).astype(np.int32) for vv in vocabs]
        delta = rng.normal(size=(2, b, dim)).astype(np.float32)
        # single chip: one merged stacked update (same occurrence stream)
        shifted = jnp.stack([jnp.asarray(idx[t]) + stacked.offsets[t]
                             for t in range(2)])
        flat_idx = shifted.reshape((-1,) + shifted.shape[2:])
        upd = SparseEmbeddingUpdate(
            delta=jnp.asarray(delta).reshape(-1, dim), indices=flat_idx)
        data1, state1 = opt.apply(data1, upd, state1)
        # sharded
        from jax.sharding import NamedSharding, PartitionSpec as P
        sd = NamedSharding(mesh, P(None, "data"))
        st, m, v, count = sharded_adam_apply(
            mesh, st, m, v, count,
            jax.device_put(shifted, sd),
            jax.device_put(jnp.asarray(delta), sd), opt)

    np.testing.assert_allclose(np.asarray(st.unshard()), np.asarray(data1),
                               rtol=2e-5, atol=1e-6)
    back = unshard_adam_state(st, m, v, count)
    np.testing.assert_allclose(np.asarray(back.m), np.asarray(state1.m),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(back.v), np.asarray(state1.v),
                               rtol=2e-5, atol=1e-8)
    assert int(back.count) == int(state1.count) == 3


def test_shard_adam_state_roundtrip():
    from embeddingtables_tpu.optim import SparseLazyAdam
    from embeddingtables_tpu.parallel.sharded import (shard_adam_state,
                                                      unshard_adam_state)
    mesh = default_mesh(("data",))
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.normal(size=(70, 8)).astype(np.float32))
    st = ShardedStackedTables.shard(mesh, "data", et.SimpleEmbedding(data))
    opt = SparseLazyAdam()
    state = opt.init(data)
    state = state._replace(m=jnp.asarray(
        rng.normal(size=(70, 8)).astype(np.float32)), count=jnp.int32(7))
    m, v, count = shard_adam_state(mesh, st, state)
    back = unshard_adam_state(st, m, v, count)
    np.testing.assert_array_equal(np.asarray(back.m), np.asarray(state.m))
    np.testing.assert_array_equal(np.asarray(back.v), np.asarray(state.v))
    assert int(back.count) == 7
