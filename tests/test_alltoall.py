"""All-to-all butterfly exchange vs the dense oracle and the v1 exchange."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import embeddingtables_tpu as et
from embeddingtables_tpu.parallel.alltoall import (sharded_lookup_a2a,
                                                   sharded_sgd_update_a2a)
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.parallel.sharded import ShardedStackedTables


@pytest.fixture
def mesh():
    return default_mesh(("data",))


def put(mesh, x):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))


@pytest.mark.parametrize("reducing", [False, True])
def test_a2a_lookup_matches_dense(mesh, reducing):
    rng = np.random.default_rng(0)
    data = jax.random.normal(jax.random.key(1), (96, 16), jnp.float32)
    st = ShardedStackedTables.shard(mesh, "data", data)
    shape = (32, 3) if reducing else (32,)
    idx = rng.integers(0, 96, shape).astype(np.int32)
    out, ovf = sharded_lookup_a2a(mesh, st, put(mesh, idx),
                                  capacity_factor=8.0)
    assert int(ovf) == 0
    expect = et.lookup_oracle(data, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_a2a_update_matches_dense(mesh):
    rng = np.random.default_rng(2)
    data = jnp.zeros((64, 8), jnp.float32)
    st = ShardedStackedTables.shard(mesh, "data", data)
    idx = rng.integers(0, 64, (32,)).astype(np.int32)
    delta = rng.normal(size=(32, 8)).astype(np.float32)
    upd = et.SparseEmbeddingUpdate(delta=put(mesh, delta),
                                   indices=put(mesh, idx))
    st2, ovf = sharded_sgd_update_a2a(mesh, st, upd, 0.5,
                                      capacity_factor=8.0)
    assert int(ovf) == 0
    expect = -0.5 * et.uncompress(
        et.SparseEmbeddingUpdate(delta=jnp.asarray(delta),
                                 indices=jnp.asarray(idx)), 64)
    np.testing.assert_allclose(np.asarray(st2.unshard()), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_a2a_overflow_counting_and_zero_fill(mesh):
    """All occurrences target ONE owner shard: with capacity_factor=1 most
    must overflow; surviving outputs are exact, dropped ones read zero."""
    data = jax.random.normal(jax.random.key(3), (80, 8), jnp.float32)
    st = ShardedStackedTables.shard(mesh, "data", data)
    # Global rows all ≡ 0 (mod 8): every index is owned by shard 0.
    idx = (np.arange(32, dtype=np.int32) * 8) % 80
    out, ovf = sharded_lookup_a2a(mesh, st, put(mesh, idx),
                                  capacity_factor=1.0)
    out = np.asarray(out)
    expect = np.asarray(data)[idx]
    assert int(ovf) > 0
    # Each output row is either exact or exactly zero (dropped).
    exact = np.isclose(out, expect, atol=1e-6).all(axis=1)
    zero = (out == 0).all(axis=1)
    assert (exact | zero).all()
    assert int(ovf) == int(zero.sum())


def test_a2a_skewed_zipf_roundtrip(mesh):
    """Power-law indices (the hard case) with a generous capacity factor."""
    rng = np.random.default_rng(4)
    ranks = (rng.pareto(1.2, 256) * 3).astype(np.int32) % 96
    data = jax.random.normal(jax.random.key(5), (96, 8), jnp.float32)
    st = ShardedStackedTables.shard(mesh, "data", data)
    out, ovf = sharded_lookup_a2a(mesh, st, put(mesh, ranks.astype(np.int32)),
                                  capacity_factor=8.0)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(data)[ranks],
                               rtol=1e-6)


def test_a2a_train_step_matches_gather_exchange(mesh):
    """The butterfly train step tracks the exact gather-exchange step when
    capacity is ample (SGD, one-hot)."""
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.optim import SparseSGD
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm)
    cfg = DLRMConfig(vocab_sizes=(64, 96, 33), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = lambda: SparseSGD(0.3)  # noqa: E731
    rng = np.random.default_rng(9)
    dense = rng.normal(size=(32, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 32).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, 32).astype(np.float32)
    sd, sc, sl = batch_shardings(mesh, "data")
    args = (jax.device_put(dense, sd), jax.device_put(cat, sc),
            jax.device_put(label, sl))

    m_g = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                     mesh, "data", sparse_opt=opt())
    m_a = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                     mesh, "data", sparse_opt=opt())
    step_g = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                     dense_lr=0.3)
    step_a = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                     dense_lr=0.3, exchange="a2a",
                                     capacity_factor=16.0)
    m_g, loss_g = step_g(m_g, *args)
    m_a, loss_a = step_a(m_a, *args)
    np.testing.assert_allclose(float(loss_a), float(loss_g), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_a.tables.unshard()),
                               np.asarray(m_g.tables.unshard()),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_a2a_train_step_with_bags_matches_gather(mesh, combiner):
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.optim import SparseSGD
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm)
    cfg = DLRMConfig(vocab_sizes=(64, 96), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1), bag=3,
                     combiner=combiner, compute_dtype=jnp.float32)
    opt = lambda: SparseSGD(0.3)  # noqa: E731
    rng = np.random.default_rng(13)
    dense = rng.normal(size=(32, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, (32, 3)).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, 32).astype(np.float32)
    sd, sc, sl = batch_shardings(mesh, "data")
    args = (jax.device_put(dense, sd), jax.device_put(cat, sc),
            jax.device_put(label, sl))
    m_g = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                     mesh, "data", sparse_opt=opt())
    m_a = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                     mesh, "data", sparse_opt=opt())
    step_g = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                     dense_lr=0.3)
    step_a = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                     dense_lr=0.3, exchange="a2a",
                                     capacity_factor=32.0)
    m_g, loss_g = step_g(m_g, *args)
    m_a, loss_a = step_a(m_a, *args)
    np.testing.assert_allclose(float(loss_a), float(loss_g), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_a.tables.unshard()),
                               np.asarray(m_g.tables.unshard()),
                               rtol=2e-4, atol=1e-6)


def test_a2a_adagrad_train_step_matches_gather(mesh):
    """AdaGrad after routing: owner-side dedup must give the same single
    state-advance-per-row as the gather exchange."""
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm)
    cfg = DLRMConfig(vocab_sizes=(64, 96), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = lambda: SparseRowWiseAdaGrad(lr=0.3, eps=1e-6)  # noqa: E731
    rng = np.random.default_rng(17)
    dense = rng.normal(size=(32, 4)).astype(np.float32)
    # duplicates on purpose: state must advance once per unique row
    cat = np.stack([rng.integers(0, 8, 32).astype(np.int32),
                    rng.integers(0, 96, 32).astype(np.int32)])
    label = rng.integers(0, 2, 32).astype(np.float32)
    sd, sc, sl = batch_shardings(mesh, "data")
    args = (jax.device_put(dense, sd), jax.device_put(cat, sc),
            jax.device_put(label, sl))
    m_g = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                     mesh, "data", sparse_opt=opt())
    m_a = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                     mesh, "data", sparse_opt=opt())
    m_g, loss_g = make_sharded_train_step(cfg, mesh, "data",
                                          sparse_opt=opt(), dense_lr=0.3)(
        m_g, *args)
    m_a, loss_a = make_sharded_train_step(cfg, mesh, "data",
                                          sparse_opt=opt(), dense_lr=0.3,
                                          exchange="a2a",
                                          capacity_factor=32.0)(m_a, *args)
    np.testing.assert_allclose(float(loss_a), float(loss_g), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_a.tables.unshard()),
                               np.asarray(m_g.tables.unshard()),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_a.emb_accum),
                               np.asarray(m_g.emb_accum),
                               rtol=2e-4, atol=1e-7)


@pytest.mark.parametrize("reducing", [False, True])
def test_a2a_lookup_2d_mesh_matches_dense(reducing):
    mesh2 = default_mesh(("data", "model"), shape=(4, 2))
    rng = np.random.default_rng(21)
    data = jax.random.normal(jax.random.key(6), (96, 16), jnp.float32)
    st = ShardedStackedTables.shard(mesh2, ("data", "model"), data)
    shape = (32, 2) if reducing else (32,)
    idx = rng.integers(0, 96, shape).astype(np.int32)
    gidx = jax.device_put(jnp.asarray(idx), NamedSharding(mesh2, P("data")))
    out, ovf = sharded_lookup_a2a(mesh2, st, gidx, capacity_factor=16.0)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(et.lookup_oracle(data, idx)),
                               rtol=1e-6, atol=1e-6)


def test_a2a_update_2d_mesh_matches_dense():
    mesh2 = default_mesh(("data", "model"), shape=(4, 2))
    rng = np.random.default_rng(23)
    data = jnp.zeros((64, 8), jnp.float32)
    st = ShardedStackedTables.shard(mesh2, ("data", "model"), data)
    idx = rng.integers(0, 64, (32,)).astype(np.int32)
    delta = rng.normal(size=(32, 8)).astype(np.float32)
    sh = NamedSharding(mesh2, P("data"))
    upd = et.SparseEmbeddingUpdate(delta=jax.device_put(delta, sh),
                                   indices=jax.device_put(idx, sh))
    st2, ovf = sharded_sgd_update_a2a(mesh2, st, upd, 0.5,
                                      capacity_factor=16.0)
    assert int(ovf) == 0
    expect = -0.5 * et.uncompress(
        et.SparseEmbeddingUpdate(delta=jnp.asarray(delta),
                                 indices=jnp.asarray(idx)), 64)
    np.testing.assert_allclose(np.asarray(st2.unshard()), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_suggest_capacity_factor():
    from embeddingtables_tpu.parallel.alltoall import suggest_capacity_factor
    assert suggest_capacity_factor(2.0, 0.0) == 2.0
    bigger = suggest_capacity_factor(2.0, 0.1)
    assert bigger > 2.0 * 1.1


def test_a2a_train_step_2d_mesh():
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.optim import SparseSGD
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm)
    mesh2 = default_mesh(("data", "model"), shape=(4, 2))
    cfg = DLRMConfig(vocab_sizes=(64, 96), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = lambda: SparseSGD(0.3)  # noqa: E731
    rng = np.random.default_rng(31)
    dense = rng.normal(size=(32, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 32).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, 32).astype(np.float32)
    axes = ("data", "model")
    sd, sc, sl = batch_shardings(mesh2, axes)
    args = (jax.device_put(dense, sd), jax.device_put(cat, sc),
            jax.device_put(label, sl))
    m_g = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                     mesh2, axes, sparse_opt=opt())
    m_a = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                     mesh2, axes, sparse_opt=opt())
    m_g, loss_g = make_sharded_train_step(cfg, mesh2, axes,
                                          sparse_opt=opt(), dense_lr=0.3)(
        m_g, *args)
    m_a, loss_a = make_sharded_train_step(cfg, mesh2, axes, sparse_opt=opt(),
                                          dense_lr=0.3, exchange="a2a",
                                          capacity_factor=32.0)(m_a, *args)
    np.testing.assert_allclose(float(loss_a), float(loss_g), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_a.tables.unshard()),
                               np.asarray(m_g.tables.unshard()),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("reducing", [False, True])
def test_a2a_weighted_update_matches_dense(mesh, reducing):
    """Per-occurrence weights ride the butterfly exchange too."""
    rng = np.random.default_rng(41)
    data = jnp.zeros((64, 8), jnp.float32)
    st = ShardedStackedTables.shard(mesh, "data", data)
    shape = (32, 2) if reducing else (32,)
    idx = rng.integers(0, 64, shape).astype(np.int32)
    delta = rng.normal(size=(32, 8)).astype(np.float32)
    w = rng.uniform(0.1, 2.0, shape).astype(np.float32)
    upd = et.SparseEmbeddingUpdate(delta=put(mesh, delta),
                                   indices=put(mesh, idx),
                                   weights=put(mesh, w))
    st2, ovf = sharded_sgd_update_a2a(mesh, st, upd, 0.5,
                                      capacity_factor=16.0)
    assert int(ovf) == 0
    expect = -0.5 * et.uncompress(
        et.SparseEmbeddingUpdate(delta=jnp.asarray(delta),
                                 indices=jnp.asarray(idx),
                                 weights=jnp.asarray(w)), 64)
    np.testing.assert_allclose(np.asarray(st2.unshard()), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_a2a_train_step_with_overflow_output(mesh):
    """`with_overflow=True` returns (model, (loss, overflow)): zero under
    ample capacity, positive when every occurrence targets one owner under
    capacity_factor=1 (the retuning signal for suggest_capacity_factor)."""
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.optim import SparseSGD
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm)
    cfg = DLRMConfig(vocab_sizes=(64,), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = lambda: SparseSGD(0.3)  # noqa: E731
    rng = np.random.default_rng(43)
    dense = rng.normal(size=(32, 4)).astype(np.float32)
    label = rng.integers(0, 2, 32).astype(np.float32)
    sd, sc, sl = batch_shardings(mesh, "data")

    def run(cat, capacity_factor):
        m = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                       mesh, "data", sparse_opt=opt())
        step = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                       dense_lr=0.3, exchange="a2a",
                                       capacity_factor=capacity_factor,
                                       with_overflow=True)
        _, (loss, ovf) = step(m, jax.device_put(dense, sd),
                              jax.device_put(cat, sc),
                              jax.device_put(label, sl))
        return float(loss), int(ovf)

    spread = np.stack([rng.integers(0, 64, 32).astype(np.int32)])
    loss, ovf = run(spread, 16.0)
    assert np.isfinite(loss) and ovf == 0
    hot = np.zeros((1, 32), np.int32)  # all -> owner of row 0
    _, ovf_hot = run(hot, 1.0)
    assert ovf_hot > 0
