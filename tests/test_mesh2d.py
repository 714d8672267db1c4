"""2-D mesh (data x model) sharding parity: rows owned over the flattened
axes, batch sharded over data only. The pod-scale decomposition the 1-chip
reference could never express (SURVEY.md §2.3 TP/EP rows)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import embeddingtables_tpu as et
from embeddingtables_tpu.models import DLRMConfig, init_dlrm, make_train_step
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                               make_sharded_train_step,
                                               shard_dlrm)
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.parallel.sharded import (ShardedStackedTables,
                                                  sharded_ensemble_lookup,
                                                  sharded_ensemble_update,
                                                  sharded_lookup,
                                                  sharded_sgd_update)


@pytest.fixture
def mesh2d():
    return default_mesh(("data", "model"), shape=(4, 2))


def test_shard_unshard_roundtrip_2d(mesh2d):
    data = jax.random.normal(jax.random.key(0), (37, 8), jnp.float32)
    st = ShardedStackedTables.shard(mesh2d, ("data", "model"), data)
    assert st.n_shards == 8 and st.axes == ("data", "model")
    np.testing.assert_array_equal(np.asarray(st.unshard()), np.asarray(data))


@pytest.mark.parametrize("reducing", [False, True])
def test_sharded_lookup_2d_matches_dense(mesh2d, reducing):
    rng = np.random.default_rng(0)
    data = jax.random.normal(jax.random.key(1), (100, 16), jnp.float32)
    st = ShardedStackedTables.shard(mesh2d, ("data", "model"), data)
    shape = (16, 3) if reducing else (16,)
    idx = rng.integers(0, 100, shape).astype(np.int32)
    gidx = jax.device_put(jnp.asarray(idx), NamedSharding(mesh2d, P("data")))
    out = sharded_lookup(mesh2d, st, gidx)
    expect = et.lookup_oracle(data, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_sharded_update_2d_matches_dense(mesh2d):
    rng = np.random.default_rng(3)
    data = jnp.zeros((64, 8), jnp.float32)
    st = ShardedStackedTables.shard(mesh2d, ("data", "model"), data)
    idx = rng.integers(0, 64, (16,)).astype(np.int32)
    delta = rng.normal(size=(16, 8)).astype(np.float32)
    upd = et.SparseEmbeddingUpdate(delta=jnp.asarray(delta),
                                   indices=jnp.asarray(idx))
    gidx = jax.device_put(upd.indices, NamedSharding(mesh2d, P("data")))
    gdelta = jax.device_put(upd.delta, NamedSharding(mesh2d, P("data")))
    st2 = sharded_sgd_update(
        mesh2d, st, et.SparseEmbeddingUpdate(delta=gdelta, indices=gidx), 0.5)
    expect = -0.5 * et.uncompress(upd, 64)
    np.testing.assert_allclose(np.asarray(st2.unshard()), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_dlrm_train_step_2d_matches_single_chip(mesh2d):
    cfg = DLRMConfig(vocab_sizes=(64, 96, 33), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = lambda: SparseRowWiseAdaGrad(lr=0.2)  # noqa: E731
    rng = np.random.default_rng(7)
    dense = rng.normal(size=(32, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, (32,)).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, 32).astype(np.float32)

    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt())
    m1, loss1 = make_train_step(cfg, sparse_opt=opt(), dense_lr=0.2,
                                jit=False)(
        model, jnp.asarray(dense), jnp.asarray(cat), jnp.asarray(label))

    axes = ("data", "model")
    smodel = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                        mesh2d, axes, sparse_opt=opt())
    sd, sc, sl = batch_shardings(mesh2d, axes)
    stepN = make_sharded_train_step(cfg, mesh2d, axes, sparse_opt=opt(),
                                    dense_lr=0.2)
    mN, lossN = stepN(smodel, jax.device_put(dense, sd),
                      jax.device_put(cat, sc), jax.device_put(label, sl))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mN.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)


def test_init_sharded_never_materializes_full_table(mesh2d):
    from embeddingtables_tpu.parallel.sharded import ShardedStackedTables
    st = ShardedStackedTables.init_sharded(
        mesh2d, ("data", "model"), (100, 60), 16, jax.random.key(0))
    assert st.n_shards == 8 and st.vocab == 160 and st.dim == 16
    from jax.sharding import NamedSharding
    assert st.data.sharding == NamedSharding(mesh2d, P(("data", "model")))
    # iid init statistics: uniform(+-1/sqrt(16)) -> std ~ 1/(sqrt(3)*4)
    sd = float(jnp.std(st.data))
    assert 0.1 < sd < 0.2, sd


def test_init_sharded_dlrm_trains(mesh2d):
    from embeddingtables_tpu.parallel.dlrm import (init_sharded_dlrm,
                                                   make_sharded_train_step)
    cfg = DLRMConfig(vocab_sizes=(16, 24), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = SparseRowWiseAdaGrad(lr=0.1)
    model = init_sharded_dlrm(jax.random.key(0), cfg, mesh2d,
                              ("data", "model"), sparse_opt=opt)
    step = make_sharded_train_step(cfg, mesh2d, ("data", "model"),
                                   sparse_opt=opt, dense_lr=0.1)
    rng = np.random.default_rng(0)
    sd, sc, sl = batch_shardings(mesh2d, ("data", "model"))
    losses = []
    # Learnable structure: label = f(first categorical) so loss must drop
    # (small vocab + enough steps that rows are revisited and memorized).
    for i in range(30):
        dense = rng.normal(size=(32, 4)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 32).astype(np.int32)
                        for v in cfg.vocab_sizes])
        label = (cat[0] % 2).astype(np.float32)
        model, loss = step(model, jax.device_put(dense, sd),
                           jax.device_put(cat, sc), jax.device_put(label, sl))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.05, losses
