"""Sharded-vs-single-chip DLRM parity on the 8-device virtual CPU mesh.

The multi-device obligation the reference never had (SURVEY.md §4): one
train step of the hybrid DP-dense/model-parallel-embedding path must match
the single-chip step numerically.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.models import DLRMConfig, init_dlrm, make_train_step
from embeddingtables_tpu.models.dlrm import dlrm_forward
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                               make_sharded_eval_step,
                                               make_sharded_train_step,
                                               shard_dlrm)
from embeddingtables_tpu.parallel.mesh import default_mesh


def tiny_cfg(**kw):
    kw.setdefault("vocab_sizes", (64, 96, 33))
    kw.setdefault("num_dense", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("bottom_mlp", (16, 8))
    kw.setdefault("top_mlp", (16, 1))
    kw.setdefault("compute_dtype", jnp.float32)
    return DLRMConfig(**kw)


def synth_batch(cfg, b, seed=0, bag=None):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    shape = (b,) if bag is None else (b, bag)
    cat = np.stack([rng.integers(0, v, shape).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, b).astype(np.float32)
    return dense, cat, label


@pytest.mark.parametrize("opt_name,bag", [("sgd", None), ("sgd", 2),
                                          ("adagrad", None), ("adagrad", 2)])
def test_sharded_step_matches_single_chip(opt_name, bag):
    cfg = tiny_cfg(bag=bag)
    mesh = default_mesh(("data",))
    assert mesh.shape["data"] == 8
    make_opt = (lambda: SparseSGD(0.3)) if opt_name == "sgd" else \
        (lambda: SparseRowWiseAdaGrad(lr=0.3, eps=1e-6))

    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=make_opt())
    dense, cat, label = synth_batch(cfg, b=32, seed=1, bag=bag)

    # Single-chip step.
    step1 = make_train_step(cfg, sparse_opt=make_opt(), dense_lr=0.3,
                            jit=False)
    m1, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                      jnp.asarray(label))

    # Sharded step.
    smodel = shard_dlrm(init_dlrm(jax.random.key(0), cfg,
                                  sparse_opt=make_opt()),
                        mesh, "data", sparse_opt=make_opt())
    sd, sc, sl = batch_shardings(mesh, "data")
    stepN = make_sharded_train_step(cfg, mesh, "data", sparse_opt=make_opt(),
                                    dense_lr=0.3)
    mN, lossN = stepN(smodel,
                      jax.device_put(dense, sd),
                      jax.device_put(cat, sc),
                      jax.device_put(label, sl))

    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mN.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)
    for (w1, b1), (wN, bN) in zip(m1.bottom + m1.top, mN.bottom + mN.top):
        np.testing.assert_allclose(np.asarray(wN), np.asarray(w1),
                                   rtol=2e-4, atol=1e-6)
    if opt_name == "adagrad":
        # Accumulator parity: unshard (n, rows_local) -> (ΣV,).
        acc = np.asarray(mN.emb_accum)
        n, rows = acc.shape
        acc_full = acc.T.reshape(n * rows)[:sum(cfg.vocab_sizes)]
        np.testing.assert_allclose(acc_full, np.asarray(m1.emb_state.accum),
                                   rtol=2e-4, atol=1e-7)


def test_sharded_eval_matches_single_chip():
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    model = init_dlrm(jax.random.key(5), cfg)
    dense, cat, _ = synth_batch(cfg, b=16, seed=9)
    expect = dlrm_forward(model, jnp.asarray(dense), jnp.asarray(cat))

    smodel = shard_dlrm(model, mesh, "data")
    sd, sc, _ = batch_shardings(mesh, "data")
    stepE = make_sharded_eval_step(cfg, mesh, "data")
    got = stepE(smodel, jax.device_put(dense, sd), jax.device_put(cat, sc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=1e-6)


def test_multi_step_training_stays_in_sync():
    """Three consecutive sharded steps track the single-chip trajectory."""
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    opt = lambda: SparseRowWiseAdaGrad(lr=0.1)  # noqa: E731
    model = init_dlrm(jax.random.key(2), cfg, sparse_opt=opt())
    smodel = shard_dlrm(model, mesh, "data", sparse_opt=opt())
    step1 = make_train_step(cfg, sparse_opt=opt(), dense_lr=0.1, jit=False)
    stepN = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                    dense_lr=0.1)
    sd, sc, sl = batch_shardings(mesh, "data")
    for i in range(3):
        dense, cat, label = synth_batch(cfg, b=16, seed=100 + i)
        model, l1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                          jnp.asarray(label))
        smodel, lN = stepN(smodel, jax.device_put(dense, sd),
                           jax.device_put(cat, sc),
                           jax.device_put(label, sl))
        np.testing.assert_allclose(float(lN), float(l1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(smodel.tables.unshard()),
                               np.asarray(model.tables.data),
                               rtol=5e-4, atol=1e-6)


def test_sharded_mean_combiner_matches_single_chip():
    cfg = tiny_cfg(bag=3, combiner="mean")
    mesh = default_mesh(("data",))
    opt = lambda: SparseSGD(0.3)  # noqa: E731
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt())
    dense, cat, label = synth_batch(cfg, b=32, seed=2, bag=3)
    m1, loss1 = make_train_step(cfg, sparse_opt=opt(), dense_lr=0.3,
                                jit=False)(
        model, jnp.asarray(dense), jnp.asarray(cat), jnp.asarray(label))
    smodel = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                        mesh, "data", sparse_opt=opt())
    sd, sc, sl = batch_shardings(mesh, "data")
    mN, lossN = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                        dense_lr=0.3)(
        smodel, jax.device_put(dense, sd), jax.device_put(cat, sc),
        jax.device_put(label, sl))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mN.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)


def test_sharded_eval_mean_combiner_matches_single_chip():
    """Eval path divides bag sums by bag width under combiner="mean"."""
    cfg = tiny_cfg(bag=3, combiner="mean")
    mesh = default_mesh(("data",))
    model = init_dlrm(jax.random.key(6), cfg)
    dense, cat, _ = synth_batch(cfg, b=16, seed=11, bag=3)
    expect = dlrm_forward(model, jnp.asarray(dense), jnp.asarray(cat))

    smodel = shard_dlrm(model, mesh, "data")
    sd, sc, _ = batch_shardings(mesh, "data")
    got = make_sharded_eval_step(cfg, mesh, "data")(
        smodel, jax.device_put(dense, sd), jax.device_put(cat, sc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=1e-6)


def test_init_sharded_dlrm_adagrad_initial_accum():
    """Direct sharded init seeds the AdaGrad accumulator at initial_accum
    (parity with optim.SparseRowWiseAdaGrad.init state)."""
    from embeddingtables_tpu.parallel.dlrm import init_sharded_dlrm
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    opt = SparseRowWiseAdaGrad(lr=0.1, initial_accum=0.5)
    smodel = init_sharded_dlrm(jax.random.key(7), cfg, mesh, sparse_opt=opt)
    acc = np.asarray(smodel.emb_accum)
    assert acc.size > 0
    np.testing.assert_allclose(acc, 0.5)


def test_unshard_dlrm_roundtrip():
    from embeddingtables_tpu.parallel.dlrm import unshard_dlrm
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    opt = SparseRowWiseAdaGrad(lr=0.3, eps=1e-6)
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt)
    smodel = shard_dlrm(model, mesh, "data", sparse_opt=opt)
    dense, cat, label = synth_batch(cfg, b=32, seed=2)
    sd, sc, sl = batch_shardings(mesh, "data")
    stepN = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt,
                                    dense_lr=0.3)
    smodel, _ = stepN(smodel, jax.device_put(dense, sd),
                      jax.device_put(cat, sc), jax.device_put(label, sl))
    back = unshard_dlrm(smodel)
    # The unsharded model is a valid single-chip DLRM: one more step runs
    # and matches the sharded continuation.
    step1 = make_train_step(cfg, sparse_opt=opt, dense_lr=0.3, jit=False)
    m1, loss1 = step1(back, jnp.asarray(dense), jnp.asarray(cat),
                      jnp.asarray(label))
    smodel2, lossN = stepN(smodel, jax.device_put(dense, sd),
                           jax.device_put(cat, sc),
                           jax.device_put(label, sl))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(smodel2.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(unshard_dlrm(smodel2).emb_state.accum),
        np.asarray(m1.emb_state.accum), rtol=2e-4, atol=1e-7)


def test_sharded_dlrm_optax_towers_match_single_chip():
    """dense_tx (optax adam) on the mesh step: replicated tower state,
    multi-step parity with the single-chip step."""
    import optax
    from embeddingtables_tpu.parallel.dlrm import make_sharded_train_step
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    tx = optax.adam(1e-2)
    opt = SparseRowWiseAdaGrad(lr=0.2, eps=1e-6)

    m1 = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt, dense_tx=tx)
    step1 = make_train_step(cfg, sparse_opt=opt, dense_tx=tx, jit=False)

    sm = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt,
                              dense_tx=tx),
                    mesh, "data", sparse_opt=opt)
    assert sm.dense_opt_state is not None
    stepN = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt,
                                    dense_tx=tx)
    sd, sc, sl = batch_shardings(mesh, "data")
    for it in range(3):       # multi-step: adam moments must track
        dense, cat, label = synth_batch(cfg, b=32, seed=10 + it)
        m1, loss1 = step1(m1, jnp.asarray(dense), jnp.asarray(cat),
                          jnp.asarray(label))
        sm, lossN = stepN(sm, jax.device_put(dense, sd),
                          jax.device_put(cat, sc), jax.device_put(label, sl))
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves((m1.bottom, m1.top)),
                    jax.tree_util.tree_leaves((sm.bottom, sm.top))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sm.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)
