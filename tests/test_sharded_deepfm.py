"""Sharded-vs-single-chip DeepFM parity on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.models.deepfm import (DeepFMConfig, deepfm_forward,
                                               init_deepfm, make_train_step)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.parallel.deepfm import (batch_shardings,
                                                 make_sharded_deepfm_eval_step,
                                                 make_sharded_deepfm_train_step,
                                                 shard_deepfm, unshard_deepfm)
from embeddingtables_tpu.parallel.mesh import default_mesh


def tiny_cfg(**kw):
    # Legacy two-stack layout: this module asserts on the fm_w stack.
    # Folded-layout sharded parity lives in tests/test_deepfm_fold.py.
    kw.setdefault("vocab_sizes", (64, 96, 33))
    kw.setdefault("num_dense", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("deep_mlp", (16, 8))
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("fold_fm_w", False)
    return DeepFMConfig(**kw)


def synth_batch(cfg, b, seed=0, bag=None):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    shape = (b,) if bag is None else (b, bag)
    cat = np.stack([rng.integers(0, v, shape).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, b).astype(np.float32)
    return dense, cat, label


@pytest.mark.parametrize("opt_name", ["sgd", "adagrad"])
def test_sharded_deepfm_step_matches_single_chip(opt_name):
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    make_opt = (lambda: SparseSGD(0.3)) if opt_name == "sgd" else \
        (lambda: SparseRowWiseAdaGrad(lr=0.3, eps=1e-6))

    model = init_deepfm(jax.random.key(0), cfg, sparse_opt=make_opt())
    dense, cat, label = synth_batch(cfg, b=32, seed=1)

    step1 = make_train_step(cfg, sparse_opt=make_opt(), dense_lr=0.3,
                            jit=False)
    m1, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                      jnp.asarray(label))

    smodel = shard_deepfm(init_deepfm(jax.random.key(0), cfg,
                                      sparse_opt=make_opt()),
                          mesh, "data", sparse_opt=make_opt())
    sd, sc, sl = batch_shardings(mesh, "data")
    stepN = make_sharded_deepfm_train_step(cfg, mesh, "data",
                                           sparse_opt=make_opt(),
                                           dense_lr=0.3)
    mN, lossN = stepN(smodel,
                      jax.device_put(dense, sd),
                      jax.device_put(cat, sc),
                      jax.device_put(label, sl))

    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mN.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mN.fm_w.unshard()),
                               np.asarray(m1.fm_w.data),
                               rtol=2e-4, atol=1e-7)
    flat1 = jax.tree_util.tree_leaves((m1.deep, m1.head, m1.dense_w, m1.bias))
    flatN = jax.tree_util.tree_leaves((mN.deep, mN.head, mN.dense_w, mN.bias))
    for a, b in zip(flat1, flatN):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
    if opt_name == "adagrad":
        for acc_sh, acc_1 in ((mN.emb_accum, m1.emb_state.accum),
                              (mN.fm_accum, m1.fm_state.accum)):
            acc = np.asarray(acc_sh)
            n, rows = acc.shape
            acc_full = acc.T.reshape(n * rows)[:sum(cfg.vocab_sizes)]
            np.testing.assert_allclose(acc_full, np.asarray(acc_1),
                                       rtol=2e-4, atol=1e-7)


def test_sharded_deepfm_eval_matches_single_chip():
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    model = init_deepfm(jax.random.key(5), cfg)
    dense, cat, _ = synth_batch(cfg, b=16, seed=9)
    expect = deepfm_forward(model, jnp.asarray(dense), jnp.asarray(cat))

    smodel = shard_deepfm(model, mesh, "data")
    sd, sc, _ = batch_shardings(mesh, "data")
    stepE = make_sharded_deepfm_eval_step(cfg, mesh, "data")
    got = stepE(smodel, jax.device_put(dense, sd), jax.device_put(cat, sc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=1e-6)


def test_sharded_deepfm_bag_mean():
    cfg = tiny_cfg(bag=2, combiner="mean")
    mesh = default_mesh(("data",))
    model = init_deepfm(jax.random.key(7), cfg, sparse_opt=SparseSGD(0.2))
    dense, cat, label = synth_batch(cfg, b=16, seed=3, bag=2)

    step1 = make_train_step(cfg, sparse_opt=SparseSGD(0.2), dense_lr=0.2,
                            jit=False)
    m1, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                      jnp.asarray(label))

    smodel = shard_deepfm(init_deepfm(jax.random.key(7), cfg,
                                      sparse_opt=SparseSGD(0.2)),
                          mesh, "data", sparse_opt=SparseSGD(0.2))
    sd, sc, sl = batch_shardings(mesh, "data")
    stepN = make_sharded_deepfm_train_step(cfg, mesh, "data",
                                           sparse_opt=SparseSGD(0.2),
                                           dense_lr=0.2)
    mN, lossN = stepN(smodel, jax.device_put(dense, sd),
                      jax.device_put(cat, sc), jax.device_put(label, sl))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mN.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mN.fm_w.unshard()),
                               np.asarray(m1.fm_w.data),
                               rtol=2e-4, atol=1e-7)


def test_train_deepfm_loop_on_mesh_learns():
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_deepfm
    cfg = tiny_cfg(vocab_sizes=(80, 80, 80))
    mesh = default_mesh(("data",))
    gen = SyntheticCriteo(vocab_sizes=cfg.vocab_sizes, num_dense=4,
                          batch_size=256, seed=11)
    eval_batches = list(gen.batches(2))
    res = train_deepfm(cfg, gen.batches(), 30,
                       sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                       dense_lr=0.05, eval_batches=eval_batches,
                       eval_every=30, mesh=mesh, log_every=10,
                       evict_every=15, evict_threshold=1e-9, verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.aucs[-1][1] > 0.6


def test_unshard_deepfm_roundtrip():
    from embeddingtables_tpu.models.deepfm import make_eval_step
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    opt = SparseRowWiseAdaGrad(lr=0.3, eps=1e-6)
    smodel = shard_deepfm(init_deepfm(jax.random.key(0), cfg,
                                      sparse_opt=opt),
                          mesh, "data", sparse_opt=opt)
    dense, cat, label = synth_batch(cfg, b=32, seed=4)
    sd, sc, sl = batch_shardings(mesh, "data")
    stepN = make_sharded_deepfm_train_step(cfg, mesh, "data",
                                           sparse_opt=opt, dense_lr=0.3)
    smodel, _ = stepN(smodel, jax.device_put(dense, sd),
                      jax.device_put(cat, sc), jax.device_put(label, sl))
    back = unshard_deepfm(smodel)
    want = make_sharded_deepfm_eval_step(cfg, mesh)(
        smodel, jax.device_put(dense, sd), jax.device_put(cat, sc))
    got = make_eval_step(cfg)(back, jnp.asarray(dense), jnp.asarray(cat))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)


def test_sharded_deepfm_optax_towers_match_single_chip():
    import optax
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    tx = optax.adam(1e-2)
    opt = SparseSGD(0.2)
    from embeddingtables_tpu.models.deepfm import init_deepfm, make_train_step
    m1 = init_deepfm(jax.random.key(0), cfg, sparse_opt=opt, dense_tx=tx)
    step1 = make_train_step(cfg, sparse_opt=opt, dense_tx=tx, jit=False)
    sm = shard_deepfm(init_deepfm(jax.random.key(0), cfg, sparse_opt=opt,
                                  dense_tx=tx),
                      mesh, "data", sparse_opt=opt)
    assert sm.dense_opt_state is not None
    stepN = make_sharded_deepfm_train_step(cfg, mesh, "data",
                                           sparse_opt=opt, dense_tx=tx)
    sd, sc, sl = batch_shardings(mesh, "data")
    for it in range(3):
        dense, cat, label = synth_batch(cfg, b=32, seed=20 + it)
        m1, loss1 = step1(m1, jnp.asarray(dense), jnp.asarray(cat),
                          jnp.asarray(label))
        sm, lossN = stepN(sm, jax.device_put(dense, sd),
                          jax.device_put(cat, sc), jax.device_put(label, sl))
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    back = unshard_deepfm(sm)
    for a, b in zip(jax.tree_util.tree_leaves((m1.deep, m1.head, m1.dense_w,
                                               m1.bias)),
                    jax.tree_util.tree_leaves((back.deep, back.head,
                                               back.dense_w, back.bias))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_sharded_deepfm_microbatch_matches_monolithic():
    """Sharded gradient accumulation: scanning the two lookup exchanges +
    dense fwd/bwd over k slices matches the monolithic sharded step."""
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    cfg = DeepFMConfig(vocab_sizes=(48, 80), num_dense=4, dim=8,
                       deep_mlp=(16,), compute_dtype=jnp.float32,
                       fold_fm_w=False)
    mesh = default_mesh(("data",))
    opt = lambda: SparseRowWiseAdaGrad(lr=0.2)  # noqa: E731

    def build(microbatch):
        return (shard_deepfm(init_deepfm(jax.random.key(0), cfg,
                                         sparse_opt=opt()),
                             mesh, "data", sparse_opt=opt()),
                make_sharded_deepfm_train_step(cfg, mesh, "data",
                                               sparse_opt=opt(),
                                               dense_lr=0.1, jit=False,
                                               microbatch=microbatch))

    m_mono, step_mono = build(None)
    m_micro, step_micro = build(2)
    sd, sc, sl = batch_shardings(mesh, "data")
    rng = np.random.default_rng(37)
    dense = rng.normal(size=(16, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, 16).astype(np.float32)
    args = (jax.device_put(dense, sd), jax.device_put(cat, sc),
            jax.device_put(label, sl))
    m_mono, loss_a = step_mono(m_mono, *args)
    m_micro, loss_b = step_micro(m_micro, *args)
    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_micro.tables.unshard()),
                               np.asarray(m_mono.tables.unshard()),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_micro.fm_w.unshard()),
                               np.asarray(m_mono.fm_w.unshard()),
                               rtol=2e-4, atol=1e-6)
