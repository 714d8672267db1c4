"""Sharded lazy-Adam / FTRL train steps vs the single-chip oracle.

Round-2 closure of the optimizer x placement asymmetry: the sharded model
train steps (gather exchange) now route SparseLazyAdam and SparseFTRL
through `_sharded_sparse_apply` -> `sharded_adam_apply`/`sharded_ftrl_apply`
(parallel/sharded.py), which share the single-chip `optim.*_dense_body`
math. Every test here asserts multi-step parity against the single-chip
step on the 8-device virtual CPU mesh — the same oracle discipline as the
reference's dense-matrix tests (`/root/reference/test/update.jl:20-61`).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.models import DLRMConfig, init_dlrm, make_train_step
from embeddingtables_tpu.ops.ensemble import StackedTables
from embeddingtables_tpu.optim import (SparseFTRL, SparseFTRLState,
                                       SparseLazyAdam, SparseAdamState,
                                       SparseOptState, SparseRowWiseAdaGrad,
                                       SparseSGD)
from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                               make_sharded_train_step,
                                               shard_dlrm, unshard_dlrm)
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.parallel.sharded import (ShardedStackedTables,
                                                  shard_row_accum,
                                                  unshard_row_state)


def tiny_cfg(**kw):
    kw.setdefault("vocab_sizes", (64, 96, 33))
    kw.setdefault("num_dense", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("bottom_mlp", (16, 8))
    kw.setdefault("top_mlp", (16, 1))
    kw.setdefault("compute_dtype", jnp.float32)
    return DLRMConfig(**kw)


def synth_batch(cfg, b, seed=0, bag=None, pad_idx=None):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    shape = (b,) if bag is None else (b, bag)
    cat = np.stack([rng.integers(0, v, shape).astype(np.int32)
                    for v in cfg.vocab_sizes])
    if pad_idx is not None and bag is not None:
        # Right-pad a random suffix of each bag with the sentinel
        # (guaranteeing >= 1 valid entry per bag).
        lens = rng.integers(1, bag + 1, size=(len(cfg.vocab_sizes), b))
        pos = np.arange(bag)[None, None, :]
        cat = np.where(pos < lens[:, :, None], cat, pad_idx)
    label = rng.integers(0, 2, b).astype(np.float32)
    return dense, cat, label


def make_opt(name):
    return {
        "adam": lambda: SparseLazyAdam(lr=0.05, b1=0.9, b2=0.99, eps=1e-8),
        "adam_reg": lambda: SparseLazyAdam(lr=0.05, weight_decay=0.01,
                                           clipnorm=1.0),
        "ftrl": lambda: SparseFTRL(lr=0.2, beta=1.0, l1=0.001, l2=0.01),
    }[name]()


def run_parity(cfg, opt_name, bag=None, pad_idx=None, steps=3):
    """Multi-step sharded-vs-single-chip parity for one optimizer."""
    mesh = default_mesh(("data",))
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=make_opt(opt_name))
    smodel = shard_dlrm(init_dlrm(jax.random.key(0), cfg,
                                  sparse_opt=make_opt(opt_name)),
                        mesh, "data", sparse_opt=make_opt(opt_name))

    step1 = make_train_step(cfg, sparse_opt=make_opt(opt_name),
                            dense_lr=0.1, jit=False)
    stepN = make_sharded_train_step(cfg, mesh, "data",
                                    sparse_opt=make_opt(opt_name),
                                    dense_lr=0.1, jit=False)
    sd, sc, sl = batch_shardings(mesh, "data")
    for i in range(steps):
        dense, cat, label = synth_batch(cfg, b=32, seed=10 + i, bag=bag,
                                        pad_idx=pad_idx)
        model, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                             jnp.asarray(label))
        smodel, lossN = stepN(smodel,
                              jax.device_put(dense, sd),
                              jax.device_put(cat, sc),
                              jax.device_put(label, sl))
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    got = unshard_dlrm(smodel)
    np.testing.assert_allclose(np.asarray(got.tables.data),
                               np.asarray(model.tables.data),
                               rtol=2e-4, atol=1e-6)
    return model, got


@pytest.mark.parametrize("bag", [None, 2])
def test_sharded_adam_matches_single_chip(bag):
    cfg = tiny_cfg(bag=bag)
    m1, mN = run_parity(cfg, "adam", bag=bag)
    assert isinstance(mN.emb_state, SparseAdamState)
    np.testing.assert_allclose(np.asarray(mN.emb_state.m),
                               np.asarray(m1.emb_state.m),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mN.emb_state.v),
                               np.asarray(m1.emb_state.v),
                               rtol=2e-4, atol=1e-9)
    assert int(mN.emb_state.count) == int(m1.emb_state.count) == 3


def test_sharded_adam_regularized():
    cfg = tiny_cfg()
    run_parity(cfg, "adam_reg")


@pytest.mark.parametrize("bag", [None, 2])
def test_sharded_ftrl_matches_single_chip(bag):
    cfg = tiny_cfg(bag=bag)
    m1, mN = run_parity(cfg, "ftrl", bag=bag)
    assert isinstance(mN.emb_state, SparseFTRLState)
    np.testing.assert_allclose(np.asarray(mN.emb_state.z),
                               np.asarray(m1.emb_state.z),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mN.emb_state.n),
                               np.asarray(m1.emb_state.n),
                               rtol=2e-4, atol=1e-9)
    # l1 > 0 must have produced SOME exact zeros in touched rows
    # (FTRL's trained-sparsity property surviving the mesh).
    assert np.any(np.asarray(mN.tables.data) == 0.0)


@pytest.mark.parametrize("opt_name", ["adam", "ftrl"])
def test_sharded_opt_padded_mean_bags(opt_name):
    """Variable-length bags (pad_idx) + mean combiner: the per-occurrence
    scale must ride the Adam/FTRL exchange exactly like SGD's."""
    cfg = tiny_cfg(bag=3, combiner="mean", pad_idx=-1)
    run_parity(cfg, opt_name, bag=3, pad_idx=-1)


def test_sharded_dcn_ftrl_matches_single_chip():
    from embeddingtables_tpu.models.dcn import (DCNConfig, init_dcn,
                                                make_train_step as dcn_step)
    from embeddingtables_tpu.parallel.dcn import (make_sharded_dcn_train_step,
                                                  shard_dcn, unshard_dcn)
    cfg = DCNConfig(vocab_sizes=(48, 80), num_dense=4, dim=8, num_cross=2,
                    cross_rank=None, deep_mlp=(16,),
                    compute_dtype=jnp.float32)
    mesh = default_mesh(("data",))
    opt = lambda: SparseFTRL(lr=0.2, l1=0.001, l2=0.01)  # noqa: E731
    model = init_dcn(jax.random.key(0), cfg, sparse_opt=opt())
    smodel = shard_dcn(init_dcn(jax.random.key(0), cfg, sparse_opt=opt()),
                       mesh, "data", sparse_opt=opt())
    step1 = dcn_step(cfg, sparse_opt=opt(), dense_lr=0.1, jit=False)
    stepN = make_sharded_dcn_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                        dense_lr=0.1, jit=False)
    sd, sc, sl = batch_shardings(mesh, "data")
    rng = np.random.default_rng(3)
    for i in range(2):
        dense = rng.normal(size=(16, 4)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                        for v in cfg.vocab_sizes])
        label = rng.integers(0, 2, 16).astype(np.float32)
        model, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                             jnp.asarray(label))
        smodel, lossN = stepN(smodel, jax.device_put(dense, sd),
                              jax.device_put(cat, sc),
                              jax.device_put(label, sl))
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    got = unshard_dcn(smodel)
    assert isinstance(got.emb_state, SparseFTRLState)
    np.testing.assert_allclose(np.asarray(got.tables.data),
                               np.asarray(model.tables.data),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.emb_state.z),
                               np.asarray(model.emb_state.z),
                               rtol=2e-4, atol=1e-6)


def test_sharded_deepfm_adam_matches_single_chip():
    from embeddingtables_tpu.models.deepfm import (DeepFMConfig, init_deepfm,
                                                   make_train_step as fm_step)
    from embeddingtables_tpu.parallel.deepfm import (
        make_sharded_deepfm_train_step, shard_deepfm, unshard_deepfm)
    cfg = DeepFMConfig(vocab_sizes=(48, 80), num_dense=4, dim=8,
                       deep_mlp=(16,), compute_dtype=jnp.float32,
                       fold_fm_w=False)
    mesh = default_mesh(("data",))
    opt = lambda: SparseLazyAdam(lr=0.05)  # noqa: E731
    model = init_deepfm(jax.random.key(0), cfg, sparse_opt=opt())
    smodel = shard_deepfm(init_deepfm(jax.random.key(0), cfg,
                                      sparse_opt=opt()),
                          mesh, "data", sparse_opt=opt())
    step1 = fm_step(cfg, sparse_opt=opt(), dense_lr=0.1, jit=False)
    stepN = make_sharded_deepfm_train_step(cfg, mesh, "data",
                                           sparse_opt=opt(), dense_lr=0.1,
                                           jit=False)
    sd, sc, sl = batch_shardings(mesh, "data")
    rng = np.random.default_rng(7)
    for i in range(2):
        dense = rng.normal(size=(16, 4)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                        for v in cfg.vocab_sizes])
        label = rng.integers(0, 2, 16).astype(np.float32)
        model, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                             jnp.asarray(label))
        smodel, lossN = stepN(smodel, jax.device_put(dense, sd),
                              jax.device_put(cat, sc),
                              jax.device_put(label, sl))
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    got = unshard_deepfm(smodel)
    assert isinstance(got.emb_state, SparseAdamState)
    assert isinstance(got.fm_state, SparseAdamState)
    # BOTH stacks advanced their Adam moments on the mesh.
    np.testing.assert_allclose(np.asarray(got.emb_state.m),
                               np.asarray(model.emb_state.m),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.fm_state.m),
                               np.asarray(model.fm_state.m),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.fm_w.data),
                               np.asarray(model.fm_w.data),
                               rtol=2e-4, atol=1e-6)


def test_state_roundtrip_through_mesh():
    """shard_row_accum -> unshard_row_state is the identity for every
    optimizer's state layout."""
    mesh = default_mesh(("data",))
    vocab, dim = 53, 8  # deliberately not divisible by 8
    data = jax.random.normal(jax.random.key(1), (vocab, dim))
    st = ShardedStackedTables.shard(
        mesh, "data", StackedTables(data=data, offsets=(0,), dim=dim))
    # Adam
    adam = SparseLazyAdam()
    state = SparseAdamState(
        m=jax.random.normal(jax.random.key(2), (vocab, dim)),
        v=jax.random.uniform(jax.random.key(3), (vocab, dim)),
        count=jnp.asarray(7, jnp.int32))
    sharded = shard_row_accum(mesh, "data", st, state, adam)
    back = unshard_row_state(st, sharded)
    assert isinstance(back, SparseAdamState)
    np.testing.assert_allclose(np.asarray(back.m), np.asarray(state.m),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.v), np.asarray(state.v),
                               rtol=1e-6)
    assert int(back.count) == 7
    # FTRL
    ftrl = SparseFTRL(lr=0.1, l1=0.01)
    fstate = ftrl.init(data)
    sharded = shard_row_accum(mesh, "data", st, fstate, ftrl)
    back = unshard_row_state(st, sharded)
    assert isinstance(back, SparseFTRLState)
    np.testing.assert_allclose(np.asarray(back.z), np.asarray(fstate.z),
                               rtol=1e-6)
    # AdaGrad
    ada = SparseRowWiseAdaGrad(lr=0.1)
    astate = SparseOptState(accum=jax.random.uniform(jax.random.key(4),
                                                     (vocab,)))
    sharded = shard_row_accum(mesh, "data", st, astate, ada)
    back = unshard_row_state(st, sharded)
    assert isinstance(back, SparseOptState)
    np.testing.assert_allclose(np.asarray(back.accum),
                               np.asarray(astate.accum), rtol=1e-6)
    # SGD placeholder
    sgd = SparseSGD(0.1)
    sharded = shard_row_accum(mesh, "data", st, SparseOptState(
        accum=jnp.zeros((0,), jnp.float32)), sgd)
    back = unshard_row_state(st, sharded)
    assert back.accum.shape == (0,)


def test_evict_rows_sharded_resets_adam_and_ftrl_state():
    from embeddingtables_tpu.utils.rowstats import evict_rows_sharded
    mesh = default_mesh(("data",))
    vocab, dim = 40, 4
    data = jnp.ones((vocab, dim))
    st = ShardedStackedTables.shard(
        mesh, "data", StackedTables(data=data, offsets=(0,), dim=dim))
    adam_state = (jnp.ones_like(st.data), jnp.ones_like(st.data),
                  jnp.asarray(5, jnp.int32))
    cold = np.asarray([3, 17, 21])
    new_st, new_state = evict_rows_sharded(st, adam_state, cold)
    n = st.n_shards
    m, v, count = new_state
    for r in cold:
        assert np.all(np.asarray(new_st.data[r % n, r // n]) == 0.0)
        assert np.all(np.asarray(m[r % n, r // n]) == 0.0)
        assert np.all(np.asarray(v[r % n, r // n]) == 0.0)
    assert int(count) == 5                        # scalar passes through
    # Untouched rows keep their state.
    assert np.all(np.asarray(m[0, 0]) == 1.0)
    # AdaGrad array layout still works (regression for the old code path).
    acc = jnp.ones(st.data.shape[:2])
    _, new_acc = evict_rows_sharded(st, acc, cold)
    for r in cold:
        assert float(new_acc[r % n, r // n]) == 0.0


def test_every_placement_accepts_stochastic_rounding():
    """Round 3 flipped the round-2 contract: every placement threads SR
    keys now — the mesh steps, and the column-sharded update (per-device
    column noise; missing key still raises loudly)."""
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    step = make_sharded_train_step(
        cfg, mesh, "data",
        sparse_opt=SparseSGD(0.1, stochastic_rounding=True))
    assert callable(step)

    from embeddingtables_tpu.parallel.colshard import (
        ColShardedStackedTables, col_sharded_update)
    import embeddingtables_tpu as et
    import numpy as np
    data = jnp.ones((64, 16), jnp.bfloat16)
    ct = ColShardedStackedTables.shard(mesh, "data", data)
    upd = et.SparseEmbeddingUpdate(
        delta=jnp.ones((8, 16), jnp.float32) * 0.02,
        indices=jnp.arange(8, dtype=jnp.int32))
    sr = SparseSGD(0.5, stochastic_rounding=True)
    with pytest.raises(ValueError, match="key"):
        col_sharded_update(mesh, ct, upd, sr, batch_sharded=False)
    new_ct = col_sharded_update(mesh, ct, upd, sr, batch_sharded=False,
                                key=jax.random.key(0))
    new = np.asarray(new_ct.unshard().astype(jnp.float32))
    old = np.asarray(data.astype(jnp.float32))
    assert not np.array_equal(new[:8], old[:8])      # touched rows moved
    np.testing.assert_array_equal(new[8:], old[8:])  # untouched exact


@pytest.mark.parametrize("opt_name,bag,pad", [("adam", None, None),
                                              ("ftrl", None, None),
                                              ("adam", 3, -1),
                                              ("ftrl", 3, -1)])
def test_a2a_adam_ftrl_matches_single_chip(opt_name, bag, pad):
    """The butterfly exchange runs Adam/FTRL too: at a no-drop capacity
    factor it must match the single-chip step exactly (same dense-body
    math after routing)."""
    cfg = tiny_cfg(bag=bag, combiner="mean" if bag else "sum", pad_idx=pad)
    mesh = default_mesh(("data",))
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=make_opt(opt_name))
    smodel = shard_dlrm(init_dlrm(jax.random.key(0), cfg,
                                  sparse_opt=make_opt(opt_name)),
                        mesh, "data", sparse_opt=make_opt(opt_name))
    step1 = make_train_step(cfg, sparse_opt=make_opt(opt_name),
                            dense_lr=0.1, jit=False)
    stepN = make_sharded_train_step(cfg, mesh, "data",
                                    sparse_opt=make_opt(opt_name),
                                    dense_lr=0.1, jit=False,
                                    exchange="a2a", capacity_factor=8.0,
                                    with_overflow=True)
    sd, sc, sl = batch_shardings(mesh, "data")
    for i in range(2):
        dense, cat, label = synth_batch(cfg, b=32, seed=20 + i, bag=bag,
                                        pad_idx=pad)
        model, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                             jnp.asarray(label))
        smodel, (lossN, ovf) = stepN(smodel,
                                     jax.device_put(dense, sd),
                                     jax.device_put(cat, sc),
                                     jax.device_put(label, sl))
        assert int(ovf) == 0
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    got = unshard_dlrm(smodel)
    np.testing.assert_allclose(np.asarray(got.tables.data),
                               np.asarray(model.tables.data),
                               rtol=2e-4, atol=1e-6)
    if opt_name == "adam":
        np.testing.assert_allclose(np.asarray(got.emb_state.m),
                                   np.asarray(model.emb_state.m),
                                   rtol=2e-4, atol=1e-7)
        assert int(got.emb_state.count) == 2
    else:
        np.testing.assert_allclose(np.asarray(got.emb_state.z),
                                   np.asarray(model.emb_state.z),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("opt_name,bag", [("adam", None), ("ftrl", 2)])
def test_sharded_microbatch_matches_monolithic(opt_name, bag):
    """Sharded gradient accumulation (gather exchange): scanning the
    lookup + dense fwd/bwd over k slices must match the monolithic sharded
    step (grouping-independent math: pointwise BCE, mean-of-means loss,
    1/B per-example delta scale)."""
    cfg = tiny_cfg(bag=bag)
    mesh = default_mesh(("data",))

    def build(microbatch):
        return shard_dlrm(init_dlrm(jax.random.key(0), cfg,
                                    sparse_opt=make_opt(opt_name)),
                          mesh, "data", sparse_opt=make_opt(opt_name)), \
            make_sharded_train_step(cfg, mesh, "data",
                                    sparse_opt=make_opt(opt_name),
                                    dense_lr=0.1, jit=False,
                                    microbatch=microbatch)

    m_mono, step_mono = build(None)
    m_micro, step_micro = build(4)
    sd, sc, sl = batch_shardings(mesh, "data")
    for i in range(2):
        dense, cat, label = synth_batch(cfg, b=32, seed=40 + i, bag=bag)
        args = (jax.device_put(dense, sd), jax.device_put(cat, sc),
                jax.device_put(label, sl))
        m_mono, loss_a = step_mono(m_mono, *args)
        m_micro, loss_b = step_micro(m_micro, *args)
        np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_micro.tables.unshard()),
                               np.asarray(m_mono.tables.unshard()),
                               rtol=2e-4, atol=1e-6)
    for (w1, b1), (wN, bN) in zip(m_mono.bottom + m_mono.top,
                                  m_micro.bottom + m_micro.top):
        np.testing.assert_allclose(np.asarray(wN), np.asarray(w1),
                                   rtol=2e-4, atol=1e-6)


def test_sharded_dcn_microbatch_matches_monolithic():
    from embeddingtables_tpu.models.dcn import DCNConfig, init_dcn
    from embeddingtables_tpu.parallel.dcn import (make_sharded_dcn_train_step,
                                                  shard_dcn)
    cfg = DCNConfig(vocab_sizes=(48, 80), num_dense=4, dim=8, num_cross=2,
                    cross_rank=None, deep_mlp=(16,),
                    compute_dtype=jnp.float32)
    mesh = default_mesh(("data",))
    opt = lambda: SparseRowWiseAdaGrad(lr=0.2)  # noqa: E731

    def build(microbatch):
        return shard_dcn(init_dcn(jax.random.key(0), cfg, sparse_opt=opt()),
                         mesh, "data", sparse_opt=opt()), \
            make_sharded_dcn_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                        dense_lr=0.1, jit=False,
                                        microbatch=microbatch)

    m_mono, step_mono = build(None)
    m_micro, step_micro = build(2)
    sd, sc, sl = batch_shardings(mesh, "data")
    rng = np.random.default_rng(11)
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


def test_sharded_microbatch_rejects_a2a():
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    with pytest.raises(NotImplementedError, match="gather"):
        make_sharded_train_step(cfg, mesh, "data", exchange="a2a",
                                microbatch=2)


@pytest.mark.parametrize("opt_name", ["adam", "ftrl"])
def test_sharded_opt_2d_mesh_matches_single_chip(opt_name):
    """Adam/FTRL on the 2-D (data x model) mesh: rows owned over the
    flattened axes, batch sharded over data only — the state exchange must
    match the single-chip step exactly like the 1-D case."""
    mesh = default_mesh(("data", "model"), shape=(4, 2))
    cfg = tiny_cfg()
    axis = ("data", "model")
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=make_opt(opt_name))
    smodel = shard_dlrm(init_dlrm(jax.random.key(0), cfg,
                                  sparse_opt=make_opt(opt_name)),
                        mesh, axis, sparse_opt=make_opt(opt_name))
    step1 = make_train_step(cfg, sparse_opt=make_opt(opt_name),
                            dense_lr=0.1, jit=False)
    stepN = make_sharded_train_step(cfg, mesh, axis,
                                    sparse_opt=make_opt(opt_name),
                                    dense_lr=0.1, jit=False)
    sd, sc, sl = batch_shardings(mesh, axis)
    for i in range(2):
        dense, cat, label = synth_batch(cfg, b=32, seed=60 + i)
        model, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                             jnp.asarray(label))
        smodel, lossN = stepN(smodel, jax.device_put(dense, sd),
                              jax.device_put(cat, sc),
                              jax.device_put(label, sl))
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    got = unshard_dlrm(smodel)
    np.testing.assert_allclose(np.asarray(got.tables.data),
                               np.asarray(model.tables.data),
                               rtol=2e-4, atol=1e-6)


def test_sharded_two_tower_adam_matches_single_chip():
    """Two-tower rides the same state plumbing: shard_row_accum places the
    Adam moments for both tables, the contrastive step advances them, and
    unshard_two_tower round-trips the SparseAdamState."""
    from embeddingtables_tpu.models.two_tower import (TwoTowerConfig,
                                                      init_two_tower,
                                                      make_train_step as
                                                      tt_step)
    from embeddingtables_tpu.parallel.two_tower import (
        make_sharded_tt_train_step, shard_two_tower, tt_batch_shardings,
        unshard_two_tower)
    cfg = TwoTowerConfig(query_vocab_sizes=(48, 64), item_vocab=96,
                         num_dense=3, dim=8, embed_dim=8,
                         query_mlp=(16, 8), item_mlp=(16, 8))
    mesh = default_mesh(("data",))
    opt = lambda: SparseLazyAdam(lr=0.05)  # noqa: E731
    model = init_two_tower(jax.random.key(0), cfg, sparse_opt=opt())
    smodel = shard_two_tower(init_two_tower(jax.random.key(0), cfg,
                                            sparse_opt=opt()),
                             mesh, "data", sparse_opt=opt())
    step1 = tt_step(cfg, sparse_opt=opt(), dense_lr=0.1, jit=False)
    stepN = make_sharded_tt_train_step(cfg, mesh, "data", sparse_opt=opt(),
                                       dense_lr=0.1, jit=False)
    sd, sq, si = tt_batch_shardings(mesh)
    rng = np.random.default_rng(23)
    for i in range(2):
        dense = rng.normal(size=(16, 3)).astype(np.float32)
        q_cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                          for v in cfg.query_vocab_sizes])
        items = rng.permutation(cfg.item_vocab)[:16].astype(np.int32)
        model, (loss1, _) = step1(model, jnp.asarray(dense),
                                  jnp.asarray(q_cat), jnp.asarray(items))
        smodel, (lossN, _) = stepN(smodel, jax.device_put(dense, sd),
                                   jax.device_put(q_cat, sq),
                                   jax.device_put(items, si))
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    got = unshard_two_tower(smodel)
    assert isinstance(got.q_state, SparseAdamState)
    assert isinstance(got.i_state, SparseAdamState)
    np.testing.assert_allclose(np.asarray(got.query_tables.data),
                               np.asarray(model.query_tables.data),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.i_state.m),
                               np.asarray(model.i_state.m),
                               rtol=2e-4, atol=1e-7)
    assert int(got.q_state.count) == 2


def test_shard_without_opt_preserves_trained_accum():
    """Review regression: placing an AdaGrad-trained model WITHOUT
    re-passing sparse_opt must keep the trained accumulator (dispatch on
    the state's contents, not the opt argument, whose default is SGD)."""
    mesh = default_mesh(("data",))
    vocab, dim = 40, 8
    data = jax.random.normal(jax.random.key(1), (vocab, dim))
    st = ShardedStackedTables.shard(
        mesh, "data", StackedTables(data=data, offsets=(0,), dim=dim))
    trained = SparseOptState(
        accum=jax.random.uniform(jax.random.key(2), (vocab,)) + 0.5)
    sharded = shard_row_accum(mesh, "data", st, trained, SparseSGD(0.01))
    back = unshard_row_state(st, sharded)
    np.testing.assert_allclose(np.asarray(back.accum),
                               np.asarray(trained.accum), rtol=1e-6)
    # Fresh accumulator at initial_accum when switching SGD -> AdaGrad.
    empty = SparseOptState(accum=jnp.zeros((0,), jnp.float32))
    sharded = shard_row_accum(mesh, "data", st, empty,
                              SparseRowWiseAdaGrad(lr=0.1,
                                                   initial_accum=0.25))
    assert sharded.shape[1] > 0
    assert np.allclose(np.asarray(sharded), 0.25)


def test_planned_resume_rejects_state_optimizer_mismatch():
    """Review regression: resuming an AdaGrad-trained state with a
    different optimizer family raises loudly instead of AttributeError."""
    from embeddingtables_tpu.ops.ensemble import StackedTables as _ST
    from embeddingtables_tpu.parallel.planner import (place_stacked_on_plan,
                                                      plan_sharding)
    mesh = default_mesh(("data",))
    vocabs = (64, 4096)
    plan = plan_sharding(vocabs, 8, mesh, replicate_max_bytes=8 * 4 * 80)
    data = jax.random.normal(jax.random.key(0), (sum(vocabs), 8))
    stacked = _ST(data=data, offsets=(0, 64, 64 + 4096), dim=8)
    trained = SparseOptState(accum=jnp.ones((sum(vocabs),)))
    with pytest.raises(NotImplementedError, match="does not match"):
        place_stacked_on_plan(plan, mesh, stacked, trained,
                              SparseLazyAdam(lr=0.05))
