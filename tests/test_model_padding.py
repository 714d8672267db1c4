"""Variable-length bags END TO END in the model families.

cfg.pad_idx threads the ops-level pad contract (tests/test_padding.py)
through DLRM / DCN / DeepFM: forward wiring vs a lookup_oracle-composed
reference, no-gradient-for-pads, sharded-vs-single-chip step parity on
both exchanges, and a learning loop on variable-length synthetic data.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.models.dlrm import (DLRMConfig, dlrm_forward,
                                             forward_from_embeddings,
                                             init_dlrm, make_train_step)
from embeddingtables_tpu.ops.lookup import lookup_oracle
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                               make_sharded_train_step,
                                               shard_dlrm)
from embeddingtables_tpu.parallel.mesh import default_mesh

PAD = -1


def tiny_cfg(**kw):
    kw.setdefault("vocab_sizes", (64, 96, 33))
    kw.setdefault("num_dense", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("bottom_mlp", (16, 8))
    kw.setdefault("top_mlp", (16, 1))
    kw.setdefault("bag", 4)
    kw.setdefault("pad_idx", PAD)
    kw.setdefault("compute_dtype", jnp.float32)
    return DLRMConfig(**kw)


def padded_batch(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, (b, cfg.bag)).astype(np.int32)
                    for v in cfg.vocab_sizes])
    mask = rng.random(cat.shape) < 0.35
    mask[..., 0] = False  # keep >= 1 valid entry per bag
    cat = np.where(mask, PAD, cat)
    label = rng.integers(0, 2, b).astype(np.float32)
    return dense, cat, label


@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_dlrm_forward_matches_oracle_composition(combiner):
    cfg = tiny_cfg(combiner=combiner)
    model = init_dlrm(jax.random.key(0), cfg)
    dense, cat, _ = padded_batch(cfg, b=16, seed=1)
    got = dlrm_forward(model, jnp.asarray(dense), jnp.asarray(cat))
    emb = jnp.stack([
        lookup_oracle(model.tables.table(t).data, jnp.asarray(cat[t]),
                      combiner, None, pad_idx=PAD)
        for t in range(cfg.num_tables)])
    exp = forward_from_embeddings(model.bottom, model.top, cfg,
                                  jnp.asarray(dense), emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5)


def test_pad_only_rows_get_no_gradient():
    cfg = tiny_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.5)
    model = init_dlrm(jax.random.key(1), cfg, sparse_opt=opt)
    rng = np.random.default_rng(3)
    b = 16
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    # Valid ids stay < 10 per table; everything else appears ONLY as pads.
    cat = np.stack([rng.integers(0, 10, (b, cfg.bag)).astype(np.int32)
                    for _ in cfg.vocab_sizes])
    cat = np.where(rng.random(cat.shape) < 0.4, PAD, cat)
    label = rng.integers(0, 2, b).astype(np.float32)
    step = make_train_step(cfg, sparse_opt=opt, jit=False)
    new_model, _ = step(model, jnp.asarray(dense), jnp.asarray(cat),
                        jnp.asarray(label))
    for t in range(cfg.num_tables):
        lo = model.tables.offsets[t]
        np.testing.assert_array_equal(
            np.asarray(new_model.tables.data)[lo + 10: model.tables.offsets[t + 1]],
            np.asarray(model.tables.data)[lo + 10: model.tables.offsets[t + 1]])
    accum = np.asarray(new_model.emb_state.accum)
    for t in range(cfg.num_tables):
        lo = model.tables.offsets[t]
        assert np.all(accum[lo + 10: model.tables.offsets[t + 1]] == 0.0)


@pytest.mark.parametrize("combiner,opt_name,exchange",
                         [("sum", "sgd", "gather"),
                          ("mean", "adagrad", "gather"),
                          ("mean", "sgd", "a2a"),
                          ("sum", "adagrad", "a2a")])
def test_sharded_padded_step_matches_single_chip(combiner, opt_name,
                                                 exchange):
    cfg = tiny_cfg(combiner=combiner)
    mesh = default_mesh(("data",))
    make_opt = (lambda: SparseSGD(0.3)) if opt_name == "sgd" else \
        (lambda: SparseRowWiseAdaGrad(lr=0.3, eps=1e-6))
    dense, cat, label = padded_batch(cfg, b=32, seed=7)

    m1 = init_dlrm(jax.random.key(2), cfg, sparse_opt=make_opt())
    step1 = make_train_step(cfg, sparse_opt=make_opt(), dense_lr=0.3,
                            jit=False)
    m1, loss1 = step1(m1, jnp.asarray(dense), jnp.asarray(cat),
                      jnp.asarray(label))

    sm = shard_dlrm(init_dlrm(jax.random.key(2), cfg, sparse_opt=make_opt()),
                    mesh, "data", sparse_opt=make_opt())
    stepN = make_sharded_train_step(cfg, mesh, "data",
                                    sparse_opt=make_opt(), dense_lr=0.3,
                                    exchange=exchange, capacity_factor=8.0)
    sd, sc, sl = batch_shardings(mesh, "data")
    sm, lossN = stepN(sm, jax.device_put(dense, sd),
                      jax.device_put(cat, sc), jax.device_put(label, sl))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sm.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)


def test_dcn_and_deepfm_padded_sharded_parity():
    from embeddingtables_tpu.models.dcn import (DCNConfig, init_dcn,
                                                make_train_step as mk_dcn)
    from embeddingtables_tpu.models.deepfm import (DeepFMConfig, init_deepfm,
                                                   make_train_step as mk_fm)
    from embeddingtables_tpu.parallel.dcn import (make_sharded_dcn_train_step,
                                                  shard_dcn)
    from embeddingtables_tpu.parallel.deepfm import (
        make_sharded_deepfm_train_step, shard_deepfm)
    mesh = default_mesh(("data",))
    rng = np.random.default_rng(11)
    vocab = (64, 96, 33)
    b, bag = 32, 3
    dense = rng.normal(size=(b, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, (b, bag)).astype(np.int32)
                    for v in vocab])
    cat = np.where(rng.random(cat.shape) < 0.3, PAD, cat)
    label = rng.integers(0, 2, b).astype(np.float32)
    sd, sc, sl = batch_shardings(mesh, "data")

    dcn_cfg = DCNConfig(vocab_sizes=vocab, num_dense=4, dim=8, num_cross=2,
                        cross_rank=4, deep_mlp=(16, 8), bag=bag,
                        combiner="mean", pad_idx=PAD,
                        compute_dtype=jnp.float32)
    m1 = init_dcn(jax.random.key(3), dcn_cfg, sparse_opt=SparseSGD(0.2))
    m1, l1 = mk_dcn(dcn_cfg, sparse_opt=SparseSGD(0.2), dense_lr=0.2,
                    jit=False)(m1, jnp.asarray(dense), jnp.asarray(cat),
                               jnp.asarray(label))
    sm = shard_dcn(init_dcn(jax.random.key(3), dcn_cfg,
                            sparse_opt=SparseSGD(0.2)), mesh, "data",
                   sparse_opt=SparseSGD(0.2))
    sm, lN = make_sharded_dcn_train_step(dcn_cfg, mesh, "data",
                                         sparse_opt=SparseSGD(0.2),
                                         dense_lr=0.2)(
        sm, jax.device_put(dense, sd), jax.device_put(cat, sc),
        jax.device_put(label, sl))
    np.testing.assert_allclose(float(lN), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sm.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)

    fm_cfg = DeepFMConfig(vocab_sizes=vocab, num_dense=4, dim=8,
                          deep_mlp=(16, 8), bag=bag, combiner="mean",
                          pad_idx=PAD, compute_dtype=jnp.float32,
                          fold_fm_w=False)
    f1 = init_deepfm(jax.random.key(4), fm_cfg, sparse_opt=SparseSGD(0.2))
    f1, l1 = mk_fm(fm_cfg, sparse_opt=SparseSGD(0.2), dense_lr=0.2,
                   jit=False)(f1, jnp.asarray(dense), jnp.asarray(cat),
                              jnp.asarray(label))
    sf = shard_deepfm(init_deepfm(jax.random.key(4), fm_cfg,
                                  sparse_opt=SparseSGD(0.2)), mesh, "data",
                      sparse_opt=SparseSGD(0.2))
    sf, lN = make_sharded_deepfm_train_step(fm_cfg, mesh, "data",
                                            sparse_opt=SparseSGD(0.2),
                                            dense_lr=0.2)(
        sf, jax.device_put(dense, sd), jax.device_put(cat, sc),
        jax.device_put(label, sl))
    np.testing.assert_allclose(float(lN), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sf.tables.unshard()),
                               np.asarray(f1.tables.data),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sf.fm_w.unshard()),
                               np.asarray(f1.fm_w.data),
                               rtol=2e-4, atol=1e-7)


def test_a2a_pads_do_not_consume_capacity_at_model_level():
    """Heavy pads + TIGHT capacity: pads must drop at routing (the global
    -1 sentinel), so the step reports zero overflow and still matches the
    single-chip step. Before the fix, pads routed as row-0 occurrences and
    starved real traffic at this capacity."""
    cfg = tiny_cfg(combiner="mean")
    mesh = default_mesh(("data",))
    rng = np.random.default_rng(23)
    b = 32
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    # ~60% pads, remaining ids spread uniformly.
    cat = np.stack([rng.integers(0, v, (b, cfg.bag)).astype(np.int32)
                    for v in cfg.vocab_sizes])
    mask = rng.random(cat.shape) < 0.6
    mask[..., 0] = False
    cat = np.where(mask, PAD, cat)
    label = rng.integers(0, 2, b).astype(np.float32)

    m1 = init_dlrm(jax.random.key(5), cfg, sparse_opt=SparseSGD(0.3))
    m1, loss1 = make_train_step(cfg, sparse_opt=SparseSGD(0.3),
                                dense_lr=0.3, jit=False)(
        m1, jnp.asarray(dense), jnp.asarray(cat), jnp.asarray(label))

    sm = shard_dlrm(init_dlrm(jax.random.key(5), cfg,
                              sparse_opt=SparseSGD(0.3)),
                    mesh, "data", sparse_opt=SparseSGD(0.3))
    stepN = make_sharded_train_step(cfg, mesh, "data",
                                    sparse_opt=SparseSGD(0.3), dense_lr=0.3,
                                    exchange="a2a", capacity_factor=3.0,
                                    with_overflow=True)
    sd, sc, sl = batch_shardings(mesh, "data")
    sm, (lossN, ovf) = stepN(sm, jax.device_put(dense, sd),
                             jax.device_put(cat, sc),
                             jax.device_put(label, sl))
    assert int(ovf) == 0, f"pads consumed capacity: overflow={int(ovf)}"
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sm.tables.unshard()),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)


def test_eviction_trackers_skip_pads():
    """evict_every + var-len bags: pads neither crash np.bincount nor count
    as traffic (a pad-only 'row' must stay evictable-never-seen)."""
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_dlrm
    cfg = tiny_cfg(vocab_sizes=(80, 80, 80))
    gen = SyntheticCriteo(vocab_sizes=cfg.vocab_sizes, num_dense=4,
                          batch_size=128, bag=cfg.bag, pad_idx=PAD, seed=5)
    res = train_dlrm(cfg, gen.batches(), 12,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                     dense_lr=0.05, log_every=6, evict_every=6,
                     evict_threshold=1e-9, verbose=False)
    assert np.isfinite(res.losses[-1])


def test_data_generator_validation():
    from embeddingtables_tpu.data import SyntheticCriteo
    with pytest.raises(ValueError, match="pad_idx requires bag"):
        SyntheticCriteo(vocab_sizes=(10,), pad_idx=-1)
    with pytest.raises(ValueError, match="collides with real ids"):
        SyntheticCriteo(vocab_sizes=(10,), bag=2, pad_idx=3)


@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_planned_padded_step_matches_single_chip(combiner):
    """Mixed replicate/row-shard placement with pads + optax adam towers:
    the planned step must match the single-chip step bit-for-bit on both
    groups (pads remap pre-shift per group and carry zero weight)."""
    import optax
    from embeddingtables_tpu.parallel.planner import (
        PlannedDLRM, make_planned_train_step, place_stacked_on_plan,
        plan_sharding)
    from jax.sharding import NamedSharding, PartitionSpec as P
    cfg = tiny_cfg(vocab_sizes=(64, 2048, 64), combiner=combiner)
    mesh = default_mesh(("data",))
    plan = plan_sharding(cfg.vocab_sizes, cfg.dim, mesh,
                         replicate_max_bytes=cfg.dim * 4 * 128)
    assert plan.replicated and plan.sharded    # genuinely mixed
    tx = optax.adam(1e-2)
    opt = SparseRowWiseAdaGrad(lr=0.3, eps=1e-6)
    dense, cat, label = padded_batch(cfg, b=32, seed=13)

    m1 = init_dlrm(jax.random.key(6), cfg, sparse_opt=opt, dense_tx=tx)
    step1 = make_train_step(cfg, sparse_opt=opt, dense_tx=tx, jit=False)

    src = init_dlrm(jax.random.key(6), cfg, sparse_opt=opt, dense_tx=tx)
    pt = place_stacked_on_plan(plan, mesh, src.tables, src.emb_state, opt)
    repl = NamedSharding(mesh, P())
    pm = PlannedDLRM(bottom=jax.device_put(src.bottom, repl),
                     top=jax.device_put(src.top, repl), tables=pt,
                     config=cfg,
                     dense_opt_state=jax.device_put(src.dense_opt_state,
                                                    repl))
    stepP = make_planned_train_step(cfg, mesh, sparse_opt=opt, dense_tx=tx)
    sd, sc, sl = batch_shardings(mesh, plan.axis)
    for it in range(2):
        dense, cat, label = padded_batch(cfg, b=32, seed=13 + it)
        m1, loss1 = step1(m1, jnp.asarray(dense), jnp.asarray(cat),
                          jnp.asarray(label))
        pm, lossP = stepP(pm, jax.device_put(dense, sd),
                          jax.device_put(cat, sc),
                          jax.device_put(label, sl))
        np.testing.assert_allclose(float(lossP), float(loss1), rtol=1e-5)
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(
            np.asarray(pm.tables.table(t)),
            np.asarray(m1.tables.data)[m1.tables.offsets[t]:
                                       m1.tables.offsets[t + 1]],
            rtol=2e-4, atol=1e-6, err_msg=f"table {t}")
    for a, b in zip(jax.tree_util.tree_leaves((m1.bottom, m1.top)),
                    jax.tree_util.tree_leaves((pm.bottom, pm.top))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_planned_resume_with_dense_tx_initializes_state():
    """Resuming a PlannedDLRM trained with plain-SGD towers under
    dense_tx= must initialize the replicated state, not crash in optax."""
    import optax
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_dlrm
    from embeddingtables_tpu.parallel.planner import plan_sharding
    cfg = tiny_cfg(vocab_sizes=(64, 2048, 64), bag=None, pad_idx=None)
    mesh = default_mesh(("data",))
    plan = plan_sharding(cfg.vocab_sizes, cfg.dim, mesh,
                         replicate_max_bytes=cfg.dim * 4 * 128)
    gen = SyntheticCriteo(vocab_sizes=cfg.vocab_sizes, num_dense=4,
                          batch_size=64, seed=3)
    res = train_dlrm(cfg, gen.batches(), 2, mesh=mesh, plan=plan,
                     log_every=0, verbose=False)
    assert res.model.dense_opt_state is None
    res2 = train_dlrm(cfg, gen.batches(), 2, model=res.model, mesh=mesh,
                      plan=plan, dense_tx=optax.adam(1e-3), log_every=0,
                      verbose=False)
    assert res2.model.dense_opt_state is not None
    assert np.isfinite(res2.losses[-1]) if res2.losses else True


def test_mixed_dim_planned_pad_matches_oracle():
    """mixed_planned_lookup/apply with pad_idx: per-dim groups match the
    lookup_oracle composition and pads leave rows untouched."""
    from embeddingtables_tpu.parallel.planner import (
        MixedDimPlannedTables, mixed_planned_apply, mixed_planned_lookup,
        plan_sharding_mixed)
    mesh = default_mesh(("data",))
    rng = np.random.default_rng(31)
    vocabs = (64, 2048, 96)
    dims = (8, 16, 8)
    arrs = [jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
            for v, d in zip(vocabs, dims)]
    plans, groups = plan_sharding_mixed(vocabs, dims, mesh,
                                        replicate_max_bytes=16 * 4 * 128)
    mt = MixedDimPlannedTables.from_tables(plans, groups, mesh, arrs)
    b, bag = 16, 3
    cat = [np.where(rng.random((b, bag)) < 0.3, PAD,
                    rng.integers(0, v, (b, bag))).astype(np.int32)
           for v in vocabs]
    outs = mixed_planned_lookup(mesh, mt, [jnp.asarray(c) for c in cat],
                                combiner="mean", pad_idx=PAD)
    for t in range(3):
        exp = lookup_oracle(arrs[t], jnp.asarray(cat[t]), "mean", None,
                            pad_idx=PAD)
        np.testing.assert_allclose(np.asarray(outs[t]), np.asarray(exp),
                                   rtol=2e-5, atol=1e-5, err_msg=f"t={t}")
    # Update: pads contribute nothing (compare vs single-chip sgd_update).
    from embeddingtables_tpu.ops.lookup import lookup_vjp
    from embeddingtables_tpu.ops.sparse_update import sgd_update
    deltas = [jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
              for d in dims]
    mt2 = mixed_planned_apply(mesh, mt, [jnp.asarray(c) for c in cat],
                              deltas, SparseSGD(0.5), combiner="mean",
                              pad_idx=PAD)
    for t in range(3):
        _, pb = lookup_vjp(arrs[t], jnp.asarray(cat[t]), combiner="mean",
                           pad_idx=PAD)
        exp = sgd_update(arrs[t], pb(deltas[t]), 0.5)
        np.testing.assert_allclose(np.asarray(mt2.table(t)),
                                   np.asarray(exp), rtol=2e-4, atol=1e-6,
                                   err_msg=f"t={t}")


def test_train_loop_on_variable_length_bags_learns():
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_dlrm
    cfg = tiny_cfg(vocab_sizes=(80, 80, 80), combiner="mean")
    gen = SyntheticCriteo(vocab_sizes=cfg.vocab_sizes, num_dense=4,
                          batch_size=256, bag=cfg.bag, pad_idx=PAD, seed=11)
    batch = next(gen.batches(1))
    assert (batch["cat"] == PAD).any()          # pads actually generated
    assert (batch["cat"] != PAD).all(axis=-1).any()
    eval_batches = list(gen.batches(2))
    res = train_dlrm(cfg, gen.batches(), 40,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                     dense_lr=0.05, eval_batches=eval_batches,
                     eval_every=20, log_every=10, verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.aucs and res.aucs[-1][1] > 0.6
