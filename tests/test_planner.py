"""Auto-sharding planner: decision rules + mixed-placement parity vs the
single-chip fused paths on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.ops.sparse_update import SparseEmbeddingUpdate
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.parallel.planner import (REPLICATE, ROW_SHARD,
                                                  PlannedTables, plan_sharding,
                                                  planned_apply,
                                                  planned_lookup)

DIM = 8


def _mesh():
    return default_mesh(("data",))


# ---------------------------------------------------------------------------
# Planning decisions
# ---------------------------------------------------------------------------

def test_plan_small_replicates_large_shards():
    mesh = _mesh()
    # 4-byte f32 rows of DIM=8 -> 32 B/row. 100 rows = 3.2 KB (replicate);
    # 1M rows = 32 MB (shard at the 4 MiB default threshold).
    plan = plan_sharding([100, 1_000_000, 500], DIM, mesh)
    p = [d.placement for d in plan.decisions]
    assert p == [REPLICATE, ROW_SHARD, REPLICATE]
    assert plan.replicated == (0, 2) and plan.sharded == (1,)
    # Sharded bytes account 1/n with padding; replicated account fully.
    n = plan.n_devices
    assert plan.decisions[1].bytes_per_device == -(-1_000_000 // n) * DIM * 4
    assert plan.decisions[0].bytes_per_device == 100 * DIM * 4
    assert "replicated" in plan.summary() and "row-sharded" in plan.summary()


def test_plan_replicate_budget_admits_smallest_first():
    mesh = _mesh()
    # Budget fits only the two smallest tables.
    row = DIM * 4
    plan = plan_sharding([300, 100, 200, 400], DIM, mesh,
                         replicate_max_bytes=1 << 20,
                         replicate_budget_bytes=row * 320)
    p = [d.placement for d in plan.decisions]
    assert p == [ROW_SHARD, REPLICATE, REPLICATE, ROW_SHARD]


def test_plan_opt_state_and_budget_guard():
    mesh = _mesh()
    plan = plan_sharding([100, 1_000_000], DIM, mesh, opt_state_scalars=1)
    n = plan.n_devices
    assert plan.opt_state_bytes_per_device == 100 * 4 + (-(-1_000_000 // n)) * 4
    with pytest.raises(ValueError, match="budget"):
        plan_sharding([100, 1_000_000], DIM, mesh,
                      hbm_budget_bytes=1 << 20)


def test_plan_single_device_all_replicate():
    from embeddingtables_tpu.parallel.mesh import local_mesh
    mesh = local_mesh(1)
    plan = plan_sharding([100, 1_000_000], DIM, mesh)
    assert all(d.placement == REPLICATE for d in plan.decisions)


# ---------------------------------------------------------------------------
# Executing the plan: parity vs single-chip
# ---------------------------------------------------------------------------

def _mixed_setup(bag=None, adagrad=False, seed=0):
    mesh = _mesh()
    vocabs = (64, 4096, 96)          # middle table row-shards
    plan = plan_sharding(vocabs, DIM, mesh, replicate_max_bytes=DIM * 4 * 128)
    assert [d.placement for d in plan.decisions] == \
        [REPLICATE, ROW_SHARD, REPLICATE]
    rng = np.random.default_rng(seed)
    arrs = [jnp.asarray(rng.normal(size=(v, DIM)).astype(np.float32))
            for v in vocabs]
    pt = PlannedTables.from_tables(plan, mesh, arrs, adagrad=adagrad)
    b = 32
    shape = (b,) if bag is None else (b, bag)
    idx = [jnp.asarray(rng.integers(0, v, shape).astype(np.int32))
           for v in vocabs]
    return mesh, vocabs, arrs, pt, idx, rng


def test_planned_lookup_matches_oracle():
    mesh, vocabs, arrs, pt, idx, _ = _mixed_setup()
    out = planned_lookup(mesh, pt, idx)
    for t in range(3):
        np.testing.assert_allclose(np.asarray(out[t]),
                                   np.asarray(arrs[t])[np.asarray(idx[t])],
                                   rtol=1e-6)


def test_planned_lookup_bag_matches_oracle():
    mesh, vocabs, arrs, pt, idx, _ = _mixed_setup(bag=3)
    out = planned_lookup(mesh, pt, idx)
    for t in range(3):
        want = np.asarray(arrs[t])[np.asarray(idx[t])].sum(axis=1)
        np.testing.assert_allclose(np.asarray(out[t]), want, rtol=1e-5,
                                   atol=1e-6)


@pytest.mark.parametrize("bag", [None, 2])
def test_planned_apply_sgd_matches_single_chip(bag):
    mesh, vocabs, arrs, pt, idx, rng = _mixed_setup(bag=bag)
    b = idx[0].shape[0]
    delta_t = jnp.asarray(rng.normal(size=(3, b, DIM)).astype(np.float32))
    opt = SparseSGD(0.3)
    new = planned_apply(mesh, pt, idx, delta_t, opt)
    for t in range(3):
        upd = SparseEmbeddingUpdate(delta=delta_t[t], indices=idx[t])
        want, _ = opt.apply(arrs[t], upd, opt.init(arrs[t]))
        np.testing.assert_allclose(np.asarray(new.table(t)),
                                   np.asarray(want), rtol=2e-5, atol=1e-6)


def test_planned_apply_adagrad_matches_single_chip():
    mesh, vocabs, arrs, pt, idx, rng = _mixed_setup(adagrad=True, seed=3)
    b = idx[0].shape[0]
    delta_t = jnp.asarray(rng.normal(size=(3, b, DIM)).astype(np.float32))
    opt = SparseRowWiseAdaGrad(lr=0.3, eps=1e-6)
    new = planned_apply(mesh, pt, idx, delta_t, opt)
    accs = []
    for t in range(3):
        upd = SparseEmbeddingUpdate(delta=delta_t[t], indices=idx[t])
        want, st = opt.apply(arrs[t], upd, opt.init(arrs[t]))
        np.testing.assert_allclose(np.asarray(new.table(t)),
                                   np.asarray(want), rtol=2e-5, atol=1e-6)
        accs.append(np.asarray(st.accum))
    # Replicated accum is contiguous per repl_offsets; sharded is mod-laid.
    np.testing.assert_allclose(np.asarray(new.repl_accum),
                               np.concatenate([accs[0], accs[2]]),
                               rtol=2e-5, atol=1e-7)
    acc = np.asarray(new.shard_accum)
    n, rows = acc.shape
    acc_full = acc.T.reshape(n * rows)[:vocabs[1]]
    np.testing.assert_allclose(acc_full, accs[1], rtol=2e-5, atol=1e-7)


def test_planned_init_shapes_and_groups():
    mesh = _mesh()
    vocabs = (64, 4096, 96)
    plan = plan_sharding(vocabs, DIM, mesh,
                         replicate_max_bytes=DIM * 4 * 128)
    pt = PlannedTables.init(jax.random.key(0), plan, mesh, adagrad=True)
    assert pt.repl.shape == (64 + 96, DIM)
    n = plan.n_devices
    assert pt.shard.data.shape == (n, -(-4096 // n), DIM)
    assert pt.repl_accum.shape == (160,)
    assert pt.shard_accum.shape == (n, -(-4096 // n))
    # init is usable: lookup returns finite rows
    idx = [jnp.zeros((8,), jnp.int32)] * 3
    out = planned_lookup(mesh, pt, idx)
    assert np.isfinite(np.asarray(out)).all()


def test_planned_all_sharded_and_all_replicated_degenerate():
    mesh = _mesh()
    rng = np.random.default_rng(9)
    arrs = [jnp.asarray(rng.normal(size=(v, DIM)).astype(np.float32))
            for v in (512, 768)]
    idx = [jnp.asarray(rng.integers(0, v, 16).astype(np.int32))
           for v in (512, 768)]
    for kw in (dict(replicate_max_bytes=0),            # all sharded
               dict(replicate_max_bytes=1 << 30)):     # all replicated
        plan = plan_sharding((512, 768), DIM, mesh, **kw)
        pt = PlannedTables.from_tables(plan, mesh, arrs)
        out = planned_lookup(mesh, pt, idx)
        for t in range(2):
            np.testing.assert_allclose(
                np.asarray(out[t]),
                np.asarray(arrs[t])[np.asarray(idx[t])], rtol=1e-6)


def test_planned_apply_rejects_unknown_optimizer():
    mesh, vocabs, arrs, pt, idx, rng = _mixed_setup()
    delta_t = jnp.zeros((3, 32, DIM))
    with pytest.raises(NotImplementedError):
        planned_apply(mesh, pt, idx, delta_t, object())


# ---------------------------------------------------------------------------
# Planned DLRM: mixed placement driving the flagship model
# ---------------------------------------------------------------------------

def _dlrm_cfg():
    from embeddingtables_tpu.models import DLRMConfig
    return DLRMConfig(vocab_sizes=(64, 4096, 96), num_dense=4, dim=DIM,
                      bottom_mlp=(16, DIM), top_mlp=(16, 1),
                      compute_dtype=jnp.float32)


@pytest.mark.parametrize("opt_name", ["sgd", "adagrad"])
def test_planned_dlrm_step_matches_single_chip(opt_name):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from embeddingtables_tpu.models import init_dlrm, make_train_step
    from embeddingtables_tpu.parallel.dlrm import batch_shardings
    from embeddingtables_tpu.parallel.planner import (PlannedDLRM,
                                                      make_planned_eval_step,
                                                      make_planned_train_step)
    cfg = _dlrm_cfg()
    mesh = _mesh()
    make_opt = (lambda: SparseSGD(0.3)) if opt_name == "sgd" else \
        (lambda: SparseRowWiseAdaGrad(lr=0.3, eps=1e-6))
    plan = plan_sharding(cfg.vocab_sizes, DIM, mesh,
                         replicate_max_bytes=DIM * 4 * 128)
    assert plan.replicated and plan.sharded     # genuinely mixed

    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=make_opt())
    rng = np.random.default_rng(1)
    b = 32
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, b).astype(np.float32)

    step1 = make_train_step(cfg, sparse_opt=make_opt(), dense_lr=0.3,
                            jit=False)
    m1, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                      jnp.asarray(label))

    offs = model.tables.offsets
    arrs = [model.tables.data[offs[t]:offs[t + 1]] for t in range(3)]
    pt = PlannedTables.from_tables(plan, mesh, arrs,
                                   adagrad=opt_name == "adagrad")
    repl = NamedSharding(mesh, P())
    pm = PlannedDLRM(bottom=jax.device_put(model.bottom, repl),
                     top=jax.device_put(model.top, repl),
                     tables=pt, config=cfg)
    sd, sc, sl = batch_shardings(mesh, "data")
    stepN = make_planned_train_step(cfg, mesh, sparse_opt=make_opt(),
                                    dense_lr=0.3)
    pmN, lossN = stepN(pm, jax.device_put(dense, sd),
                       jax.device_put(cat, sc), jax.device_put(label, sl))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    for t in range(3):
        want = np.asarray(m1.tables.data[offs[t]:offs[t + 1]])
        np.testing.assert_allclose(np.asarray(pmN.tables.table(t)), want,
                                   rtol=2e-4, atol=1e-6)
    flat1, _ = jax.tree_util.tree_flatten((m1.bottom, m1.top))
    flatN, _ = jax.tree_util.tree_flatten((pmN.bottom, pmN.top))
    for a, bb in zip(flat1, flatN):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
    # Eval parity on the updated model.
    from embeddingtables_tpu.models.dlrm import make_eval_step
    want = make_eval_step(cfg)(m1, jnp.asarray(dense), jnp.asarray(cat))
    got = make_planned_eval_step(cfg, mesh)(pmN, jax.device_put(dense, sd),
                                            jax.device_put(cat, sc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_init_planned_dlrm_learns():
    from embeddingtables_tpu.parallel.dlrm import batch_shardings
    from embeddingtables_tpu.parallel.planner import (init_planned_dlrm,
                                                      make_planned_train_step)
    cfg = _dlrm_cfg()
    mesh = _mesh()
    plan = plan_sharding(cfg.vocab_sizes, DIM, mesh,
                         replicate_max_bytes=DIM * 4 * 128)
    opt = SparseRowWiseAdaGrad(lr=0.1, initial_accum=0.1)
    pm = init_planned_dlrm(jax.random.key(2), cfg, plan, mesh,
                           sparse_opt=opt)
    assert float(pm.tables.repl_accum[0]) == pytest.approx(0.1)
    step = make_planned_train_step(cfg, mesh, sparse_opt=opt, dense_lr=0.1)
    sd, sc, sl = batch_shardings(mesh, "data")
    rng = np.random.default_rng(5)
    b = 64
    losses = []
    for i in range(12):
        dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                        for v in cfg.vocab_sizes])
        label = (dense.sum(axis=1) > 0).astype(np.float32)
        pm, loss = step(pm, jax.device_put(dense, sd),
                        jax.device_put(cat, sc),
                        jax.device_put(label, sl))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("trial", range(8))
def test_planner_fuzz_mixed_placements(trial):
    """Random vocab mixes/bags/thresholds: planned lookup+SGD apply must
    match the per-table single-chip oracle for every placement split."""
    rng = np.random.default_rng(4000 + trial)
    mesh = _mesh()
    ntab = int(rng.integers(2, 6))
    vocabs = tuple(int(rng.integers(8, 3000)) for _ in range(ntab))
    dim = int(rng.choice([4, 8, 16]))
    thresh = int(rng.choice([0, dim * 4 * 64, dim * 4 * 1024, 1 << 30]))
    plan = plan_sharding(vocabs, dim, mesh, replicate_max_bytes=thresh)
    arrs = [jnp.asarray(rng.normal(size=(v, dim)).astype(np.float32))
            for v in vocabs]
    pt = PlannedTables.from_tables(plan, mesh, arrs)
    b = int(rng.integers(1, 5)) * 8
    bag = int(rng.integers(1, 4)) if rng.random() < 0.4 else None
    shape = (b,) if bag is None else (b, bag)
    idx = [jnp.asarray(rng.integers(0, v, shape).astype(np.int32))
           for v in vocabs]
    out = planned_lookup(mesh, pt, idx)
    for t in range(ntab):
        want = np.asarray(arrs[t])[np.asarray(idx[t])]
        if bag is not None:
            want = want.sum(axis=1)
        np.testing.assert_allclose(np.asarray(out[t]), want, rtol=1e-5,
                                   atol=1e-5)
    delta_t = jnp.asarray(rng.normal(size=(ntab, b, dim)).astype(np.float32))
    opt = SparseSGD(0.2)
    new = planned_apply(mesh, pt, idx, delta_t, opt)
    for t in range(ntab):
        upd = SparseEmbeddingUpdate(delta=delta_t[t], indices=idx[t])
        want, _ = opt.apply(arrs[t], upd, opt.init(arrs[t]))
        np.testing.assert_allclose(np.asarray(new.table(t)),
                                   np.asarray(want), rtol=2e-5, atol=2e-6)


def test_plan_hotness_biases_admission():
    mesh = _mesh()
    row = DIM * 4
    # Same budget as the smallest-first test, but table 0 (300 rows) is 20x
    # hotter than everything else -> highest value density, admitted first.
    plan = plan_sharding([300, 100, 200, 400], DIM, mesh,
                         hotness=[20.0, 1.0, 1.0, 1.0],
                         replicate_max_bytes=1 << 20,
                         replicate_budget_bytes=row * 320)
    p = [d.placement for d in plan.decisions]
    assert p[0] == REPLICATE                # hot table wins the budget
    assert p[3] == ROW_SHARD
    with pytest.raises(ValueError, match="hotness"):
        plan_sharding([100, 200], DIM, mesh, hotness=[1.0])


# ---------------------------------------------------------------------------
# Mixed feature dims: one group per dim
# ---------------------------------------------------------------------------

def test_mixed_dim_plan_and_lookup_apply():
    from embeddingtables_tpu.parallel.planner import (MixedDimPlannedTables,
                                                      mixed_planned_apply,
                                                      mixed_planned_lookup,
                                                      plan_sharding_mixed)
    mesh = _mesh()
    vocabs = (64, 4096, 96, 2048)
    dims = (8, 16, 8, 16)
    plans, groups = plan_sharding_mixed(
        vocabs, dims, mesh, replicate_max_bytes=16 * 4 * 128)
    assert groups == ((0, 2), (1, 3))            # grouped by dim, ordered
    assert [d.placement for d in plans[0].decisions] == [REPLICATE] * 2
    assert [d.placement for d in plans[1].decisions] == [ROW_SHARD] * 2

    rng = np.random.default_rng(7)
    arrs = [jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
            for v, d in zip(vocabs, dims)]
    mt = MixedDimPlannedTables.from_tables(plans, groups, mesh, arrs)
    b = 32
    idx = [jnp.asarray(rng.integers(0, v, b).astype(np.int32))
           for v in vocabs]
    out = mixed_planned_lookup(mesh, mt, idx)
    for t in range(4):
        assert out[t].shape == (b, dims[t])
        np.testing.assert_allclose(np.asarray(out[t]),
                                   np.asarray(arrs[t])[np.asarray(idx[t])],
                                   rtol=1e-6)

    deltas = [jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
              for d in dims]
    opt = SparseSGD(0.2)
    new = mixed_planned_apply(mesh, mt, idx, deltas, opt)
    for t in range(4):
        upd = SparseEmbeddingUpdate(delta=deltas[t], indices=idx[t])
        want, _ = opt.apply(arrs[t], upd, opt.init(arrs[t]))
        np.testing.assert_allclose(np.asarray(new.table(t)),
                                   np.asarray(want), rtol=2e-5, atol=1e-6)


def test_mixed_dim_init_and_adagrad():
    from embeddingtables_tpu.parallel.planner import (MixedDimPlannedTables,
                                                      mixed_planned_apply,
                                                      plan_sharding_mixed)
    mesh = _mesh()
    vocabs, dims = (64, 2048), (8, 16)
    plans, groups = plan_sharding_mixed(vocabs, dims, mesh,
                                        replicate_max_bytes=8 * 4 * 128,
                                        opt_state_scalars=1)
    mt = MixedDimPlannedTables.init(jax.random.key(0), plans, groups, mesh,
                                    adagrad=True)
    assert mt.table(0).shape == (64, 8) and mt.table(1).shape == (2048, 16)
    rng = np.random.default_rng(3)
    idx = [jnp.asarray(rng.integers(0, v, 16).astype(np.int32))
           for v in vocabs]
    arrs = [jnp.asarray(np.asarray(mt.table(t))) for t in range(2)]
    deltas = [jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
              for d in dims]
    opt = SparseRowWiseAdaGrad(lr=0.1, eps=1e-6)
    new = mixed_planned_apply(mesh, mt, idx, deltas, opt)
    for t in range(2):
        upd = SparseEmbeddingUpdate(delta=deltas[t], indices=idx[t])
        want, _ = opt.apply(arrs[t], upd, opt.init(arrs[t]))
        np.testing.assert_allclose(np.asarray(new.table(t)),
                                   np.asarray(want), rtol=2e-5, atol=1e-6)
    with pytest.raises(ValueError, match="dims"):
        plan_sharding_mixed((10, 20), (8,), mesh)


def test_train_dlrm_with_plan_learns():
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    vocab = (64, 1024, 96)
    cfg = DLRMConfig(vocab_sizes=vocab, num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    mesh = _mesh()
    plan = plan_sharding(vocab, 8, mesh, replicate_max_bytes=8 * 4 * 128,
                         opt_state_scalars=1)
    assert plan.replicated and plan.sharded
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=4, batch_size=256,
                          seed=13)
    eval_batches = list(gen.batches(2))
    res = train_dlrm(cfg, gen.batches(), 30,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                     dense_lr=0.05, eval_batches=eval_batches,
                     eval_every=30, mesh=mesh, plan=plan, log_every=10,
                     verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.aucs and res.aucs[-1][1] > 0.6
    with pytest.raises(NotImplementedError, match="gather"):
        train_dlrm(cfg, gen.batches(), 1, mesh=mesh, plan=plan,
                   exchange="a2a", verbose=False)
    with pytest.raises(ValueError, match="mesh"):
        train_dlrm(cfg, gen.batches(), 1, plan=plan, verbose=False)


def test_from_tables_carries_adagrad_accums():
    """Resuming a trained model onto a plan keeps its row state (review
    fix: from_tables used to zero the accumulators silently)."""
    mesh = _mesh()
    vocabs = (64, 4096, 96)
    plan = plan_sharding(vocabs, DIM, mesh, replicate_max_bytes=DIM * 4 * 128)
    rng = np.random.default_rng(21)
    arrs = [jnp.asarray(rng.normal(size=(v, DIM)).astype(np.float32))
            for v in vocabs]
    accs = [jnp.asarray(rng.uniform(0.1, 2.0, v).astype(np.float32))
            for v in vocabs]
    pt = PlannedTables.from_tables(plan, mesh, arrs, accums=accs)
    np.testing.assert_allclose(np.asarray(pt.repl_accum),
                               np.concatenate([accs[0], accs[2]]), rtol=1e-6)
    acc = np.asarray(pt.shard_accum)
    n, rows = acc.shape
    np.testing.assert_allclose(acc.T.reshape(n * rows)[:vocabs[1]],
                               np.asarray(accs[1]), rtol=1e-6)
    # And the update continues from that state (matches single-chip resume).
    idx = [jnp.asarray(rng.integers(0, v, 16).astype(np.int32))
           for v in vocabs]
    delta_t = jnp.asarray(rng.normal(size=(3, 16, DIM)).astype(np.float32))
    opt = SparseRowWiseAdaGrad(lr=0.2, eps=1e-6)
    new = planned_apply(mesh, pt, idx, delta_t, opt)
    for t in range(3):
        upd = SparseEmbeddingUpdate(delta=delta_t[t], indices=idx[t])
        from embeddingtables_tpu.optim import SparseOptState
        want, _ = opt.apply(arrs[t], upd, SparseOptState(accum=accs[t]))
        np.testing.assert_allclose(np.asarray(new.table(t)),
                                   np.asarray(want), rtol=2e-5, atol=1e-6)


def test_mixed_plan_budgets_are_global():
    """Review fix: HBM/replicate budgets apply to the COMBINED mixed plan,
    not per dim-group (budgets below are chosen so the OLD per-group
    behavior would pass each check and the fixed global accounting must
    not)."""
    from embeddingtables_tpu.parallel.planner import plan_sharding_mixed
    mesh = _mesh()
    # Sharded per-device: dim-8 group 0.31 MiB, dim-16 group 0.61 MiB —
    # each under the 0.7 MiB budget alone, 0.92 MiB combined: only the
    # combined check raises ("mixed plan" message).
    vocabs, dims = (80_000, 80_000), (8, 16)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mixed plan"):
        plan_sharding_mixed(vocabs, dims, mesh, replicate_max_bytes=0,
                            hbm_budget_bytes=int(0.7 * 2**20))
    # Replicate budget consumed ACROSS groups: B=20000 B admits the whole
    # dim-8 group (9600 B) and, standalone (old behavior), also both
    # dim-16 tables (19200 B <= 20000). The fixed remainder 10400 B admits
    # only the V=100 dim-16 table.
    plans, groups = plan_sharding_mixed(
        (100, 200, 100, 200), (8, 8, 16, 16), mesh,
        replicate_max_bytes=1 << 20, replicate_budget_bytes=20_000)
    p8 = [d.placement for d in plans[0].decisions]
    p16 = [d.placement for d in plans[1].decisions]
    assert p8 == [REPLICATE, REPLICATE]
    assert p16 == [REPLICATE, ROW_SHARD]     # remainder fits only V=100


# ---------------------------------------------------------------------------
# Planned DCN
# ---------------------------------------------------------------------------

def test_planned_dcn_step_matches_single_chip():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from embeddingtables_tpu.models.dcn import (DCNConfig, init_dcn,
                                                make_train_step as dcn_step)
    from embeddingtables_tpu.parallel.dlrm import batch_shardings
    from embeddingtables_tpu.parallel.planner import (
        PlannedDCN, make_planned_dcn_eval_step, make_planned_dcn_train_step)
    cfg = DCNConfig(vocab_sizes=(64, 4096, 96), num_dense=4, dim=DIM,
                    num_cross=2, cross_rank=4, deep_mlp=(16, 8),
                    compute_dtype=jnp.float32)
    mesh = _mesh()
    plan = plan_sharding(cfg.vocab_sizes, DIM, mesh,
                         replicate_max_bytes=DIM * 4 * 128)
    opt = lambda: SparseRowWiseAdaGrad(lr=0.3, eps=1e-6)   # noqa: E731

    model = init_dcn(jax.random.key(0), cfg, sparse_opt=opt())
    rng = np.random.default_rng(17)
    b = 32
    dense = rng.normal(size=(b, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, b).astype(np.float32)
    m1, loss1 = dcn_step(cfg, sparse_opt=opt(), dense_lr=0.3, jit=False)(
        model, jnp.asarray(dense), jnp.asarray(cat), jnp.asarray(label))

    offs = model.tables.offsets
    arrs = [model.tables.data[offs[t]:offs[t + 1]] for t in range(3)]
    pt = PlannedTables.from_tables(plan, mesh, arrs, adagrad=True)
    repl = NamedSharding(mesh, P())
    pm = PlannedDCN(cross=jax.device_put(model.cross, repl),
                    deep=jax.device_put(model.deep, repl),
                    head=jax.device_put(model.head, repl),
                    tables=pt, config=cfg)
    sd, sc, sl = batch_shardings(mesh, plan.axis)
    stepN = make_planned_dcn_train_step(cfg, mesh, sparse_opt=opt(),
                                        dense_lr=0.3)
    pmN, lossN = stepN(pm, jax.device_put(dense, sd),
                       jax.device_put(cat, sc), jax.device_put(label, sl))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    for t in range(3):
        want = np.asarray(m1.tables.data[offs[t]:offs[t + 1]])
        np.testing.assert_allclose(np.asarray(pmN.tables.table(t)), want,
                                   rtol=2e-4, atol=1e-6)
    # Eval parity on the updated model.
    from embeddingtables_tpu.models.dcn import make_eval_step
    want = make_eval_step(cfg)(m1, jnp.asarray(dense), jnp.asarray(cat))
    got = make_planned_dcn_eval_step(cfg, mesh)(
        pmN, jax.device_put(dense, sd), jax.device_put(cat, sc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_init_planned_dcn_learns():
    from embeddingtables_tpu.models.dcn import DCNConfig
    from embeddingtables_tpu.parallel.dlrm import batch_shardings
    from embeddingtables_tpu.parallel.planner import (
        init_planned_dcn, make_planned_dcn_train_step)
    cfg = DCNConfig(vocab_sizes=(64, 1024, 96), num_dense=4, dim=DIM,
                    num_cross=2, cross_rank=4, deep_mlp=(16, 8),
                    compute_dtype=jnp.float32)
    mesh = _mesh()
    plan = plan_sharding(cfg.vocab_sizes, DIM, mesh,
                         replicate_max_bytes=DIM * 4 * 128)
    opt = SparseRowWiseAdaGrad(lr=0.1)
    pm = init_planned_dcn(jax.random.key(3), cfg, plan, mesh, sparse_opt=opt)
    step = make_planned_dcn_train_step(cfg, mesh, sparse_opt=opt,
                                       dense_lr=0.1)
    sd, sc, sl = batch_shardings(mesh, plan.axis)
    rng = np.random.default_rng(9)
    losses = []
    for i in range(12):
        dense = rng.normal(size=(64, 4)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 64).astype(np.int32)
                        for v in cfg.vocab_sizes])
        label = (dense.sum(axis=1) > 0).astype(np.float32)
        pm, loss = step(pm, jax.device_put(dense, sd),
                        jax.device_put(cat, sc), jax.device_put(label, sl))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_train_dcn_with_plan_learns():
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.dcn import DCNConfig
    from embeddingtables_tpu.models.train import train_dcn
    vocab = (64, 1024, 96)
    cfg = DCNConfig(vocab_sizes=vocab, num_dense=4, dim=DIM, num_cross=2,
                    cross_rank=4, deep_mlp=(16, 8),
                    compute_dtype=jnp.float32)
    mesh = _mesh()
    plan = plan_sharding(vocab, DIM, mesh, replicate_max_bytes=DIM * 4 * 128,
                         opt_state_scalars=1)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=4, batch_size=256,
                          seed=15)
    res = train_dcn(cfg, gen.batches(), 30,
                    sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                    dense_lr=0.05, eval_batches=list(gen.batches(2)),
                    eval_every=30, mesh=mesh, plan=plan, log_every=10,
                    verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.aucs and res.aucs[-1][1] > 0.6


def test_train_plan_rejects_foreign_model_types():
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    vocab = (64, 1024)
    cfg = DLRMConfig(vocab_sizes=vocab, num_dense=4, dim=DIM,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    mesh = _mesh()
    plan = plan_sharding(vocab, DIM, mesh, replicate_max_bytes=DIM * 4 * 128)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=4, batch_size=64)
    with pytest.raises(TypeError, match="PlannedDLRM"):
        train_dlrm(cfg, gen.batches(), 1, mesh=mesh, plan=plan,
                   model=object(), verbose=False)


def test_planner_on_2d_mesh():
    """Planner over a tuple axis: rows shard over the data x model product,
    batch stays on the data axis (same decomposition as test_mesh2d)."""
    mesh = default_mesh(("data", "model"), shape=(4, 2))
    vocabs = (64, 4096, 96)
    plan = plan_sharding(vocabs, DIM, mesh, axis=("data", "model"),
                         replicate_max_bytes=DIM * 4 * 128)
    assert plan.n_devices == 8
    assert plan.replicated == (0, 2) and plan.sharded == (1,)
    rng = np.random.default_rng(23)
    arrs = [jnp.asarray(rng.normal(size=(v, DIM)).astype(np.float32))
            for v in vocabs]
    pt = PlannedTables.from_tables(plan, mesh, arrs)
    idx = [jnp.asarray(rng.integers(0, v, 32).astype(np.int32))
           for v in vocabs]
    out = planned_lookup(mesh, pt, idx)
    for t in range(3):
        np.testing.assert_allclose(np.asarray(out[t]),
                                   np.asarray(arrs[t])[np.asarray(idx[t])],
                                   rtol=1e-6)
    delta_t = jnp.asarray(rng.normal(size=(3, 32, DIM)).astype(np.float32))
    opt = SparseSGD(0.2)
    new = planned_apply(mesh, pt, idx, delta_t, opt)
    for t in range(3):
        upd = SparseEmbeddingUpdate(delta=delta_t[t], indices=idx[t])
        want, _ = opt.apply(arrs[t], upd, opt.init(arrs[t]))
        np.testing.assert_allclose(np.asarray(new.table(t)),
                                   np.asarray(want), rtol=2e-5, atol=1e-6)


def test_hotness_from_trackers():
    from embeddingtables_tpu.parallel.planner import hotness_from_trackers
    from embeddingtables_tpu.utils.rowstats import FrequencyTracker
    trackers = [FrequencyTracker(100), FrequencyTracker(100),
                FrequencyTracker(100)]
    rng = np.random.default_rng(0)
    for _ in range(5):
        trackers[0].observe(rng.integers(0, 100, 64))          # 1 id/example
        trackers[1].observe(rng.integers(0, 100, (64, 4)))     # 4 ids (bag)
        # trackers[2] never observes
    hot = hotness_from_trackers(trackers)
    assert hot[1] > hot[0] * 2          # multivalent table is hotter
    assert hot[2] == 1.0
    # Long-run stability (review fix): the EMA normalization keeps a hot
    # table's score near its true occurrences-per-batch instead of
    # decaying below the 1.0 never-seen fallback as observations grow.
    long = FrequencyTracker(100, decay=0.9)
    for _ in range(500):
        long.observe(rng.integers(0, 100, 64))
    (h,) = hotness_from_trackers([long])
    assert 50 < h < 80                  # ~64, not ~O(1/steps)
    assert h > 1.0                      # outranks never-seen
    # Feeds straight into the planner.
    plan = plan_sharding((100, 100, 100), DIM, _mesh(), hotness=hot,
                         replicate_max_bytes=1 << 20,
                         replicate_budget_bytes=100 * DIM * 4)
    assert plan.decisions[1].placement == REPLICATE      # hottest wins


def test_train_dlrm_plan_with_eviction():
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    vocab = (64, 1024, 96)
    cfg = DLRMConfig(vocab_sizes=vocab, num_dense=4, dim=DIM,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    mesh = _mesh()
    plan = plan_sharding(vocab, DIM, mesh, replicate_max_bytes=DIM * 4 * 128,
                         opt_state_scalars=1)
    # Zipf traffic: many ids appear once then go stale -> evictions happen.
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=4, batch_size=128,
                          seed=3, zipf_a=1.5)
    res = train_dlrm(cfg, gen.batches(), 24,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                     dense_lr=0.05, mesh=mesh, plan=plan, log_every=8,
                     evict_every=8, evict_threshold=0.3, freq_decay=0.5,
                     verbose=False)
    assert res.losses[-1] < res.losses[0] + 0.05
    assert res.evicted_rows > 0
    # Evicted rows are actually ZERO rows somewhere in the placed groups
    # (trained/init rows are never exactly the zero vector; uniform init
    # has no zero rows).
    pt = res.model.tables
    repl_zero = (np.abs(np.asarray(pt.repl)).sum(axis=1) == 0.0).sum()
    sh = pt.shard.unshard()[:1024]
    shard_zero = (np.abs(np.asarray(sh)).sum(axis=1) == 0.0).sum()
    assert repl_zero + shard_zero > 0


def test_evict_rows_planned_layouts():
    from embeddingtables_tpu.parallel.planner import evict_rows_planned
    mesh = _mesh()
    vocabs = (64, 4096, 96)
    plan = plan_sharding(vocabs, DIM, mesh, replicate_max_bytes=DIM * 4 * 128)
    rng = np.random.default_rng(2)
    arrs = [jnp.asarray(rng.normal(size=(v, DIM)).astype(np.float32))
            for v in vocabs]
    accs = [jnp.asarray(rng.uniform(1, 2, v).astype(np.float32))
            for v in vocabs]
    pt = PlannedTables.from_tables(plan, mesh, arrs, accums=accs)
    cold = [np.array([3, 10]), np.array([100, 2000]), np.array([], np.int64)]
    new = evict_rows_planned(pt, cold)
    for t, c in enumerate(cold):
        got = np.asarray(new.table(t))
        want = np.asarray(arrs[t]).copy()
        want[np.asarray(c, np.int64)] = 0.0
        np.testing.assert_allclose(got, want, rtol=1e-6)
    # Accums zeroed at the same rows.
    assert float(np.asarray(new.repl_accum)[3]) == 0.0
    acc = np.asarray(new.shard_accum)
    n, rows = acc.shape
    acc_full = acc.T.reshape(n * rows)[:vocabs[1]]
    assert acc_full[100] == 0.0 and acc_full[2000] == 0.0 and acc_full[0] > 0


# ---------------------------------------------------------------------------
# COL_SHARD: the third placement
# ---------------------------------------------------------------------------

def test_plan_col_shard_placement_and_accounting():
    from embeddingtables_tpu.parallel.planner import COL_SHARD
    mesh = _mesh()
    n = mesh.devices.size
    plan = plan_sharding([100, 1_000_000, 500], DIM, mesh, col_shard=[2],
                         opt_state_scalars=1)
    p = [d.placement for d in plan.decisions]
    assert p == [REPLICATE, ROW_SHARD, COL_SHARD]
    assert plan.col_sharded == (2,)
    assert plan.decisions[2].bytes_per_device == 500 * (-(-DIM // n)) * 4
    assert "col-sharded" in plan.summary()
    with pytest.raises(ValueError, match="out of range"):
        plan_sharding([100], DIM, mesh, col_shard=[5])
    with pytest.raises(NotImplementedError, match="single-axis"):
        plan_sharding([100, 200], DIM,
                      default_mesh(("data", "model"), shape=(4, 2)),
                      axis=("data", "model"), col_shard=[0])


@pytest.mark.parametrize("opt_name,bag,pad", [("sgd", None, None),
                                              ("adagrad", 3, None),
                                              ("adagrad", 3, -1),
                                              ("sgd", 3, -1)])
def test_three_way_placement_parity(opt_name, bag, pad):
    """replicate + row-shard + col-shard in ONE plan: lookup and update
    match the single-chip fused contract on every table, with bags, pads,
    and AdaGrad state on all three groups."""
    from embeddingtables_tpu.ops.lookup import lookup_oracle, lookup_vjp
    mesh = _mesh()
    vocabs = (100, 1_000_000 // 256, 500)  # keep the test fast
    plan = plan_sharding(list(vocabs), DIM, mesh, col_shard=[2],
                         replicate_max_bytes=DIM * 4 * 128)
    assert plan.replicated and plan.sharded and plan.col_sharded
    rng = np.random.default_rng(hash((opt_name, bag, pad)) % 2**31)
    arrs = [jnp.asarray(rng.standard_normal((v, DIM)).astype(np.float32))
            for v in vocabs]
    opt = (SparseSGD(0.3) if opt_name == "sgd"
           else SparseRowWiseAdaGrad(lr=0.3, eps=1e-6))
    adagrad = opt_name == "adagrad"
    pt = PlannedTables.from_tables(plan, mesh, arrs, adagrad=adagrad)

    b = 32
    shape = (b,) if bag is None else (b, bag)
    cat = [rng.integers(0, v, shape).astype(np.int32) for v in vocabs]
    if pad is not None:
        cat = [np.where(rng.random(shape) < 0.3, pad, c) for c in cat]
    cat = [jnp.asarray(c) for c in cat]
    combiner = "mean" if pad is not None and bag is not None else "sum"

    out = planned_lookup(mesh, pt, cat, combiner=combiner, pad_idx=pad)
    for t in range(3):
        exp = lookup_oracle(arrs[t], cat[t], combiner, None, pad_idx=pad)
        np.testing.assert_allclose(np.asarray(out[t]), np.asarray(exp),
                                   rtol=2e-5, atol=1e-5, err_msg=f"t={t}")

    deltas = jnp.stack([jnp.asarray(
        rng.standard_normal((b, DIM)).astype(np.float32)) for _ in range(3)])
    pt2 = planned_apply(mesh, pt, cat, deltas, opt, combiner=combiner,
                        pad_idx=pad)
    for t in range(3):
        _, pb = lookup_vjp(arrs[t], cat[t], combiner=combiner, pad_idx=pad)
        upd = pb(deltas[t])
        if adagrad:
            exp, _ = opt.apply(arrs[t], upd, opt.init(arrs[t]))
        else:
            from embeddingtables_tpu.ops.sparse_update import sgd_update
            exp = sgd_update(arrs[t], upd, 0.3)
        np.testing.assert_allclose(np.asarray(pt2.table(t)),
                                   np.asarray(exp), rtol=2e-4, atol=1e-6,
                                   err_msg=f"t={t}")


def test_col_shard_eviction_on_plan():
    from embeddingtables_tpu.parallel.planner import evict_rows_planned
    mesh = _mesh()
    vocabs = (100, 8000, 64)
    plan = plan_sharding(list(vocabs), DIM, mesh, col_shard=[2],
                         replicate_max_bytes=DIM * 4 * 128)
    rng = np.random.default_rng(3)
    arrs = [jnp.asarray(rng.standard_normal((v, DIM)).astype(np.float32))
            for v in vocabs]
    pt = PlannedTables.from_tables(plan, mesh, arrs, adagrad=True)
    cold = [np.array([], np.int64), np.array([5], np.int64),
            np.array([3, 60], np.int64)]
    pt2 = evict_rows_planned(pt, cold)
    t2 = np.asarray(pt2.table(2))
    assert np.all(t2[3] == 0.0) and np.all(t2[60] == 0.0)
    assert np.all(t2[4] == np.asarray(arrs[2])[4])
    assert np.all(np.asarray(pt2.col_accum)[[3, 60]] == 0.0)


def test_skew_driven_col_shard():
    from embeddingtables_tpu.parallel.planner import (COL_SHARD,
                                                      skew_from_trackers)
    from embeddingtables_tpu.utils.rowstats import FrequencyTracker
    mesh = _mesh()
    big = 1_000_000
    # Table 1 would row-shard; 40% of its traffic on one row -> col-shard.
    # Table 0 replicates regardless (small); table 2 row-shards (no skew).
    plan = plan_sharding([100, big, big], DIM, mesh,
                         skew=[0.0, 0.4, 0.001])
    p = [d.placement for d in plan.decisions]
    assert p == [REPLICATE, COL_SHARD, ROW_SHARD]
    assert "skew 40%" in plan.summary()
    # skew_from_trackers: hottest-row share of decayed traffic; silent
    # tables report 0 (unknown != skewed).
    trs = [FrequencyTracker(10), FrequencyTracker(10),
           FrequencyTracker(1000)]
    trs[1].observe(np.array([3, 3, 3, 3, 7, 1, 2, 4, 5, 6], np.int64))
    trs[2].observe(np.arange(1000, dtype=np.int64))  # flat: 0.1% share
    skew = skew_from_trackers(trs)
    assert skew[0] == 0.0
    assert abs(skew[1] - 0.4) < 1e-6
    assert abs(skew[2] - 0.001) < 1e-6
    plan2 = plan_sharding([100, big, big], DIM, mesh, skew=skew)
    assert plan2.decisions[1].placement == COL_SHARD
    assert plan2.decisions[2].placement == ROW_SHARD
