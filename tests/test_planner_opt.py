"""Planner placements with lazy Adam / FTRL: the optimizer x placement
matrix closure on the planner side. Every test drives all THREE placements
(replicate + row-shard + col-shard) against the single-chip optimizer
oracle — multi-step, so state divergence cannot hide."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.ops.sparse_update import SparseEmbeddingUpdate
from embeddingtables_tpu.optim import (SparseAdamState, SparseFTRL,
                                       SparseFTRLState, SparseLazyAdam,
                                       SparseRowWiseAdaGrad, SparseSGD)
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.parallel.planner import (PlannedTables,
                                                  plan_sharding,
                                                  planned_apply,
                                                  planned_lookup,
                                                  planned_row_state,
                                                  place_stacked_on_plan)

DIM = 16


def _mesh():
    return default_mesh(("data",))


def make_opt(name):
    return {
        "adam": lambda: SparseLazyAdam(lr=0.05, b1=0.9, b2=0.99),
        "adam_reg": lambda: SparseLazyAdam(lr=0.05, weight_decay=0.01,
                                           clipnorm=1.0),
        "ftrl": lambda: SparseFTRL(lr=0.2, l1=0.002, l2=0.01),
    }[name]()


def _three_way_setup(seed=0):
    """repl + row-shard + col-shard plan over three tables."""
    mesh = _mesh()
    vocabs = (64, 4096, 96)
    plan = plan_sharding(vocabs, DIM, mesh,
                         replicate_max_bytes=DIM * 4 * 80,
                         col_shard=[2])
    places = [d.placement for d in plan.decisions]
    assert places == ["replicate", "row_shard", "col_shard"], places
    rng = np.random.default_rng(seed)
    arrs = [jnp.asarray(rng.normal(size=(v, DIM)).astype(np.float32))
            for v in vocabs]
    return mesh, vocabs, plan, arrs, rng


@pytest.mark.parametrize("opt_name", ["adam", "adam_reg", "ftrl"])
@pytest.mark.parametrize("bag", [None, 2])
def test_planned_apply_opt_matches_single_chip(opt_name, bag):
    mesh, vocabs, plan, arrs, rng = _three_way_setup(
        seed=hash((opt_name, bag)) % 2**31)
    opt = make_opt(opt_name)
    pt = PlannedTables.from_tables(plan, mesh, arrs)
    ra, sa, ca = planned_row_state(mesh, pt, opt)
    pt = dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                             col_accum=ca)
    datas = list(arrs)
    states = [opt.init(a) for a in arrs]
    for i in range(3):
        shape = (16,) if bag is None else (16, bag)
        idx = [jnp.asarray(rng.integers(0, v, shape).astype(np.int32))
               for v in vocabs]
        delta_t = jnp.asarray(
            rng.normal(size=(3, 16, DIM)).astype(np.float32))
        pt = planned_apply(mesh, pt, idx, delta_t, opt)
        for t in range(3):
            upd = SparseEmbeddingUpdate(delta=delta_t[t], indices=idx[t])
            datas[t], states[t] = opt.apply(datas[t], upd, states[t])
    for t in range(3):
        np.testing.assert_allclose(np.asarray(pt.table(t)),
                                   np.asarray(datas[t]),
                                   rtol=2e-4, atol=1e-6)
    if opt_name.startswith("adam"):
        assert int(pt.repl_accum[2]) == 3      # repl count
        assert int(pt.shard_accum[2]) == 3     # shard count
        assert int(pt.col_accum[2]) == 3       # col count


def test_planned_lookup_after_opt_untouched():
    """Lookup parity is preserved on planned tables carrying Adam state."""
    mesh, vocabs, plan, arrs, rng = _three_way_setup(seed=5)
    opt = make_opt("adam")
    pt = PlannedTables.from_tables(plan, mesh, arrs)
    ra, sa, ca = planned_row_state(mesh, pt, opt)
    pt = dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                             col_accum=ca)
    idx = [jnp.asarray(rng.integers(0, v, 16).astype(np.int32))
           for v in vocabs]
    out = planned_lookup(mesh, pt, idx)
    for t in range(3):
        np.testing.assert_allclose(
            np.asarray(out[t]), np.asarray(arrs[t])[np.asarray(idx[t])],
            rtol=1e-6)


def test_planned_resume_carries_adam_state():
    """place_stacked_on_plan with a trained SparseAdamState: the next
    planned step must match the single-chip continuation exactly."""
    from embeddingtables_tpu.ops.ensemble import StackedTables
    mesh, vocabs, plan, arrs, rng = _three_way_setup(seed=9)
    opt = make_opt("adam")
    stacked = StackedTables.stack([a for a in arrs])
    # "Train" two single-chip steps to get non-trivial state.
    data = stacked.data
    state = opt.init(data)
    offs = stacked.offsets
    for i in range(2):
        rows = jnp.asarray(rng.integers(0, data.shape[0], 64), jnp.int32)
        delta = jnp.asarray(rng.normal(size=(64, DIM)).astype(np.float32))
        data, state = opt.apply(
            data, SparseEmbeddingUpdate(delta=delta, indices=rows), state)
    stacked = dataclasses.replace(stacked, data=data)
    pt = place_stacked_on_plan(plan, mesh, stacked, state, opt)
    assert isinstance(pt.repl_accum, tuple) and len(pt.repl_accum) == 3
    assert int(pt.repl_accum[2]) == 2
    # One more step on both paths.
    idx = [jnp.asarray(rng.integers(0, v, 16).astype(np.int32))
           for v in vocabs]
    delta_t = jnp.asarray(rng.normal(size=(3, 16, DIM)).astype(np.float32))
    pt2 = planned_apply(mesh, pt, idx, delta_t, opt)
    datas = [data[offs[t]:offs[t + 1]] for t in range(3)]
    for t in range(3):
        st_t = SparseAdamState(m=state.m[offs[t]:offs[t + 1]],
                               v=state.v[offs[t]:offs[t + 1]],
                               count=state.count)
        want, _ = opt.apply(datas[t], SparseEmbeddingUpdate(
            delta=delta_t[t], indices=idx[t]), st_t)
        np.testing.assert_allclose(np.asarray(pt2.table(t)),
                                   np.asarray(want), rtol=2e-4, atol=1e-6)


def test_planned_resume_carries_ftrl_state():
    from embeddingtables_tpu.ops.ensemble import StackedTables
    mesh, vocabs, plan, arrs, rng = _three_way_setup(seed=13)
    opt = make_opt("ftrl")
    stacked = StackedTables.stack([a for a in arrs])
    data = stacked.data
    state = opt.init(data)
    rows = jnp.asarray(rng.integers(0, data.shape[0], 64), jnp.int32)
    delta = jnp.asarray(rng.normal(size=(64, DIM)).astype(np.float32))
    data, state = opt.apply(
        data, SparseEmbeddingUpdate(delta=delta, indices=rows), state)
    stacked = dataclasses.replace(stacked, data=data)
    pt = place_stacked_on_plan(plan, mesh, stacked, state, opt)
    assert isinstance(pt.repl_accum, tuple) and len(pt.repl_accum) == 2
    offs = stacked.offsets
    idx = [jnp.asarray(rng.integers(0, v, 16).astype(np.int32))
           for v in vocabs]
    delta_t = jnp.asarray(rng.normal(size=(3, 16, DIM)).astype(np.float32))
    pt2 = planned_apply(mesh, pt, idx, delta_t, opt)
    for t in range(3):
        st_t = SparseFTRLState(z=state.z[offs[t]:offs[t + 1]],
                               n=state.n[offs[t]:offs[t + 1]])
        want, _ = opt.apply(data[offs[t]:offs[t + 1]],
                            SparseEmbeddingUpdate(delta=delta_t[t],
                                                  indices=idx[t]), st_t)
        np.testing.assert_allclose(np.asarray(pt2.table(t)),
                                   np.asarray(want), rtol=2e-4, atol=1e-6)


def test_planned_eviction_resets_adam_state():
    from embeddingtables_tpu.parallel.planner import evict_rows_planned
    mesh, vocabs, plan, arrs, rng = _three_way_setup(seed=17)
    opt = make_opt("adam")
    pt = PlannedTables.from_tables(plan, mesh, arrs)
    ra, sa, ca = planned_row_state(mesh, pt, opt)
    # Pretend moments are nonzero everywhere.
    ra = (jnp.ones_like(ra[0]), jnp.ones_like(ra[1]), jnp.asarray(4))
    sa = (jnp.ones_like(sa[0]), jnp.ones_like(sa[1]), jnp.asarray(4))
    ca = (jnp.ones_like(ca[0]), jnp.ones_like(ca[1]), jnp.asarray(4))
    pt = dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                             col_accum=ca)
    cold = [np.asarray([3]), np.asarray([100, 7]), np.asarray([11])]
    pt2 = evict_rows_planned(pt, cold)
    # Repl group (table 0 at repl offset 0): row 3 zeroed.
    assert np.all(np.asarray(pt2.repl_accum[0][3]) == 0.0)
    assert np.all(np.asarray(pt2.repl_accum[0][4]) == 1.0)
    assert int(pt2.repl_accum[2]) == 4
    # Shard group (table 1): global rows 100, 7 -> (shard, slot).
    n = pt.shard.n_shards
    for r in (100, 7):
        assert np.all(np.asarray(pt2.shard_accum[0][r % n, r // n]) == 0.0)
    # Col group (table 2, col offset 0): row 11 zeroed in every slice.
    assert np.all(np.asarray(pt2.col_accum[0][:, 11, :]) == 0.0)
    assert np.all(np.asarray(pt2.col_accum[0][:, 12, :]) == 1.0)
    # Tables themselves zeroed too.
    assert np.all(np.asarray(pt2.table(0))[3] == 0.0)
    assert np.all(np.asarray(pt2.table(2))[11] == 0.0)


def test_planned_train_step_adam_matches_single_chip():
    """End to end: PlannedDLRM + lazy Adam = the single-chip DLRM step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from embeddingtables_tpu.models import (DLRMConfig, init_dlrm,
                                            make_train_step)
    from embeddingtables_tpu.parallel.dlrm import batch_shardings
    from embeddingtables_tpu.parallel.planner import (
        PlannedDLRM, make_planned_eval_step, make_planned_train_step)
    mesh = _mesh()
    vocabs = (64, 4096, 96)
    plan = plan_sharding(vocabs, DIM, mesh,
                         replicate_max_bytes=DIM * 4 * 80, col_shard=[2])
    cfg = DLRMConfig(vocab_sizes=vocabs, num_dense=4, dim=DIM,
                     bottom_mlp=(16, DIM), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = lambda: SparseLazyAdam(lr=0.05)  # noqa: E731
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt())
    offs = model.tables.offsets
    pt = place_stacked_on_plan(plan, mesh, model.tables, model.emb_state,
                               opt())
    repl = NamedSharding(mesh, P())
    pm = PlannedDLRM(bottom=jax.device_put(model.bottom, repl),
                     top=jax.device_put(model.top, repl),
                     tables=pt, config=cfg)
    step1 = make_train_step(cfg, sparse_opt=opt(), dense_lr=0.3, jit=False)
    stepN = make_planned_train_step(cfg, mesh, sparse_opt=opt(),
                                    dense_lr=0.3)
    sd, sc, sl = batch_shardings(mesh, "data")
    rng = np.random.default_rng(1)
    for i in range(2):
        dense = rng.normal(size=(32, 4)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 32).astype(np.int32)
                        for v in vocabs])
        label = rng.integers(0, 2, 32).astype(np.float32)
        model, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                             jnp.asarray(label))
        pm, lossN = stepN(pm, jax.device_put(dense, sd),
                          jax.device_put(cat, sc),
                          jax.device_put(label, sl))
        np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    for t in range(3):
        want = np.asarray(model.tables.data[offs[t]:offs[t + 1]])
        np.testing.assert_allclose(np.asarray(pm.tables.table(t)), want,
                                   rtol=2e-4, atol=1e-6)


def test_mixed_dim_planner_adam():
    """Mixed feature dims x lazy Adam: per-group state via
    MixedDimPlannedTables(sparse_opt=), per-table parity vs single-chip."""
    from embeddingtables_tpu.parallel.planner import (
        MixedDimPlannedTables, mixed_planned_apply, mixed_planned_lookup,
        plan_sharding_mixed)
    mesh = _mesh()
    vocabs = (64, 2048, 96, 80)
    dims = (8, 16, 8, 16)
    plans, groups = plan_sharding_mixed(vocabs, dims, mesh,
                                        replicate_max_bytes=16 * 4 * 80)
    rng = np.random.default_rng(29)
    arrs = [jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
            for v, d in zip(vocabs, dims)]
    opt = make_opt("adam")
    mt = MixedDimPlannedTables.from_tables(plans, groups, mesh, arrs,
                                           sparse_opt=opt)
    datas = list(arrs)
    states = [opt.init(a) for a in arrs]
    for i in range(2):
        idx = [jnp.asarray(rng.integers(0, v, 16).astype(np.int32))
               for v in vocabs]
        deltas = [jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
                  for d in dims]
        mt = mixed_planned_apply(mesh, mt, idx, deltas, opt)
        for t in range(4):
            upd = SparseEmbeddingUpdate(delta=deltas[t], indices=idx[t])
            datas[t], states[t] = opt.apply(datas[t], upd, states[t])
    for t in range(4):
        np.testing.assert_allclose(np.asarray(mt.table(t)),
                                   np.asarray(datas[t]),
                                   rtol=2e-4, atol=1e-6)
    out = mixed_planned_lookup(mesh, mt, [jnp.zeros(8, jnp.int32)] * 4)
    assert [o.shape for o in out] == [(8, d) for d in dims]


def test_planned_microbatch_matches_monolithic():
    """Planner + gradient accumulation: the scanned planned_lookup + dense
    fwd/bwd matches the monolithic planned step (ONE planned_apply)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.parallel.dlrm import batch_shardings
    from embeddingtables_tpu.parallel.planner import (
        PlannedDLRM, make_planned_train_step)
    mesh = _mesh()
    vocabs = (64, 4096, 96)
    plan = plan_sharding(vocabs, DIM, mesh,
                         replicate_max_bytes=DIM * 4 * 80, col_shard=[2])
    cfg = DLRMConfig(vocab_sizes=vocabs, num_dense=4, dim=DIM,
                     bottom_mlp=(16, DIM), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = lambda: SparseRowWiseAdaGrad(lr=0.2)  # noqa: E731

    def build(microbatch):
        model = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt())
        pt = place_stacked_on_plan(plan, mesh, model.tables,
                                   model.emb_state, opt())
        repl = NamedSharding(mesh, P())
        pm = PlannedDLRM(bottom=jax.device_put(model.bottom, repl),
                         top=jax.device_put(model.top, repl),
                         tables=pt, config=cfg)
        return pm, make_planned_train_step(cfg, mesh, sparse_opt=opt(),
                                           dense_lr=0.2,
                                           microbatch=microbatch)

    m_mono, step_mono = build(None)
    m_micro, step_micro = build(4)
    sd, sc, sl = batch_shardings(mesh, "data")
    rng = np.random.default_rng(41)
    dense = rng.normal(size=(32, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 32).astype(np.int32)
                    for v in vocabs])
    label = rng.integers(0, 2, 32).astype(np.float32)
    args = (jax.device_put(dense, sd), jax.device_put(cat, sc),
            jax.device_put(label, sl))
    m_mono, loss_a = step_mono(m_mono, *args)
    m_micro, loss_b = step_micro(m_micro, *args)
    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-5)
    for t in range(3):
        np.testing.assert_allclose(np.asarray(m_micro.tables.table(t)),
                                   np.asarray(m_mono.tables.table(t)),
                                   rtol=2e-4, atol=1e-6)
