"""PlannedDeepFM: the planner's mixed placement hosting DeepFM's FUSED
stack (round 4 — enabled by the fold: one (ΣV, D+1) stack is exactly the
planner's one-stack shape; the legacy two-stack layout is rejected).

Parity pattern mirrors tests/test_planner.py's PlannedDLRM coverage:
single-chip folded step == planned step on a genuinely mixed
replicate/row-shard/col-shard plan, for SGD and row-wise AdaGrad, plus
the init path (zero first-order column on every group) and the
train_deepfm(plan=) loop."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.models.deepfm import (DeepFMConfig, init_deepfm,
                                               make_eval_step,
                                               make_train_step)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.parallel.planner import (
    PlannedDeepFM, init_planned_deepfm, make_planned_deepfm_eval_step,
    make_planned_deepfm_train_step, place_stacked_on_plan, plan_sharding)

CFG = DeepFMConfig(vocab_sizes=(50, 900, 70), num_dense=4, dim=8,
                   deep_mlp=(16, 8), compute_dtype=jnp.float32)


def _mesh():
    return default_mesh(("data",))


def _plan(mesh, **kw):
    # dim = cfg.stack_dim: the plan places the FUSED stack.
    kw.setdefault("replicate_max_bytes", CFG.stack_dim * 4 * 128)
    return plan_sharding(CFG.vocab_sizes, CFG.stack_dim, mesh, **kw)


def _batch(rng, b=32):
    dense = rng.normal(size=(b, CFG.num_dense)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                    for v in CFG.vocab_sizes])
    label = rng.integers(0, 2, b).astype(np.float32)
    return dense, cat, label


@pytest.mark.parametrize("opt_name", ["sgd", "adagrad"])
def test_planned_deepfm_step_matches_single_chip(opt_name):
    from embeddingtables_tpu.parallel.dlrm import batch_shardings
    mesh = _mesh()
    make_opt = (lambda: SparseSGD(0.3)) if opt_name == "sgd" else \
        (lambda: SparseRowWiseAdaGrad(lr=0.3, eps=1e-6))
    # Genuinely mixed three-way plan: table 0 replicated (small), table 1
    # row-sharded (big), table 2 forced col-sharded.
    plan = _plan(mesh, col_shard=[2])
    assert plan.replicated and plan.sharded and plan.col_sharded

    model = init_deepfm(jax.random.key(0), CFG, sparse_opt=make_opt())
    rng = np.random.default_rng(1)
    dense, cat, label = _batch(rng)

    step1 = make_train_step(CFG, sparse_opt=make_opt(), dense_lr=0.3,
                            jit=False)
    m1, loss1 = step1(model, jnp.asarray(dense), jnp.asarray(cat),
                      jnp.asarray(label))

    ref = init_deepfm(jax.random.key(0), CFG, sparse_opt=make_opt())
    pt = place_stacked_on_plan(plan, mesh, ref.tables, ref.emb_state,
                               make_opt())
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    pm = PlannedDeepFM(deep=jax.device_put(ref.deep, repl),
                       head=jax.device_put(ref.head, repl),
                       dense_w=jax.device_put(ref.dense_w, repl),
                       bias=jax.device_put(ref.bias, repl),
                       tables=pt, config=CFG)
    sd, sc, sl = batch_shardings(mesh, "data")
    stepN = make_planned_deepfm_train_step(CFG, mesh, sparse_opt=make_opt(),
                                           dense_lr=0.3)
    pmN, lossN = stepN(pm, jax.device_put(dense, sd),
                       jax.device_put(cat, sc), jax.device_put(label, sl))
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-5)
    offs = m1.tables.offsets
    for t in range(CFG.num_tables):
        want = np.asarray(m1.tables.data[offs[t]:offs[t + 1]])
        np.testing.assert_allclose(np.asarray(pmN.tables.table(t)), want,
                                   rtol=2e-4, atol=1e-6)
    # Eval parity on the updated model (fused split inside both paths).
    want = make_eval_step(CFG)(m1, jnp.asarray(dense), jnp.asarray(cat))
    got = make_planned_deepfm_eval_step(CFG, mesh)(
        pmN, jax.device_put(dense, sd), jax.device_put(cat, sc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_init_planned_deepfm_zero_w_column_and_learns():
    from embeddingtables_tpu.parallel.dlrm import batch_shardings
    mesh = _mesh()
    plan = _plan(mesh, col_shard=[2])
    opt = SparseRowWiseAdaGrad(lr=0.1)
    pm = init_planned_deepfm(jax.random.key(2), CFG, plan, mesh,
                             sparse_opt=opt)
    # Column 0 (first-order weights) zero on EVERY placement group;
    # vector columns not.
    for t in range(CFG.num_tables):
        arr = np.asarray(pm.tables.table(t))
        assert arr.shape == (CFG.vocab_sizes[t], CFG.stack_dim)
        assert np.all(arr[:, 0] == 0.0), t
        assert np.any(arr[:, 1:] != 0.0), t
    step = make_planned_deepfm_train_step(CFG, mesh, sparse_opt=opt,
                                          dense_lr=0.1)
    sd, sc, sl = batch_shardings(mesh, "data")
    rng = np.random.default_rng(5)
    losses = []
    for _ in range(12):
        dense, cat, _ = _batch(rng, b=64)
        label = (cat[0] % 2).astype(np.float32)
        pm, loss = step(pm, jax.device_put(dense, sd),
                        jax.device_put(cat, sc), jax.device_put(label, sl))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_train_deepfm_plan_loop_and_resume():
    """train_deepfm(plan=): fresh planned init AND resuming a single-chip
    folded model onto the plan both run; loss falls; eval works."""
    from embeddingtables_tpu.models.train import train_deepfm
    mesh = _mesh()
    plan = _plan(mesh)
    rng = np.random.default_rng(9)

    def batches():
        while True:
            dense, cat, _ = _batch(rng, b=64)
            yield dict(dense=dense, cat=cat,
                       label=(cat[0] % 2).astype(np.float32))

    eval_batches = [next(batches()) for _ in range(2)]
    res = train_deepfm(CFG, batches(), 8, sparse_opt=SparseRowWiseAdaGrad(
        lr=0.1), dense_lr=0.05, mesh=mesh, plan=plan, log_every=0,
        eval_batches=eval_batches, eval_every=8, verbose=False)
    assert isinstance(res.model, PlannedDeepFM)
    assert np.isfinite(res.losses[-1]) if res.losses else True
    assert res.aucs and 0.0 <= res.aucs[-1][1] <= 1.0

    # Resume: a trained single-chip FOLDED model carries onto the plan.
    m1 = init_deepfm(jax.random.key(4), CFG,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.1))
    res2 = train_deepfm(CFG, batches(), 4,
                        sparse_opt=SparseRowWiseAdaGrad(lr=0.1),
                        dense_lr=0.05, mesh=mesh, plan=plan, model=m1,
                        log_every=0, verbose=False)
    assert isinstance(res2.model, PlannedDeepFM)


def test_planned_deepfm_rejects_legacy_layout():
    mesh = _mesh()
    cfg_legacy = dataclasses.replace(CFG, fold_fm_w=False)
    plan = plan_sharding(cfg_legacy.vocab_sizes, cfg_legacy.dim, mesh)
    with pytest.raises(ValueError, match="folded"):
        init_planned_deepfm(jax.random.key(0), cfg_legacy, plan, mesh)
    with pytest.raises(ValueError, match="folded"):
        make_planned_deepfm_train_step(cfg_legacy, mesh)
    # And a plan built with the WRONG dim (D instead of D+1) is rejected.
    bad_plan = plan_sharding(CFG.vocab_sizes, CFG.dim, mesh)
    with pytest.raises(ValueError, match="stack_dim"):
        init_planned_deepfm(jax.random.key(0), CFG, bad_plan, mesh)
