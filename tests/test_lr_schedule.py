"""Learning-rate schedules: traced per-step lr through the train steps.

The reference's update! is fixed-eta SGD; schedules are a production
obligation the engine adds. The lr enters the jitted step as a TRACED
scalar (zero recompiles across steps) and must produce exactly the same
math as rebuilding the optimizer at each step's lr — verified against a
manual per-step `apply(lr=)` oracle, single-chip and on the mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.models import DLRMConfig, init_dlrm, make_train_step
from embeddingtables_tpu.optim import (SparseFTRL, SparseLazyAdam,
                                       SparseRowWiseAdaGrad, SparseSGD,
                                       warmup_constant_lr, warmup_cosine_lr)
from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                               make_sharded_train_step,
                                               shard_dlrm, unshard_dlrm)
from embeddingtables_tpu.parallel.mesh import default_mesh


def tiny_cfg(**kw):
    kw.setdefault("vocab_sizes", (64, 96))
    kw.setdefault("num_dense", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("bottom_mlp", (16, 8))
    kw.setdefault("top_mlp", (16, 1))
    kw.setdefault("compute_dtype", jnp.float32)
    return DLRMConfig(**kw)


def batch(cfg, seed, b=32):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(b, cfg.num_dense)).astype(np.float32),
            np.stack([rng.integers(0, v, b).astype(np.int32)
                      for v in cfg.vocab_sizes]),
            rng.integers(0, 2, b).astype(np.float32))


def test_schedule_shapes():
    s = warmup_cosine_lr(0.1, total_steps=100, warmup_steps=10)
    assert s(0) == pytest.approx(0.01)
    assert s(9) == pytest.approx(0.1)
    assert s(10) == pytest.approx(0.1)       # cosine starts at base
    assert s(100) == pytest.approx(0.0, abs=1e-9)
    assert s(55) == pytest.approx(0.1 * 0.5, rel=1e-2)
    c = warmup_constant_lr(0.2, 4)
    assert c(0) == pytest.approx(0.05)
    assert c(3) == pytest.approx(0.2)
    assert c(1000) == pytest.approx(0.2)


@pytest.mark.parametrize("opt_name", ["sgd", "adagrad", "adam"])
def test_single_chip_scheduled_lr_matches_manual(opt_name):
    """step(..., lr) == rebuilding at that lr manually, over a varying
    schedule (state carried across the lr change must stay consistent)."""
    cfg = tiny_cfg()
    make = {"sgd": lambda: SparseSGD(0.5),
            "adagrad": lambda: SparseRowWiseAdaGrad(lr=0.5),
            "adam": lambda: SparseLazyAdam(lr=0.5)}[opt_name]
    lrs = [0.05, 0.2, 0.5]
    m_sched = init_dlrm(jax.random.key(0), cfg, sparse_opt=make())
    m_manual = init_dlrm(jax.random.key(0), cfg, sparse_opt=make())
    step = make_train_step(cfg, sparse_opt=make(), dense_lr=0.1, jit=True)
    for i, lr in enumerate(lrs):
        d, c, l = batch(cfg, seed=50 + i)
        m_sched, loss_a = step(m_sched, jnp.asarray(d), jnp.asarray(c),
                               jnp.asarray(l), jnp.float32(lr))
        # Manual oracle: a fresh step whose optimizer is built AT this lr
        # (jit=False; state carries over).
        import dataclasses as dc
        manual_opt = dc.replace(make(), lr=lr)
        manual_step = make_train_step(cfg, sparse_opt=manual_opt,
                                      dense_lr=0.1, jit=False)
        m_manual, loss_b = manual_step(m_manual, jnp.asarray(d),
                                       jnp.asarray(c), jnp.asarray(l))
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_sched.tables.data),
                               np.asarray(m_manual.tables.data),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("opt_name", ["adagrad", "adam"])
def test_sharded_scheduled_lr_matches_single_chip(opt_name):
    """The traced lr rides the gather exchange identically on the mesh."""
    cfg = tiny_cfg()
    make = {"adagrad": lambda: SparseRowWiseAdaGrad(lr=0.5),
            "adam": lambda: SparseLazyAdam(lr=0.5)}[opt_name]
    sched = warmup_cosine_lr(0.3, total_steps=10, warmup_steps=2)
    mesh = default_mesh(("data",))
    m1 = init_dlrm(jax.random.key(0), cfg, sparse_opt=make())
    mN = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=make()),
                    mesh, "data", sparse_opt=make())
    step1 = make_train_step(cfg, sparse_opt=make(), dense_lr=0.1, jit=False)
    stepN = make_sharded_train_step(cfg, mesh, "data", sparse_opt=make(),
                                    dense_lr=0.1, jit=True)
    sd, sc, sl = batch_shardings(mesh, "data")
    for i in range(3):
        d, c, l = batch(cfg, seed=70 + i)
        lr = jnp.float32(sched(i))
        m1, loss_a = step1(m1, jnp.asarray(d), jnp.asarray(c),
                           jnp.asarray(l), lr)
        mN, loss_b = stepN(mN, jax.device_put(d, sd), jax.device_put(c, sc),
                           jax.device_put(l, sl), lr)
        np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-5)
    got = unshard_dlrm(mN)
    np.testing.assert_allclose(np.asarray(got.tables.data),
                               np.asarray(m1.tables.data),
                               rtol=2e-4, atol=1e-6)


def test_train_loop_with_schedule_learns():
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_dlrm
    cfg = tiny_cfg(num_dense=13)
    gen = SyntheticCriteo(vocab_sizes=cfg.vocab_sizes, batch_size=64)
    res = train_dlrm(cfg, iter(gen.batches()), 12,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.1),
                     lr_schedule=warmup_cosine_lr(0.1, 12, warmup_steps=3),
                     log_every=1, verbose=False)
    assert np.isfinite(res.losses[-1])
    assert res.losses[-1] < res.losses[0]


def test_ftrl_rejects_schedule():
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    opt = SparseFTRL(lr=0.1)
    mN = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt),
                    mesh, "data", sparse_opt=opt)
    stepN = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt,
                                    dense_lr=0.1, jit=False)
    sd, sc, sl = batch_shardings(mesh, "data")
    d, c, l = batch(cfg, seed=99)
    with pytest.raises(ValueError, match="cannot change lr"):
        stepN(mN, jax.device_put(d, sd), jax.device_put(c, sc),
              jax.device_put(l, sl), jnp.float32(0.05))
    # Same rejection on the a2a exchange and the planner path.
    stepA = make_sharded_train_step(cfg, mesh, "data", sparse_opt=opt,
                                    dense_lr=0.1, jit=False,
                                    exchange="a2a")
    with pytest.raises(ValueError, match="cannot change lr"):
        stepA(mN, jax.device_put(d, sd), jax.device_put(c, sc),
              jax.device_put(l, sl), jnp.float32(0.05))


@pytest.mark.parametrize("placement", ["a2a", "planner", "colshard"])
def test_scheduled_lr_everywhere(placement):
    """The traced lr reaches every placement: a2a butterfly, planner
    (three-way placement), and the column-sharded update — each matching
    the single-chip scheduled sequence."""
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    make = lambda: SparseRowWiseAdaGrad(lr=0.5)  # noqa: E731
    lrs = [0.05, 0.3]
    if placement == "colshard":
        from embeddingtables_tpu.ops.sparse_update import \
            SparseEmbeddingUpdate
        from embeddingtables_tpu.parallel.colshard import (
            ColShardedStackedTables, col_sharded_update, init_col_row_state)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rng = np.random.default_rng(3)
        data = jnp.asarray(rng.standard_normal((48, 16)).astype(np.float32))
        ct = ColShardedStackedTables.shard(mesh, "data", data)
        opt = make()
        acc_c = init_col_row_state(mesh, ct, opt)
        d1, s1 = data, opt.init(data)
        put = lambda x: jax.device_put(  # noqa: E731
            x, NamedSharding(mesh, P("data")))
        for lr in lrs:
            idx = rng.integers(0, 48, 32).astype(np.int32)
            delta = rng.standard_normal((32, 16)).astype(np.float32)
            upd1 = SparseEmbeddingUpdate(delta=jnp.asarray(delta),
                                         indices=jnp.asarray(idx))
            d1, s1 = opt.apply(d1, upd1, s1, lr=lr)
            updc = SparseEmbeddingUpdate(delta=put(jnp.asarray(delta)),
                                         indices=put(jnp.asarray(idx)))
            ct, acc_c = col_sharded_update(mesh, ct, updc, opt, acc_c,
                                           lr=jnp.float32(lr))
        np.testing.assert_allclose(np.asarray(ct.unshard()),
                                   np.asarray(d1), rtol=2e-4, atol=1e-6)
        return
    m1 = init_dlrm(jax.random.key(0), cfg, sparse_opt=make())
    step1 = make_train_step(cfg, sparse_opt=make(), dense_lr=0.1, jit=False)
    if placement == "a2a":
        mN = shard_dlrm(init_dlrm(jax.random.key(0), cfg,
                                  sparse_opt=make()),
                        mesh, "data", sparse_opt=make())
        stepN = make_sharded_train_step(cfg, mesh, "data",
                                        sparse_opt=make(), dense_lr=0.1,
                                        jit=False, exchange="a2a",
                                        capacity_factor=8.0)
        unshard = unshard_dlrm
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from embeddingtables_tpu.parallel.planner import (
            PlannedDLRM, make_planned_train_step, place_stacked_on_plan,
            plan_sharding)
        plan = plan_sharding(cfg.vocab_sizes, cfg.dim, mesh,
                             replicate_max_bytes=cfg.dim * 4 * 80,
                             col_shard=[1])
        pt = place_stacked_on_plan(plan, mesh, m1.tables, m1.emb_state,
                                   make())
        repl = NamedSharding(mesh, P())
        mN = PlannedDLRM(bottom=jax.device_put(m1.bottom, repl),
                         top=jax.device_put(m1.top, repl),
                         tables=pt, config=cfg)
        stepN = make_planned_train_step(cfg, mesh, sparse_opt=make(),
                                        dense_lr=0.1, jit=False)

        def unshard(m):
            return m
    sd, sc, sl = batch_shardings(mesh, "data")
    for i, lr in enumerate(lrs):
        d, c, l = batch(cfg, seed=80 + i)
        m1, loss_a = step1(m1, jnp.asarray(d), jnp.asarray(c),
                           jnp.asarray(l), jnp.float32(lr))
        mN, loss_b = stepN(mN, jax.device_put(d, sd),
                           jax.device_put(c, sc), jax.device_put(l, sl),
                           jnp.float32(lr))
        if placement == "a2a":
            loss_b, ovf = (loss_b if isinstance(loss_b, tuple)
                           else (loss_b, 0))
        np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-5)
    if placement == "a2a":
        got = unshard(mN)
        np.testing.assert_allclose(np.asarray(got.tables.data),
                                   np.asarray(m1.tables.data),
                                   rtol=2e-4, atol=1e-6)
    else:
        offs = m1.tables.offsets
        for t in range(len(cfg.vocab_sizes)):
            np.testing.assert_allclose(
                np.asarray(mN.tables.table(t)),
                np.asarray(m1.tables.data[offs[t]:offs[t + 1]]),
                rtol=2e-4, atol=1e-6)
