"""Planner placement for the two-tower family (round 5, VERDICT r4 item 5):
both row spaces (query feature stack, item corpus) behind
`plan_sharding`/`PlannedTables`, parity vs the single-chip trajectory —
the uniform table treatment every other family already has
(reference analog: one API surface for every table,
`/root/reference/src/EmbeddingTables.jl:49-156`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embeddingtables_tpu.models.two_tower import (TwoTowerConfig,
                                                  build_item_index,
                                                  init_two_tower,
                                                  make_train_step, retrieve)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.parallel.planner import (
    PlannedTwoTower, init_planned_two_tower, make_planned_tt_train_step,
    place_two_tower_on_plan, plan_sharding, planned_build_item_index,
    planned_retrieve)


CFG = TwoTowerConfig(query_vocab_sizes=(24, 300, 56), item_vocab=500,
                     num_dense=3, dim=8, embed_dim=8,
                     query_mlp=(16, 8), item_mlp=(16, 8))


def _plans(mesh, opt_scalars=0):
    # Mixed query placement: tiny tables replicate, the 300-row one shards.
    qp = plan_sharding(CFG.query_vocab_sizes, CFG.dim, mesh,
                       replicate_max_bytes=24 * CFG.dim * 4 + 1,
                       opt_state_scalars=opt_scalars)
    ip = plan_sharding([CFG.item_vocab], CFG.dim, mesh,
                       replicate_max_bytes=1,     # corpus row-shards
                       opt_state_scalars=opt_scalars)
    assert len(qp.replicated) >= 1 and len(qp.sharded) >= 1
    assert len(ip.sharded) == 1
    return qp, ip


def _batch(b, seed):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(b, CFG.num_dense)).astype(np.float32)
    q_cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                      for v in CFG.query_vocab_sizes])
    item_ids = rng.permutation(CFG.item_vocab)[:b].astype(np.int32)
    return dense, q_cat, item_ids


def _dense_tables(pt):
    return np.concatenate([np.asarray(pt.table(t))
                           for t in range(pt.ntables)], axis=0)


@pytest.mark.parametrize("opt_name", ["sgd", "adagrad"])
def test_planned_tt_step_matches_single_chip(opt_name):
    """Three planned contrastive steps track the single-chip trajectory
    (both tables, both MLPs, optimizer state) on a mixed placement."""
    mesh = default_mesh(("data",))

    def make_opt():
        return (SparseSGD(0.1) if opt_name == "sgd"
                else SparseRowWiseAdaGrad(lr=0.1, eps=1e-6))

    qp, ip = _plans(mesh, opt_scalars=1 if opt_name == "adagrad" else 0)
    m1 = init_two_tower(jax.random.key(3), CFG, sparse_opt=make_opt())
    mP = place_two_tower_on_plan(qp, ip, mesh, m1, make_opt())
    step1 = make_train_step(CFG, sparse_opt=make_opt(), dense_lr=0.1,
                            jit=False)
    stepP = make_planned_tt_train_step(CFG, mesh, sparse_opt=make_opt(),
                                       dense_lr=0.1)
    for s in range(3):
        dense, q_cat, item_ids = _batch(32, seed=60 + s)
        m1, (l1, a1) = step1(m1, jnp.asarray(dense), jnp.asarray(q_cat),
                             jnp.asarray(item_ids))
        mP, (lP, aP) = stepP(mP, jnp.asarray(dense), jnp.asarray(q_cat),
                             jnp.asarray(item_ids))
        np.testing.assert_allclose(float(lP), float(l1), rtol=1e-4)
    np.testing.assert_allclose(_dense_tables(mP.query_tables),
                               np.asarray(m1.query_tables.data),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(_dense_tables(mP.item_tables),
                               np.asarray(m1.item_table.data),
                               rtol=5e-4, atol=1e-5)
    for wP, w1 in zip(jax.tree.leaves((mP.query_mlp, mP.item_mlp)),
                      jax.tree.leaves((m1.query_mlp, m1.item_mlp))):
        np.testing.assert_allclose(np.asarray(wP), np.asarray(w1),
                                   rtol=5e-4, atol=1e-5)


def test_planned_retrieval_matches_single_chip():
    """Index build + top-k retrieval on the planned placement equal the
    single-chip serving path."""
    mesh = default_mesh(("data",))
    qp, ip = _plans(mesh)
    model = init_two_tower(jax.random.key(5), CFG)
    planned = place_two_tower_on_plan(qp, ip, mesh, model, SparseSGD(0.1))

    idx1 = build_item_index(model, batch=256)
    idxP = planned_build_item_index(mesh, planned, batch=256)
    np.testing.assert_allclose(np.asarray(idxP), np.asarray(idx1),
                               rtol=1e-5, atol=1e-6)

    dense, q_cat, _ = _batch(16, seed=7)
    s1, i1 = retrieve(model, idx1, jnp.asarray(dense), jnp.asarray(q_cat),
                      k=7)
    sP, iP = planned_retrieve(mesh, planned, idxP, dense, q_cat, k=7)
    np.testing.assert_allclose(np.asarray(sP), np.asarray(s1), rtol=1e-5,
                               atol=1e-6)
    for r in range(16):   # ties can reorder ids at equal scores
        assert set(np.asarray(iP[r]).tolist()) == \
            set(np.asarray(i1[r]).tolist()), r


def test_train_two_tower_with_plan_learns():
    """`train_two_tower(plan=(q_plan, i_plan))` runs end to end: loss falls,
    recall eval works, the result carries the planned model."""
    from embeddingtables_tpu.data import SyntheticRetrieval
    from embeddingtables_tpu.models.train import train_two_tower

    mesh = default_mesh(("data",))
    qp, ip = _plans(mesh, opt_scalars=1)
    gen = SyntheticRetrieval(query_vocab_sizes=CFG.query_vocab_sizes,
                             item_vocab=CFG.item_vocab,
                             num_dense=CFG.num_dense, batch_size=64)
    it = gen.batches()
    eval_batches = [next(it) for _ in range(2)]
    res = train_two_tower(CFG, it, 30, mesh=mesh, plan=(qp, ip),
                          sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                          dense_lr=0.05, eval_batches=eval_batches,
                          eval_every=15, log_every=10, verbose=False)
    assert isinstance(res.model, PlannedTwoTower)
    assert len(res.recalls) == 2
    assert res.losses[-1] < res.losses[0]
    assert 0.0 <= res.recalls[-1][1] <= 1.0


def test_train_two_tower_plan_validations():
    from embeddingtables_tpu.models.train import train_two_tower
    mesh = default_mesh(("data",))
    qp, ip = _plans(mesh)
    with pytest.raises(ValueError, match="plan= requires mesh"):
        train_two_tower(CFG, iter([]), 1, plan=(qp, ip))
    with pytest.raises(NotImplementedError, match="delta"):
        train_two_tower(CFG, iter([]), 1, mesh=mesh, plan=(qp, ip),
                        delta_ckpt=(object(), object()), delta_every=5)
    with pytest.raises(TypeError, match="PlannedTwoTower"):
        train_two_tower(CFG, iter([]), 1, mesh=mesh, plan=(qp, ip),
                        model=object())
    # A fresh planned init (no model) + a wrong item plan rejects loudly.
    bad_ip = plan_sharding([CFG.item_vocab + 1], CFG.dim, mesh)
    with pytest.raises(ValueError, match="single-table plan"):
        init_planned_two_tower(jax.random.key(0), CFG, qp, bad_ip, mesh)
