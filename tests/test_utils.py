"""Checkpoint round-trips (incl. sharded restore) and telemetry."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from embeddingtables_tpu.models import DLRMConfig, init_dlrm
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
from embeddingtables_tpu.parallel.dlrm import shard_dlrm
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.utils import (CheckpointManager, get_telemetry,
                                       restore_checkpoint, save_checkpoint)


def tiny_cfg():
    return DLRMConfig(vocab_sizes=(40, 60), num_dense=4, dim=8,
                      bottom_mlp=(16, 8), top_mlp=(16, 1),
                      compute_dtype=jnp.float32)


def assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip_single_chip(tmp_path):
    cfg = tiny_cfg()
    model = init_dlrm(jax.random.key(0), cfg,
                      sparse_opt=SparseRowWiseAdaGrad(lr=0.1))
    p = save_checkpoint(str(tmp_path / "ck"), model)
    template = init_dlrm(jax.random.key(1), cfg,
                         sparse_opt=SparseRowWiseAdaGrad(lr=0.1))
    restored = restore_checkpoint(p, template)
    assert_tree_equal(model, restored)
    assert restored.config == cfg  # static fields come from the template


def test_checkpoint_roundtrip_sharded(tmp_path):
    """Sharded save + sharded restore: shardings must survive."""
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    opt = SparseRowWiseAdaGrad(lr=0.1)
    smodel = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt),
                        mesh, "data", sparse_opt=opt)
    p = save_checkpoint(str(tmp_path / "ck"), smodel)
    template = shard_dlrm(init_dlrm(jax.random.key(1), cfg, sparse_opt=opt),
                          mesh, "data", sparse_opt=opt)
    restored = restore_checkpoint(p, template)
    assert_tree_equal(smodel, restored)
    assert restored.tables.data.sharding == NamedSharding(mesh, P("data"))


def test_checkpoint_manager_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "run"), max_to_keep=2)
    tree = {"w": jnp.arange(4.0)}
    for s in (1, 2, 3):
        mgr.save(s, {"w": jnp.arange(4.0) * s})
    assert mgr.latest_step() == 3
    got = mgr.restore_latest(tree)
    np.testing.assert_array_equal(np.asarray(got["w"]), np.arange(4.0) * 3)
    # step 1 rotated out
    with pytest.raises(Exception):
        mgr.restore(1, tree)


def test_telemetry_phases_and_callbacks():
    tel = get_telemetry()
    tel.reset()
    events = []
    tel.on_phase(lambda name, ev: events.append((name, ev)))
    with tel.phase("update", nbytes=1000):
        pass
    with tel.phase("update", nbytes=1000):
        pass
    st = tel.phases["update"]
    assert st.count == 2 and st.bytes == 2000 and st.total_s > 0
    assert events == [("update", "start"), ("update", "end")] * 2
    assert "update" in tel.summary()
    tel.callbacks.clear()
    tel.reset()


def test_checkpoint_roundtrip_dcn(tmp_path):
    from embeddingtables_tpu.models.dcn import DCNConfig, init_dcn
    cfg = DCNConfig(vocab_sizes=(40, 60), num_dense=4, dim=8,
                    num_cross=2, cross_rank=4, deep_mlp=(16, 8),
                    compute_dtype=jnp.float32)
    model = init_dcn(jax.random.key(0), cfg,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.1))
    p = save_checkpoint(str(tmp_path / "ck"), model)
    template = init_dcn(jax.random.key(1), cfg,
                        sparse_opt=SparseRowWiseAdaGrad(lr=0.1))
    restored = restore_checkpoint(p, template)
    assert_tree_equal(model, restored)
    assert restored.config == cfg


def test_checkpoint_roundtrip_planned_dlrm(tmp_path):
    """Mixed-placement model: replicated + sharded groups both survive a
    sharded save/restore with their placements."""
    from embeddingtables_tpu.parallel.planner import (init_planned_dlrm,
                                                      plan_sharding)
    cfg = DLRMConfig(vocab_sizes=(64, 4096, 96), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    mesh = default_mesh(("data",))
    plan = plan_sharding(cfg.vocab_sizes, 8, mesh,
                         replicate_max_bytes=8 * 4 * 128)
    opt = SparseRowWiseAdaGrad(lr=0.1)
    model = init_planned_dlrm(jax.random.key(0), cfg, plan, mesh,
                              sparse_opt=opt)
    p = save_checkpoint(str(tmp_path / "ck"), model)
    template = init_planned_dlrm(jax.random.key(1), cfg, plan, mesh,
                                 sparse_opt=opt)
    restored = restore_checkpoint(p, template)
    assert_tree_equal(model, restored)
    assert restored.tables.shard.data.sharding == \
        NamedSharding(mesh, P("data"))
    assert restored.tables.repl.sharding == NamedSharding(mesh, P())


def test_checkpoint_roundtrip_sharded_adam_state(tmp_path):
    """Sharded models carrying TUPLE optimizer state (Adam (m, v, count) in
    emb_accum) survive an orbax save/restore onto the mesh — regression
    for the round-2 generic-state plumbing."""
    from embeddingtables_tpu.models import init_dlrm
    from embeddingtables_tpu.optim import SparseLazyAdam
    cfg = tiny_cfg()
    mesh = default_mesh(("data",))
    opt = SparseLazyAdam(lr=0.05)
    model = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt),
                       mesh, "data", sparse_opt=opt)
    # Make the state non-trivial so equality is meaningful.
    import dataclasses as dc
    m, v, count = model.emb_accum
    model = dc.replace(model, emb_accum=(m + 1.0, v + 2.0,
                                         count + jnp.asarray(7)))
    mgr = CheckpointManager(str(tmp_path / "adam_run"))
    mgr.save(1, model)
    got = mgr.restore_latest(model)
    assert_tree_equal(got, model)
    assert isinstance(got.emb_accum, tuple) and len(got.emb_accum) == 3
    assert int(got.emb_accum[2]) == 7
