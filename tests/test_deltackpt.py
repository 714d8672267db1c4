"""Incremental (delta) checkpointing: bitwise restore, chain rotation,
placement-agnostic replay.

The restore contract is BITWISE equality with the live state: gather and
scatter of whole rows are exact, and the base restore is orbax byte
round-trip. Oracle discipline mirrors the package's checkpoint tests; the
reference has no checkpointing at all (SURVEY.md §5).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.optim import (SparseLazyAdam, SparseRowWiseAdaGrad,
                                       SparseSGD)
from embeddingtables_tpu.ops.sparse_update import SparseEmbeddingUpdate
from embeddingtables_tpu.utils import (DeltaCheckpointManager,
                                       TouchedRowTracker, apply_delta,
                                       snapshot_delta)

V, D, B = 300, 16, 48


def _train_steps(data, opt, state, tracker, rng, n, bag=None):
    """Run n real sparse-optimizer steps, observing indices like a host
    input pipeline would."""
    for _ in range(n):
        shape = (B,) if bag is None else (B, bag)
        idx = rng.integers(0, V, size=shape).astype(np.int32)
        tracker.observe(idx)
        upd = SparseEmbeddingUpdate(
            delta=jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
            indices=jnp.asarray(idx))
        data, state = opt.apply(data, upd, state)
    return data, state


def test_tracker_observe_batch_offsets_and_pad():
    tr = TouchedRowTracker(30)
    cat = np.array([[[0, 2, 9], [1, 9, 9]],     # table 0, pad=9
                    [[3, 9, 9], [0, 1, 9]]], dtype=np.int32)
    tr.observe_batch(cat, offsets=(0, 10, 20), pad_idx=9)
    assert set(tr.rows().tolist()) == {0, 1, 2, 13, 10, 11}
    assert tr.count() == 6
    tr.clear()
    assert tr.count() == 0
    # Without pad_idx the sentinel rows are marked too (9 and 19).
    tr.observe_batch(cat, offsets=(0, 10, 20))
    assert set(tr.rows().tolist()) == {0, 1, 2, 9, 13, 10, 11, 19}


@pytest.mark.parametrize("opt", [
    SparseRowWiseAdaGrad(lr=0.05),
    SparseLazyAdam(lr=0.05),
    SparseSGD(lr=0.05),
], ids=["adagrad", "adam", "sgd"])
def test_snapshot_apply_roundtrip_bitwise(opt):
    rng = np.random.default_rng(0)
    data0 = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    state0 = opt.init(data0)
    tracker = TouchedRowTracker(V)
    data1, state1 = _train_steps(data0, opt, state0, tracker, rng, 3)
    delta = snapshot_delta(data1, state1, tracker.rows())
    # Replay onto the PRE-training arrays: rows were saved post-update, so
    # the scattered result must equal the live state bitwise (untouched
    # rows never moved: lazy updates touch only looked-up rows).
    data_r, state_r = apply_delta(data0, state0, delta)
    assert (np.asarray(data_r) == np.asarray(data1)).all()
    for a, b in zip(jax.tree_util.tree_leaves(state_r),
                    jax.tree_util.tree_leaves(state1)):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_delta_is_orows_not_ovocab():
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    opt = SparseRowWiseAdaGrad(lr=0.05)
    state = opt.init(data)
    rows = np.array([3, 7, 250], dtype=np.int32)
    delta = snapshot_delta(data, state, rows)
    assert delta["vals"].shape == (3, D)
    assert delta["srow_0"].shape == (3,)  # (V,) accum row-sliced


def test_manager_chain_restore_bitwise(tmp_path):
    rng = np.random.default_rng(2)
    opt = SparseRowWiseAdaGrad(lr=0.05)
    data = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    state = opt.init(data)
    tracker = TouchedRowTracker(V)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=4)

    step = 0
    for ck in range(6):  # saves: base, d, d, d, base, d
        data, state = _train_steps(data, opt, state, tracker, rng, 2,
                                   bag=3 if ck % 2 else None)
        step += 2
        mgr.save(step, data, state, tracker)
        assert tracker.count() == 0  # save consumes the tracker
    assert mgr.latest_step() == step
    names = sorted(os.listdir(tmp_path))
    # base_every=4: saves 1 and 5 are bases (steps 2 and 10); the new base
    # pruned the first chain, so exactly one base + the trailing delta.
    assert "base_10" in names and "delta_12.npz" in names
    assert sum(n.startswith("base_") for n in names) == 1

    restored = mgr.restore_latest(jnp.zeros_like(data), opt.init(data))
    assert restored is not None
    data_r, state_r = restored
    assert (np.asarray(data_r) == np.asarray(data)).all()
    assert (np.asarray(state_r.accum) == np.asarray(state.accum)).all()


def test_manager_restore_none_when_empty(tmp_path):
    mgr = DeltaCheckpointManager(str(tmp_path))
    assert mgr.restore_latest(jnp.zeros((V, D)), None) is None
    assert mgr.latest_step() is None


def test_manager_reopen_resumes_cadence(tmp_path):
    """A new manager over an existing directory keeps the base cadence by
    counting deltas since the latest base."""
    rng = np.random.default_rng(3)
    opt = SparseSGD(lr=0.1)
    data = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    state = opt.init(data)
    tracker = TouchedRowTracker(V)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=3)
    for s in (1, 2, 3):  # base_1, delta_2, delta_3
        data, state = _train_steps(data, opt, state, tracker, rng, 1)
        mgr.save(s, data, state, tracker)
    mgr2 = DeltaCheckpointManager(str(tmp_path), base_every=3)
    data, state = _train_steps(data, opt, state, tracker, rng, 1)
    p = mgr2.save(4, data, state, tracker)
    assert os.path.basename(p) == "base_4"  # fourth save rolls a new base
    restored = mgr2.restore_latest(jnp.zeros_like(data), opt.init(data))
    assert (np.asarray(restored[0]) == np.asarray(data)).all()


def test_delta_restore_is_placement_agnostic(tmp_path):
    """Deltas are keyed by global row id: a chain saved from unsharded
    arrays replays onto a mesh-sharded restore target (elastic restore)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(4)
    opt = SparseRowWiseAdaGrad(lr=0.05)
    Vs = 320  # divisible by 8 devices
    data = jnp.asarray(rng.normal(size=(Vs, D)).astype(np.float32))
    state = opt.init(data)
    tracker = TouchedRowTracker(Vs)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    for s in (1, 2, 3):
        idx = rng.integers(0, Vs, size=B).astype(np.int32)
        tracker.observe(idx)
        upd = SparseEmbeddingUpdate(
            delta=jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
            indices=jnp.asarray(idx))
        data, state = opt.apply(data, upd, state)
        mgr.save(s, data, state, tracker)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
    sh = NamedSharding(mesh, P("model", None))
    sh1 = NamedSharding(mesh, P("model"))
    data_t = jax.ShapeDtypeStruct((Vs, D), jnp.float32, sharding=sh)
    state_t = type(state)(accum=jax.ShapeDtypeStruct(
        (Vs,), jnp.float32, sharding=sh1))
    data_r, state_r = mgr.restore_latest(data_t, state_t)
    assert data_r.sharding.is_equivalent_to(sh, 2)
    assert (np.asarray(data_r) == np.asarray(data)).all()
    assert (np.asarray(state_r.accum) == np.asarray(state.accum)).all()


# ---------------------------------------------------------------------------
# train-loop integration (train_dlrm delta_ckpt=) on both placements
# ---------------------------------------------------------------------------

def _dlrm_batches(vocabs, b=32, seed=9):
    rng = np.random.default_rng(seed)
    while True:
        cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                        for v in vocabs])
        yield dict(dense=rng.normal(size=(b, 4)).astype(np.float32),
                   cat=cat, label=(cat[0] % 2).astype(np.float32))


def _tiny_cfg():
    from embeddingtables_tpu.models import DLRMConfig
    return DLRMConfig(vocab_sizes=(40, 24), num_dense=4, dim=8,
                      bottom_mlp=(8, 8), top_mlp=(8, 1),
                      compute_dtype=jnp.float32)


def test_train_loop_delta_ckpt_single_chip(tmp_path):
    from embeddingtables_tpu.models import init_dlrm
    from embeddingtables_tpu.models.train import (restore_dlrm_delta,
                                                  train_dlrm)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    cfg = _tiny_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    res = train_dlrm(cfg, _dlrm_batches(cfg.vocab_sizes), 9, sparse_opt=opt,
                     dense_lr=0.1, log_every=0, verbose=False,
                     delta_ckpt=mgr, delta_every=3)
    assert mgr.latest_step() == 9
    # Resume into a DIFFERENT init: tables + row state must be bitwise the
    # trained ones (base covers untouched rows; deltas replay the rest).
    fresh = init_dlrm(jax.random.key(123), cfg, sparse_opt=opt)
    resumed = restore_dlrm_delta(mgr, fresh)
    assert (np.asarray(resumed.tables.data)
            == np.asarray(res.model.tables.data)).all()
    assert (np.asarray(resumed.emb_state.accum)
            == np.asarray(res.model.emb_state.accum)).all()


def test_train_loop_delta_ckpt_sharded(tmp_path):
    from embeddingtables_tpu.models.train import (restore_dlrm_delta,
                                                  train_dlrm)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.dlrm import shard_dlrm, unshard_dlrm
    from embeddingtables_tpu.parallel.mesh import default_mesh
    from embeddingtables_tpu.models import init_dlrm
    cfg = _tiny_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mesh = default_mesh(("data",))
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    res = train_dlrm(cfg, _dlrm_batches(cfg.vocab_sizes), 7, sparse_opt=opt,
                     dense_lr=0.1, log_every=0, verbose=False, mesh=mesh,
                     delta_ckpt=mgr, delta_every=2)
    assert mgr.latest_step() == 6  # cadence 2 over 7 steps
    fresh = shard_dlrm(init_dlrm(jax.random.key(7), cfg, sparse_opt=opt),
                       mesh, "data", sparse_opt=opt)
    resumed = restore_dlrm_delta(mgr, fresh)
    # Steps 1..6 of state; compare against the trained model's mod-layout
    # arrays by unsharding BOTH (the trained model took one extra step, so
    # compare the restored chain against a 6-step control).
    res6 = train_dlrm(cfg, _dlrm_batches(cfg.vocab_sizes), 6, sparse_opt=opt,
                      dense_lr=0.1, log_every=0, verbose=False, mesh=mesh)
    assert (np.asarray(resumed.tables.data)
            == np.asarray(res6.model.tables.data)).all()
    # emb_accum is the raw (n_shards, rows_local) accumulator array here.
    assert (np.asarray(resumed.emb_accum)
            == np.asarray(res6.model.emb_accum)).all()


def test_stale_deltas_pruned_on_base_commit(tmp_path):
    """A new base deletes ALL deltas — including ones with step > base. A
    directory reused by a run whose step counter restarted must not replay
    the previous run's deltas onto the new base (ADVICE r2)."""
    rng = np.random.default_rng(5)
    opt = SparseSGD(lr=0.1)
    data = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    state = opt.init(data)
    tracker = TouchedRowTracker(V)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    for s in (10, 11):  # base_10, delta_11
        data, state = _train_steps(data, opt, state, tracker, rng, 1)
        mgr.save(s, data, state, tracker)
    # Second run over the same directory, step counter restarted at 2.
    # Its first save rolls a base (cadence counted from delta_11); every
    # old delta — including delta_11 with 11 > 2 — must die with it.
    mgr2 = DeltaCheckpointManager(str(tmp_path), base_every=2)
    data2 = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    mgr2.save(2, data2, opt.init(data2), TouchedRowTracker(V))
    names = os.listdir(tmp_path)
    assert not any(n.startswith("delta_") for n in names)
    restored = mgr2.restore_latest(jnp.zeros_like(data2), opt.init(data2))
    assert (np.asarray(restored[0]) == np.asarray(data2)).all()


def test_force_base_makes_next_save_full(tmp_path):
    """force_base(): the manager's escape hatch for events that invalidate
    the delta chain's premise (DivergenceGuard rollback, ADVICE r2)."""
    rng = np.random.default_rng(6)
    opt = SparseSGD(lr=0.1)
    data = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    state = opt.init(data)
    tracker = TouchedRowTracker(V)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=8)
    data, state = _train_steps(data, opt, state, tracker, rng, 1)
    mgr.save(1, data, state, tracker)                      # base_1
    data, state = _train_steps(data, opt, state, tracker, rng, 1)
    mgr.save(2, data, state, tracker)                      # delta_2
    mgr.force_base()
    # Simulate a rollback: the live model regresses to an OLD state the
    # tracker knows nothing about; only a full base can capture it.
    data_old = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    p = mgr.save(3, data_old, opt.init(data_old), tracker)
    assert os.path.basename(p) == "base_3"
    restored = mgr.restore_latest(jnp.zeros_like(data), opt.init(data))
    assert (np.asarray(restored[0]) == np.asarray(data_old)).all()


def test_train_loop_evict_marks_delta_tracker(tmp_path):
    """evict_every rewrites rows OUTSIDE the input stream (value + state
    reset); with delta_ckpt on, those rows must land in the next delta or a
    restore diverges from the live model (ADVICE r2 medium)."""
    from embeddingtables_tpu.models import init_dlrm
    from embeddingtables_tpu.models.train import (restore_dlrm_delta,
                                                  train_dlrm)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    cfg = _tiny_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=100)
    # evict_threshold huge: every seen-then-tracked row is evicted at each
    # interval, maximizing rewritten-outside-the-stream rows. base_every
    # huge: saves after the first are all deltas, so the fix (not the base
    # cadence) must carry the evicted rows.
    res = train_dlrm(cfg, _dlrm_batches(cfg.vocab_sizes), 12, sparse_opt=opt,
                     dense_lr=0.1, log_every=0, verbose=False,
                     delta_ckpt=mgr, delta_every=3,
                     evict_every=4, evict_threshold=1e9)
    assert res.evicted_rows > 0, "test premise: eviction must fire"
    fresh = init_dlrm(jax.random.key(321), cfg, sparse_opt=opt)
    resumed = restore_dlrm_delta(mgr, fresh)
    assert (np.asarray(resumed.tables.data)
            == np.asarray(res.model.tables.data)).all()
    assert (np.asarray(resumed.emb_state.accum)
            == np.asarray(res.model.emb_state.accum)).all()


def test_sharded_save_restores_single_chip(tmp_path):
    """The headline placement-agnostic claim, base included: a chain saved
    from a mod-sharded run restores BITWISE into an unsharded model (the
    base's row-wise leaves are re-laid by global row id)."""
    from embeddingtables_tpu.models import init_dlrm
    from embeddingtables_tpu.models.train import (restore_dlrm_delta,
                                                  train_dlrm)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.dlrm import unshard_dlrm
    from embeddingtables_tpu.parallel.mesh import default_mesh
    cfg = _tiny_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mesh = default_mesh(("data",))
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    res = train_dlrm(cfg, _dlrm_batches(cfg.vocab_sizes), 6, sparse_opt=opt,
                     dense_lr=0.1, log_every=0, verbose=False, mesh=mesh,
                     delta_ckpt=mgr, delta_every=2)
    oracle = unshard_dlrm(res.model)
    fresh = init_dlrm(jax.random.key(99), cfg, sparse_opt=opt)
    resumed = restore_dlrm_delta(mgr, fresh)   # single-chip target
    assert resumed.tables.data.shape == oracle.tables.data.shape
    assert (np.asarray(resumed.tables.data)
            == np.asarray(oracle.tables.data)).all()
    assert (np.asarray(resumed.emb_state.accum)
            == np.asarray(oracle.emb_state.accum)).all()


def test_single_chip_save_restores_sharded(tmp_path):
    """The reverse direction: a flat-saved chain restores into a mod-sharded
    model (elastic scale-up from a single-chip checkpoint)."""
    from embeddingtables_tpu.models import init_dlrm
    from embeddingtables_tpu.models.train import (restore_dlrm_delta,
                                                  train_dlrm)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.dlrm import shard_dlrm, unshard_dlrm
    from embeddingtables_tpu.parallel.mesh import default_mesh
    cfg = _tiny_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    res = train_dlrm(cfg, _dlrm_batches(cfg.vocab_sizes), 5, sparse_opt=opt,
                     dense_lr=0.1, log_every=0, verbose=False,
                     delta_ckpt=mgr, delta_every=2)
    mesh = default_mesh(("data",))
    fresh = shard_dlrm(init_dlrm(jax.random.key(5), cfg, sparse_opt=opt),
                       mesh, "data", sparse_opt=opt)
    resumed = restore_dlrm_delta(mgr, fresh)   # mod-sharded target
    back = unshard_dlrm(resumed)
    # Saves stop at step 4 (cadence 2 over 5 steps): compare vs a 4-step
    # control run on the same stream.
    res4 = train_dlrm(cfg, _dlrm_batches(cfg.vocab_sizes), 4, sparse_opt=opt,
                      dense_lr=0.1, log_every=0, verbose=False)
    assert (np.asarray(back.tables.data)
            == np.asarray(res4.model.tables.data)).all()
    assert (np.asarray(back.emb_state.accum)
            == np.asarray(res4.model.emb_state.accum)).all()


def test_sharded_save_restores_different_mesh_size(tmp_path):
    """Elastic resharding: a chain saved from an 8-device mod-sharded run
    restores into a 4-device mod layout (mod(n1) -> flat -> mod(n2) base
    conversion; deltas are global-row-keyed either way)."""
    from embeddingtables_tpu.models import init_dlrm
    from embeddingtables_tpu.models.train import (restore_dlrm_delta,
                                                  train_dlrm)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.dlrm import shard_dlrm, unshard_dlrm
    from jax.sharding import Mesh

    cfg = _tiny_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mesh8 = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    res = train_dlrm(cfg, _dlrm_batches(cfg.vocab_sizes), 6, sparse_opt=opt,
                     dense_lr=0.1, log_every=0, verbose=False, mesh=mesh8,
                     delta_ckpt=mgr, delta_every=2)
    oracle = unshard_dlrm(res.model)

    mesh4 = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    fresh4 = shard_dlrm(init_dlrm(jax.random.key(42), cfg, sparse_opt=opt),
                        mesh4, "data", sparse_opt=opt)
    resumed = restore_dlrm_delta(mgr, fresh4)
    assert resumed.tables.data.shape[0] == 4  # still the 4-shard layout
    back = unshard_dlrm(resumed)
    assert (np.asarray(back.tables.data)
            == np.asarray(oracle.tables.data)).all()
    assert (np.asarray(back.emb_state.accum)
            == np.asarray(oracle.emb_state.accum)).all()


def test_train_dcn_delta_ckpt(tmp_path):
    from embeddingtables_tpu.models import DCNConfig, init_dcn
    from embeddingtables_tpu.models.train import (restore_dlrm_delta,
                                                  train_dcn)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    cfg = DCNConfig(vocab_sizes=(40, 24), num_dense=4, dim=8,
                    num_cross=1, cross_rank=None, deep_mlp=(8,),
                    compute_dtype=jnp.float32)
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    res = train_dcn(cfg, _dlrm_batches(cfg.vocab_sizes), 6, sparse_opt=opt,
                    dense_lr=0.1, log_every=0, verbose=False,
                    delta_ckpt=mgr, delta_every=2)
    fresh = init_dcn(jax.random.key(11), cfg, sparse_opt=opt)
    resumed = restore_dlrm_delta(mgr, fresh)
    assert (np.asarray(resumed.tables.data)
            == np.asarray(res.model.tables.data)).all()
    assert (np.asarray(resumed.emb_state.accum)
            == np.asarray(res.model.emb_state.accum)).all()


def _deepfm_cfg():
    from embeddingtables_tpu.models import DeepFMConfig
    return DeepFMConfig(vocab_sizes=(40, 24), num_dense=4, dim=8,
                        deep_mlp=(8,), compute_dtype=jnp.float32,
                        fold_fm_w=False)


def test_train_deepfm_delta_ckpt_both_stacks(tmp_path):
    """DeepFM's two stacks (FM vectors + dim-1 first-order weights) ride
    ONE manager: bitwise restore of tables, fm_w, and both row states."""
    from embeddingtables_tpu.models import init_deepfm
    from embeddingtables_tpu.models.train import (restore_deepfm_delta,
                                                  train_deepfm)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    cfg = _deepfm_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    res = train_deepfm(cfg, _dlrm_batches(cfg.vocab_sizes), 7,
                       sparse_opt=opt, dense_lr=0.1, log_every=0,
                       verbose=False, delta_ckpt=mgr, delta_every=2)
    fresh = init_deepfm(jax.random.key(77), cfg, sparse_opt=opt)
    resumed = restore_deepfm_delta(mgr, fresh)
    # Saves stop at step 6; 6-step control on the same stream.
    res6 = train_deepfm(cfg, _dlrm_batches(cfg.vocab_sizes), 6,
                        sparse_opt=opt, dense_lr=0.1, log_every=0,
                        verbose=False)
    for attr in ("tables", "fm_w"):
        assert (np.asarray(getattr(resumed, attr).data)
                == np.asarray(getattr(res6.model, attr).data)).all(), attr
    assert (np.asarray(resumed.emb_state.accum)
            == np.asarray(res6.model.emb_state.accum)).all()
    assert (np.asarray(resumed.fm_state.accum)
            == np.asarray(res6.model.fm_state.accum)).all()


def test_train_deepfm_delta_ckpt_sharded_to_single(tmp_path):
    """Sharded DeepFM delta chain restores into a single-chip model (both
    stacks layout-converted by global row id)."""
    from embeddingtables_tpu.models import init_deepfm
    from embeddingtables_tpu.models.train import (restore_deepfm_delta,
                                                  train_deepfm)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.deepfm import unshard_deepfm
    from embeddingtables_tpu.parallel.mesh import default_mesh
    cfg = _deepfm_cfg()
    opt = SparseRowWiseAdaGrad(lr=0.1)
    mesh = default_mesh(("data",))
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    res = train_deepfm(cfg, _dlrm_batches(cfg.vocab_sizes), 6,
                       sparse_opt=opt, dense_lr=0.1, log_every=0,
                       verbose=False, mesh=mesh, delta_ckpt=mgr,
                       delta_every=2)
    oracle = unshard_deepfm(res.model)
    fresh = init_deepfm(jax.random.key(88), cfg, sparse_opt=opt)
    resumed = restore_deepfm_delta(mgr, fresh)
    for attr in ("tables", "fm_w"):
        assert (np.asarray(getattr(resumed, attr).data)
                == np.asarray(getattr(oracle, attr).data)).all(), attr
    assert (np.asarray(resumed.emb_state.accum)
            == np.asarray(oracle.emb_state.accum)).all()
    assert (np.asarray(resumed.fm_state.accum)
            == np.asarray(oracle.fm_state.accum)).all()


def test_train_two_tower_delta_ckpt(tmp_path):
    """Two-tower delta chains: a PAIR of managers (query stack and item
    corpus are independent row spaces); bitwise restore of both tables +
    row states, incl. a sharded-save -> single-chip restore."""
    from embeddingtables_tpu.models.two_tower import (TwoTowerConfig,
                                                      init_two_tower)
    from embeddingtables_tpu.models.train import (restore_two_tower_delta,
                                                  train_two_tower)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    rng = np.random.default_rng(19)
    cfg = TwoTowerConfig(query_vocab_sizes=(40, 24), item_vocab=48,
                         num_dense=2, dim=8, embed_dim=8,
                         query_mlp=(8,), item_mlp=(8,))

    def batches(seed):
        r = np.random.default_rng(seed)
        while True:
            yield dict(dense=r.normal(size=(8, 2)).astype(np.float32),
                       q_cat=np.stack(
                           [r.integers(0, v, 8).astype(np.int32)
                            for v in cfg.query_vocab_sizes]),
                       item_ids=r.integers(0, 48, 8).astype(np.int32))

    opt = SparseRowWiseAdaGrad(lr=0.1)
    mgrs = (DeltaCheckpointManager(str(tmp_path / "q"), base_every=2),
            DeltaCheckpointManager(str(tmp_path / "i"), base_every=2))
    res = train_two_tower(cfg, batches(1), 6, sparse_opt=opt,
                          dense_lr=0.1, log_every=0, verbose=False,
                          delta_ckpt=mgrs, delta_every=2)
    fresh = init_two_tower(jax.random.key(5), cfg, sparse_opt=opt)
    resumed = restore_two_tower_delta(mgrs, fresh)
    assert (np.asarray(resumed.query_tables.data)
            == np.asarray(res.model.query_tables.data)).all()
    assert (np.asarray(resumed.item_table.data)
            == np.asarray(res.model.item_table.data)).all()
    assert (np.asarray(resumed.q_state.accum)
            == np.asarray(res.model.q_state.accum)).all()
    assert (np.asarray(resumed.i_state.accum)
            == np.asarray(res.model.i_state.accum)).all()

    # Sharded save -> single-chip restore (layout-converted bases).
    # train_two_tower(mesh=) returns the UNSHARDED view, which is the
    # oracle directly; the saves happened from the mod-sharded arrays.
    from embeddingtables_tpu.parallel.mesh import default_mesh
    mgrs2 = (DeltaCheckpointManager(str(tmp_path / "q2"), base_every=2),
             DeltaCheckpointManager(str(tmp_path / "i2"), base_every=2))
    res_m = train_two_tower(cfg, batches(2), 4, sparse_opt=opt,
                            dense_lr=0.1, log_every=0, verbose=False,
                            mesh=default_mesh(("data",)),
                            delta_ckpt=mgrs2, delta_every=2)
    oracle = res_m.model
    fresh2 = init_two_tower(jax.random.key(6), cfg, sparse_opt=opt)
    resumed2 = restore_two_tower_delta(mgrs2, fresh2)
    assert (np.asarray(resumed2.query_tables.data)
            == np.asarray(oracle.query_tables.data)).all()
    assert (np.asarray(resumed2.item_table.data)
            == np.asarray(oracle.item_table.data)).all()


def test_manager_chain_restore_bitwise_bf16_tables(tmp_path):
    """bf16 tables through the delta chain (round-5 regression: np.savez
    round-trips ml_dtypes arrays as raw void `|V2`, which np.load hands
    back uncastable — found by the on-chip CLI resume of a bf16-table
    run; _atomic_savez/_load_npz now view-encode them). Also covers the
    DeltaFollower on a bf16 chain."""
    from embeddingtables_tpu.utils.deltackpt import DeltaFollower

    rng = np.random.default_rng(7)
    opt = SparseRowWiseAdaGrad(lr=0.05)
    data = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32)).astype(
        jnp.bfloat16)
    state = opt.init(data)
    tracker = TouchedRowTracker(V)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=4)

    def steps(data, state, n):
        for _ in range(n):
            idx = rng.integers(0, V, size=(B,)).astype(np.int32)
            tracker.observe(idx)
            upd = SparseEmbeddingUpdate(
                delta=jnp.asarray(
                    rng.normal(size=(B, D)).astype(np.float32)),
                indices=jnp.asarray(idx))
            data, state = opt.apply(data, upd, state)
        return data, state

    step = 0
    for _ in range(3):  # saves: base, delta, delta
        data, state = steps(data, state, 2)
        step += 2
        mgr.save(step, data, state, tracker)
    assert data.dtype == jnp.bfloat16

    restored = mgr.restore_latest(jnp.zeros_like(data), opt.init(data))
    assert restored is not None
    data_r, state_r = restored
    assert data_r.dtype == jnp.bfloat16
    assert (np.asarray(data_r.astype(jnp.float32))
            == np.asarray(data.astype(jnp.float32))).all()
    assert (np.asarray(state_r.accum) == np.asarray(state.accum)).all()

    # The serving-side follower applies the same bf16 deltas.
    fol = DeltaFollower(str(tmp_path), jnp.zeros_like(data))
    fol.poll()
    assert fol.data.dtype == jnp.bfloat16
    assert (np.asarray(fol.data.astype(jnp.float32))
            == np.asarray(data.astype(jnp.float32))).all()
