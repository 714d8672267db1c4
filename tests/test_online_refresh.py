"""Online model refresh: a serving replica follows a trainer's
delta-checkpoint chain (utils.DeltaFollower) and serves the updated rows
with zero recompiles (serving.make_refreshable_dlrm_service) — the
parameter-server "pull" as incremental file sync.

Oracle: after each sync, served scores must EXACTLY match the live
trained model's eval (dense towers frozen with dense_lr=0, since the
chain carries table rows only).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embeddingtables_tpu.models import DLRMConfig, init_dlrm
from embeddingtables_tpu.models.dlrm import make_eval_step
from embeddingtables_tpu.models.train import train_dlrm
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
from embeddingtables_tpu.serving import make_refreshable_dlrm_service
from embeddingtables_tpu.utils import DeltaCheckpointManager, DeltaFollower


def _cfg():
    return DLRMConfig(vocab_sizes=(60, 40), num_dense=4, dim=8,
                      bottom_mlp=(8, 8), top_mlp=(8, 1),
                      compute_dtype=jnp.float32)


def _batches(vocabs, seed):
    rng = np.random.default_rng(seed)
    while True:
        cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                        for v in vocabs])
        yield dict(dense=rng.normal(size=(16, 4)).astype(np.float32),
                   cat=cat, label=(cat[0] % 2).astype(np.float32))


def test_follower_tracks_trainer_chain(tmp_path):
    cfg = _cfg()
    opt = SparseRowWiseAdaGrad(lr=0.2)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=3)
    model0 = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt)
    follower = DeltaFollower(str(tmp_path), model0.tables.data)
    assert follower.poll() == 0          # nothing written yet

    # Trainer phase 1: 4 steps, saves at 2 and 4 (base_2 + delta_4).
    # dense_lr=0 freezes the towers, so table sync == full score parity.
    it = _batches(cfg.vocab_sizes, 7)
    res = train_dlrm(cfg, it, 4, sparse_opt=opt, dense_lr=0.0,
                     log_every=0, verbose=False, model=model0,
                     delta_ckpt=mgr, delta_every=2)
    assert follower.poll() == 2          # base_2 + delta_4
    np.testing.assert_array_equal(np.asarray(follower.data),
                                  np.asarray(res.model.tables.data))

    # Trainer phase 2 (continues the SAME chain): next saves roll a new
    # base (cadence) then a delta; the follower resyncs through the base
    # commit that pruned the old files.
    res2 = train_dlrm(cfg, it, 4, sparse_opt=opt, dense_lr=0.0,
                      log_every=0, verbose=False, model=res.model,
                      delta_ckpt=mgr, delta_every=2)
    assert follower.poll() >= 1
    np.testing.assert_array_equal(np.asarray(follower.data),
                                  np.asarray(res2.model.tables.data))
    assert follower.poll() == 0          # idempotent


def test_follower_converts_sharded_chain(tmp_path):
    """Trainer on the mesh, serving single-chip: the follower's base read
    converts the mod layout by global row id."""
    from embeddingtables_tpu.parallel.dlrm import unshard_dlrm
    from embeddingtables_tpu.parallel.mesh import default_mesh
    cfg = _cfg()
    opt = SparseRowWiseAdaGrad(lr=0.2)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=2)
    model0 = init_dlrm(jax.random.key(1), cfg, sparse_opt=opt)
    follower = DeltaFollower(str(tmp_path), model0.tables.data)
    res = train_dlrm(cfg, _batches(cfg.vocab_sizes, 8), 6, sparse_opt=opt,
                     dense_lr=0.0, log_every=0, verbose=False,
                     mesh=default_mesh(("data",)),
                     delta_ckpt=mgr, delta_every=2)
    assert follower.poll() >= 1
    oracle = unshard_dlrm(res.model)
    np.testing.assert_array_equal(np.asarray(follower.data),
                                  np.asarray(oracle.tables.data))


def test_refreshable_service_serves_synced_rows(tmp_path):
    cfg = _cfg()
    opt = SparseRowWiseAdaGrad(lr=0.2)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=4)
    model0 = init_dlrm(jax.random.key(2), cfg, sparse_opt=opt)
    # The serving replica holds its OWN buffers (in production it is a
    # different process); the trainer's donated step consumes model0's.
    served0 = init_dlrm(jax.random.key(2), cfg, sparse_opt=opt)
    batcher, swap = make_refreshable_dlrm_service(served0, max_batch=64,
                                                 max_latency_ms=1.0)
    try:
        rng = np.random.default_rng(3)
        dense = rng.normal(size=(5, 4)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 5).astype(np.int32)
                        for v in cfg.vocab_sizes])
        before = batcher.predict(dense, cat)

        follower = DeltaFollower(str(tmp_path), served0.tables.data)
        res = train_dlrm(cfg, _batches(cfg.vocab_sizes, 9), 4,
                         sparse_opt=opt, dense_lr=0.0, log_every=0,
                         verbose=False, model=model0,
                         delta_ckpt=mgr, delta_every=2)
        assert follower.poll() >= 1
        batcher.swap_tables(follower.data)   # zero-downtime row swap

        after = np.asarray(batcher.predict(dense, cat))
        eval_step = make_eval_step(cfg)
        expect = np.asarray(eval_step(res.model, jnp.asarray(dense),
                                      jnp.asarray(cat)))
        np.testing.assert_array_equal(after, expect)
        assert not np.array_equal(after, np.asarray(before))
    finally:
        batcher.stop()


def test_refreshable_service_deepfm_folded(tmp_path):
    """Every CTR family rides `make_refreshable_service` (round 4).
    DeepFM's FOLDED stack makes the row sync carry first-order weights
    and FM vectors in ONE swap_tables call — exact score parity after
    sync (dense parts frozen with dense_lr=0)."""
    from embeddingtables_tpu.models.deepfm import (DeepFMConfig,
                                                   init_deepfm)
    from embeddingtables_tpu.models.deepfm import \
        make_eval_step as fm_eval
    from embeddingtables_tpu.models.train import train_deepfm
    from embeddingtables_tpu.serving import make_refreshable_service
    cfg = DeepFMConfig(vocab_sizes=(60, 40), num_dense=4, dim=8,
                       deep_mlp=(8,), compute_dtype=jnp.float32)
    opt = SparseRowWiseAdaGrad(lr=0.2)
    mgr = DeltaCheckpointManager(str(tmp_path), base_every=4)
    model0 = init_deepfm(jax.random.key(2), cfg, sparse_opt=opt)
    served0 = init_deepfm(jax.random.key(2), cfg, sparse_opt=opt)
    batcher, swap = make_refreshable_service(served0, max_batch=64,
                                             max_latency_ms=1.0)
    try:
        rng = np.random.default_rng(3)
        dense = rng.normal(size=(5, 4)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 5).astype(np.int32)
                        for v in cfg.vocab_sizes])
        before = batcher.predict(dense, cat)

        follower = DeltaFollower(str(tmp_path), served0.tables.data)
        res = train_deepfm(cfg, _batches(cfg.vocab_sizes, 9), 4,
                           sparse_opt=opt, dense_lr=0.0, log_every=0,
                           verbose=False, model=model0,
                           delta_ckpt=mgr, delta_every=2)
        assert follower.poll() >= 1
        batcher.swap_tables(follower.data)

        after = np.asarray(batcher.predict(dense, cat))
        expect = np.asarray(fm_eval(cfg)(res.model, jnp.asarray(dense),
                                         jnp.asarray(cat)))
        np.testing.assert_array_equal(after, expect)
        assert not np.array_equal(after, np.asarray(before))
    finally:
        batcher.stop()


def test_refreshable_service_dcn_and_type_error():
    from embeddingtables_tpu.models.dcn import DCNConfig, init_dcn
    from embeddingtables_tpu.serving import make_refreshable_service
    cfg = DCNConfig(vocab_sizes=(30, 20), num_dense=4, dim=8,
                    num_cross=1, cross_rank=4, deep_mlp=(8,),
                    compute_dtype=jnp.float32)
    model = init_dcn(jax.random.key(0), cfg)
    batcher, swap = make_refreshable_service(model, max_batch=16,
                                             max_latency_ms=1.0)
    try:
        rng = np.random.default_rng(1)
        dense = rng.normal(size=(3, 4)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 3).astype(np.int32)
                        for v in cfg.vocab_sizes])
        out = batcher.predict(dense, cat)
        assert np.all(np.isfinite(np.asarray(out)))
        # swap to a re-seeded model changes scores, no recompile needed
        batcher.swap(init_dcn(jax.random.key(5), cfg))
        out2 = batcher.predict(dense, cat)
        assert not np.array_equal(np.asarray(out), np.asarray(out2))
    finally:
        batcher.stop()
    with pytest.raises(TypeError, match="CTR"):
        make_refreshable_service(object())
