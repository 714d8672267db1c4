"""End-to-end training-loop driver tests: loss/AUC trajectory, checkpointing,
single-chip vs sharded loop parity of results."""
import numpy as np
import pytest

import jax.numpy as jnp

from embeddingtables_tpu.data import SyntheticCriteo
from embeddingtables_tpu.models import DLRMConfig
from embeddingtables_tpu.models.train import train_dlrm
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
from embeddingtables_tpu.parallel.mesh import default_mesh
from embeddingtables_tpu.utils import CheckpointManager


def small_setup(batch=256):
    vocab = (80, 80, 80)
    cfg = DLRMConfig(vocab_sizes=vocab, num_dense=4, dim=16,
                     bottom_mlp=(32, 16), top_mlp=(32, 1),
                     compute_dtype=jnp.float32)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=4, batch_size=batch,
                          seed=11)
    return cfg, gen


def test_train_loop_learns_and_checkpoints(tmp_path):
    cfg, gen = small_setup()
    eval_batches = list(gen.batches(2))
    it = gen.batches()
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    res = train_dlrm(cfg, it, 40, sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                     dense_lr=0.05, eval_batches=eval_batches, eval_every=20,
                     ckpt_manager=mgr, ckpt_every=20, log_every=10,
                     verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.aucs and res.aucs[-1][1] > 0.6
    assert res.examples_per_sec > 0
    assert mgr.latest_step() == 40
    restored = mgr.restore_latest(res.model)
    np.testing.assert_array_equal(np.asarray(restored.tables.data),
                                  np.asarray(res.model.tables.data))


def test_train_loop_sharded_matches_quality():
    cfg, gen = small_setup()
    mesh = default_mesh(("data",))
    eval_batches = list(gen.batches(2))
    it = gen.batches()
    res = train_dlrm(cfg, it, 30, sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                     dense_lr=0.05, eval_batches=eval_batches, eval_every=30,
                     mesh=mesh, log_every=10, verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.aucs[-1][1] > 0.6


def test_capacity_autotuner_policy():
    from embeddingtables_tpu.parallel.alltoall import CapacityAutoTuner
    t = CapacityAutoTuner(2.0, occurrences_per_step=100, cooldown=2)
    assert t.observe(0) is None           # no drops -> no retune
    new = t.observe(20)                   # 20% drops -> grow
    assert new is not None and new > 2.0 and t.factor == new
    assert t.observe(20) is None          # cooldown holds
    assert t.observe(20) is None
    assert t.observe(20) is not None      # cooldown expired -> grow again
    assert t.retunes == 2
    capped = CapacityAutoTuner(60.0, 100, cooldown=0, max_factor=64.0)
    assert capped.observe(90) == 64.0     # clamps at max_factor
    assert capped.observe(90) is None     # already at the cap


def test_train_loop_a2a_auto_capacity_recovers_from_drops():
    """Start the butterfly exchange at a starved capacity factor on skewed
    (all-hot) indices: the loop must observe the overflow, rebuild the step
    at a larger factor, and end with zero drops while still learning."""
    vocab = (64,)
    cfg = DLRMConfig(vocab_sizes=vocab, num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    mesh = default_mesh(("data",))
    rng = np.random.default_rng(0)

    def hot_batches():
        while True:
            dense = rng.normal(size=(32, 4)).astype(np.float32)
            cat = np.zeros((1, 32), np.int32)   # every index -> owner of row 0
            cat[0, :8] = rng.integers(0, 64, 8) # a little spread for learning
            label = rng.integers(0, 2, 32).astype(np.float32)
            yield dict(dense=dense, cat=cat, label=label)

    from embeddingtables_tpu.parallel import alltoall as a2a_mod
    tuner_seen = []
    orig = a2a_mod.CapacityAutoTuner.observe

    def spy(self, ovf):
        r = orig(self, ovf)
        tuner_seen.append((ovf, r, self.factor))
        return r

    a2a_mod.CapacityAutoTuner.observe = spy
    try:
        res = train_dlrm(cfg, hot_batches(), 12, dense_lr=0.05, mesh=mesh,
                         exchange="a2a", capacity_factor=1.0,
                         auto_capacity=True, log_every=1, verbose=False)
    finally:
        a2a_mod.CapacityAutoTuner.observe = orig
    assert any(r is not None for _, r, _ in tuner_seen), tuner_seen
    assert tuner_seen[0][0] > 0            # starved factor really dropped
    assert tuner_seen[-1][0] == 0          # retuned factor drops nothing
    assert np.isfinite(res.losses[-1])


def test_two_tower_train_loop_learns_and_evals(tmp_path):
    from embeddingtables_tpu.data import SyntheticRetrieval
    from embeddingtables_tpu.models.train import train_two_tower
    from embeddingtables_tpu.models.two_tower import TwoTowerConfig
    from embeddingtables_tpu.optim import SparseSGD

    cfg = TwoTowerConfig(query_vocab_sizes=(40, 60), item_vocab=200,
                         num_dense=3, dim=16, embed_dim=16,
                         query_mlp=(32, 16), item_mlp=(32, 16))
    gen = SyntheticRetrieval(query_vocab_sizes=cfg.query_vocab_sizes,
                             item_vocab=cfg.item_vocab, num_dense=3,
                             batch_size=64, seed=2)
    eval_batches = list(SyntheticRetrieval(
        query_vocab_sizes=cfg.query_vocab_sizes, item_vocab=cfg.item_vocab,
        num_dense=3, batch_size=64, seed=77).batches(2))
    mgr = CheckpointManager(str(tmp_path / "tt"), max_to_keep=1)
    res = train_two_tower(cfg, gen.batches(), 200,
                          sparse_opt=SparseSGD(0.2), dense_lr=0.2,
                          eval_batches=eval_batches, eval_every=100, k=10,
                          ckpt_manager=mgr, ckpt_every=100, log_every=20,
                          verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.accs[-1] > res.accs[0] + 0.15
    # recall@10 over 200 items: chance = 5%; trained should beat it well.
    assert res.recalls and res.recalls[-1][1] > 0.2, res.recalls
    assert res.recalls[-1][1] >= res.recalls[0][1] - 0.05
    assert mgr.latest_step() == 200


def test_two_tower_train_loop_sharded():
    from embeddingtables_tpu.data import SyntheticRetrieval
    from embeddingtables_tpu.models.train import train_two_tower
    from embeddingtables_tpu.models.two_tower import TwoTowerConfig
    from embeddingtables_tpu.optim import SparseSGD

    cfg = TwoTowerConfig(query_vocab_sizes=(40, 60), item_vocab=200,
                         num_dense=3, dim=16, embed_dim=16,
                         query_mlp=(32, 16), item_mlp=(32, 16))
    mesh = default_mesh(("data",))
    gen = SyntheticRetrieval(query_vocab_sizes=cfg.query_vocab_sizes,
                             item_vocab=cfg.item_vocab, num_dense=3,
                             batch_size=64, seed=3)
    eval_batches = list(SyntheticRetrieval(
        query_vocab_sizes=cfg.query_vocab_sizes, item_vocab=cfg.item_vocab,
        num_dense=3, batch_size=64, seed=78).batches(2))
    res = train_two_tower(cfg, gen.batches(), 120,
                          sparse_opt=SparseSGD(0.2), dense_lr=0.2,
                          eval_batches=eval_batches, eval_every=120, k=10,
                          mesh=mesh, log_every=20, verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.recalls and res.recalls[-1][1] > 0.15, res.recalls
    # Result model is the dense single-chip view (serve/checkpoint-ready).
    from embeddingtables_tpu.models.two_tower import TwoTower
    assert isinstance(res.model, TwoTower)


def test_recall_at_k_metric():
    from embeddingtables_tpu.metrics import recall_at_k
    true = np.array([3, 7, 9])
    retrieved = np.array([[3, 1], [2, 4], [1, 9]])
    assert recall_at_k(true, retrieved) == pytest.approx(2 / 3)
