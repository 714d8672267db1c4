"""End-to-end training-loop driver tests: loss/AUC trajectory, checkpointing,
single-chip vs sharded loop parity of results."""
import numpy as np

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
