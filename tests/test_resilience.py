"""Divergence guard + auto-resume (failure-recovery obligations,
SURVEY.md §5 — absent in the reference)."""
import numpy as np

import jax
import jax.numpy as jnp

from embeddingtables_tpu.models import DLRMConfig, init_dlrm
from embeddingtables_tpu.utils import CheckpointManager
from embeddingtables_tpu.utils.resilience import (DivergenceGuard,
                                                  resume_or_init)


def tiny_model(seed=0):
    cfg = DLRMConfig(vocab_sizes=(30, 40), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    return init_dlrm(jax.random.key(seed), cfg)


def test_guard_rolls_back_on_nan(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    model = tiny_model()
    mgr.save(10, model)
    guard = DivergenceGuard(ckpt=mgr)

    # healthy losses build the running mean
    m, rolled = guard.observe(0.7, model)
    assert not rolled
    m, rolled = guard.observe(0.69, model)
    assert not rolled

    # mutate the model (as if a bad step happened), then hit a NaN
    bad = jax.tree_util.tree_map(lambda x: x + 100.0, model)
    m, rolled = guard.observe(float("nan"), bad)
    assert rolled and guard.rollbacks == 1
    np.testing.assert_array_equal(np.asarray(m.tables.data),
                                  np.asarray(model.tables.data))


def test_guard_spike_detection():
    guard = DivergenceGuard(ckpt=None, spike_factor=5.0)
    model = object()
    for _ in range(5):
        _, rolled = guard.observe(0.5, model)
        assert not rolled
    _, rolled = guard.observe(50.0, model)   # 100x the mean
    assert rolled
    _, rolled = guard.observe(0.55, model)   # recovers
    assert not rolled


def test_resume_or_init(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    calls = []

    def init_fn():
        calls.append(1)
        return tiny_model(seed=3)

    m0, step = resume_or_init(mgr, init_fn)
    assert step == 0 and len(calls) == 1

    mgr.save(42, m0)
    m1, step = resume_or_init(mgr, init_fn, template=m0)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(m1.tables.data),
                                  np.asarray(m0.tables.data))
