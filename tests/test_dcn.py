"""DCN-v2 model family: cross-layer math, training, lazy discipline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embeddingtables_tpu.models.dcn import (DCN, DCNConfig, cross_layers,
                                            dcn_forward, dcn_small_config,
                                            init_dcn, make_eval_step,
                                            make_train_step)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad


def _cfg(**kw):
    kw.setdefault("vocab_sizes", (50, 70, 30))
    kw.setdefault("num_dense", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("deep_mlp", (16, 8))
    kw.setdefault("cross_rank", 6)
    kw.setdefault("num_cross", 2)
    kw.setdefault("compute_dtype", jnp.float32)
    return DCNConfig(**kw)


def _batch(rng, cfg, b):
    dense = jnp.asarray(rng.standard_normal((b, cfg.num_dense))
                        .astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, v, b) for v in cfg.vocab_sizes]).astype(np.int32))
    label = jnp.asarray((rng.random(b) > 0.5).astype(np.float32))
    return dense, cat, label


def test_cross_layer_matches_numpy_low_rank():
    rng = np.random.default_rng(0)
    B, F, R = 5, 12, 4
    x0 = rng.standard_normal((B, F)).astype(np.float32)
    u = rng.standard_normal((F, R)).astype(np.float32)
    v = rng.standard_normal((F, R)).astype(np.float32)
    b = rng.standard_normal(F).astype(np.float32)
    got = cross_layers([(jnp.asarray(u), jnp.asarray(v), jnp.asarray(b))],
                       jnp.asarray(x0), jnp.float32)
    want = x0 * (x0 @ v @ u.T + b) + x0
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_cross_layer_matches_numpy_full_rank():
    rng = np.random.default_rng(1)
    B, F = 4, 9
    x0 = rng.standard_normal((B, F)).astype(np.float32)
    w = rng.standard_normal((F, F)).astype(np.float32)
    b = rng.standard_normal(F).astype(np.float32)
    # Two stacked layers with the same W: x2 = x0*(W x1 + b) + x1.
    got = cross_layers([(jnp.asarray(w), jnp.asarray(b))] * 2,
                       jnp.asarray(x0), jnp.float32)
    x1 = x0 * (x0 @ w + b) + x0
    want = x0 * (x1 @ w + b) + x1
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("structure", ["stacked", "parallel"])
@pytest.mark.parametrize("rank", [None, 6])
def test_dcn_forward_shapes(structure, rank):
    rng = np.random.default_rng(2)
    cfg = _cfg(structure=structure, cross_rank=rank)
    model = init_dcn(jax.random.key(0), cfg)
    dense, cat, _ = _batch(rng, cfg, 16)
    out = dcn_forward(model, dense, cat)
    assert out.shape == (16,) and out.dtype == jnp.float32
    # jitted eval path agrees.
    ev = make_eval_step(cfg)
    np.testing.assert_allclose(np.asarray(ev(model, dense, cat)),
                               np.asarray(out), rtol=1e-5, atol=1e-6)


def test_dcn_training_learns():
    # A learnable synthetic rule: label depends on one table's id parity.
    rng = np.random.default_rng(3)
    cfg = _cfg()
    model = init_dcn(jax.random.key(1), cfg,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.1))
    step = make_train_step(cfg, sparse_opt=SparseRowWiseAdaGrad(lr=0.1),
                           dense_lr=0.05)
    losses = []
    for _ in range(60):
        dense, cat, _ = _batch(rng, cfg, 64)
        label = jnp.asarray((np.asarray(cat[0]) % 2).astype(np.float32))
        model, loss = step(model, dense, cat, label)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.35, np.mean(losses[-10:])
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.1


def test_dcn_update_touches_only_looked_up_rows():
    # The lazy discipline: rows outside the batch's id set never move.
    rng = np.random.default_rng(4)
    cfg = _cfg()
    model = init_dcn(jax.random.key(2), cfg)
    before = np.asarray(model.tables.data).copy()
    step = make_train_step(cfg, jit=False)
    dense, cat, label = _batch(rng, cfg, 8)
    g = model.tables.shift_indices([cat[i] for i in range(cfg.num_tables)])
    touched = np.unique(np.asarray(g).reshape(-1))
    model, _ = step(model, dense, cat, label)
    after = np.asarray(model.tables.data)
    untouched = np.setdiff1d(np.arange(before.shape[0]), touched)
    np.testing.assert_array_equal(after[untouched], before[untouched])
    assert not np.allclose(after[touched], before[touched])


def test_dcn_bag_mean_combiner():
    rng = np.random.default_rng(5)
    cfg = _cfg(bag=3, combiner="mean")
    model = init_dcn(jax.random.key(3), cfg)
    b = 8
    dense = jnp.asarray(rng.standard_normal((b, cfg.num_dense))
                        .astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, v, (b, 3)) for v in cfg.vocab_sizes])
        .astype(np.int32))
    label = jnp.asarray((rng.random(b) > 0.5).astype(np.float32))
    out = dcn_forward(model, dense, cat)
    assert out.shape == (b,)
    step = make_train_step(cfg, jit=False)
    model2, loss = step(model, dense, cat, label)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(model2.tables.data),
                           np.asarray(model.tables.data))


def test_train_dcn_loop_learns():
    # End-to-end loop driver (single-chip + sharded) on synthetic Criteo.
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_dcn
    from embeddingtables_tpu.parallel.mesh import default_mesh
    vocab = (80, 80, 80)
    cfg = DCNConfig(vocab_sizes=vocab, num_dense=4, dim=16,
                    num_cross=2, cross_rank=8, deep_mlp=(32, 16),
                    compute_dtype=jnp.float32)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=4, batch_size=256,
                          seed=11)
    eval_batches = list(gen.batches(2))
    res = train_dcn(cfg, gen.batches(), 40,
                    sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                    dense_lr=0.05, eval_batches=eval_batches, eval_every=20,
                    log_every=10, verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.aucs and res.aucs[-1][1] > 0.6
    # Sharded loop reaches comparable quality.
    mesh = default_mesh(("data",))
    res_s = train_dcn(cfg, gen.batches(), 30,
                      sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                      dense_lr=0.05, eval_batches=eval_batches,
                      eval_every=30, mesh=mesh, log_every=10, verbose=False)
    assert res_s.losses[-1] < res_s.losses[0]
    assert res_s.aucs[-1][1] > 0.6


def test_dcn_config_validation():
    with pytest.raises(ValueError):
        _cfg(structure="bogus")
    with pytest.raises(ValueError):
        _cfg(num_cross=0)
    cfg = dcn_small_config(vocab=1000, dim=8, num_dense=4,
                           deep_mlp=(16, 8), compute_dtype=jnp.float32)
    assert cfg.num_tables == 26
    assert cfg.input_features == 26 * 8 + 4


def test_dcn_microbatch_step_matches_monolithic():
    cfg = _cfg(compute_dtype=jnp.float32)
    model = init_dcn(jax.random.key(0), cfg,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.3, eps=1e-6))
    rng = np.random.default_rng(6)
    b = 32
    dense = jnp.asarray(rng.normal(size=(b, cfg.num_dense)).astype(np.float32))
    cat = jnp.asarray(np.stack([rng.integers(0, v, b).astype(np.int32)
                                for v in cfg.vocab_sizes]))
    label = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
    mk = lambda **kw: make_train_step(            # noqa: E731
        cfg, sparse_opt=SparseRowWiseAdaGrad(lr=0.3, eps=1e-6),
        dense_lr=0.3, jit=False, **kw)
    m1, loss1 = mk()(model, dense, cat, label)
    mK, lossK = mk(microbatch=4)(model, dense, cat, label)
    np.testing.assert_allclose(float(lossK), float(loss1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mK.tables.data),
                               np.asarray(m1.tables.data),
                               rtol=2e-5, atol=1e-7)
    flat1, _ = jax.tree_util.tree_flatten((m1.cross, m1.deep, m1.head))
    flatK, _ = jax.tree_util.tree_flatten((mK.cross, mK.deep, mK.head))
    for a, bb in zip(flat1, flatK):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-5, atol=1e-7)


def test_train_dcn_guard_wired(tmp_path):
    """The DCN loop feeds losses to the divergence guard at log cadence."""
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_dcn
    from embeddingtables_tpu.utils.resilience import DivergenceGuard

    class SpyGuard(DivergenceGuard):
        seen = 0

        def observe(self, loss, model):
            SpyGuard.seen += 1
            return super().observe(loss, model)

    vocab = (50, 50)
    cfg = DCNConfig(vocab_sizes=vocab, num_dense=3, dim=8, num_cross=1,
                    cross_rank=4, deep_mlp=(8,), compute_dtype=jnp.float32)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=3, batch_size=64,
                          seed=2)
    train_dcn(cfg, gen.batches(), 6, log_every=2, verbose=False,
              guard=SpyGuard(ckpt=None))
    assert SpyGuard.seen >= 3


def test_train_dcn_eviction_single_chip():
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_dcn
    vocab = (80, 80)
    cfg = DCNConfig(vocab_sizes=vocab, num_dense=3, dim=8, num_cross=1,
                    cross_rank=4, deep_mlp=(8,), compute_dtype=jnp.float32)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=3, batch_size=64,
                          seed=5, zipf_a=1.5)
    res = train_dcn(cfg, gen.batches(), 16,
                    sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                    log_every=8, evict_every=8, evict_threshold=0.3,
                    freq_decay=0.5, verbose=False)
    assert res.evicted_rows > 0
    assert np.isfinite(np.asarray(res.model.tables.data)).all()


@pytest.mark.parametrize("placement", ["mesh", "plan"])
def test_train_dcn_eviction_on_mesh_and_plan(placement):
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_dcn
    from embeddingtables_tpu.parallel.mesh import default_mesh
    vocab = (80, 1024)
    cfg = DCNConfig(vocab_sizes=vocab, num_dense=3, dim=8, num_cross=1,
                    cross_rank=4, deep_mlp=(8,), compute_dtype=jnp.float32)
    mesh = default_mesh(("data",))
    plan = None
    if placement == "plan":
        from embeddingtables_tpu.parallel.planner import plan_sharding
        plan = plan_sharding(vocab, 8, mesh,
                             replicate_max_bytes=8 * 4 * 128,
                             opt_state_scalars=1)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=3, batch_size=64,
                          seed=5, zipf_a=1.5)
    res = train_dcn(cfg, gen.batches(), 16,
                    sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                    mesh=mesh, plan=plan, log_every=8, evict_every=8,
                    evict_threshold=0.3, freq_decay=0.5, verbose=False)
    assert res.evicted_rows > 0
    # Some rows were zeroed (init is uniform nonzero everywhere).
    if placement == "plan":
        tab = np.concatenate([np.asarray(res.model.tables.table(t))
                              for t in range(2)])
    else:
        tab = np.asarray(res.model.tables.unshard())
    assert (np.abs(tab).sum(axis=1) == 0.0).any()
