"""DeepFM model family: FM algebra, lazy-gradient parity, training sanity.

Pattern mirrors tests/test_dcn.py: the lazy-sparse train step is checked
against full dense autodiff through an equivalent jnp.take-based forward
(SGD is linear, so one step must match to float tolerance), plus a
convergence run.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.models.deepfm import (DeepFM, DeepFMConfig,
                                               deepfm_forward,
                                               fm_second_order, init_deepfm,
                                               make_eval_step,
                                               make_train_step)
from embeddingtables_tpu.models.dlrm import bce_loss
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad

# This module pins the LEGACY two-stack layout (fold_fm_w=False) — it
# asserts directly on the fm_w stack. The folded (default) layout is
# covered by tests/test_deepfm_fold.py, including exact fold-vs-legacy
# parity.
CFG = DeepFMConfig(vocab_sizes=(50, 70, 30), num_dense=5, dim=8,
                   deep_mlp=(16, 8), compute_dtype=jnp.float32,
                   fold_fm_w=False)


def make_batch(rng, cfg, b=16, bag=None):
    shape = (cfg.num_tables, b) if bag is None else (cfg.num_tables, b, bag)
    cat = np.stack([rng.integers(0, v, size=shape[1:])
                    for v in cfg.vocab_sizes]).astype(np.int32)
    dense = rng.standard_normal((b, cfg.num_dense)).astype(np.float32)
    label = (rng.random(b) < 0.3).astype(np.float32)
    return jnp.asarray(dense), jnp.asarray(cat), jnp.asarray(label)


def test_fm_second_order_matches_pairwise_oracle():
    rng = np.random.default_rng(0)
    T, B, D = 6, 9, 5
    v = rng.standard_normal((T, B, D)).astype(np.float32)
    got = np.asarray(fm_second_order(jnp.asarray(v)))
    exp = np.zeros(B, np.float32)
    for i in range(T):
        for j in range(i + 1, T):
            exp += (v[i] * v[j]).sum(axis=-1)
    np.testing.assert_allclose(got, exp, atol=1e-4)


def dense_forward(model: DeepFM, dense, cat, tables_data, fm_data):
    """Fully-differentiable forward taking the table arrays as explicit
    arguments (dense-autodiff oracle)."""
    cfg = model.config
    t = cfg.num_tables
    g = jnp.stack([cat[i] + model.tables.offsets[i] for i in range(t)])
    emb_t = jnp.take(tables_data, g.reshape(-1), axis=0).reshape(
        t, cat.shape[1], cfg.dim)
    w_t = jnp.take(fm_data, g.reshape(-1), axis=0).reshape(
        t, cat.shape[1], 1)
    from embeddingtables_tpu.models.deepfm import forward_from_embeddings
    return forward_from_embeddings(
        (model.deep, model.head, model.dense_w, model.bias), cfg, dense,
        emb_t, w_t)


def test_forward_matches_dense_oracle():
    rng = np.random.default_rng(1)
    model = init_deepfm(jax.random.PRNGKey(0), CFG)
    dense, cat, _ = make_batch(rng, CFG)
    got = deepfm_forward(model, dense, cat)
    exp = dense_forward(model, dense, cat, model.tables.data,
                        model.fm_w.data)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5)


def test_train_step_matches_dense_autodiff_sgd():
    """One lazy-sparse SGD step == one dense-autodiff SGD step on both
    stacked ensembles and the dense params."""
    from embeddingtables_tpu.optim import SparseSGD
    rng = np.random.default_rng(2)
    lr = 0.1
    model = init_deepfm(jax.random.PRNGKey(1), CFG)
    dense, cat, label = make_batch(rng, CFG)
    step = make_train_step(CFG, sparse_opt=SparseSGD(lr=lr), dense_lr=lr,
                           jit=False)
    ref = init_deepfm(jax.random.PRNGKey(1), CFG)  # same init

    new_model, loss = step(model, dense, cat, label)

    def dense_loss(params):
        deep, head, dw, bias, tdata, fdata = params
        m = dataclasses.replace(ref, deep=deep, head=head, dense_w=dw,
                                bias=bias)
        logits = dense_forward(m, dense, cat, tdata, fdata)
        return bce_loss(logits, label)

    params = (ref.deep, ref.head, ref.dense_w, ref.bias, ref.tables.data,
              ref.fm_w.data)
    lval, grads = jax.value_and_grad(dense_loss)(params)
    np.testing.assert_allclose(float(loss), float(lval), atol=1e-6)
    exp = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    np.testing.assert_allclose(np.asarray(new_model.tables.data),
                               np.asarray(exp[4]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_model.fm_w.data),
                               np.asarray(exp[5]), atol=1e-6)
    for got_l, exp_l in zip(jax.tree.leaves(
            (new_model.deep, new_model.head, new_model.dense_w,
             new_model.bias)), jax.tree.leaves(exp[:4])):
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(exp_l),
                                   atol=1e-5)


@pytest.mark.parametrize("bag,combiner", [(None, "sum"), (4, "sum"),
                                          (4, "mean")])
def test_training_reduces_loss(bag, combiner):
    cfg = dataclasses.replace(CFG, bag=bag, combiner=combiner)
    rng = np.random.default_rng(3)
    model = init_deepfm(jax.random.PRNGKey(2), cfg,
                        sparse_opt=SparseRowWiseAdaGrad(lr=0.1))
    step = make_train_step(cfg, sparse_opt=SparseRowWiseAdaGrad(lr=0.1),
                           dense_lr=0.05)
    # A learnable synthetic signal: label depends on table 0's category.
    # With bags, table 0's bag repeats ONE id (a one-hot bag) so the signal
    # survives the bag reduction cleanly.
    losses = []
    for it in range(40):
        dense, cat, _ = make_batch(rng, cfg, b=64, bag=bag)
        if bag is not None:
            cat = np.array(cat)
            cat[0] = np.broadcast_to(cat[0][:, :1], cat[0].shape)
            cat = jnp.asarray(cat)
        key_feat = np.asarray(cat[0]).reshape(64, -1)[:, 0]
        label = jnp.asarray((key_feat % 2).astype(np.float32))
        model, loss = step(model, dense, cat, label)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:5]), (
        losses[:3], losses[-3:])


def test_ablation_flags():
    rng = np.random.default_rng(4)
    dense, cat, _ = make_batch(rng, CFG)
    # use_fm=False is a TRUE deep-only ablation: the output must not depend
    # on the fm_w stack or the dense linear weights at all.
    cfg = dataclasses.replace(CFG, use_fm=False)
    m = init_deepfm(jax.random.PRNGKey(3), cfg)
    out = make_eval_step(cfg)(m, dense, cat)
    assert np.all(np.isfinite(np.asarray(out)))
    m2 = dataclasses.replace(
        m,
        fm_w=dataclasses.replace(m.fm_w, data=m.fm_w.data + 100.0),
        dense_w=m.dense_w + 100.0)
    out2 = make_eval_step(cfg)(m2, dense, cat)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # Plain FM: use_deep=False works with an EMPTY deep_mlp (no tower is
    # built at all).
    cfg = dataclasses.replace(CFG, use_deep=False, deep_mlp=())
    m = init_deepfm(jax.random.PRNGKey(3), cfg)
    out = make_eval_step(cfg)(m, dense, cat)
    assert np.all(np.isfinite(np.asarray(out)))
    assert m.deep == []
    with pytest.raises(ValueError):
        dataclasses.replace(CFG, use_fm=False, use_deep=False)
    with pytest.raises(ValueError):
        dataclasses.replace(CFG, deep_mlp=())  # use_deep needs a tower


def test_use_fm_false_trains_without_touching_fm_stack():
    cfg = dataclasses.replace(CFG, use_fm=False)
    rng = np.random.default_rng(6)
    model = init_deepfm(jax.random.PRNGKey(5), cfg)
    dense, cat, label = make_batch(rng, cfg)
    step = make_train_step(cfg, dense_lr=0.1, jit=False)
    new_model, loss = step(model, dense, cat, label)
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(np.asarray(new_model.fm_w.data),
                                  np.asarray(model.fm_w.data))
    assert not np.array_equal(np.asarray(new_model.tables.data),
                              np.asarray(model.tables.data))


def test_train_deepfm_loop_learns_and_checkpoints(tmp_path):
    """End-to-end loop: AUC above chance, loss falling, checkpoints saved,
    eviction wired to BOTH ensembles, FTRL as the sparse optimizer."""
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models.train import train_deepfm
    from embeddingtables_tpu.optim import SparseFTRL
    from embeddingtables_tpu.utils import CheckpointManager

    vocab = (80, 80, 80)
    cfg = DeepFMConfig(vocab_sizes=vocab, num_dense=4, dim=16,
                       deep_mlp=(32, 16), compute_dtype=jnp.float32,
                       fold_fm_w=False)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=4, batch_size=256,
                          seed=11)
    eval_batches = list(gen.batches(2))
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    res = train_deepfm(cfg, gen.batches(), 40,
                       sparse_opt=SparseFTRL(lr=0.2, l2=0.01),
                       dense_lr=0.05, eval_batches=eval_batches,
                       eval_every=20, ckpt_manager=mgr, ckpt_every=20,
                       log_every=10, evict_every=20, evict_threshold=1e-9,
                       verbose=False)
    assert res.losses[-1] < res.losses[0]
    assert res.aucs and res.aucs[-1][1] > 0.6
    assert res.examples_per_sec > 0
    assert mgr.latest_step() == 40
    restored = mgr.restore_latest(res.model)
    np.testing.assert_array_equal(np.asarray(restored.tables.data),
                                  np.asarray(res.model.tables.data))
    np.testing.assert_array_equal(np.asarray(restored.fm_w.data),
                                  np.asarray(res.model.fm_w.data))


def test_eval_step_matches_forward():
    rng = np.random.default_rng(5)
    model = init_deepfm(jax.random.PRNGKey(4), CFG)
    dense, cat, _ = make_batch(rng, CFG)
    got = make_eval_step(CFG)(model, dense, cat)
    exp = deepfm_forward(model, dense, cat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-6)


@pytest.mark.parametrize("use_fm", [True, False])
def test_microbatch_matches_monolithic(use_fm):
    """Gradient accumulation (lax.scan over 4 slices) matches the
    monolithic step on BOTH stacks — the DLRM/DCN microbatch contract
    extended to DeepFM's two activation sets."""
    cfg = dataclasses.replace(CFG, use_fm=use_fm)
    rng = np.random.default_rng(31)
    opt = lambda: SparseRowWiseAdaGrad(lr=0.2)  # noqa: E731
    m_mono = init_deepfm(jax.random.key(3), cfg, sparse_opt=opt())
    m_micro = init_deepfm(jax.random.key(3), cfg, sparse_opt=opt())
    step_mono = make_train_step(cfg, sparse_opt=opt(), dense_lr=0.1,
                                jit=False)
    step_micro = make_train_step(cfg, sparse_opt=opt(), dense_lr=0.1,
                                 jit=False, microbatch=4)
    for i in range(2):
        dense, cat, label = make_batch(rng, cfg, b=32)
        m_mono, loss_a = step_mono(m_mono, dense, cat, label)
        m_micro, loss_b = step_micro(m_micro, dense, cat, label)
        np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_micro.tables.data),
                               np.asarray(m_mono.tables.data),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_micro.fm_w.data),
                               np.asarray(m_mono.fm_w.data),
                               rtol=2e-4, atol=1e-6)
