"""Sparse-optimizer regularization: lazy weight decay, per-row clipnorm,
and lazy Adam — all against hand-computed dense oracles on touched rows."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.optim import (SparseLazyAdam, SparseRowWiseAdaGrad,
                                       SparseSGD)


def make(rng, V=40, D=8, n=15):
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, n).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((n, D)).astype(np.float32))
    return data, et.SparseEmbeddingUpdate(delta=delta, indices=idx)


def dense_grad(upd, V):
    return np.asarray(et.uncompress(upd, V))


def test_sgd_lazy_weight_decay():
    rng = np.random.default_rng(0)
    V = 40
    data, upd = make(rng, V=V)
    opt = SparseSGD(lr=0.5, weight_decay=0.1)
    new, _ = opt.apply(data, upd, opt.init(data))
    g = dense_grad(upd, V)
    touched = (g != 0).any(axis=1)
    expect = np.asarray(data).copy()
    # Decoupled (AdamW-style) lazy decay: applied AFTER the gradient step,
    # touched rows only — the one convention shared by all optimizers here.
    expect[touched] = (expect[touched] - 0.5 * g[touched]) * (1 - 0.5 * 0.1)
    np.testing.assert_allclose(np.asarray(new), expect, rtol=1e-5,
                               atol=1e-7)
    # Untouched rows are EXACT fixed points (lazy semantics).
    np.testing.assert_array_equal(np.asarray(new)[~touched],
                                  np.asarray(data)[~touched])


def test_sgd_clipnorm_applies_to_accumulated_row_grad():
    rng = np.random.default_rng(1)
    V, D = 20, 4
    data = jnp.zeros((V, D), jnp.float32)
    # Two occurrences of row 3 that each have norm < clip but sum > clip:
    # clipping must apply AFTER accumulation.
    idx = jnp.asarray([3, 3], jnp.int32)
    delta = jnp.asarray([[3.0, 0, 0, 0], [3.0, 0, 0, 0]], jnp.float32)
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)
    opt = SparseSGD(lr=1.0, clipnorm=4.0)
    new, _ = opt.apply(data, upd, opt.init(data))
    # Accumulated grad = (6,0,0,0), norm 6 -> clipped to (4,0,0,0).
    np.testing.assert_allclose(np.asarray(new)[3], [-4.0, 0, 0, 0],
                               rtol=1e-6)


@pytest.mark.parametrize("clip", [None, 0.5])
def test_adagrad_weight_decay_clip_dense(clip):
    rng = np.random.default_rng(2)
    V = 40
    data, upd = make(rng, V=V)
    opt = SparseRowWiseAdaGrad(lr=0.3, weight_decay=0.05, clipnorm=clip,
                               initial_accum=0.1)
    new, st = opt.apply(data, upd, opt.init(data))
    g = dense_grad(upd, V)
    if clip is not None:
        norms = np.linalg.norm(g, axis=1, keepdims=True)
        g = g * np.minimum(1.0, clip / np.maximum(norms, 1e-12))
    touched = (g != 0).any(axis=1)
    acc = 0.1 + (g ** 2).mean(axis=1)
    expect = np.asarray(data) - 0.3 * g / np.sqrt(acc + opt.eps)[:, None]
    expect[touched] *= (1 - 0.3 * 0.05)
    np.testing.assert_allclose(np.asarray(new), expect, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.accum), acc, rtol=1e-6)
    # indexer method must refuse (regularizers are dense-path only).
    with pytest.raises(ValueError, match="dense"):
        opt.apply(data, upd, opt.init(data), method="indexer")


def test_lazy_adam_matches_reference_math_and_is_lazy():
    rng = np.random.default_rng(3)
    V, D = 30, 8
    data, upd = make(rng, V=V, D=D, n=12)
    opt = SparseLazyAdam(lr=0.1, b1=0.9, b2=0.99)
    st = opt.init(data)
    new, st1 = opt.apply(data, upd, st)
    g = dense_grad(upd, V)
    touched = (g != 0).any(axis=1)

    m = np.where(touched[:, None], 0.9 * 0 + 0.1 * g, 0.0)
    v = np.where(touched[:, None], 0.01 * g * g, 0.0)
    mhat = m / (1 - 0.9)
    vhat = v / (1 - 0.99)
    step = 0.1 * mhat / (np.sqrt(vhat) + opt.eps)
    expect = np.asarray(data) - np.where(touched[:, None], step, 0.0)
    np.testing.assert_allclose(np.asarray(new), expect, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st1.m), m, rtol=1e-6, atol=1e-7)
    assert int(st1.count) == 1
    # Laziness: untouched rows and their moments unchanged.
    np.testing.assert_array_equal(np.asarray(new)[~touched],
                                  np.asarray(data)[~touched])

    # Second step with a different touched set advances count and keeps
    # old moments where untouched.
    _, upd2 = make(rng, V=V, D=D, n=5)
    new2, st2 = opt.apply(new, upd2, st1)
    g2 = dense_grad(upd2, V)
    untouched2 = ~(g2 != 0).any(axis=1)
    np.testing.assert_array_equal(np.asarray(st2.m)[untouched2],
                                  np.asarray(st1.m)[untouched2])
    assert int(st2.count) == 2


def test_lazy_adam_trains_a_table():
    # Sanity: lazy Adam reduces a simple regression loss through the lazy
    # update pipeline (lookup_vjp -> SparseEmbeddingUpdate -> apply).
    rng = np.random.default_rng(4)
    V, D, B = 25, 8, 16
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    opt = SparseLazyAdam(lr=0.05)
    st = opt.init(data)
    losses = []
    for i in range(60):
        idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
        out, pull = et.lookup_vjp(data, idx)
        delta = 2 * (out - target[idx]) / B
        losses.append(float(((out - target[idx]) ** 2).mean()))
        data, st = opt.apply(data, pull(delta), st)
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])


def test_sharded_step_rejects_unsupported_optimizer():
    # Round 2: Adam/FTRL are supported on the mesh now; the guard must
    # still reject optimizers the shard bodies do not implement.
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.parallel.dlrm import make_sharded_train_step
    from embeddingtables_tpu.parallel.mesh import default_mesh
    cfg = DLRMConfig(vocab_sizes=(16, 16), num_dense=4, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1))
    mesh = default_mesh(("data",))

    class NotAnOptimizer:
        lr = 0.1

    with pytest.raises(NotImplementedError, match="NotAnOptimizer"):
        make_sharded_train_step(cfg, mesh, sparse_opt=NotAnOptimizer())


def test_ensemble_update_regularized_sgd_protocol_table():
    # Review finding: regularized SGD on a protocol table must NOT silently
    # drop weight_decay/clipnorm through the plain scatter path.
    rng = np.random.default_rng(7)
    data = rng.standard_normal((30, 8)).astype(np.float32)
    upd = et.SparseEmbeddingUpdate(
        delta=jnp.asarray(rng.standard_normal((9, 8)).astype(np.float32)),
        indices=jnp.asarray(rng.integers(0, 30, 9).astype(np.int32)))
    opt = SparseSGD(0.5, weight_decay=0.2, clipnorm=0.8)
    [simple_new], _ = et.ensemble_update(
        opt, [et.SimpleEmbedding(jnp.asarray(data))], [upd])
    [split_new], _ = et.ensemble_update(opt, [et.SplitEmbedding(data, 11)],
                                        [upd])
    np.testing.assert_allclose(np.asarray(split_new.materialize()),
                               np.asarray(simple_new.data), rtol=1e-5,
                               atol=1e-6)


def test_sharded_regularized_adagrad_matches_single_chip():
    # Review finding: the sharded bodies must honor weight_decay/clipnorm
    # (they share optim.adagrad_dense_body with the single-chip path).
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_train_step
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm)
    from embeddingtables_tpu.parallel.mesh import default_mesh
    opt = lambda: SparseRowWiseAdaGrad(lr=0.3, weight_decay=0.05,  # noqa
                                       clipnorm=0.5)
    cfg = DLRMConfig(vocab_sizes=(40, 56), num_dense=4, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32)
    rng = np.random.default_rng(8)
    dense = rng.normal(size=(16, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, 16).astype(np.float32)

    m1 = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt())
    m1, _ = make_train_step(cfg, sparse_opt=opt(), dense_lr=0.3, jit=False)(
        m1, jnp.asarray(dense), jnp.asarray(cat), jnp.asarray(label))

    mesh = default_mesh(("data",))
    sm = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                    mesh, "data", sparse_opt=opt())
    sd, sc, sl = batch_shardings(mesh)
    step = make_sharded_train_step(cfg, mesh, sparse_opt=opt(), dense_lr=0.3)
    sm, _ = step(sm, jax.device_put(dense, sd), jax.device_put(cat, sc),
                 jax.device_put(label, sl))
    np.testing.assert_allclose(np.asarray(sm.tables.unshard()),
                               np.asarray(m1.tables.data), rtol=2e-4,
                               atol=1e-6)

def test_a2a_regularized_sgd_matches_single_chip():
    # The butterfly exchange shares optim.sgd_dense_body per owner shard, so
    # decay/clip match the single-chip step (ample capacity -> no drops).
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_train_step
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm)
    from embeddingtables_tpu.parallel.mesh import default_mesh
    opt = lambda: SparseSGD(0.4, weight_decay=0.1, clipnorm=0.5)  # noqa
    cfg = DLRMConfig(vocab_sizes=(40, 56), num_dense=4, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32)
    rng = np.random.default_rng(9)
    dense = rng.normal(size=(16, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, 16).astype(np.float32)

    m1 = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt())
    m1, _ = make_train_step(cfg, sparse_opt=opt(), dense_lr=0.4, jit=False)(
        m1, jnp.asarray(dense), jnp.asarray(cat), jnp.asarray(label))

    mesh = default_mesh(("data",))
    sm = shard_dlrm(init_dlrm(jax.random.key(0), cfg, sparse_opt=opt()),
                    mesh, "data", sparse_opt=opt())
    sd, sc, sl = batch_shardings(mesh)
    step = make_sharded_train_step(cfg, mesh, sparse_opt=opt(), dense_lr=0.4,
                                   exchange="a2a", capacity_factor=32.0)
    sm, _ = step(sm, jax.device_put(dense, sd), jax.device_put(cat, sc),
                 jax.device_put(label, sl))
    np.testing.assert_allclose(np.asarray(sm.tables.unshard()),
                               np.asarray(m1.tables.data), rtol=2e-4,
                               atol=1e-6)
