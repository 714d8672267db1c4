"""End-to-end DLRM tests: forward shapes, gradient laziness, training quality.

Mirrors the reference's end-to-end grad-through-loss tests
(`/root/reference/test/map.jl:109-177`) at model scale, plus the new
obligation (SURVEY.md §4): learnability on synthetic Criteo-like data.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.data import SyntheticCriteo
from embeddingtables_tpu.metrics import auc
from embeddingtables_tpu.models import (DLRMConfig, init_dlrm, make_eval_step,
                                        make_train_step)
from embeddingtables_tpu.models.dlrm import (bce_loss, dlrm_forward,
                                             dot_interaction,
                                             embedding_forward)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD


def tiny_cfg(**kw):
    kw.setdefault("vocab_sizes", (50, 70, 30))
    kw.setdefault("num_dense", 4)
    kw.setdefault("dim", 8)
    kw.setdefault("bottom_mlp", (16, 8))
    kw.setdefault("top_mlp", (16, 1))
    kw.setdefault("compute_dtype", jnp.float32)
    return DLRMConfig(**kw)


def synth_batch(cfg, b=32, seed=0, bag=None):
    rng = np.random.default_rng(seed)
    dense = rng.normal(size=(b, cfg.num_dense)).astype(np.float32)
    shape = (b,) if bag is None else (b, bag)
    cat = np.stack([rng.integers(0, v, shape).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, b).astype(np.float32)
    return dense, cat, label


def test_forward_shapes_and_interaction():
    cfg = tiny_cfg()
    model = init_dlrm(jax.random.key(0), cfg)
    dense, cat, _ = synth_batch(cfg)
    logits = dlrm_forward(model, dense, cat)
    assert logits.shape == (32,)
    assert logits.dtype == jnp.float32

    # dot interaction feature count: dim + C(T+1, 2)
    t1 = cfg.num_tables + 1
    assert cfg.interaction_features == cfg.dim + t1 * (t1 - 1) // 2


def test_embedding_forward_matches_per_table_lookup():
    cfg = tiny_cfg()
    model = init_dlrm(jax.random.key(1), cfg)
    dense, cat, _ = synth_batch(cfg, seed=3)
    emb = embedding_forward(model.tables, jnp.asarray(cat))
    for t in range(cfg.num_tables):
        table = model.tables.table(t)
        expect = et.lookup(table, cat[t])
        np.testing.assert_array_equal(np.asarray(emb[t]), np.asarray(expect))


def test_dot_interaction_is_pairwise_dots():
    b, t, d = 4, 3, 8
    rng = np.random.default_rng(0)
    bot = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    out = dot_interaction(bot, emb, self_interaction=False)
    z = np.concatenate([np.asarray(bot)[:, None], np.asarray(emb)], axis=1)
    # First d features are the bottom output; rest are strict-lower-tri dots.
    np.testing.assert_allclose(np.asarray(out[:, :d]), np.asarray(bot))
    k = d
    for i in range(t + 1):
        for j in range(i):
            expect = (z[:, i] * z[:, j]).sum(-1)
            np.testing.assert_allclose(np.asarray(out[:, k]), expect,
                                       rtol=1e-5)
            k += 1
    assert k == out.shape[1]


@pytest.mark.parametrize("self_interaction", [False, True])
def test_dot_interaction_selection_matches_gather_branch(
        self_interaction, monkeypatch):
    """The MXU selection-matmul triangle extraction (the production branch,
    docs/DESIGN.md §10) must agree with the fancy-index fallback it
    replaced — the fallback still serves huge ensembles past
    `_SEL_MAX_ENTRIES`. Selection is exact (one nonzero per output
    column), so equality is bitwise."""
    from embeddingtables_tpu.models import dlrm as dlrm_mod
    b, t, d = 4, 5, 8
    rng = np.random.default_rng(1)
    bot = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    sel_out = dot_interaction(bot, emb, self_interaction)
    monkeypatch.setattr(dlrm_mod, "_SEL_MAX_ENTRIES", 0)  # force fallback
    gather_out = dot_interaction(bot, emb, self_interaction)
    np.testing.assert_array_equal(np.asarray(sel_out),
                                  np.asarray(gather_out))


@pytest.mark.parametrize("bag", [None, 3])
def test_train_step_runs_and_matches_dense_oracle_grad(bag):
    """One train step's embedding update must equal the dense-table oracle:
    jax.grad through the full model w.r.t. the stacked table (materialized
    dense), applied as plain SGD."""
    cfg = tiny_cfg(bag=bag)
    model = init_dlrm(jax.random.key(2), cfg)
    dense, cat, label = synth_batch(cfg, b=16, seed=7, bag=bag)
    lr = 0.5

    # Oracle: dense gradient w.r.t. the whole stacked array.
    def loss_of(data, bottom, top):
        from embeddingtables_tpu.models.dlrm import forward_from_embeddings
        import dataclasses
        tables = dataclasses.replace(model.tables, data=data)
        emb = embedding_forward(tables, jnp.asarray(cat))
        logits = forward_from_embeddings(bottom, top, cfg, dense, emb)
        return bce_loss(logits, jnp.asarray(label))

    g_data = jax.grad(loss_of, argnums=0)(
        model.tables.data, model.bottom, model.top)
    expect_data = model.tables.data - lr * g_data

    step = make_train_step(cfg, sparse_opt=SparseSGD(lr), dense_lr=lr,
                           jit=False)
    new_model, loss = step(model, jnp.asarray(dense), jnp.asarray(cat),
                           jnp.asarray(label))
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(new_model.tables.data),
                               np.asarray(expect_data), rtol=1e-4, atol=1e-6)


def test_training_learns_synthetic_criteo():
    """Loss decreases and AUC beats chance on learnable synthetic data —
    the AUC-parity smoke test (BASELINE.md north star, scaled down)."""
    vocab = (100, 100, 100, 100)
    cfg = DLRMConfig(vocab_sizes=vocab, num_dense=4, dim=16,
                     bottom_mlp=(32, 16), top_mlp=(32, 1),
                     compute_dtype=jnp.float32)
    gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=4, batch_size=512,
                          seed=5)
    model = init_dlrm(jax.random.key(3), cfg,
                      sparse_opt=SparseRowWiseAdaGrad(lr=0.05))
    step = make_train_step(cfg, sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                           dense_lr=0.05)
    losses = []
    it = gen.batches()
    for i in range(60):
        b = next(it)
        model, loss = step(model, jnp.asarray(b["dense"]),
                           jnp.asarray(b["cat"]), jnp.asarray(b["label"]))
        losses.append(float(loss))
    eval_step = make_eval_step(cfg)
    b = next(it)
    scores = eval_step(model, jnp.asarray(b["dense"]), jnp.asarray(b["cat"]))
    a = auc(b["label"], np.asarray(scores))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.01, losses
    assert a > 0.65, a


def test_adagrad_state_advances_once_per_unique_row():
    """Row-state single-advance contract (SURVEY.md §2.4 item 8): repeated
    indices in one batch must bump the AdaGrad accumulator once, with the
    accumulated gradient."""
    opt = SparseRowWiseAdaGrad(lr=1.0, eps=0.0)
    data = jnp.zeros((4, 8), jnp.float32)
    state = opt.init(data)
    delta = jnp.ones((3, 8), jnp.float32)
    idx = jnp.asarray([2, 2, 1], jnp.int32)
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)
    new_data, new_state = opt.apply(data, upd, state)
    # Row 2 sees summed grad 2.0 -> accum = mean(4) = 4; row 1 -> accum 1.
    np.testing.assert_allclose(np.asarray(new_state.accum),
                               [0.0, 1.0, 4.0, 0.0])
    np.testing.assert_allclose(np.asarray(new_data[2]), -2.0 / 2.0)
    np.testing.assert_allclose(np.asarray(new_data[1]), -1.0)
    np.testing.assert_allclose(np.asarray(new_data[0]), 0.0)


def test_mean_combiner_train_step_matches_dense_oracle():
    """DLRM with combiner='mean' bags: one train step's table update equals
    jax.grad through the dense mean-bag formulation."""
    cfg = tiny_cfg(bag=3, combiner="mean")
    model = init_dlrm(jax.random.key(4), cfg)
    dense, cat, label = synth_batch(cfg, b=16, seed=11, bag=3)
    lr = 0.5

    def loss_of(data):
        import dataclasses
        from embeddingtables_tpu.models.dlrm import forward_from_embeddings
        tables = dataclasses.replace(model.tables, data=data)
        emb = embedding_forward(tables, jnp.asarray(cat), "mean")
        logits = forward_from_embeddings(model.bottom, model.top, cfg, dense,
                                         emb)
        return bce_loss(logits, jnp.asarray(label))

    g_data = jax.grad(loss_of)(model.tables.data)
    expect = model.tables.data - lr * g_data

    step = make_train_step(cfg, sparse_opt=SparseSGD(lr), dense_lr=lr,
                           jit=False)
    new_model, loss = step(model, jnp.asarray(dense), jnp.asarray(cat),
                           jnp.asarray(label))
    np.testing.assert_allclose(np.asarray(new_model.tables.data),
                               np.asarray(expect), rtol=1e-4, atol=1e-6)


def test_dense_tx_optax_adam():
    """Dense towers on optax.adam while tables ride the fused sparse path."""
    import optax
    cfg = tiny_cfg()
    tx = optax.adam(1e-2)
    model = init_dlrm(jax.random.key(7), cfg, sparse_opt=SparseSGD(0.5),
                      dense_tx=tx)
    assert model.dense_opt_state is not None
    step = make_train_step(cfg, sparse_opt=SparseSGD(0.5), dense_tx=tx,
                           jit=False)
    rng = np.random.default_rng(0)
    losses = []
    for i in range(60):
        dense = rng.normal(size=(64, cfg.num_dense)).astype(np.float32)
        cat = np.stack([rng.integers(0, v, 64).astype(np.int32)
                        for v in cfg.vocab_sizes])
        label = (cat[0] % 2).astype(np.float32)
        model, loss = step(model, jnp.asarray(dense), jnp.asarray(cat),
                           jnp.asarray(label))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.02, losses
    # adam state advanced (count > 0)
    import jax as _jax
    counts = [x for x in _jax.tree_util.tree_leaves(model.dense_opt_state)
              if getattr(x, "dtype", None) == jnp.int32]
    assert counts and int(counts[0]) == 60


@pytest.mark.parametrize("bag,opt_name", [(None, "sgd"), (2, "adagrad")])
def test_microbatch_step_matches_monolithic(bag, opt_name):
    """Gradient accumulation (lax.scan over B/k slices) is the same step."""
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
    cfg = DLRMConfig(vocab_sizes=(40, 60, 30), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1), bag=bag,
                     combiner="mean" if bag else "sum",
                     compute_dtype=jnp.float32)
    make_opt = (lambda: SparseSGD(0.3)) if opt_name == "sgd" else \
        (lambda: SparseRowWiseAdaGrad(lr=0.3, eps=1e-6))
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=make_opt())
    rng = np.random.default_rng(8)
    b = 32
    dense = jnp.asarray(rng.normal(size=(b, 4)).astype(np.float32))
    shape = (b,) if bag is None else (b, bag)
    cat = jnp.asarray(np.stack([rng.integers(0, v, shape).astype(np.int32)
                                for v in cfg.vocab_sizes]))
    label = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))

    step1 = make_train_step(cfg, sparse_opt=make_opt(), dense_lr=0.3,
                            jit=False)
    m1, loss1 = step1(model, dense, cat, label)
    stepK = make_train_step(cfg, sparse_opt=make_opt(), dense_lr=0.3,
                            jit=False, microbatch=4)
    mK, lossK = stepK(model, dense, cat, label)

    np.testing.assert_allclose(float(lossK), float(loss1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mK.tables.data),
                               np.asarray(m1.tables.data),
                               rtol=2e-5, atol=1e-7)
    flat1, _ = jax.tree_util.tree_flatten((m1.bottom, m1.top))
    flatK, _ = jax.tree_util.tree_flatten((mK.bottom, mK.top))
    for a, bb in zip(flat1, flatK):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-5, atol=1e-7)
    if opt_name == "adagrad":
        np.testing.assert_allclose(np.asarray(mK.emb_state.accum),
                                   np.asarray(m1.emb_state.accum),
                                   rtol=2e-5, atol=1e-8)
    # Indivisible batch is rejected.
    with pytest.raises(ValueError, match="divisible"):
        make_train_step(cfg, jit=False, microbatch=5)(model, dense, cat,
                                                      label)


@pytest.mark.parametrize("self_interaction", [False, True])
def test_dot_interaction_fused_vjp_matches_default_ad(self_interaction):
    """The hand-fused interaction VJP (round 5, DESIGN.md §12: ONE
    symmetrized selection matmul + ONE batched matmul instead of dzzt +
    two batched matmuls — measured -6.5 ms on the bench step) must equal
    default AD through the same forward up to matmul re-association."""
    from embeddingtables_tpu.models.dlrm import (_tri_interaction_fn,
                                                 _tril_selection_np)
    b, t1, d = 8, 6, 16
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((b, t1, d)).astype(np.float32))
    offset = 0 if self_interaction else -1
    sel = jnp.asarray(_tril_selection_np(t1, offset))

    def f_default(z):
        zzt = jnp.einsum("bij,bkj->bik", z, z)
        flat = zzt.reshape(b, t1 * t1) @ sel
        return jnp.sum(jnp.sin(flat * 0.1))

    def f_fused(z):
        return jnp.sum(jnp.sin(_tri_interaction_fn(t1, offset)(z) * 0.1))

    # Forward identical (same program), backward equal to re-association.
    np.testing.assert_array_equal(np.asarray(f_default(z)),
                                  np.asarray(f_fused(z)))
    g_def = jax.grad(f_default)(z)
    g_fus = jax.grad(f_fused)(z)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_def),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("self_interaction", [False, True])
def test_block_interaction_forward_matches_canonical(self_interaction,
                                                     monkeypatch):
    """The block-Gram production interaction (round 5, DESIGN.md §14:
    Gram blocks computed directly on the table-major (T, B, D) embeddings,
    block feature order compensated by permuting the top-W1 rows) must
    match the canonical z-assembly path — same products, so the forward
    differs only by matmul re-association, and the hand VJP must match
    default AD through the canonical fallback."""
    import dataclasses as dc
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models import dlrm as dlrm_mod
    from embeddingtables_tpu.models.dlrm import (bce_loss,
                                                 forward_from_embeddings)
    from embeddingtables_tpu.optim import SparseSGD

    # f32 compute so re-association is the ONLY tolerance needed (the
    # default bf16 towers would add ~5e-4 ulp noise between assemblies).
    cfg = DLRMConfig(vocab_sizes=(40, 70, 30, 50, 20), num_dense=5, dim=16,
                     bottom_mlp=(12, 16), top_mlp=(12, 1),
                     self_interaction=self_interaction,
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(2), cfg, sparse_opt=SparseSGD(0.1))
    rng = np.random.default_rng(9)
    b = 12
    dense = jnp.asarray(rng.normal(size=(b, 5)).astype(np.float32))
    emb_t = jnp.asarray(
        rng.standard_normal((5, b, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))

    def loss(params, emb):
        bottom, top = params
        return bce_loss(
            forward_from_embeddings(bottom, top, cfg, dense, emb), label)

    l_blk, (gd_blk, ge_blk) = jax.value_and_grad(loss, argnums=(0, 1))(
        (model.bottom, model.top), emb_t)
    # Force the canonical fallback (fancy-index triangle, default AD).
    monkeypatch.setattr(dlrm_mod, "_SEL_MAX_ENTRIES", 0)
    l_can, (gd_can, ge_can) = jax.value_and_grad(loss, argnums=(0, 1))(
        (model.bottom, model.top), emb_t)

    np.testing.assert_allclose(float(l_blk), float(l_can), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ge_blk), np.asarray(ge_can),
                               rtol=1e-4, atol=1e-6)
    for a, c in zip(jax.tree.leaves(gd_blk), jax.tree.leaves(gd_can)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)


def test_block_interaction_single_table_edge():
    """t=1 DLRM: the block assembly's ee-triangle is EMPTY at offset -1
    (zero-width selection matmul) and a single self-dot at offset 0 — both
    must run and train (round-5 §14 edge the canonical z-path never had)."""
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import dlrm_forward, make_train_step
    from embeddingtables_tpu.optim import SparseSGD

    for si in (False, True):
        cfg = DLRMConfig(vocab_sizes=(50,), num_dense=4, dim=8,
                         bottom_mlp=(8, 8), top_mlp=(8, 1),
                         self_interaction=si, compute_dtype=jnp.float32)
        m = init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(0.1))
        rng = np.random.default_rng(0)
        dense = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
        cat = jnp.asarray(rng.integers(0, 50, (1, 6)).astype(np.int32))
        label = jnp.asarray(rng.integers(0, 2, 6).astype(np.float32))
        assert dlrm_forward(m, dense, cat).shape == (6,)
        _, loss = make_train_step(cfg, sparse_opt=SparseSGD(0.1),
                                  jit=False)(m, dense, cat, label)
        assert np.isfinite(float(loss))


@pytest.mark.thorough
@pytest.mark.parametrize("t", [1, 2, 3, 5, 8, 13])
@pytest.mark.parametrize("self_interaction", [False, True])
def test_block_interaction_width_sweep(t, self_interaction, monkeypatch):
    """Reference-scale volume for the §14 block assembly: block==canonical
    logits across table counts x both offsets (f32, tight tolerance)."""
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models import dlrm as dlrm_mod
    from embeddingtables_tpu.models.dlrm import forward_from_embeddings
    from embeddingtables_tpu.optim import SparseSGD

    cfg = DLRMConfig(vocab_sizes=(30,) * t, num_dense=3, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     self_interaction=self_interaction,
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(1), cfg, sparse_opt=SparseSGD(0.1))
    rng = np.random.default_rng(t)
    b = 9
    dense = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32))
    emb_t = jnp.asarray(rng.standard_normal((t, b, 8)).astype(np.float32))
    out_blk = forward_from_embeddings(model.bottom, model.top, cfg, dense,
                                      emb_t)
    monkeypatch.setattr(dlrm_mod, "_SEL_MAX_ENTRIES", 0)
    out_can = forward_from_embeddings(model.bottom, model.top, cfg, dense,
                                      emb_t)
    np.testing.assert_allclose(np.asarray(out_blk), np.asarray(out_can),
                               rtol=1e-5, atol=1e-6)
