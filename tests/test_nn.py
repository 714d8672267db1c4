"""flax.linen integration (embeddingtables_tpu.nn): dense-grad Embed,
lazy SparseEmbed through a stock flax train step, vs the library oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.nn import (Embed, SparseEmbed,
                                    apply_sparse_updates,
                                    sparse_updates_from_grads)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD

import flax.linen as fnn


def test_embed_dense_grad_matches_uncompress():
    rng = np.random.default_rng(0)
    V, D, B = 50, 16, 20
    idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    m = Embed(vocab=V, dim=D)
    params = m.init(jax.random.key(0), idx)
    out = m.apply(params, idx)
    table = params["params"]["table"]
    assert (out == et.lookup_oracle(table, idx)).all()

    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    g = jax.grad(lambda p: (m.apply(p, idx) * delta).sum())(params)
    want = et.uncompress(et.SparseEmbeddingUpdate(delta, idx), V)
    np.testing.assert_allclose(np.asarray(g["params"]["table"]),
                               np.asarray(want), rtol=1e-5, atol=1e-6)


class TwoTableModel(fnn.Module):
    """Tiny model with two lazy tables + a dense head."""

    @fnn.compact
    def __call__(self, idx_a, idx_b):
        a = SparseEmbed(vocab=40, dim=8, name="emb_a")(idx_a)
        b = SparseEmbed(vocab=60, dim=8, combiner="mean", name="emb_b")(idx_b)
        h = jnp.concatenate([a, b], axis=-1)
        w = self.param("head", fnn.initializers.ones, (16,), jnp.float32)
        return (h * w).sum(axis=-1)


@pytest.mark.parametrize("opt", [SparseSGD(0.5),
                                 SparseRowWiseAdaGrad(lr=0.5)])
def test_sparse_embed_full_flax_step_matches_dense_reference(opt):
    rng = np.random.default_rng(1)
    B, bag = 12, 3
    idx_a = jnp.asarray(rng.integers(0, 40, B).astype(np.int32))
    idx_b = jnp.asarray(rng.integers(0, 60, (B, bag)).astype(np.int32))
    target = jnp.asarray(rng.standard_normal(B).astype(np.float32))

    model = TwoTableModel()
    vars_ = model.init(jax.random.key(0), idx_a, idx_b)
    params, perts = vars_["params"], vars_["perturbations"]

    def loss_fn(params, perts):
        out, mut = model.apply({"params": params, "perturbations": perts},
                               idx_a, idx_b, mutable=["intermediates"])
        return ((out - target) ** 2).mean(), mut["intermediates"]

    (lval, inter), grads = jax.value_and_grad(loss_fn, argnums=1,
                                              has_aux=True)(params, perts)

    # The lazy route: perturbation grads are the deltas; NO dense table
    # cotangent exists anywhere.
    upds = sparse_updates_from_grads(grads, inter)
    upd_a = upds["emb_a"]["delta"]
    assert isinstance(upd_a, et.SparseEmbeddingUpdate)
    assert (upd_a.indices == idx_a).all()
    upd_b = upds["emb_b"]["delta"]
    # mean combiner folded into per-occurrence weights.
    np.testing.assert_allclose(np.asarray(upd_b.weights),
                               np.full((B, bag), 1 / bag, np.float32))

    new_params, states = apply_sparse_updates(params, upds, opt)

    # Dense reference: full autodiff wrt the tables through the same math.
    def dense_loss(tables):
        ta, tb = tables
        a = et.lookup_oracle(ta, idx_a)
        b = et.lookup_oracle(tb, idx_b, combiner="mean")
        h = jnp.concatenate([a, b], axis=-1)
        out = (h * params["head"]).sum(axis=-1)
        return ((out - target) ** 2).mean()

    ta = params["emb_a"]["table"]
    tb = params["emb_b"]["table"]
    ga, gb = jax.grad(dense_loss)((ta, tb))
    ref_a, _ = opt.apply(ta, et.SparseEmbeddingUpdate(
        upd_a.delta, idx_a), opt.init(ta))
    np.testing.assert_allclose(np.asarray(new_params["emb_a"]["table"]),
                               np.asarray(ref_a), rtol=1e-5, atol=1e-6)
    # And the lazy update's uncompress equals the dense gradient.
    np.testing.assert_allclose(np.asarray(et.uncompress(upd_a, 40)),
                               np.asarray(ga), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(et.uncompress(upd_b, 60)),
                               np.asarray(gb), rtol=1e-5, atol=1e-6)

    # Head keeps its dense grad; tables' dense grads are structurally zero.
    gp = jax.grad(lambda p: loss_fn(p, perts)[0])(params)
    assert float(jnp.abs(gp["emb_a"]["table"]).max()) == 0.0
    assert float(jnp.abs(gp["head"]).max()) > 0.0


def test_sparse_embed_training_reduces_loss():
    # A few stock-flax steps with the fused sparse optimizer must learn.
    rng = np.random.default_rng(2)
    B = 32
    model = TwoTableModel()
    idx_a = jnp.asarray(rng.integers(0, 40, B).astype(np.int32))
    idx_b = jnp.asarray(rng.integers(0, 60, (B, 3)).astype(np.int32))
    target = jnp.asarray((np.asarray(idx_a) % 2).astype(np.float32))
    vars_ = model.init(jax.random.key(1), idx_a, idx_b)
    params, perts = vars_["params"], vars_["perturbations"]
    opt = SparseSGD(0.05)
    states = None
    losses = []
    for _ in range(30):
        def loss_fn(params, perts):
            out, mut = model.apply(
                {"params": params, "perturbations": perts}, idx_a, idx_b,
                mutable=["intermediates"])
            return ((out - target) ** 2).mean(), mut["intermediates"]
        (lval, inter), grads = jax.value_and_grad(
            loss_fn, argnums=1, has_aux=True)(params, perts)
        upds = sparse_updates_from_grads(grads, inter)
        params, states = apply_sparse_updates(params, upds, opt, states)
        losses.append(float(lval))
    assert losses[-1] < 0.5 * losses[0], losses[:3] + losses[-3:]
