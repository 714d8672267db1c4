"""Full-model parity against INDEPENDENT torch references — every family.

The internal parity tests (block vs canonical interaction, train step vs
dense-oracle grad) are self-consistent — a feature-order bug that hit both
sides identically would pass them. This file pins the model's external
semantics: a torch implementation of the same architecture (bottom MLP ->
pairwise-dot interaction in np.tril_indices order -> [bot | flat] -> top
MLP), built from scratch on torch ops with the SAME weights, must produce
the same logits AND the same gradient w.r.t. the embedding activations
(the lazy-update delta). This is the whole-model analog of the reference's
dense-matrix Zygote oracle (`/root/reference/test/update.jl:20-45`) and of
interop.py's torch lookup parity, raised to the DLRM family.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from embeddingtables_tpu.models import DLRMConfig, init_dlrm
from embeddingtables_tpu.models.dlrm import forward_from_embeddings
from embeddingtables_tpu.optim import SparseSGD


def _torch_mlp(layers, x, final_activation):
    for i, (w, b) in enumerate(layers):
        x = x @ torch.as_tensor(np.asarray(w)) + torch.as_tensor(
            np.asarray(b))
        if i < len(layers) - 1 or final_activation:
            x = torch.relu(x)
    return x


def _torch_dlrm_forward(model, cfg, dense, emb_t, self_interaction):
    """Independent torch build of the DLRM forward. emb_t: (T, B, D)."""
    bot = _torch_mlp(model.bottom, dense, final_activation=True)  # (B, D)
    z = torch.cat([bot.unsqueeze(1), emb_t.permute(1, 0, 2)], dim=1)
    zzt = torch.einsum("bij,bkj->bik", z, z)
    t1 = z.shape[1]
    li, lj = np.tril_indices(t1, k=0 if self_interaction else -1)
    flat = zzt[:, torch.as_tensor(li), torch.as_tensor(lj)]
    feat = torch.cat([bot, flat], dim=-1)
    logits = _torch_mlp(model.top, feat, final_activation=False)
    return logits[:, 0]


@pytest.mark.parametrize("self_interaction", [False, True])
def test_dlrm_forward_and_emb_grad_match_torch(self_interaction):
    cfg = DLRMConfig(vocab_sizes=(40, 70, 30, 50), num_dense=6, dim=16,
                     bottom_mlp=(12, 16), top_mlp=(12, 1),
                     self_interaction=self_interaction,
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(4), cfg, sparse_opt=SparseSGD(0.1))
    rng = np.random.default_rng(11)
    b = 10
    dense_np = rng.normal(size=(b, 6)).astype(np.float32)
    emb_np = rng.standard_normal((4, b, 16)).astype(np.float32)
    # A generic upstream cotangent for the logits (not a loss, so the
    # comparison covers the raw model VJP, not one loss's saturation).
    dlogits_np = rng.normal(size=(b,)).astype(np.float32)

    # Ours: logits + grad w.r.t. the embedding activations (the delta).
    def f(emb):
        return forward_from_embeddings(model.bottom, model.top, cfg,
                                       jnp.asarray(dense_np), emb)

    logits, vjp = jax.vjp(f, jnp.asarray(emb_np))
    (demb,) = vjp(jnp.asarray(dlogits_np))

    # Torch: same weights, independent ops.
    emb_t = torch.as_tensor(emb_np).requires_grad_(True)
    t_logits = _torch_dlrm_forward(model, cfg, torch.as_tensor(dense_np),
                                   emb_t, self_interaction)
    t_logits.backward(torch.as_tensor(dlogits_np))

    np.testing.assert_allclose(np.asarray(logits),
                               t_logits.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(demb), emb_t.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("structure,rank", [("stacked", 4), ("stacked", None),
                                            ("parallel", 4)])
def test_dcn_forward_and_emb_grad_match_torch(structure, rank):
    """Same external-oracle treatment for DCN-v2: the cross network
    `x <- x0 * (W x + b) + x` (full or low-rank W = U Vᵀ), stacked and
    parallel structures, rebuilt independently on torch ops."""
    from embeddingtables_tpu.models.dcn import (DCNConfig,
                                                forward_from_embeddings,
                                                init_dcn)

    cfg = DCNConfig(vocab_sizes=(40, 30, 50), num_dense=5, dim=8,
                    num_cross=3, cross_rank=rank, deep_mlp=(12, 8),
                    structure=structure, compute_dtype=jnp.float32)
    model = init_dcn(jax.random.key(6), cfg, sparse_opt=SparseSGD(0.1))
    rng = np.random.default_rng(13)
    b = 9
    dense_np = rng.normal(size=(b, 5)).astype(np.float32)
    emb_np = rng.standard_normal((3, b, 8)).astype(np.float32)
    dlogits_np = rng.normal(size=(b,)).astype(np.float32)

    def f(emb):
        return forward_from_embeddings(model.cross, model.deep, model.head,
                                       cfg, jnp.asarray(dense_np), emb)

    logits, vjp = jax.vjp(f, jnp.asarray(emb_np))
    (demb,) = vjp(jnp.asarray(dlogits_np))

    emb_t = torch.as_tensor(emb_np).requires_grad_(True)
    flat = emb_t.permute(1, 0, 2).reshape(b, -1)
    x0 = torch.cat([flat, torch.as_tensor(dense_np)], dim=-1)
    x = x0
    for layer in model.cross:
        if len(layer) == 2:
            w, bb = layer
            xw = x @ torch.as_tensor(np.asarray(w))
        else:
            u, v, bb = layer
            xw = (x @ torch.as_tensor(np.asarray(v))) @ torch.as_tensor(
                np.asarray(u)).T
        x = x0 * (xw + torch.as_tensor(np.asarray(bb))) + x
    if structure == "stacked":
        feat = _torch_mlp(model.deep, x, final_activation=True)
    else:
        feat = torch.cat(
            [x, _torch_mlp(model.deep, x0, final_activation=True)], dim=-1)
    w, bh = model.head
    t_logits = (feat @ torch.as_tensor(np.asarray(w))
                + torch.as_tensor(np.asarray(bh)))[:, 0]
    t_logits.backward(torch.as_tensor(dlogits_np))

    np.testing.assert_allclose(np.asarray(logits),
                               t_logits.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(demb), emb_t.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_deepfm_forward_and_grads_match_torch():
    """DeepFM external oracle: bias + first order + dense linear + the FM
    sum-square second order + deep tower, rebuilt on torch; gradients
    w.r.t. BOTH activation streams (FM vectors and first-order weights)."""
    from embeddingtables_tpu.models.deepfm import (DeepFMConfig,
                                                   forward_from_embeddings,
                                                   init_deepfm)

    cfg = DeepFMConfig(vocab_sizes=(40, 30, 50, 20), num_dense=5, dim=8,
                       deep_mlp=(12, 8), compute_dtype=jnp.float32)
    model = init_deepfm(jax.random.key(8), cfg, sparse_opt=SparseSGD(0.1))
    rng = np.random.default_rng(17)
    b = 9
    dense_np = rng.normal(size=(b, 5)).astype(np.float32)
    emb_np = rng.standard_normal((4, b, 8)).astype(np.float32)
    w_np = rng.standard_normal((4, b, 1)).astype(np.float32)
    dlogits_np = rng.normal(size=(b,)).astype(np.float32)
    params = (model.deep, model.head, model.dense_w, model.bias)

    def f(emb, w):
        return forward_from_embeddings(params, cfg, jnp.asarray(dense_np),
                                       emb, w)

    logits, vjp = jax.vjp(f, jnp.asarray(emb_np), jnp.asarray(w_np))
    demb, dw = vjp(jnp.asarray(dlogits_np))

    emb_t = torch.as_tensor(emb_np).requires_grad_(True)
    w_t = torch.as_tensor(w_np).requires_grad_(True)
    logit = torch.as_tensor(np.asarray(model.bias)).expand(b).clone()
    logit = logit + w_t[..., 0].sum(dim=0)
    logit = logit + torch.as_tensor(dense_np) @ torch.as_tensor(
        np.asarray(model.dense_w))
    s = emb_t.sum(dim=0)
    sq = emb_t.square().sum(dim=0)
    logit = logit + 0.5 * (s.square() - sq).sum(dim=-1)
    flat = emb_t.permute(1, 0, 2).reshape(b, -1)
    x = torch.cat([flat, torch.as_tensor(dense_np)], dim=-1)
    hw, hb = model.head
    out = _torch_mlp(model.deep, x, final_activation=True) @ \
        torch.as_tensor(np.asarray(hw)) + torch.as_tensor(np.asarray(hb))
    logit = logit + out[:, 0]
    logit.backward(torch.as_tensor(dlogits_np))

    np.testing.assert_allclose(np.asarray(logits), logit.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(demb), emb_t.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), w_t.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_two_tower_loss_and_row_grads_match_torch():
    """Two-tower external oracle: both towers (concat-fused features,
    final-linear MLPs, L2-normalized embeddings) + the in-batch-negatives
    softmax, rebuilt on torch; gradients w.r.t. BOTH lookup-row streams
    (the lazy-update deltas for the query stack and the item corpus)."""
    from embeddingtables_tpu.models.two_tower import (
        TwoTowerConfig, in_batch_softmax_loss, init_two_tower,
        item_embed_from_rows, query_embed_from_rows)

    cfg = TwoTowerConfig(query_vocab_sizes=(40, 30), item_vocab=100,
                         num_dense=3, dim=8, embed_dim=8,
                         query_mlp=(12, 8), item_mlp=(12, 8),
                         compute_dtype=jnp.float32)
    model = init_two_tower(jax.random.key(5), cfg, sparse_opt=SparseSGD(0.1))
    rng = np.random.default_rng(19)
    b = 8
    dense_np = rng.normal(size=(b, 3)).astype(np.float32)
    q_rows_np = rng.standard_normal((b, 2, 8)).astype(np.float32)
    i_rows_np = rng.standard_normal((b, 8)).astype(np.float32)

    def f(q_rows, i_rows):
        q = query_embed_from_rows(model.query_mlp, cfg,
                                  jnp.asarray(dense_np), q_rows)
        i = item_embed_from_rows(model.item_mlp, cfg, i_rows)
        loss, _ = in_batch_softmax_loss(q, i, cfg.temperature)
        return loss

    loss, (dq, di) = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(q_rows_np), jnp.asarray(i_rows_np))

    qr = torch.as_tensor(q_rows_np).requires_grad_(True)
    ir = torch.as_tensor(i_rows_np).requires_grad_(True)
    feats = torch.cat([torch.as_tensor(dense_np), qr.reshape(b, -1)], dim=-1)
    q = _torch_mlp(model.query_mlp, feats, final_activation=False)
    q = q * torch.rsqrt((q * q).sum(dim=-1, keepdim=True) + 1e-6)
    i = _torch_mlp(model.item_mlp, ir, final_activation=False)
    i = i * torch.rsqrt((i * i).sum(dim=-1, keepdim=True) + 1e-6)
    logits = (q @ i.T) / cfg.temperature
    t_loss = -torch.log_softmax(logits, dim=-1).diagonal().mean()
    t_loss.backward()

    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dq), qr.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(di), ir.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
