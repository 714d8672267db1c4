"""Full-model DLRM parity against an INDEPENDENT torch reference.

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
