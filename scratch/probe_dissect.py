"""Dissect the headline DLRM train step (fwd / bwd / sparse update) with the
chained-jit methodology — refreshing the round-1 dissection after the
round-2 findings (consumer-fused gathers, dense-grad AdaGrad).

  D1 forward+loss only
  D2 forward+backward (grads consumed, no update)
  D3 full SGD step          (bench baseline ~78 ms)
  D4 full AdaGrad step      (dense-grad path ~94 ms)

update = D3 - D2; backward = D2 - D1; adagrad extra = D4 - D3.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() == "tpu"
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import (bce_loss, embedding_forward,
                                                 forward_from_embeddings,
                                                 make_train_step)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD

    t, vocab, dim, batch, chunk, reps = 26, 250_000, 128, 65_536, 10, 3
    cfg = DLRMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13, dim=dim,
                     bottom_mlp=(64, dim), top_mlp=(64, 1))
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(batch, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32)
         for _ in range(t)]))
    label = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))

    def timeit(name, body, model):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(model):
            def step(k, carry):
                m, s = carry
                m, out = body(m, (cat + k) % vocab)
                return m, s + out
            return jax.lax.fori_loop(0, chunk, step,
                                     (model, jnp.zeros((), jnp.float32)))
        model, r = run(model)
        _ = float(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            model, r = run(model)
            _ = float(r)
            ts.append((time.perf_counter() - t0) / chunk)
        sec = float(np.median(ts))
        print(f"{name:28s} {sec*1e3:7.2f} ms", file=sys.stderr, flush=True)
        del model
        return sec

    def fwd_only(m, c):
        emb = embedding_forward(m.tables, c)
        logits = forward_from_embeddings(m.bottom, m.top, cfg, dense, emb)
        return m, bce_loss(logits, label)

    def fwd_bwd(m, c):
        def loss_fn(dense_params, emb):
            b_, t_ = dense_params
            return bce_loss(
                forward_from_embeddings(b_, t_, cfg, dense, emb), label)
        emb = embedding_forward(m.tables, c)
        loss, (dg, delta) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))((m.bottom, m.top), emb)
        # Consume every gradient so nothing is dead code.
        consumed = (sum(jnp.sum(w) + jnp.sum(b) for w, b in dg[0])
                    + sum(jnp.sum(w) + jnp.sum(b) for w, b in dg[1])
                    + jnp.sum(delta))
        return m, loss + 1e-30 * consumed

    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))
    d1 = timeit("D1 fwd+loss", fwd_only, model)
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))
    d2 = timeit("D2 fwd+bwd (no update)", fwd_bwd, model)

    sgd_step = make_train_step(cfg, sparse_opt=SparseSGD(1e-4),
                               dense_lr=1e-4, jit=False)
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))
    d3 = timeit("D3 full SGD step",
                lambda m, c: sgd_step(m, dense, c, label), model)

    ada = SparseRowWiseAdaGrad(lr=1e-3)
    ada_step = make_train_step(cfg, sparse_opt=ada, dense_lr=1e-4, jit=False)
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=ada)
    d4 = timeit("D4 full AdaGrad step",
                lambda m, c: ada_step(m, dense, c, label), model)

    print(f"=> fwd {d1*1e3:.1f} | bwd +{(d2-d1)*1e3:.1f} | "
          f"sgd-update +{(d3-d2)*1e3:.1f} | adagrad-extra +{(d4-d3)*1e3:.1f}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
