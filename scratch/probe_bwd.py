"""Dissect the backward's 15.8 ms (docs/DESIGN.md §4): roofline math says
the tower/interaction backward should cost ~3-5 ms (matmuls are tiny at
these shapes; the delta write is ~1 ms of streaming), so ~10 ms is
unexplained. Hypothesis: `dot_interaction`'s lower-triangle extraction
(`zzt[:, li, lj]` advanced indexing over (B, 27, 27)) lowers to a
B*351 = 23M-element gather forward / scatter-add backward.

Candidate fix measured here: extract the triangle with a constant 0/1
SELECTION MATRIX matmul — `zzt.reshape(B, 729) @ S` with S[(i*t1+j), p] =
1 — whose backward is another matmul (`dflat @ S^T`). Each output selects
exactly ONE element, so the MXU accumulation is EXACT (bitwise-equal
values), not an approximation.

  W1 fwd+loss, tril-gather interaction          (D1 re-measure)
  W2 fwd+bwd,  tril-gather                      (D2 re-measure)
  W3 fwd+loss, selection-matmul interaction
  W4 fwd+bwd,  selection-matmul
  W5 fwd+bwd,  interaction="cat"                (interaction-free bwd floor)
  W6 full SGD step, tril-gather                 (bench baseline)
  W7 full SGD step, selection-matmul            (the decision metric)
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
    from embeddingtables_tpu.models.dlrm import (_mlp, bce_loss,
                                                 embedding_forward,
                                                 make_train_step)
    from embeddingtables_tpu.models.dlrm import forward_from_embeddings
    from embeddingtables_tpu.optim import SparseSGD

    t, vocab, dim, batch, chunk, reps = 26, 250_000, 128, 65_536, 10, 3
    cfg = DLRMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13, dim=dim,
                     bottom_mlp=(64, dim), top_mlp=(64, 1))
    cfg_cat = DLRMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13,
                         dim=dim, bottom_mlp=(64, dim), top_mlp=(64, 1),
                         interaction="cat")
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(batch, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32)
         for _ in range(t)]))
    label = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))

    # Selection matrix for the strict lower triangle of a (t+1, t+1) Gram.
    t1 = t + 1
    li, lj = np.tril_indices(t1, k=-1)
    sel = np.zeros((t1 * t1, li.size), np.float32)
    sel[li * t1 + lj, np.arange(li.size)] = 1.0
    SEL = jnp.asarray(sel)

    def fwd_sel(bottom, top, dense_x, emb_t):
        cd = cfg.compute_dtype
        bot = _mlp(bottom, dense_x, cd)
        emb = jnp.transpose(emb_t, (1, 0, 2)).astype(cd)
        z = jnp.concatenate([bot[:, None, :], emb], axis=1)
        zzt = jnp.einsum("bij,bkj->bik", z, z)
        flat = zzt.reshape(zzt.shape[0], t1 * t1) @ SEL.astype(cd)
        feat = jnp.concatenate([bot, flat], axis=-1)
        logits = _mlp(top, feat, cd, final_activation=False)
        return logits[:, 0].astype(jnp.float32)

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
        print(f"{name:34s} {sec*1e3:7.2f} ms", file=sys.stderr, flush=True)
        del model
        return sec

    def mk_fwd(fwd, c_cfg):
        def body(m, c):
            emb = embedding_forward(m.tables, c)
            logits = fwd(m.bottom, m.top, dense, emb)
            return m, bce_loss(logits, label)
        return body

    def mk_fwd_bwd(fwd, c_cfg):
        def body(m, c):
            def loss_fn(dense_params, emb):
                b_, t_ = dense_params
                return bce_loss(fwd(b_, t_, dense, emb), label)
            emb = embedding_forward(m.tables, c)
            loss, (dg, delta) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))((m.bottom, m.top), emb)
            consumed = (sum(jnp.sum(w) + jnp.sum(b) for w, b in dg[0])
                        + sum(jnp.sum(w) + jnp.sum(b) for w, b in dg[1])
                        + jnp.sum(delta))
            return m, loss + 1e-30 * consumed
        return body

    def fwd_std(bottom, top, dense_x, emb_t):
        return forward_from_embeddings(bottom, top, cfg, dense_x, emb_t)

    def fwd_cat(bottom, top, dense_x, emb_t):
        return forward_from_embeddings(bottom, top, cfg_cat, dense_x, emb_t)

    def fresh(c_cfg=cfg):
        return init_dlrm(jax.random.key(0), c_cfg,
                         sparse_opt=SparseSGD(1e-4))

    r = {}
    r["W1_fwd_tril"] = timeit("W1 fwd+loss tril-gather", mk_fwd(fwd_std, cfg),
                              fresh())
    r["W2_fwdbwd_tril"] = timeit("W2 fwd+bwd tril-gather",
                                 mk_fwd_bwd(fwd_std, cfg), fresh())
    r["W3_fwd_sel"] = timeit("W3 fwd+loss selection-matmul",
                             mk_fwd(fwd_sel, cfg), fresh())
    r["W4_fwdbwd_sel"] = timeit("W4 fwd+bwd selection-matmul",
                                mk_fwd_bwd(fwd_sel, cfg), fresh())
    r["W5_fwdbwd_cat"] = timeit("W5 fwd+bwd cat-interaction",
                                mk_fwd_bwd(fwd_cat, cfg_cat),
                                fresh(cfg_cat))

    sgd_step = make_train_step(cfg, sparse_opt=SparseSGD(1e-4),
                               dense_lr=1e-4, jit=False)
    r["W6_step_tril"] = timeit("W6 full SGD step tril-gather",
                               lambda m, c: sgd_step(m, dense, c, label),
                               fresh())

    def sel_step(m, c):
        def loss_fn(dense_params, emb):
            b_, t_ = dense_params
            return bce_loss(fwd_sel(b_, t_, dense, emb), label)
        emb = embedding_forward(m.tables, c)
        loss, (dg, delta) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))((m.bottom, m.top), emb)
        import dataclasses as dc
        from embeddingtables_tpu.models.dlrm import (stacked_flat_indices)
        from embeddingtables_tpu.ops.sparse_update import \
            SparseEmbeddingUpdate
        lr = 1e-4
        new_bottom = jax.tree.map(lambda p, g: p - lr * g, m.bottom, dg[0])
        new_top = jax.tree.map(lambda p, g: p - lr * g, m.top, dg[1])
        flat_idx, _ = stacked_flat_indices(m.tables, c)
        upd = SparseEmbeddingUpdate(
            delta=delta.reshape(-1, dim).astype(jnp.float32),
            indices=flat_idx)
        opt = SparseSGD(lr)
        new_data, _ = opt.apply(m.tables.data, upd, m.emb_state)
        return dc.replace(m, bottom=new_bottom, top=new_top,
                          tables=dc.replace(m.tables, data=new_data)), loss

    r["W7_step_sel"] = timeit("W7 full SGD step selection-matmul",
                              sel_step, fresh())

    print(f"=> bwd tril {1e3*(r['W2_fwdbwd_tril']-r['W1_fwd_tril']):.1f} ms"
          f" | bwd sel {1e3*(r['W4_fwdbwd_sel']-r['W3_fwd_sel']):.1f}"
          f" | bwd cat-floor vs its own fwd n/a"
          f" | step tril {1e3*r['W6_step_tril']:.1f}"
          f" -> sel {1e3*r['W7_step_sel']:.1f}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
