"""Probe: where does the fwd+bwd's remaining fat live? (round 5, after
the fused interaction VJP took the step to 65.7 ms = 0.871 vs_dma_sol.)

Accounting at bench shapes (T=26, V=250k, D=128, B=64Ki): the update is AT
its measured scatter SoL (~33 ms); fwd+bwd measures 32.5 ms vs component
floors ~21 ms (consumer-fused gather 11.4, 4 activation/delta streams 8.4,
MXU FLOPs ~1.5). Hypotheses for the ~11 ms:

  H1 the (B, T+1, D) `z` assembly: emb arrives table-major (T, B, D); the
     interaction transposes to (B, T, D) and CONCATs the bottom row — the
     concat cannot fuse into the Gram dot, so it materializes ~906 MB
     (r+w ≈ 2.3 ms), and the transpose may cost another copy if XLA does
     not absorb it into dot_general's dimension numbers.
  H2 the cotangent mirrors H1: dz splits + transposes back to (T, B, D)
     before the scatter's delta reshape.

F-series (all §1 methodology: chained fori_loop in one jit, varying
indices, consumed outputs, donated model):

  F1 gather + sum-consume            -> the materialized-gather floor
  F2 gather + transpose + concat + sum -> H1's assembly cost on top of F1
  F3 fwd-only loss (fused-vjp tri)   -> total forward
  F5 fwd+bwd (fused-vjp tri)         -> X2 re-measured in this process
  F8 fwd-only, BLOCK-GRAM assembly   -> no z: G_ee = einsum(ibd,jbd->bij),
     G_be = einsum(bd,jbd->bj), flat = [G_be | tril(G_ee)] — no transpose,
     no concat of the big operand (fold the feature permutation into the
     top MLP's first matmul rows, exact)
  F9 fwd+bwd, block-Gram with the same symmetrized-selection hand VJP in
     (T, B, D) layout end to end (cotangent never transposes)
  F10 full SGD step with F9 if F9 < F5

Numerics gates: block fwd == default fwd (after W1-row permutation) and
block VJP == default AD, both on-chip at small shapes.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    assert jax.default_backend() == "tpu"
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import (_mlp, _tril_selection_np,
                                                 bce_loss, embedding_forward)
    from embeddingtables_tpu.optim import SparseSGD

    t, vocab, dim, batch, chunk, reps = 26, 250_000, 128, 65_536, 10, 3
    cfg = DLRMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13, dim=dim,
                     bottom_mlp=(64, dim), top_mlp=(64, 1))
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(batch, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32)
         for _ in range(t)]))
    label = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))

    t1 = t + 1
    li, lj = np.tril_indices(t1, k=-1)                       # canonical order
    sel_np = _tril_selection_np(t1, -1)                      # (t1*t1, 351)
    swap_np = np.zeros_like(sel_np)
    swap_np[lj * t1 + li, np.arange(li.size)] = 1.0
    ss_np = sel_np + swap_np

    # --- current production tri (fused VJP on the z assembly) -------------
    @jax.custom_vjp
    def tri_fused(z):
        zzt = jnp.einsum("bij,bkj->bik", z, z)
        return zzt.reshape(z.shape[0], t1 * t1) @ jnp.asarray(sel_np, z.dtype)

    def tri_fused_fwd(z):
        return tri_fused(z), z

    def tri_fused_bwd(z, dflat):
        m = (dflat @ jnp.asarray(ss_np.T, dflat.dtype)).reshape(
            z.shape[0], t1, t1)
        return (jnp.einsum("bij,bjd->bid", m, z),)

    tri_fused.defvjp(tri_fused_fwd, tri_fused_bwd)

    def fwd_current(bottom, top, dense_x, emb_t):
        cd = cfg.compute_dtype
        bot = _mlp(bottom, dense_x, cd)
        emb = jnp.transpose(emb_t, (1, 0, 2)).astype(cd)
        z = jnp.concatenate([bot[:, None, :], emb], axis=1)
        flat = tri_fused(z)
        feat = jnp.concatenate([bot, flat], axis=-1)
        logits = _mlp(top, feat, cd, final_activation=False)
        return logits[:, 0].astype(jnp.float32)

    # --- block-Gram assembly: no transpose, no big concat -----------------
    # flat_block = [G_be (26) | tril(G_ee) (325)]; canonical order is the
    # tril_indices(27, -1) interleave, so permute the TOP MLP's first-matmul
    # rows instead of the 180 MB feature matrix (exact, ~free).
    li26, lj26 = np.tril_indices(t, k=-1)                    # 325 ee pairs
    sel26_np = np.zeros((t * t, li26.size), np.float32)
    sel26_np[li26 * t + lj26, np.arange(li26.size)] = 1.0
    ss26_np = sel26_np.copy()
    ss26_np[lj26 * t + li26, np.arange(li26.size)] += 1.0

    # canonical column k holds pair (li[k], lj[k]) of z (bot = row 0,
    # emb_i = row i+1). In block order: (i,0) -> G_be[i-1]; (i,j>=1) ->
    # ee pair (i-1, j-1) at 26 + its tril26 position.
    ee_pos = {(a, b): k for k, (a, b) in enumerate(zip(li26, lj26))}
    perm_flat = np.empty(li.size, np.int64)
    for k, (a, b) in enumerate(zip(li, lj)):
        perm_flat[k] = (a - 1) if b == 0 else t + ee_pos[(a - 1, b - 1)]
    # feat = [bot (dim) | flat (351)]: feat_canonical[k] = feat_block[P[k]]
    # with P = [id | dim+perm_flat], so feat_block @ W1_eff == feat_can @ W1
    # requires W1_eff[j] = W1[P^-1(j)] — the INVERSE permutation's rows.
    perm_w1 = np.argsort(np.concatenate([np.arange(dim), dim + perm_flat]))

    @jax.custom_vjp
    def tri_block(bot, emb_t):
        # (B, 325) ee pairs + (B, 26) bot-emb pairs, all from (T, B, D).
        gee = jnp.einsum("ibd,jbd->bij", emb_t, emb_t)
        flat_ee = gee.reshape(bot.shape[0], t * t) @ jnp.asarray(
            sel26_np, bot.dtype)
        gbe = jnp.einsum("bd,jbd->bj", bot, emb_t)
        return jnp.concatenate([gbe, flat_ee], axis=-1)     # block order

    def tri_block_fwd(bot, emb_t):
        return tri_block(bot, emb_t), (bot, emb_t)

    def tri_block_bwd(res, dflat):
        bot, emb_t = res
        dgbe, dflat_ee = dflat[:, :t], dflat[:, t:]
        m = (dflat_ee @ jnp.asarray(ss26_np.T, dflat.dtype)).reshape(
            bot.shape[0], t, t)
        demb = jnp.einsum("bij,jbd->ibd", m, emb_t)          # stays (T,B,D)
        demb = demb + jnp.einsum("bj,bd->jbd", dgbe, bot)
        dbot = jnp.einsum("bj,jbd->bd", dgbe, emb_t)
        return dbot, demb

    tri_block.defvjp(tri_block_fwd, tri_block_bwd)

    def fwd_block(bottom, top, dense_x, emb_t):
        cd = cfg.compute_dtype
        bot = _mlp(bottom, dense_x, cd)
        flat = tri_block(bot, emb_t.astype(cd))
        feat = jnp.concatenate([bot, flat], axis=-1)
        w1, b1 = top[0]
        top_perm = [(jnp.take(w1, jnp.asarray(perm_w1), axis=0), b1)] + \
            list(top[1:])
        logits = _mlp(top_perm, feat, cd, final_activation=False)
        return logits[:, 0].astype(jnp.float32)

    # --- numerics gates (small shapes, on-chip) ---------------------------
    sb = 16
    srng = np.random.default_rng(3)
    s_dense = jnp.asarray(srng.normal(size=(sb, 13)).astype(np.float32))
    s_emb = jnp.asarray(srng.standard_normal((t, sb, dim)).astype(np.float32))
    s_label = jnp.asarray(srng.integers(0, 2, sb).astype(np.float32))
    model0 = init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))

    def loss_of(fwd, dp, emb):
        return bce_loss(fwd(dp[0], dp[1], s_dense, emb), s_label)

    lc, (gc_d, gc_e) = jax.value_and_grad(
        functools.partial(loss_of, fwd_current), argnums=(0, 1))(
        (model0.bottom, model0.top), s_emb)
    lb, (gb_d, gb_e) = jax.value_and_grad(
        functools.partial(loss_of, fwd_block), argnums=(0, 1))(
        (model0.bottom, model0.top), s_emb)
    print(f"numerics: |loss_current-loss_block|={abs(float(lc-lb)):.3e}",
          flush=True)
    emb_err = float(jnp.max(jnp.abs(gc_e - gb_e)))
    dense_err = max(float(jnp.max(jnp.abs(a - b))) for a, b in
                    zip(jax.tree.leaves(gc_d), jax.tree.leaves(gb_d)))
    print(f"numerics: max|demb diff|={emb_err:.3e} "
          f"max|ddense diff|={dense_err:.3e}", flush=True)

    # --- timing harness ----------------------------------------------------
    def timeit(name, body, model):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(model):
            def step(k, carry):
                m, s = carry
                m, out = body(m, (cat + k) % vocab)
                return m, s + out
            return jax.lax.fori_loop(0, chunk, step,
                                     (model, jnp.zeros((), jnp.float32)))
        print(f"stage: {name} compile", flush=True)
        model, r = run(model)
        _ = float(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            model, r = run(model)
            _ = float(r)
            ts.append((time.perf_counter() - t0) / chunk)
        sec = float(np.median(ts))
        print(f"RESULT {name:30s} {sec*1e3:7.2f} ms", flush=True)
        del model
        return sec

    def fresh():
        return init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))

    def body_gather_sum(m, c):
        emb = embedding_forward(m.tables, c)
        return m, jnp.sum(emb)

    def body_gather_assemble(m, c):
        emb_t = embedding_forward(m.tables, c)
        bot = _mlp(m.bottom, dense, cfg.compute_dtype)
        emb = jnp.transpose(emb_t, (1, 0, 2))
        z = jnp.concatenate([bot[:, None, :], emb], axis=1)
        return m, jnp.sum(z)

    def mk_fwd_only(fwd):
        def body(m, c):
            emb = embedding_forward(m.tables, c)
            return m, bce_loss(fwd(m.bottom, m.top, dense, emb), label)
        return body

    def mk_fwd_bwd(fwd):
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

    def mk_step(fwd):
        def body(m, c):
            import dataclasses as dc
            from embeddingtables_tpu.models.dlrm import stacked_flat_indices
            from embeddingtables_tpu.ops.sparse_update import \
                SparseEmbeddingUpdate

            def loss_fn(dense_params, emb):
                b_, t_ = dense_params
                return bce_loss(fwd(b_, t_, dense, emb), label)
            emb = embedding_forward(m.tables, c)
            loss, (dg, delta) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))((m.bottom, m.top), emb)
            lr = 1e-4
            new_bottom = jax.tree.map(lambda p, g: p - lr * g, m.bottom,
                                      dg[0])
            new_top = jax.tree.map(lambda p, g: p - lr * g, m.top, dg[1])
            flat_idx, _ = stacked_flat_indices(m.tables, c)
            upd = SparseEmbeddingUpdate(
                delta=delta.reshape(-1, dim).astype(jnp.float32),
                indices=flat_idx)
            new_data, _ = SparseSGD(lr).apply(m.tables.data, upd,
                                              m.emb_state)
            return dc.replace(m, bottom=new_bottom, top=new_top,
                              tables=dc.replace(m.tables, data=new_data)), \
                loss
        return body

    r = {}
    r["F1"] = timeit("F1 gather+sum", body_gather_sum, fresh())
    r["F2"] = timeit("F2 gather+assemble-z+sum", body_gather_assemble,
                     fresh())
    r["F3"] = timeit("F3 fwd-only current", mk_fwd_only(fwd_current),
                     fresh())
    r["F5"] = timeit("F5 fwd+bwd current", mk_fwd_bwd(fwd_current), fresh())
    r["F8"] = timeit("F8 fwd-only block-gram", mk_fwd_only(fwd_block),
                     fresh())
    r["F9"] = timeit("F9 fwd+bwd block-gram", mk_fwd_bwd(fwd_block),
                     fresh())
    if r["F9"] < r["F5"]:
        r["F10"] = timeit("F10 full step block-gram", mk_step(fwd_block),
                          fresh())
        r["F11"] = timeit("F11 full step current", mk_step(fwd_current),
                          fresh())
    print("SUMMARY " + " ".join(f"{k}={v*1e3:.2f}" for k, v in r.items()),
          flush=True)


if __name__ == "__main__":
    main()
