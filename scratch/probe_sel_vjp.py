"""Probe: custom VJP for the Gram+selection interaction (hunting the
backward's 12.8 ms, DESIGN.md §10 / VERDICT r4 item 1).

Default AD through `flat = (z zT).reshape @ SEL` runs, on the backward:
  dzzt = reshape(dflat @ SELT)            (B, t1, t1) materialized
  dz   = dzzt @ z  +  dzztT @ z           TWO batched (t1,t1)@(t1,D) matmuls

Because zzt is symmetric in its adjoint (dz = (dzzt + dzztT) @ z) and SEL
has exactly one nonzero per column at flat index (i*t1+j), the symmetrized
cotangent is itself ONE selection matmul with SS = SEL + SEL_swap
(SEL_swap puts the 1 at (j*t1+i)):

  dz = reshape(dflat @ SST) @ z           ONE (B,pairs)@(pairs,t1*t1)
                                          + ONE batched matmul

— half the batched-matmul work and no separate dzzt+transpose pass, EXACT
(same products, one extra zero-add per lane). Measured here at bench
shapes (fwd+bwd and full-SGD-step levels, §1 methodology), with a
numerics gate vs the default-AD path.
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
    from embeddingtables_tpu.models.dlrm import forward_from_embeddings
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
    li, lj = np.tril_indices(t1, k=-1)
    sel_np = _tril_selection_np(t1, -1)                      # (t1*t1, pairs)
    swap_np = np.zeros_like(sel_np)
    swap_np[lj * t1 + li, np.arange(li.size)] = 1.0
    ss_np = sel_np + swap_np

    def tri_fwd_default(z, sel):
        zzt = jnp.einsum("bij,bkj->bik", z, z)
        return zzt.reshape(z.shape[0], t1 * t1) @ sel

    @jax.custom_vjp
    def tri_fused(z):
        sel = jnp.asarray(sel_np, z.dtype)
        zzt = jnp.einsum("bij,bkj->bik", z, z)
        return zzt.reshape(z.shape[0], t1 * t1) @ sel

    def tri_fused_fwd(z):
        return tri_fused(z), z

    def tri_fused_bwd(z, dflat):
        ss = jnp.asarray(ss_np, dflat.dtype)
        m = (dflat @ ss.T).reshape(z.shape[0], t1, t1)
        return (jnp.einsum("bij,bjd->bid", m, z),)

    tri_fused.defvjp(tri_fused_fwd, tri_fused_bwd)

    def fwd_with(tri, bottom, top, dense_x, emb_t):
        cd = cfg.compute_dtype
        bot = _mlp(bottom, dense_x, cd)
        emb = jnp.transpose(emb_t, (1, 0, 2)).astype(cd)
        z = jnp.concatenate([bot[:, None, :], emb], axis=1)
        flat = tri(z)
        feat = jnp.concatenate([bot, flat], axis=-1)
        logits = _mlp(top, feat, cd, final_activation=False)
        return logits[:, 0].astype(jnp.float32)

    fwd_default = functools.partial(
        fwd_with, lambda z: tri_fwd_default(z, jnp.asarray(sel_np, z.dtype)))
    fwd_fused = functools.partial(fwd_with, tri_fused)

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
        print(f"RESULT {name:28s} {sec*1e3:7.2f} ms", flush=True)
        del model
        return sec

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

    def fresh():
        return init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))

    # Numerics gate FIRST (tiny shapes, on-chip): fused vjp == default AD.
    zs = jnp.asarray(rng.standard_normal((8, t1, dim)).astype(np.float32))

    def f_def(z):
        return jnp.sum(jnp.sin(
            tri_fwd_default(z, jnp.asarray(sel_np, z.dtype)) * 0.1))

    def f_fus(z):
        return jnp.sum(jnp.sin(tri_fused(z) * 0.1))

    g_def = jax.grad(f_def)(zs)
    g_fus = jax.grad(f_fus)(zs)
    err = float(jnp.max(jnp.abs(g_def - g_fus)))
    print(f"numerics: max|dz_default - dz_fused| = {err:.3e}", flush=True)

    r = {}
    r["X1"] = timeit("X1 fwd+bwd default-AD sel", mk_fwd_bwd(fwd_default),
                     fresh())
    r["X2"] = timeit("X2 fwd+bwd fused-vjp sel", mk_fwd_bwd(fwd_fused),
                     fresh())
    r["X3"] = timeit("X3 full SGD step default", mk_step(fwd_default),
                     fresh())
    r["X4"] = timeit("X4 full SGD step fused-vjp", mk_step(fwd_fused),
                     fresh())
    print(f"SUMMARY: fwd+bwd {r['X1']*1e3:.2f} -> {r['X2']*1e3:.2f} ms | "
          f"step {r['X3']*1e3:.2f} -> {r['X4']*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
