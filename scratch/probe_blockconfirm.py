"""Confirm probe: block-Gram interaction vs current fused-VJP, full SGD
step, A/B/A/B in ONE process (is probe_fwdfat's -0.7 ms stable?).
Same harness/shapes as probe_fwdfat.py; perm fixed (inverse W1 rows,
gate-checked exact on CPU)."""
from __future__ import annotations
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")


def main():
    assert jax.default_backend() == "tpu"
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import (_mlp, _tril_selection_np,
                                                 bce_loss, embedding_forward,
                                                 stacked_flat_indices)
    from embeddingtables_tpu.ops.sparse_update import SparseEmbeddingUpdate
    from embeddingtables_tpu.optim import SparseSGD
    import dataclasses as dc

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
    sel_np = _tril_selection_np(t1, -1)
    swap_np = np.zeros_like(sel_np)
    swap_np[lj * t1 + li, np.arange(li.size)] = 1.0
    ss_np = sel_np + swap_np
    li26, lj26 = np.tril_indices(t, k=-1)
    sel26_np = np.zeros((t * t, li26.size), np.float32)
    sel26_np[li26 * t + lj26, np.arange(li26.size)] = 1.0
    ss26_np = sel26_np.copy()
    ss26_np[lj26 * t + li26, np.arange(li26.size)] += 1.0
    ee_pos = {(a, b): k for k, (a, b) in enumerate(zip(li26, lj26))}
    perm_flat = np.empty(li.size, np.int64)
    for k, (a, b) in enumerate(zip(li, lj)):
        perm_flat[k] = (a - 1) if b == 0 else t + ee_pos[(a - 1, b - 1)]
    perm_w1 = np.argsort(np.concatenate([np.arange(dim), dim + perm_flat]))

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
        return _mlp(top, feat, cd, final_activation=False)[:, 0].astype(
            jnp.float32)

    @jax.custom_vjp
    def tri_block(bot, emb_t):
        gee = jnp.einsum("ibd,jbd->bij", emb_t, emb_t)
        flat_ee = gee.reshape(bot.shape[0], t * t) @ jnp.asarray(
            sel26_np, bot.dtype)
        gbe = jnp.einsum("bd,jbd->bj", bot, emb_t)
        return jnp.concatenate([gbe, flat_ee], axis=-1)
    def tri_block_fwd(bot, emb_t):
        return tri_block(bot, emb_t), (bot, emb_t)
    def tri_block_bwd(res, dflat):
        bot, emb_t = res
        dgbe, dflat_ee = dflat[:, :t], dflat[:, t:]
        m = (dflat_ee @ jnp.asarray(ss26_np.T, dflat.dtype)).reshape(
            bot.shape[0], t, t)
        demb = jnp.einsum("bij,jbd->ibd", m, emb_t) + \
            jnp.einsum("bj,bd->jbd", dgbe, bot)
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
        return _mlp(top_perm, feat, cd, final_activation=False)[:, 0].astype(
            jnp.float32)

    def mk_step(fwd):
        def body(m, c):
            def loss_fn(dense_params, emb):
                b_, t_ = dense_params
                return bce_loss(fwd(b_, t_, dense, emb), label)
            emb = embedding_forward(m.tables, c)
            loss, (dg, delta) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))((m.bottom, m.top), emb)
            lr = 1e-4
            new_bottom = jax.tree.map(lambda p, g: p - lr * g, m.bottom, dg[0])
            new_top = jax.tree.map(lambda p, g: p - lr * g, m.top, dg[1])
            flat_idx, _ = stacked_flat_indices(m.tables, c)
            upd = SparseEmbeddingUpdate(
                delta=delta.reshape(-1, dim).astype(jnp.float32),
                indices=flat_idx)
            new_data, _ = SparseSGD(lr).apply(m.tables.data, upd, m.emb_state)
            return dc.replace(m, bottom=new_bottom, top=new_top,
                              tables=dc.replace(m.tables, data=new_data)), loss
        return body

    def fresh():
        return init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))

    runs = {}
    for name, fwd in [("current", fwd_current), ("block", fwd_block)]:
        body = mk_step(fwd)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(model, body=body):
            def step(k, carry):
                m, s = carry
                m, out = body(m, (cat + k) % vocab)
                return m, s + out
            return jax.lax.fori_loop(0, chunk, step,
                                     (model, jnp.zeros((), jnp.float32)))
        runs[name] = run

    # warm both compiles first, then interleave measurements A B A B.
    for name in ("current", "block"):
        print(f"stage: compile {name}", flush=True)
        m, r2 = runs[name](fresh())
        _ = float(r2)
        del m
    for trial in range(3):
        for name in ("current", "block"):
            m = fresh()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                m, r2 = runs[name](m)
                _ = float(r2)
                ts.append((time.perf_counter() - t0) / chunk)
            del m
            print(f"RESULT trial{trial} {name:8s} "
                  f"{float(np.median(ts))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
