"""Probe: block the DLRM dot-interaction Gram over examples for MXU
utilization.

After round 4's selection-matmul fix (docs/DESIGN.md §10) the interaction
still costs ~13 ms of fwd+bwd beyond the cat floor (W4 39.6 vs W5 26.6).
Hypothesis: each example's Gram is a (27,128)@(128,27) batched matmul —
~(27/128)^2 = 4.5% MXU utilization. Packing `block` examples' feature rows
into one (block*27, 128) operand computes a (block*27, block*27) Gram at
(108/128)^2 = 71% utilization (block=4); the off-diagonal cross-example
blocks are wasted FLOPs on cycles that were idle anyway, and the four
diagonal 27x27 blocks are extracted with STATIC slices (backward = static
pad, no gather/scatter).

  G1 fwd+loss, production selection-matmul path   (baseline re-measure)
  G2 fwd+bwd,  production
  G3 fwd+loss, blocked Gram (block=4, per-block selection + stack)
  G4 fwd+bwd,  blocked
  G5 fwd+loss, blocked+padded Gram (t1 27->32, block=4 -> 128 exactly)
  G6 fwd+bwd,  blocked+padded
  G7 full SGD step, production                    (bench baseline)
  G8 full SGD step, best blocked variant          (decision metric)
  G9 numeric check: blocked vs production logits at small shape

Same methodology as probe_bwd.py: chained fori_loop steps inside one jit,
scalar-fetch fence, median of reps.
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
    from embeddingtables_tpu.models.dlrm import (_mlp, _tril_selection_np,
                                                 bce_loss, embedding_forward,
                                                 forward_from_embeddings,
                                                 make_train_step)
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
    SEL = jnp.asarray(_tril_selection_np(t1, -1))

    def blocked_flat(z, block, pad_to=None):
        """(B, t1, D) -> (B, pairs) strict-lower-tri dots, block examples
        per Gram matmul. pad_to: pad t1 so block*pad_to == 128 exactly."""
        b, _, d = z.shape
        tt = t1
        if pad_to is not None:
            z = jnp.pad(z, ((0, 0), (0, pad_to - t1), (0, 0)))
            tt = pad_to
        zb = z.reshape(b // block, block * tt, d)
        g = jnp.einsum("bij,bkj->bik", zb, zb)    # (B/blk, blk*tt, blk*tt)
        outs = []
        for k in range(block):
            blk = jax.lax.slice(
                g, (0, k * tt, k * tt),
                (g.shape[0], k * tt + t1, k * tt + t1))  # (B/blk, t1, t1)
            outs.append(blk.reshape(blk.shape[0], t1 * t1)
                        @ SEL.astype(blk.dtype))         # (B/blk, pairs)
        return jnp.stack(outs, axis=1).reshape(b, -1)

    def mk_fwd_blocked(block, pad_to):
        def fwd(bottom, top, dense_x, emb_t):
            cd = cfg.compute_dtype
            bot = _mlp(bottom, dense_x, cd)
            emb = jnp.transpose(emb_t, (1, 0, 2)).astype(cd)
            z = jnp.concatenate([bot[:, None, :], emb], axis=1)
            flat = blocked_flat(z, block, pad_to)
            feat = jnp.concatenate([bot, flat], axis=-1)
            logits = _mlp(top, feat, cd, final_activation=False)
            return logits[:, 0].astype(jnp.float32)
        return fwd

    def fwd_std(bottom, top, dense_x, emb_t):
        return forward_from_embeddings(bottom, top, cfg, dense_x, emb_t)

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
        print(f"{name:36s} {sec*1e3:7.2f} ms", file=sys.stderr, flush=True)
        del model
        return sec

    def mk_fwd(fwd):
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

    def fresh():
        return init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))

    fwd_blk = mk_fwd_blocked(4, None)
    fwd_pad = mk_fwd_blocked(4, 32)

    r = {}
    r["G1"] = timeit("G1 fwd+loss production", mk_fwd(fwd_std), fresh())
    r["G2"] = timeit("G2 fwd+bwd production", mk_fwd_bwd(fwd_std), fresh())
    r["G3"] = timeit("G3 fwd+loss blocked4", mk_fwd(fwd_blk), fresh())
    r["G4"] = timeit("G4 fwd+bwd blocked4", mk_fwd_bwd(fwd_blk), fresh())
    r["G5"] = timeit("G5 fwd+loss blocked4 pad32", mk_fwd(fwd_pad), fresh())
    r["G6"] = timeit("G6 fwd+bwd blocked4 pad32", mk_fwd_bwd(fwd_pad),
                     fresh())

    sgd_step = make_train_step(cfg, sparse_opt=SparseSGD(1e-4),
                               dense_lr=1e-4, jit=False)
    r["G7"] = timeit("G7 full SGD step production",
                     lambda m, c: sgd_step(m, dense, c, label), fresh())

    best = fwd_pad if r["G6"] <= r["G4"] else fwd_blk

    def blk_step(m, c):
        import dataclasses as dc
        from embeddingtables_tpu.models.dlrm import stacked_flat_indices
        from embeddingtables_tpu.ops.sparse_update import \
            SparseEmbeddingUpdate
        def loss_fn(dense_params, emb):
            b_, t_ = dense_params
            return bce_loss(best(b_, t_, dense, emb), label)
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

    r["G8"] = timeit("G8 full SGD step best-blocked", blk_step, fresh())

    # G9: numeric parity at a small shape (same dots, same contraction
    # order over D -> expect bitwise-or-ULP equality in bf16 compute).
    m = fresh()
    small_dense = dense[:256]
    small_cat = cat[:, :256]
    emb = embedding_forward(m.tables, small_cat)
    a = fwd_std(m.bottom, m.top, small_dense, emb)
    b = fwd_blk(m.bottom, m.top, small_dense, emb)
    c_ = fwd_pad(m.bottom, m.top, small_dense, emb)
    print(f"G9 max|blk-std| {float(jnp.max(jnp.abs(a-b))):.3e} "
          f"max|pad-std| {float(jnp.max(jnp.abs(a-c_))):.3e}",
          file=sys.stderr, flush=True)
    print(f"=> step production {1e3*r['G7']:.1f} ms -> blocked "
          f"{1e3*r['G8']:.1f} | interaction fwd+bwd: prod "
          f"{1e3*r['G2']:.1f}, blk4 {1e3*r['G4']:.1f}, pad32 "
          f"{1e3*r['G6']:.1f}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
