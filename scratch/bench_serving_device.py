"""Device-rate serving throughput (VERDICT r2 item 7): what the chip itself
sustains on the DLRM inference paths, decoupled from the tunnel.

The end-to-end serving bench (`bench_serving.py`) measures the full RPC ->
MicroBatcher -> device stack, but through the remote tunnel its number is
~96% dispatch overhead (docs/DESIGN.md §5). This bench isolates the device:
K inference micro-batches chained inside ONE jit (per-iteration index
variation, output consumed into the carry, scalar fetch as the fence — the
bench.py methodology), for the f32 path and the int8-quantized path.

Prints ONE JSON line; shapes mirror the serving-stack config
(T=26, V=100K, D=64, coalesced max_batch=2048).
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

T, V, D = 26, 100_000, 64
B = 2048          # MicroBatcher max_batch in the serving stack
K = 50            # chained inference batches per jit call
REPS = 3


def main():
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import dlrm_forward
    from embeddingtables_tpu.quant import quantize_dlrm

    cfg = DLRMConfig(vocab_sizes=tuple([V] * T), num_dense=13, dim=D,
                     bottom_mlp=(256, D), top_mlp=(256, 1))
    model = init_dlrm(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(B, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, V, (B,)).astype(np.int32) for _ in range(T)]))

    @jax.jit
    def run_f32(model, dense, cat):
        def body(k, acc):
            logits = dlrm_forward(model, dense, (cat + k) % V)
            return acc + logits.sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    qt, _eval_fn = quantize_dlrm(model, bits=8)

    # The quantized forward with explicit args (mirrors quantize_dlrm's
    # _eval; qt/params enter as arguments of the chained jit below — no
    # giant closure constants, CLAUDE.md rule).
    def _q_eval(qt, bottom, top, dense, cat):
        from embeddingtables_tpu.models.dlrm import forward_from_embeddings
        offsets = model.tables.offsets
        t = len(offsets) - 1
        shifted = jnp.stack([cat[i] + offsets[i] for i in range(t)])
        flat = shifted.reshape((-1,) + shifted.shape[2:])
        rows = qt.rows(flat)
        emb = rows.reshape(t, shifted.shape[1], cfg.dim)
        return forward_from_embeddings(bottom, top, cfg, dense, emb)

    @jax.jit
    def run_q(qt, bottom, top, dense, cat):
        def body(k, acc):
            logits = _q_eval(qt, bottom, top, dense, (cat + k) % V)
            return acc + logits.sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    def timeit(fn, *args):
        _ = float(fn(*args))  # compile + warmup; scalar fetch = fence
        ts = []
        for _i in range(REPS):
            t0 = time.perf_counter()
            _ = float(fn(*args))
            ts.append((time.perf_counter() - t0) / K)
        return float(np.median(ts))

    sec_f32 = timeit(run_f32, model, dense, cat)
    sec_q = timeit(run_q, qt, model.bottom, model.top, dense, cat)

    # --- the other CTR families, f32 path (one compile each) --------------
    from embeddingtables_tpu.models.dcn import (DCNConfig, dcn_forward,
                                                init_dcn)
    from embeddingtables_tpu.models.deepfm import (DeepFMConfig,
                                                   deepfm_forward,
                                                   init_deepfm)
    cfg_dcn = DCNConfig(vocab_sizes=tuple([V] * T), num_dense=13, dim=D,
                        num_cross=2, cross_rank=64, deep_mlp=(256, D))
    dcn = init_dcn(jax.random.key(1), cfg_dcn)

    @jax.jit
    def run_dcn(m, dense, cat):
        def body(k, acc):
            return acc + dcn_forward(m, dense, (cat + k) % V).sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    sec_dcn = timeit(run_dcn, dcn, dense, cat)

    # DeepFM both layouts: folded (default — first-order weights ride
    # column 0 of the fused stack, ONE gather) vs legacy (second dim-1
    # gather). The fold is the round-4 perf item (probe_fmfold.py).
    cfg_fm = DeepFMConfig(vocab_sizes=tuple([V] * T), num_dense=13, dim=D,
                          deep_mlp=(256, D))
    fm = init_deepfm(jax.random.key(2), cfg_fm)

    @jax.jit
    def run_fm(m, dense, cat):
        def body(k, acc):
            return acc + deepfm_forward(m, dense, (cat + k) % V).sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    sec_fm = timeit(run_fm, fm, dense, cat)

    import dataclasses
    cfg_fm_legacy = dataclasses.replace(cfg_fm, fold_fm_w=False)
    fm_legacy = init_deepfm(jax.random.key(2), cfg_fm_legacy)
    sec_fm_legacy = timeit(run_fm, fm_legacy, dense, cat)

    out = {
        "metric": "dlrm_serving_device_rate",
        "batch": B, "tables": T, "vocab": V, "dim": D,
        "f32_batch_ms": round(sec_f32 * 1e3, 3),
        "f32_examples_per_s": round(B / sec_f32),
        "int8_batch_ms": round(sec_q * 1e3, 3),
        "int8_examples_per_s": round(B / sec_q),
        "dcn_f32_examples_per_s": round(B / sec_dcn),
        "deepfm_f32_examples_per_s": round(B / sec_fm),
        "deepfm_legacy_unfolded_examples_per_s": round(B / sec_fm_legacy),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
