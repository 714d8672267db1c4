"""DeepFM TRAIN-step cost: folded (ΣV, D+1) stack vs legacy two-stack.

The round-4 fold (models/deepfm.py) replaces the separate dim-1 first-order
gather+scatter with one fused stack — serving measured +50% examples/s
(bench_serving_device.py). This bench measures the TRAINING step the same
way (bench.py methodology: chunk steps chained in one jit, donated model,
varying indices, loss fetch as the fence) for SGD and row-wise AdaGrad.

The issue-bound model (docs/DESIGN.md §1b) predicts the win: the legacy
layout pays a second gather (n_occ DMAs) AND a second scatter (n_occ DMAs +
a (ΣV, 1) table pass) that the fused layout folds into the main streams
for ~1/65th extra bytes.

Prints ONE JSON line; human detail on stderr.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def measure(run_chunk, model, dense, cat, label, chunk, reps):
    model, loss = run_chunk(model, dense, cat, label)
    _ = float(loss)
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        model, loss = run_chunk(model, dense, cat, label)
        lv = float(loss)
        times.append((time.perf_counter() - t0) / chunk)
    assert np.isfinite(lv), lv
    del model
    return float(np.median(times))


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        t, vocab, dim, batch, chunk, reps = 26, 100_000, 64, 65_536, 8, 3
    else:
        t, vocab, dim, batch, chunk, reps = 6, 5_000, 16, 2_048, 3, 2

    from embeddingtables_tpu.models.deepfm import (DeepFMConfig,
                                                   init_deepfm,
                                                   make_train_step)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD

    cfg_fold = DeepFMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13,
                            dim=dim, deep_mlp=(64, dim))
    cfg_leg = dataclasses.replace(cfg_fold, fold_fm_w=False)

    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(batch, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32)
         for _ in range(t)]))
    label = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))

    results = {}
    for layout, cfg in (("folded", cfg_fold), ("legacy", cfg_leg)):
        for opt_name, opt_mk in (
                ("sgd", lambda: SparseSGD(1e-4)),
                ("adagrad", lambda: SparseRowWiseAdaGrad(1e-3))):
            step = make_train_step(cfg, sparse_opt=opt_mk(), dense_lr=1e-4,
                                   jit=False)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run_chunk(model, dense, cat, label, _step=step):
                def body(k, carry):
                    m, _ = carry
                    m, loss = _step(m, dense, (cat + k) % vocab, label)
                    return m, loss
                return jax.lax.fori_loop(
                    0, chunk, body, (model, jnp.zeros((), jnp.float32)))

            model = init_deepfm(jax.random.key(0), cfg, sparse_opt=opt_mk())
            key = f"{layout}_{opt_name}"
            results[key] = measure(run_chunk, model, dense, cat, label,
                                   chunk, reps)
            print(f"# {key:16s} {results[key]*1e3:8.2f} ms/step "
                  f"({batch/results[key]:,.0f} examples/s)",
                  file=sys.stderr, flush=True)

    out = {
        "metric": "deepfm_train_step_fold_vs_legacy",
        "tables": t, "vocab": vocab, "dim": dim, "batch": batch,
        "backend": jax.default_backend(),
        **{f"{k}_ms": round(v * 1e3, 3) for k, v in results.items()},
        "fold_speedup_sgd": round(
            results["legacy_sgd"] / results["folded_sgd"], 4),
        "fold_speedup_adagrad": round(
            results["legacy_adagrad"] / results["folded_adagrad"], 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
