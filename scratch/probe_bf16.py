"""Probe: bf16 embedding tables + index-layout effects on the real step.

Motivation (docs/DESIGN.md §1d): the scatter's full-table-pass term scales
with table BYTES (~2.1 ns per f32 row at D=128), and the fwd/bwd activation
traffic is byte-proportional too — bf16 tables halve both. The dense towers
already run bf16 (compute_dtype); this probes the TABLE dtype:

  B1  full DLRM train step, f32 tables (the bench baseline)
  B2  same, bf16 tables (param_dtype=bf16)
  B3  same, bf16 tables + AdaGrad (dense-grad path; accum/grad stay f32)
  B4  f32 tables + AdaGrad (bench's uniform_adagrad reference point)

Methodology: identical to bench.py (chained fori_loop steps, donated model,
varying indices, loss-fetch fence).
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def measure(step, model, dense, cat, label, vocab, chunk=10, reps=3):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(model, dense, cat, label):
        def body(k, carry):
            m, _ = carry
            m, loss = step(m, dense, (cat + k) % vocab, label)
            return m, loss
        return jax.lax.fori_loop(0, chunk, body,
                                 (model, jnp.zeros((), jnp.float32)))

    model, loss = run_chunk(model, dense, cat, label)
    _ = float(loss)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        model, loss = run_chunk(model, dense, cat, label)
        _ = float(loss)
        times.append((time.perf_counter() - t0) / chunk)
    del model
    return float(np.median(times))


def main():
    assert jax.default_backend() == "tpu"
    only = set(sys.argv[1:])
    want = lambda p: not only or p in only
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_train_step
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD

    t, vocab, dim, batch = 26, 250_000, 128, 65_536
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(batch, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32)
         for _ in range(t)]))
    label = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))

    def run(name, pdtype, opt):
        cfg = DLRMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13,
                         dim=dim, bottom_mlp=(64, dim), top_mlp=(64, 1),
                         param_dtype=pdtype)
        step = make_train_step(cfg, sparse_opt=opt, dense_lr=1e-4, jit=False)
        model = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt)
        sec = measure(step, model, dense, cat, label, vocab)
        print(f"{name:34s} {sec*1e3:7.2f} ms", file=sys.stderr, flush=True)

    if want("B1"):
        run("B1 f32 tables + SGD", jnp.float32, SparseSGD(1e-4))
    if want("B2"):
        run("B2 bf16 tables + SGD", jnp.bfloat16, SparseSGD(1e-4))
    if want("B3"):
        run("B3 bf16 tables + AdaGrad", jnp.bfloat16,
            SparseRowWiseAdaGrad(lr=1e-3))
    if want("B4"):
        run("B4 f32 tables + AdaGrad", jnp.float32,
            SparseRowWiseAdaGrad(lr=1e-3))


if __name__ == "__main__":
    main()
