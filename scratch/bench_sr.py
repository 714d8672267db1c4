"""Measure the stochastic-rounding overhead on the benched AdaGrad step
(bf16 tables): SR's cast randomizes the full (V, D) result before the
touched-row select, i.e. O(V*D) RNG per step — how much does that cost at
the bench scale (26 x 250K x 128)?

Configs: bf16 tables nearest (SR off) vs bf16 tables + SR, both with f32
towers (the production recipe, DESIGN.md §7); f32 baseline for reference.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from embeddingtables_tpu.models import DLRMConfig, init_dlrm
from embeddingtables_tpu.models.dlrm import make_train_step
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad

T, V, D, B, CHUNK, REPS = 26, 250_000, 128, 65_536, 10, 3


def run_config(name, table_dtype, sr):
    cfg = DLRMConfig(vocab_sizes=tuple([V] * T), num_dense=13, dim=D,
                     bottom_mlp=(64, D), top_mlp=(64, 1),
                     table_dtype=table_dtype)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(B, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, V, (B,)).astype(np.int32) for _ in range(T)]))
    label = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))
    ada = SparseRowWiseAdaGrad(lr=1e-3, stochastic_rounding=sr)
    step = make_train_step(cfg, sparse_opt=ada, dense_lr=1e-4, jit=False)
    base_key = jax.random.key(7)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(model, dense, cat, label):
        def body(k, carry):
            m, _ = carry
            kw = {"key": jax.random.fold_in(base_key, k)} if sr else {}
            m, loss = step(m, dense, (cat + k) % V, label, **kw)
            return m, loss
        return jax.lax.fori_loop(0, CHUNK, body,
                                 (model, jnp.zeros((), jnp.float32)))

    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=ada)
    model, loss = run_chunk(model, dense, cat, label)
    _ = float(loss)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        model, loss = run_chunk(model, dense, cat, label)
        _ = float(loss)
        ts.append((time.perf_counter() - t0) / CHUNK)
    del model
    print(f"{name:24s} {float(np.median(ts))*1e3:8.2f} ms", flush=True)


def main():
    run_config("f32", None, False)
    run_config("bf16tab_nearest", jnp.bfloat16, False)
    run_config("bf16tab_sr", jnp.bfloat16, True)


if __name__ == "__main__":
    main()
