"""Probe: is DeepFM's separate dim-1 `fm_w` gather worth folding into the
main stack as an extra feature column? (round 3; DESIGN.md §5 noted the
measured DeepFM serving rate is 3.7x below DLRM's.)

The issue-bound model (§1b) predicts: a second gather of (V, 1) rows pays
the SAME per-row cost as the (V, D) gather despite moving 1/128th the
bytes, so ONE gather of a fused (V, D+1) stack (padding D+1 up to the next
lane multiple) should approach the single-gather time.

  F1  gather (V, 64), n occurrences              [main stack alone]
  F2  F1 + separate gather (V, 1), same indices  [today's DeepFM layout]
  F3  one gather (V, 65), same n                 [fused layout]
  F4  one gather (V, 128), same n                [fused at full lane pad]
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

V = 2_600_000      # 26 tables x 100K (serving scale)
N = 2048 * 26      # occurrences per serving batch
K = 200            # chained batches
REPS = 3


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(fn, args):
    jfn = jax.jit(fn)
    fence(jfn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fence(jfn(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.median(ts))


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    t64 = jax.random.normal(jax.random.key(0), (V, 64), jnp.float32)
    t1 = jax.random.normal(jax.random.key(1), (V, 1), jnp.float32)
    t65 = jax.random.normal(jax.random.key(2), (V, 65), jnp.float32)
    t128 = jax.random.normal(jax.random.key(3), (V, 128), jnp.float32)
    for x in (idx, t64, t1, t65, t128):
        x.block_until_ready()

    def one(table):
        def f(table, idx):
            def body(k, acc):
                y = jnp.take(table, (idx + k) % V, axis=0)
                return acc + y.sum()
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
        return f

    def two(t64, t1, idx):
        def body(k, acc):
            i = (idx + k) % V
            y = jnp.take(t64, i, axis=0)
            w = jnp.take(t1, i, axis=0)
            return acc + y.sum() + w.sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    r = {}
    r["F1_main_only_64"] = timed(one(t64), (t64, idx))
    r["F2_main_plus_dim1"] = timed(two, (t64, t1, idx))
    r["F3_fused_65"] = timed(one(t65), (t65, idx))
    r["F4_fused_128"] = timed(one(t128), (t128, idx))
    print()
    for k, v in r.items():
        print(f"{k:22s} {v*1e3:8.3f} ms/batch")


if __name__ == "__main__":
    main()
