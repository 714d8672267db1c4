"""Measure the small-vocab dense-grad realizations on the real chip: MXU
one-hot segment-accumulate (f32-exact, optim._dense_grad's segsum path) vs
the XLA scatter-add, across padded vocab sizes — to set the dispatch
threshold empirically (round 3; the 5.6 ns/occ figure from DESIGN.md §1d
was measured in bf16 at H=1024, and the f32 one-hot FLOPs grow linearly
in the padded vocab).

K-chained, varying rows, outputs consumed (§1 methodology). n = 1.7M
occurrences (the bench-scale stream a small table would absorb through
per-table placements).
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1_700_000
D = 128
K = 6
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
    from embeddingtables_tpu.ops.pallas.segsum import hot_accumulate
    rng = np.random.default_rng(0)
    g = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    g.block_until_ready()

    print(f"{'V':>6} {'segsum_f32':>12} {'segsum_bf16':>12} "
          f"{'scatter':>10}")
    for v in (256, 1024, 2048, 4096):
        rows = jnp.asarray(rng.integers(0, v, N).astype(np.int32))
        rows.block_until_ready()

        def seg_f32(rows, g):
            def body(k, acc):
                r = (rows + k) % v
                out = hot_accumulate(r, g, v, compute_dtype=jnp.float32)
                return acc + out.sum()
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

        def seg_bf16(rows, g):
            def body(k, acc):
                r = (rows + k) % v
                out = hot_accumulate(r, g, v, compute_dtype=jnp.bfloat16)
                return acc + out.sum()
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

        def scat(rows, g):
            def body(k, acc):
                r = (rows + k) % v
                out = jnp.zeros((v, D), jnp.float32).at[r].add(g)
                return acc + out.sum()
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

        t_f32 = timed(seg_f32, (rows, g))
        t_bf16 = timed(seg_bf16, (rows, g))
        t_sc = timed(scat, (rows, g))
        print(f"{v:>6} {t_f32*1e3:>10.2f}ms {t_bf16*1e3:>10.2f}ms "
              f"{t_sc*1e3:>8.2f}ms", flush=True)


if __name__ == "__main__":
    main()
