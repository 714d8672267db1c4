"""Probe DMA-phase concurrency (VERDICT round-2 item 1).

The round-2 step dissection (docs/DESIGN.md §4) sums EXACTLY to the step
time — fwd 29.0 + bwd 15.8 + update 33.5 = 78.3 ms — i.e. zero overlap
between the update's scatter stream and anything else. The unprobed
question: can two independent random-row DMA streams run concurrently on
v5e, or do they serialize on one issue engine? If concurrent, a two-stack
staggered pipeline hides up to ~25-30 ms/step; if serialized, the SoL
claim is airtight and the pipeline idea is dead.

Experiments (all K-chained in one jit, varying indices, consumed results,
scalar-fetch fence — docs/DESIGN.md §1 methodology):

  G1   gather N rows from table A, consume-sum          (read stream alone)
  G2   two gathers N/2 from A and B                     (read || read)
  S1   scatter N occ into A (donated)                   (write stream alone)
  S2   two scatters N/2 into A and B (both donated)     (write || write)
  GS2  gather N/2 from A + scatter N/2 into B           (read || write, half)
  GSF  gather N from A + scatter N into B               (read || write, full)
  M1   bf16 matmul chain alone                          (MXU baseline)
  MS   matmul chain + scatter N into B                  (MXU || write)

Interpretation: for each combined experiment, serial-predict = sum of the
component times (minus the shared consume/loop overhead), overlap-predict
= max of them. Which the measurement lands on is the verdict.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1_700_000
V = 3_250_000
D = 128
K = 6
REPS = 3
MM = 8192  # matmul side (bf16): 2*MM^3 = 1.1 TFLOP per iter


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(fn, args, donate_idx=()):
    """Median per-iteration seconds of REPS runs of the K-chained jit.

    Convention for donating fns: return (fence_value, *new_donated) with
    the new buffers in `donate_idx` order, so the runner can rebind them
    between calls (a donated input is invalid after the call)."""
    jfn = jax.jit(fn, donate_argnums=donate_idx)
    args = list(args)

    def call():
        out = jfn(*args)
        if donate_idx:
            for di, new in zip(donate_idx, out[1:]):
                args[di] = new
            return out[0]
        return out

    fence(call())  # warmup + compile
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fence(call())
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    kA, kB, kd = jax.random.split(key, 3)
    # Generate big arrays ON device (CLAUDE.md rule).
    A = jax.random.normal(kA, (V, D), jnp.float32)
    B = jax.random.normal(kB, (V, D), jnp.float32)
    delta = jax.random.normal(kd, (N, D), jnp.float32)
    idxA = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    idxB = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    half = N // 2
    for x in (A, B, delta, idxA, idxB):
        x.block_until_ready()

    res = {}

    # ---- G1: gather alone (consume-fused sum) ---------------------------
    def g1(A, idx):
        def body(k, acc):
            y = jnp.take(A, (idx + k) % V, axis=0)
            return acc + y.sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    res["G1_gather_N"] = timed(g1, (A, idxA))

    # ---- G2: two half gathers from different tables ---------------------
    def g2(A, B, ia, ib):
        def body(k, acc):
            ya = jnp.take(A, (ia[:half] + k) % V, axis=0)
            yb = jnp.take(B, (ib[:half] + k) % V, axis=0)
            return acc + ya.sum() + yb.sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    res["G2_gather_half_x2"] = timed(g2, (A, B, idxA, idxB))

    # ---- S1: scatter alone (donated table) ------------------------------
    def s1(B, idx, delta):
        def body(k, t):
            return t.at[(idx + k) % V].add(delta)
        t = jax.lax.fori_loop(0, K, body, B)
        return t[0, :1], t
    res["S1_scatter_N"] = timed(s1, (B, idxB, delta), donate_idx=(0,))
    B = jax.random.normal(kB, (V, D), jnp.float32); B.block_until_ready()

    # ---- S2: two half scatters into different tables --------------------
    def s2(A, B, ia, ib, delta):
        def body(k, carry):
            ta, tb = carry
            ta = ta.at[(ia[:half] + k) % V].add(delta[:half])
            tb = tb.at[(ib[:half] + k) % V].add(delta[half:])
            return ta, tb
        ta, tb = jax.lax.fori_loop(0, K, body, (A, B))
        return ta[0, :1], ta, tb
    res["S2_scatter_half_x2"] = timed(s2, (A, B, idxA, idxB, delta),
                                      donate_idx=(0, 1))
    A = jax.random.normal(kA, (V, D), jnp.float32)
    B = jax.random.normal(kB, (V, D), jnp.float32)
    A.block_until_ready(); B.block_until_ready()

    # ---- GS2: half gather + half scatter, independent arrays ------------
    def gs2(A, B, ia, ib, delta):
        def body(k, carry):
            tb, acc = carry
            y = jnp.take(A, (ia[:half] + k) % V, axis=0)
            tb = tb.at[(ib[:half] + k) % V].add(delta[:half])
            return tb, acc + y.sum()
        tb, acc = jax.lax.fori_loop(0, K, body, (B, jnp.zeros((), jnp.float32)))
        return acc, tb
    res["GS2_half_each"] = timed(gs2, (A, B, idxA, idxB, delta),
                                 donate_idx=(1,))
    B = jax.random.normal(kB, (V, D), jnp.float32); B.block_until_ready()

    # ---- GSF: full gather + full scatter --------------------------------
    def gsf(A, B, ia, ib, delta):
        def body(k, carry):
            tb, acc = carry
            y = jnp.take(A, (ia + k) % V, axis=0)
            tb = tb.at[(ib + k) % V].add(delta)
            return tb, acc + y.sum()
        tb, acc = jax.lax.fori_loop(0, K, body, (B, jnp.zeros((), jnp.float32)))
        return acc, tb
    res["GSF_full_each"] = timed(gsf, (A, B, idxA, idxB, delta),
                                 donate_idx=(1,))
    B = jax.random.normal(kB, (V, D), jnp.float32); B.block_until_ready()

    # ---- M1: matmul chain alone -----------------------------------------
    X0 = jax.random.normal(kA, (MM, MM), jnp.bfloat16)
    W = jax.random.normal(kB, (MM, MM), jnp.bfloat16) * 0.01
    X0.block_until_ready(); W.block_until_ready()

    def m1(X, W):
        def body(k, x):
            return jnp.tanh(x @ W)  # tanh keeps the chain from blowing up
        return jax.lax.fori_loop(0, K, body, X)[:1, :1]
    res["M1_matmul"] = timed(m1, (X0, W))

    # ---- MS: matmul chain + full scatter --------------------------------
    def ms(X, W, B, ib, delta):
        def body(k, carry):
            x, tb = carry
            x = jnp.tanh(x @ W)
            tb = tb.at[(ib + k) % V].add(delta)
            return x, tb
        x, tb = jax.lax.fori_loop(0, K, body, (X, B))
        return x[:1, :1], tb
    res["MS_matmul_plus_scatter"] = timed(ms, (X0, W, B, idxB, delta),
                                          donate_idx=(2,))

    # ---- report ---------------------------------------------------------
    print()
    for k, v in res.items():
        print(f"{k:28s} {v*1e3:8.2f} ms")
    g, s = res["G1_gather_N"], res["S1_scatter_N"]
    m = res["M1_matmul"]
    print()
    print(f"G2 vs G1:                     {res['G2_gather_half_x2']*1e3:.2f}"
          f" vs {g*1e3:.2f} (same total rows; >1x means splitting costs)")
    print(f"S2 vs S1:                     {res['S2_scatter_half_x2']*1e3:.2f}"
          f" vs {s*1e3:.2f}")
    print(f"GS2: serial-predict {(g+s)/2*1e3:.2f}  overlap-predict "
          f"{max(g, s)/2*1e3:.2f}  measured {res['GS2_half_each']*1e3:.2f}")
    print(f"GSF: serial-predict {(g+s)*1e3:.2f}  overlap-predict "
          f"{max(g, s)*1e3:.2f}  measured {res['GSF_full_each']*1e3:.2f}")
    print(f"MS:  serial-predict {(m+s)*1e3:.2f}  overlap-predict "
          f"{max(m, s)*1e3:.2f}  measured "
          f"{res['MS_matmul_plus_scatter']*1e3:.2f}")


if __name__ == "__main__":
    main()
