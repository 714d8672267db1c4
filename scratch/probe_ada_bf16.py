"""Probe: can the AdaGrad dense-grad realization (optim §1e: ONE
duplicate-accumulating scatter into a (V, D) f32 scratch + ONE fused
elementwise pass) go faster with a bf16 scratch?

The pass streams ~10 GB/step at bench scale (grad write+read 2x3.3 GB,
table read+write 2x3.3 GB, accum small). A bf16 scratch halves the grad
streams (~-4 ms predicted at 819 GB/s) at the cost of bf16 accumulation
precision on duplicate hits (and bf16 quantization of every delta).

  U1 f32 scratch: scatter-add + adagrad pass (donated table), K-chained
  U2 bf16 scratch: same
  U3 numeric check at small shape: max |row update diff| vs f32 oracle

Verdict drives whether an opt-in `dense_grad_dtype` lands in optim.py.

LESSON (first attempt, 2026-08-20): closing the (N, D) = 872 MB delta
into the jit as a constant stalled compilation >8 min (the CLAUDE.md
rule exists for COMPILE time, not just transfer time) and the probe had
to be timeout-killed, wedging the tunnel server for the usual ~20 min.
This version passes idx/delta as jit ARGUMENTS.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

T, V, D = 26, 250_000, 128
N = 65_536 * T          # occurrences per step (bench scale)
K = 8
REPS = 3
SUMV = T * V


def _p(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    _p("backend up")
    # Generate the big operands ON DEVICE (tunnel transfer rule) and pass
    # them as jit ARGUMENTS (closure constants stall the compile).
    idx = jax.jit(lambda: jax.random.randint(
        jax.random.key(1), (N,), 0, SUMV, jnp.int32))()
    delta = jax.jit(lambda: 1e-3 * jax.random.normal(
        jax.random.key(2), (N, D), jnp.float32))()
    _p("operand jits dispatched")
    # Fence with a scalar fetch — block_until_ready HANGS through the
    # tunnel (CLAUDE.md; measured: 15 min blocked, ~0 CPU).
    _ = float(delta[0, 0]) + float(idx[0])
    _p("operands ready on device")

    def gen_table():
        return jax.jit(lambda: jax.random.normal(
            jax.random.key(0), (SUMV, D), jnp.float32))()

    def make_run(scratch_dtype):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(table, accum, idx, delta):
            def body(k, carry):
                tbl, acc, s = carry
                rows = (idx + k) % SUMV
                g = jnp.zeros((SUMV, D), scratch_dtype)
                g = g.at[rows].add(delta.astype(scratch_dtype))
                gf = g.astype(jnp.float32)
                g2 = jnp.mean(jnp.square(gf), axis=-1)
                new_acc = acc + g2
                denom = jax.lax.rsqrt(jnp.maximum(new_acc + 1e-8, 1e-30))
                new_tbl = tbl - 0.01 * gf * denom[:, None]
                return new_tbl, new_acc, s + new_tbl[0, 0]
            tbl, acc, s = jax.lax.fori_loop(
                0, K, body, (table, accum, jnp.zeros((), jnp.float32)))
            return tbl, acc, s
        return run

    for name, dt in (("U1_f32_scratch", jnp.float32),
                     ("U2_bf16_scratch", jnp.bfloat16)):
        run = make_run(dt)
        tbl = gen_table()
        acc = jnp.zeros((SUMV,), jnp.float32)
        _p(f"{name}: warmup (compile) dispatched")
        tbl, acc, s = run(tbl, acc, idx, delta)
        _ = float(s)
        _p(f"{name}: compiled + warm")
        ts = []
        for _i in range(REPS):
            t0 = time.perf_counter()
            tbl, acc, s = run(tbl, acc, idx, delta)
            _ = float(s)
            ts.append((time.perf_counter() - t0) / K)
        print(f"{name:18s} {float(np.median(ts))*1e3:8.2f} ms/step",
              file=sys.stderr, flush=True)
        del tbl, acc

    # U3: numeric error at a small shape with REAL duplication (zipf-ish).
    v = 4096
    n = 32768
    rows = jnp.asarray((rng.zipf(1.3, n) % v).astype(np.int32))
    d_small = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32) * 1e-3)
    g32 = jnp.zeros((v, D), jnp.float32).at[rows].add(d_small)
    g16 = jnp.zeros((v, D), jnp.bfloat16).at[rows].add(
        d_small.astype(jnp.bfloat16)).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(g16 - g32))
                / jnp.maximum(jnp.max(jnp.abs(g32)), 1e-30))
    print(f"U3 bf16-scratch max rel grad err (zipf dups): {rel:.3e}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
