"""Settle the DESIGN §4 discrepancy: a flat uniform gather measured 14.2 ms
in one session (probe_hot P6) and 24.4 ms in another (probe_fwd F3), same
methodology on paper. Run both index constructions back to back in ONE
process so tunnel-state/context explanations cancel.

  A1  (N,) uniform int32 indices over V          (P6 construction)
  A2  (T, B) per-table local ids + offsets, flat (F3 construction)
  A3  A1 again (drift check)
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1_700_000
V = 6_500_000
T, B = 26, 65_536
K = 8


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(k, s):
            return s + fn(k, *a)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    r = run(*args)
    _ = float(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        ts.append((time.perf_counter() - t0) / K)
    print(f"{name:44s} {float(np.median(ts))*1e3:7.2f} ms",
          file=sys.stderr, flush=True)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    table = jax.jit(lambda: jax.random.normal(
        jax.random.key(0), (V, 128), jnp.float32))()
    flat = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    local = jnp.asarray(rng.integers(0, V // T, (T, B)).astype(np.int32))
    offs = (jnp.arange(T, dtype=jnp.int32) * (V // T))[:, None]

    def mat(x):
        return jnp.sum(jax.lax.optimization_barrier(x))

    def a1(k, t, i):
        return mat(jnp.take(t, (i + k) % V, axis=0))

    def a2(k, t, c, o):
        idx = ((c + k) % (V // T) + o).reshape(-1)
        return mat(jnp.take(t, idx, axis=0))

    only = set(sys.argv[1:])
    if not only or "A1" in only:
        timeit("A1 flat uniform (P6 construction)", a1, table, flat)
        timeit("A2 (T,B)+offsets flat (F3 construction)", a2, table, local,
               offs)
        timeit("A3 flat uniform again", a1, table, flat)

    if only and "A9" in only:
        blocked_np = np.concatenate(
            [rng.integers(t * (V // T), (t + 1) * (V // T), B)
             for t in range(T)]).astype(np.int32)
        sigma = rng.permutation(V).astype(np.int32)
        timeit("A9 blocked values host-scrambled", a1, table,
               jnp.asarray(sigma[blocked_np]))
        shuf = blocked_np.copy()
        rng.shuffle(shuf)
        timeit("A10 blocked values order-shuffled", a1, table,
               jnp.asarray(shuf))
        return

    if only and "A4" not in only:
        return
    # Discriminators: distribution vs graph shape.
    blocked_np = np.concatenate(
        [rng.integers(t * (V // T), (t + 1) * (V // T), B)
         for t in range(T)]).astype(np.int32)
    blocked = jnp.asarray(blocked_np)
    timeit("A4 host-precomputed blocked flat", a1, table, blocked)

    def a5(k, t, c, o):
        idx = ((c + k) % (V // T) + o).reshape(-1)
        idx = jax.lax.optimization_barrier(idx)   # materialize the indices
        return mat(jnp.take(t, idx, axis=0))
    timeit("A5 A2 + index barrier", a5, table, local, offs)

    def a6(k, t, c, o):
        idx = (c + o).reshape(-1)                 # no mod in the graph
        idx = (idx + k) % V
        return mat(jnp.take(t, idx, axis=0))
    timeit("A6 add-offsets then flat %V", a6, table, local, offs)

    # A7: SCRAMBLED layout — store rows permuted by g' = g*A mod V
    # (A odd, coprime to V): any blocked pattern spreads over the full
    # range for the cost of one fused multiply+mod per index.
    A = 2654435761 % V
    if np.gcd(A, V) != 1:
        A += 1

    def a7(k, t, c, o):
        g = ((c + k) % (V // T) + o).reshape(-1)
        idx = (g.astype(jnp.uint64) * A % V).astype(jnp.int32)
        return mat(jnp.take(t, idx, axis=0))
    timeit("A7 blocked ids + scrambled layout", a7, table, local, offs)

    # A8: scatter-side — blocked vs uniform vs scrambled targets.
    vals = jax.jit(lambda: jax.random.normal(
        jax.random.key(2), (N, 128), jnp.float32))()

    def timeit_tab(name, fn, table0, *args):
        import functools
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(tb, *a):
            def body(k, carry):
                tb2, s = carry
                tb2, out = fn(k, tb2, *a)
                return tb2, s + out
            return jax.lax.fori_loop(0, K, body,
                                     (table0 * 0 + tb,
                                      jnp.zeros((), jnp.float32)))
        # simpler: donate fresh zeros table
        tb = jnp.zeros((V, 128), jnp.float32)
        tb, r = run(tb)
        _ = float(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            tb, r = run(tb)
            _ = float(r)
            ts.append((time.perf_counter() - t0) / K)
        print(f"{name:44s} {float(np.median(ts))*1e3:7.2f} ms",
              file=sys.stderr, flush=True)

    import functools
    def scat_run(name, idx_fn):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(tb):
            def body(k, carry):
                tb2, s = carry
                tb2 = tb2.at[idx_fn(k)].add(vals)
                return tb2, s + jnp.sum(tb2[:2])
            return jax.lax.fori_loop(0, K, body,
                                     (tb, jnp.zeros((), jnp.float32)))
        tb = jnp.zeros((V, 128), jnp.float32)
        tb, r = run(tb)
        _ = float(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            tb, r = run(tb)
            _ = float(r)
            ts.append((time.perf_counter() - t0) / K)
        print(f"{name:44s} {float(np.median(ts))*1e3:7.2f} ms",
              file=sys.stderr, flush=True)
        del tb

    if "A9" in only:
        sigma = rng.permutation(V).astype(np.int32)
        idx9 = jnp.asarray(sigma[blocked_np])       # values scrambled
        timeit("A9 blocked values host-scrambled", a1, table, idx9)
        shuf = blocked_np.copy()
        rng.shuffle(shuf)                            # order scrambled
        timeit("A10 blocked values order-shuffled", a1, table,
               jnp.asarray(shuf))
        srt = np.sort(np.asarray(flat))
        timeit("A11 uniform values SORTED order", a1, table,
               jnp.asarray(srt))
        return

    scat_run("A8a scatter uniform targets",
             lambda k: (flat + k) % V)
    scat_run("A8b scatter blocked targets",
             lambda k: ((local + k) % (V // T) + offs).reshape(-1))
    scat_run("A8c scatter blocked+scrambled",
             lambda k: ((((local + k) % (V // T) + offs).reshape(-1)
                        ).astype(jnp.uint64) * A % V).astype(jnp.int32))


if __name__ == "__main__":
    main()
