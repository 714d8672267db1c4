"""Probe: does SPLITTING the stacked-ensemble gather into per-table gathers
recover the fast-gather rate? (round 3)

DESIGN.md §4 closed the 14.2-vs-24.4 ms gather gap "without exploitation":
per-table-BLOCKED index values (the stacked ensemble's layout) gather 1.7x
slower than fully-uniform values, and no index TRANSFORMATION moved a
realistic stream below ~24 ms. Untried: change the OP STRUCTURE — 26
separate gathers, each 65Ki indices confined to its own 250K-row table.
Each sub-gather's index distribution is "uniform over its table" (the A1
fast-case shape), and probe_overlap.py G2 measured gather splitting as
FREE (two half gathers == one). If B2/B3 land near 26 x the fast rate, the
ensemble forward has ~10 ms on the table; if they stay at ~24 ms, the
blocked penalty is about value/range locality inside the gather engine and
the §4 closure stands.

Experiments (K-chained, §1 methodology, consume-fused sum):
  B1  one gather, 1.7M blocked indices, (6.5M, D) stacked table [status quo]
  B2  26 gathers of 65Ki, each from its own (250K, D) separate array
  B3  26 gathers of 65Ki, each from a static slice of the stacked array
  B4  26 gathers of 65Ki BLOCKED indices, all into the FULL stacked array
      (same op split, full-range row ids -> discriminates op-splitting
      from value-range effects)
  B5  one gather, 1.7M fully-uniform indices over (6.5M, D) [the fast case]
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

T = 26
VT = 250_000
V = T * VT
B = 65_536
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
    rng = np.random.default_rng(0)
    table = jax.random.normal(jax.random.key(0), (V, D), jnp.float32)
    # Per-table local indices (T, B) and their blocked/stacked flat form.
    local = np.stack([rng.integers(0, VT, B).astype(np.int32)
                      for _ in range(T)])
    offsets = (np.arange(T, dtype=np.int32) * VT)[:, None]
    blocked = (local + offsets).reshape(-1)          # (T*B,) blocked values
    uniform = rng.integers(0, V, T * B).astype(np.int32)
    local_j = jnp.asarray(local)
    blocked_j = jnp.asarray(blocked)
    uniform_j = jnp.asarray(uniform)
    tables_sep = [jax.random.normal(jax.random.key(i + 1), (VT, D),
                                    jnp.float32) for i in range(T)]
    for x in tables_sep + [table, local_j, blocked_j, uniform_j]:
        x.block_until_ready()

    res = {}

    def b1(table, idx):
        def body(k, acc):
            y = jnp.take(table, (idx + k) % V, axis=0)
            return acc + y.sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    res["B1_one_blocked"] = timed(b1, (table, blocked_j))

    def b2(local, *tabs):
        def body(k, acc):
            for i in range(T):
                y = jnp.take(tabs[i], (local[i] + k) % VT, axis=0)
                acc = acc + y.sum()
            return acc
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    res["B2_split_separate"] = timed(b2, (local_j, *tables_sep))

    def b3(table, local):
        def body(k, acc):
            for i in range(T):
                sl = jax.lax.slice_in_dim(table, i * VT, (i + 1) * VT)
                y = jnp.take(sl, (local[i] + k) % VT, axis=0)
                acc = acc + y.sum()
            return acc
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    res["B3_split_slices"] = timed(b3, (table, local_j))

    def b4(table, local):
        def body(k, acc):
            for i in range(T):
                gidx = (local[i] + k) % VT + i * VT
                y = jnp.take(table, gidx, axis=0)
                acc = acc + y.sum()
            return acc
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    res["B4_split_fullrange"] = timed(b4, (table, local_j))

    res["B5_one_uniform"] = timed(b1, (table, uniform_j))

    print()
    for k, v in res.items():
        print(f"{k:22s} {v*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
