"""Probe the v5e per-row DMA-issue gap (VERDICT round-1 item 2).

DESIGN.md §2 says per-row DMAs *issue* at ~3 ns; the measured gather floor is
~13 ns/row. This script measures where the 4x lives:

  E1  XLA gather, uniform-random rows        (the 22.4 ms baseline)
  E2  Pallas v2 gather tb=256, uniform       (the 22.9 ms round-1 kernel)
  E3  Pallas v2 tb=512 / tb=1024-shared-sems (more DMAs in flight)
  E4  Pallas v2 tb=256, SORTED uniform rows  (HBM locality, no dup skip)
  E5  Pallas v2 tb=256, all-same-row         (pure issue rate, perfect hits)
  E6  Pallas v2 tb=256, sorted Zipf(1.1)     (dup baseline)
  E7  COALESCING gather tb=256, sorted Zipf  (skip dup DMAs, VMEM fill)
  E8  XLA gather, sorted Zipf                (XLA's own dup behavior)
  E9  Pallas v2, D=512 at n/4                (same bytes, 1/4 the DMAs)

Methodology (docs/DESIGN.md §1 — DCE/hoist/CSE-proof): every variant runs
K iterations inside ONE jit via fori_loop; each iteration offsets the index
vector by the loop counter (nothing loop-invariant); the gather output is
consumed by a full sum into the carry; the scalar fetch at the end is the
fence. Reported per-iteration time includes the ~1.1 ms consume-sum —
constant across variants, so deltas are clean.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1_700_000
V = 6_500_000
D = 128
K = 8  # chained iterations per jit


def zipf_indices(rng, n, vocab, a=1.1):
    """Bounded Zipf by inverse-CDF over ranks (same skew family as data.py)."""
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    w = 1.0 / ranks ** a
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    u = rng.random(n)
    return np.searchsorted(cdf, u).astype(np.int32)


# ---------------------------------------------------------------------------
# Parametrized v2-style gather kernel: nsems semaphores shared mod j, optional
# duplicate coalescing (requires sorted rows).
# ---------------------------------------------------------------------------

def _kernel(tb, n_tiles, nsems, coalesce, idx_hbm, table_ref, out_ref,
            idx_smem, isems, rsems):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(idx_hbm.at[0], idx_smem.at[0],
                              isems.at[0]).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        nxt = i + 1
        pltpu.make_async_copy(idx_hbm.at[nxt], idx_smem.at[nxt % 2],
                              isems.at[nxt % 2]).start()

    pltpu.make_async_copy(idx_hbm.at[i], idx_smem.at[i % 2],
                          isems.at[i % 2]).wait()

    if not coalesce:
        for j in range(tb):
            row = idx_smem[i % 2, 0, j]
            pltpu.make_async_copy(table_ref.at[row], out_ref.at[j],
                                  rsems.at[j % nsems]).start()
        for j in range(tb):
            row = idx_smem[i % 2, 0, j]
            pltpu.make_async_copy(table_ref.at[row], out_ref.at[j],
                                  rsems.at[j % nsems]).wait()
    else:
        # Duplicate coalescing: sorted rows -> runs are adjacent; only the
        # first occurrence in a tile-local run issues a DMA, the rest copy
        # from the previous output slot in VMEM (j=0 always DMAs, so a run
        # crossing a tile boundary pays one extra DMA — negligible).
        dups = []
        for j in range(tb):
            row = idx_smem[i % 2, 0, j]
            dup = (jnp.asarray(False) if j == 0
                   else row == idx_smem[i % 2, 0, j - 1])
            dups.append(dup)

            @pl.when(jnp.logical_not(dup))
            def _(j=j, row=row):
                pltpu.make_async_copy(table_ref.at[row], out_ref.at[j],
                                      rsems.at[j % nsems]).start()
        for j in range(tb):
            row = idx_smem[i % 2, 0, j]

            @pl.when(jnp.logical_not(dups[j]))
            def _(j=j, row=row):
                pltpu.make_async_copy(table_ref.at[row], out_ref.at[j],
                                      rsems.at[j % nsems]).wait()
        for j in range(1, tb):
            @pl.when(dups[j])
            def _(j=j):
                out_ref[j] = out_ref[j - 1]


def pallas_gather(table3, idx, tb, nsems, coalesce):
    b = idx.shape[0]
    d = table3.shape[2]
    b_pad = (b + tb - 1) // tb * tb
    if b_pad != b:
        idx = jnp.pad(idx, (0, b_pad - b))
    b = b_pad
    n_tiles = b // tb
    idx3 = idx.reshape(n_tiles, 1, tb)
    return pl.pallas_call(
        functools.partial(_kernel, tb, n_tiles, nsems, coalesce),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tb, 1, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2, 1, tb), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((nsems,)),
        ],
        out_shape=jax.ShapeDtypeStruct((b, 1, d), table3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0, bytes_accessed=2 * b * d * 4),
    )(idx3, table3)


def timeit(name, fn, table, idx, vocab):
    @jax.jit
    def run(table, idx):
        def body(k, carry):
            out = fn(table, (idx + k) % vocab)
            return carry + jnp.sum(out, dtype=jnp.float32)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    r = run(table, idx)
    r.block_until_ready()
    _ = float(r)  # fence through the tunnel
    ts = []
    for _rep in range(3):
        t0 = time.perf_counter()
        _ = float(run(table, idx))
        ts.append((time.perf_counter() - t0) / K)
    sec = float(np.median(ts))
    n = idx.shape[0]
    print(f"{name:34s} {sec*1e3:7.2f} ms  {sec/n*1e9:6.2f} ns/row "
          f"{2*n*table.shape[-1]*4/sec/1e9:6.1f} GB/s-effective",
          file=sys.stderr, flush=True)
    return sec


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    only = set(sys.argv[1:])  # experiment name prefixes; empty = all

    def want(name):
        return not only or any(name.startswith(p) for p in only)

    rng = np.random.default_rng(0)
    # Generate the table ON DEVICE — a 3.3 GB host->device transfer through
    # the tunnel takes longer than the whole probe budget.
    table = jax.jit(lambda: jax.random.normal(
        jax.random.key(0), (V, D), jnp.float32))()
    table.block_until_ready()
    print("table ready", file=sys.stderr, flush=True)

    uni_np = rng.integers(0, V, N).astype(np.int32)
    uni = jnp.asarray(uni_np)
    uni_sorted = jnp.asarray(np.sort(uni_np))
    zipf = zipf_indices(rng, N, V)
    nuniq = len(np.unique(zipf))
    print(f"zipf unique: {nuniq} of {N} (x{N/nuniq:.2f} duplication)",
          file=sys.stderr, flush=True)
    zipf_sorted = jnp.asarray(np.sort(zipf))
    same = jnp.zeros((N,), jnp.int32)

    xla = lambda t, i: jnp.take(t, i, axis=0)
    mk = lambda tb, ns, co: (lambda t, i: pallas_gather(
        t.reshape(V, 1, D), i, tb, ns, co).reshape(-1, D)[:i.shape[0]])

    runs = [
        ("E1 xla uniform", xla, uni),
        ("E2 pallas tb=256 uniform", mk(256, 256, False), uni),
        ("E3a pallas tb=512 uniform", mk(512, 256, False), uni),
        ("E3b pallas tb=1024 sems=256", mk(1024, 256, False), uni),
        ("E3c pallas tb=128 uniform", mk(128, 128, False), uni),
        ("E4 pallas tb=256 SORTED uniform", mk(256, 256, False), uni_sorted),
        ("E5 pallas tb=256 all-same-row", mk(256, 256, False), same),
        ("E6 pallas tb=256 sorted zipf", mk(256, 256, False), zipf_sorted),
        ("E7 COALESCE tb=256 sorted zipf", mk(256, 256, True), zipf_sorted),
        ("E7b COALESCE tb=256 sorted unif", mk(256, 256, True), uni_sorted),
        ("E8 xla sorted zipf", xla, zipf_sorted),
    ]
    for name, fn, idx in runs:
        if want(name.split()[0]):
            timeit(name, fn, table, idx, V)

    if want("E9"):
        # E9: D-scaling — same bytes, 1/4 the DMAs.
        V2, D2, N2 = V // 4, 512, N // 4
        table_w = jax.jit(lambda: jax.random.normal(
            jax.random.key(1), (V2, D2), jnp.float32))()
        uni_w = jnp.asarray(rng.integers(0, V2, N2).astype(np.int32))
        mkw = lambda tb: (lambda t, i: pallas_gather(
            t.reshape(V2, 1, D2), i, tb, tb, False).reshape(-1, D2)[:i.shape[0]])
        timeit("E9 pallas D=512 n/4 uniform", mkw(256), table_w, uni_w, V2)
        timeit("E9b xla D=512 n/4 uniform", xla, table_w, uni_w, V2)


if __name__ == "__main__":
    main()
