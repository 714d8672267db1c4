"""Probe the hot-set MXU-accumulator update design (round-2 dedup prize).

Idea: with a frequency-ordered vocabulary (hot rows renumbered to ids < H by
the data pipeline — maintained periodically, free at step time), the Zipf
head's duplication is absorbed by an MXU segment-sum: per occurrence tile,
build a one-hot (TB, H) matrix of hot ids on the VPU and accumulate
S^T @ vals into a persistent (H, D) VMEM accumulator — NO sort, NO permute,
no per-occurrence scalar walk. Cold occurrences (row >= H) go through XLA's
scatter-add with the hot entries redirected to a dropped sentinel.

Measurements (v5e, N=1.7M, D=128, Zipf(1.1) over V=6.5M):
  P1  hot-accumulate kernel alone, H in {512, 1024, 2048}
  P2  XLA scatter-add: full stream (baseline) vs hot-masked (dropped) stream
  P3  end-to-end hot/cold update vs plain XLA scatter-add
  P4  coverage stats (fraction of occurrences with row < H)

Methodology: chained K-iteration fori_loop per jit, varying inputs per
iteration, consumed outputs, scalar-fetch fence (docs/DESIGN.md §1).
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
K = 8


def zipf_ranks(rng, n, vocab, a=1.1):
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    w = 1.0 / ranks ** a
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    u = rng.random(n)
    return np.searchsorted(cdf, u).astype(np.int32)  # rank order = freq order


# ---------------------------------------------------------------------------
# Hot-accumulate kernel: (H, D) += sum over occurrences with row < H
# ---------------------------------------------------------------------------

def _hot_kernel(tb, h, n_tiles, rows_ref, vals_ref, out_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    rows = rows_ref[0, 0]                  # (1, tb) int32 VMEM block
    # One-hot S (tb, h): S[j, u] = 1 iff rows[j] == u. Cold rows (>= h)
    # match nothing. Built on the VPU, consumed by the MXU.
    rows_col = rows.reshape(tb, 1)         # lane -> sublane relayout
    onehot = (rows_col ==
              jax.lax.broadcasted_iota(jnp.int32, (tb, h), 1))
    s = onehot.astype(jnp.bfloat16)
    acc[:, :] += jax.lax.dot_general(
        s, vals_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n_tiles - 1)
    def _():
        out_ref[:, :] = acc[:, :]


def hot_accumulate(rows, vals, h, tb=512):
    n = rows.shape[0]
    d = vals.shape[1]
    n_pad = (n + tb - 1) // tb * tb
    if n_pad != n:
        rows = jnp.pad(rows, (0, n_pad - n), constant_values=h)  # cold pad
        vals = jnp.pad(vals, ((0, n_pad - n), (0, 0)))
        n = n_pad
    n_tiles = n // tb
    return pl.pallas_call(
        functools.partial(_hot_kernel, tb, h, n_tiles),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 1, tb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((h, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * d, transcendentals=0,
            bytes_accessed=n * (d * 4 + 4) + h * d * 4),
    )(rows.reshape(n_tiles, 1, tb), vals)


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(k, carry):
            out = fn(k, *a)
            return carry + out
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

    r = run(*args)
    r.block_until_ready()
    _ = float(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        ts.append((time.perf_counter() - t0) / K)
    sec = float(np.median(ts))
    print(f"{name:44s} {sec*1e3:7.2f} ms", file=sys.stderr, flush=True)
    return sec


def timeit_table(name, fn, table, *args):
    """Variant whose body updates the TABLE: it rides the loop carry so XLA
    updates it in place instead of copying 3.3 GB per iteration."""
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(table, *a):
        def body(k, carry):
            t, s = carry
            t, out = fn(k, t, *a)
            return t, s + out
        return jax.lax.fori_loop(0, K, body,
                                 (table, jnp.zeros((), jnp.float32)))

    table, r = run(table, *args)
    _ = float(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        table, r = run(table, *args)
        _ = float(r)
        ts.append((time.perf_counter() - t0) / K)
    sec = float(np.median(ts))
    print(f"{name:44s} {sec*1e3:7.2f} ms", file=sys.stderr, flush=True)
    return sec, table


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    only = set(sys.argv[1:])

    def want(p):
        return not only or p in only

    rng = np.random.default_rng(0)
    rows_np = zipf_ranks(rng, N, V)   # frequency-ordered ids: hot = small id
    rows = jnp.asarray(rows_np)
    vals = jax.jit(lambda: jax.random.normal(
        jax.random.key(1), (N, D), jnp.float32))()
    table = jax.jit(lambda: jnp.zeros((V, D), jnp.float32))()

    for h in (512, 1024, 2048, 8192):
        cov = float((rows_np < h).mean())
        print(f"coverage H={h}: {cov:.3f}", file=sys.stderr, flush=True)

    # Correctness spot-check at small scale (interpret-free, on chip).
    small_r = jnp.asarray(rows_np[:4096])
    small_v = vals[:4096]
    got = hot_accumulate(small_r, small_v, 512)
    want_acc = jnp.zeros((512, D)).at[jnp.where(small_r < 512, small_r, 512)
                                      ].add(small_v, mode="drop")
    err = float(jnp.abs(got - want_acc).max())
    print(f"hot_accumulate parity err {err:.5f} (bf16 matmul)",
          file=sys.stderr, flush=True)

    if want("P1"):
        for h, tb in ((512, 512), (1024, 512), (2048, 512), (1024, 1024)):
            timeit(f"P1 hot-acc H={h} tb={tb}",
                   lambda k, r, v, h=h, tb=tb: jnp.sum(
                       hot_accumulate((r + k) % V, v, h, tb)),
                   rows, vals)

    if want("P2"):
        def scat(k, t, r, v):
            t = t.at[(r + k) % V].add(v)
            return t, jnp.sum(t[:2])
        _, table = timeit_table("P2 scatter full stream", scat, table,
                                rows, vals)

        def scat_masked(k, t, r, v, h=1024):
            rr = (r + k) % V
            rr = jnp.where(rr < h, V, rr)   # hot entries dropped
            t = t.at[rr].add(v, mode="drop")
            return t, jnp.sum(t[:2])
        _, table = timeit_table("P2 scatter cold-only (H=1024 dropped)",
                                scat_masked, table, rows, vals)

    if want("P4"):
        # Host-compacted cold stream (the data pipeline computes cold
        # positions for free, overlapped with the device step): scatter
        # operand count DROPS, unlike P2's masked scatter.
        h = 1024
        cold_pos_np = np.nonzero(rows_np >= h)[0].astype(np.int32)
        ncold = len(cold_pos_np)
        cap = (ncold + 511) // 512 * 512
        cold_pos_np = np.pad(cold_pos_np, (0, cap - ncold),
                             constant_values=0)
        cold_pos = jnp.asarray(cold_pos_np)
        pad_mask = jnp.arange(cap) >= ncold
        print(f"cold stream: {ncold} of {N} ({ncold/N:.3f})",
              file=sys.stderr, flush=True)

        def p4b(k, t, r, v):
            rr = (r + k) % V
            crows = jnp.where(pad_mask, V, rr[cold_pos])
            t = t.at[crows].add(v[cold_pos], mode="drop")
            return t, jnp.sum(t[:2])
        _, table = timeit_table("P4b cold-compacted scatter (fused gather)",
                                p4b, table, rows, vals)

        def p4c(k, t, r, v, h=h):
            rr = (r + k) % V
            acc = hot_accumulate(rr, v, h, tb=1024)
            crows = jnp.where(pad_mask, V, rr[cold_pos])
            t = t.at[crows].add(v[cold_pos], mode="drop")
            t = jax.lax.dynamic_update_slice(
                t, jax.lax.dynamic_slice(t, (0, 0), (h, D)) + acc, (0, 0))
            return t, jnp.sum(t[:2])
        _, table = timeit_table("P4c hybrid: hot-MXU + compacted cold",
                                p4c, table, rows, vals)

    if want("P5"):
        # Is XLA's scatter table-size-bound (sort + dense-table merge) or
        # occurrence-bound? Scatter the same stream into tables of varying
        # V, and a 10x-smaller stream into the full table.
        for vsmall in (650_000, 6_500_000):
            tsm = jax.jit(lambda vs=vsmall: jnp.zeros((vs, D),
                                                      jnp.float32))()

            def sc(k, t, r, v, vs=vsmall):
                t = t.at[(r + k) % vs].add(v)
                return t, jnp.sum(t[:2])
            timeit_table(f"P5 scatter 1.7M occ -> V={vsmall}", sc, tsm,
                         rows, vals)
            del tsm
        tsm = jax.jit(lambda: jnp.zeros((V, D), jnp.float32))()
        rows_s = rows[:N // 10]
        vals_s = vals[:N // 10]

        def sc10(k, t, r, v):
            t = t.at[(r + k) % V].add(v)
            return t, jnp.sum(t[:2])
        timeit_table("P5 scatter 170K occ -> V=6.5M", sc10, tsm,
                     rows_s, vals_s)
        del tsm

    if want("P6"):
        # Forward-gather bank conflicts: Zipf's hot rows hit the same HBM
        # banks repeatedly (E8: sorted-zipf read 2x slower than uniform).
        # Fix under test: frequency-ordered vocab + REPLICATED hot head —
        # replica chosen by position spreads duplicate reads across banks.
        H, R = 1024, 8
        pos = jnp.arange(N, dtype=jnp.int32)

        def mat(x):
            # Force materialization of the gather result (step-realistic).
            return jnp.sum(jax.lax.optimization_barrier(x))

        def g_base(k, t, r):
            return mat(jnp.take(t, (r + k) % V, axis=0))
        timeit("P6 gather zipf unsorted (materialized)", g_base,
               table[:V], rows)
        uni = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
        timeit("P6b gather uniform (materialized)", g_base, table[:V], uni)

        # Replicated-hot table: rows [0, H*R) hold R copies of the hot head
        # (copy r of hot row h lives at h*R + r); cold rows shift up.
        table_rep = jax.jit(lambda t: jnp.concatenate(
            [jnp.repeat(t[:H], R, axis=0), t[H:]], axis=0))(table)

        def g_rep(k, t, r):
            rr = (r + k) % V
            hot = rr < H
            radj = jnp.where(hot, rr * R + (pos & (R - 1)),
                             rr + H * (R - 1))
            return mat(jnp.take(t, radj, axis=0))
        timeit("P6c gather zipf hot-replicated R=8", g_rep, table_rep, rows)
        del table_rep

    if want("P4d"):
        # P4b retry with an optimization barrier between the cold gather and
        # the scatter — tests whether the 52 ms was a fusion pathology.
        h = 1024
        cold_pos_np = np.nonzero(rows_np >= h)[0].astype(np.int32)
        ncold = len(cold_pos_np)
        cap = (ncold + 511) // 512 * 512
        cold_pos = jnp.asarray(np.pad(cold_pos_np, (0, cap - ncold)))
        pad_mask = jnp.arange(cap) >= ncold

        def p4d(k, t, r, v):
            cp = (cold_pos + k) % N   # k-varying so nothing hoists
            rr = (r + k) % V
            crows = jnp.where(pad_mask, V, rr[cp])
            cvals = jax.lax.optimization_barrier(v[cp])
            t = t.at[crows].add(cvals, mode="drop")
            return t, jnp.sum(t[:2])
        _, table = timeit_table("P4d compacted cold scatter (barrier)",
                                p4d, table, rows, vals)

        def p4e(k, t, r, v):
            cp = (cold_pos + k) % N
            cvals = jax.lax.optimization_barrier(v[cp])
            return t, jnp.sum(cvals[:2])
        _, table = timeit_table("P4e cold delta gather alone",
                                p4e, table, rows, vals)

    if want("P7"):
        # Same-harness pair: is there a zipf-specific scatter penalty at
        # all, and does spreading hot rows across replicas remove it?
        uni7 = jnp.asarray(rng.integers(0, V, N).astype(np.int32))

        def scat7(k, t, r, v):
            t = t.at[(r + k) % V].add(v)
            return t, jnp.sum(t[:2])
        _, table = timeit_table("P7a scatter uniform rows", scat7, table,
                                uni7, vals)
        _, table = timeit_table("P7b scatter zipf rows", scat7, table,
                                rows, vals)

        # Replica-spread: hot row h scatters into one of R=8 replica slots
        # appended at [V, V + H*R); fold is a trivial contiguous pass.
        H7, R7 = 1024, 8
        pos7 = jnp.arange(N, dtype=jnp.int32)
        tbig = jax.jit(lambda t: jnp.concatenate(
            [t, jnp.zeros((H7 * R7, D), jnp.float32)], axis=0))(table)
        del table

        def scat7c(k, t, r, v):
            rr = (r + k) % V
            hot = rr < H7
            tgt = jnp.where(hot, V + rr * R7 + (pos7 & (R7 - 1)), rr)
            t = t.at[tgt].add(v)
            # Fold replicas back into the hot head (contiguous, tiny).
            rep = jax.lax.dynamic_slice(t, (V, 0), (H7 * R7, D))
            head = (jax.lax.dynamic_slice(t, (0, 0), (H7, D))
                    + rep.reshape(H7, R7, D).sum(axis=1))
            t = jax.lax.dynamic_update_slice(t, head, (0, 0))
            t = jax.lax.dynamic_update_slice(
                t, jnp.zeros((H7 * R7, D), jnp.float32), (V, 0))
            return t, jnp.sum(t[:2])
        timeit_table("P7c scatter zipf hot-replica-spread", scat7c, tbig,
                     rows, vals)
        del tbig
        return

    if want("P3"):
        def hybrid(k, t, r, v, h=1024):
            rr = (r + k) % V
            acc = hot_accumulate(rr, v, h)
            cold = jnp.where(rr < h, V, rr)
            t = t.at[cold].add(v, mode="drop")
            t = jax.lax.dynamic_update_slice(
                t, jax.lax.dynamic_slice(t, (0, 0), (h, D)) + acc, (0, 0))
            return t, jnp.sum(t[:2])
        _, table = timeit_table("P3 hybrid hot-MXU + cold-scatter (H=1024)",
                                hybrid, table, rows, vals)


if __name__ == "__main__":
    main()
