"""Pallas TPU run-scatter kernel: the fused sparse-update fast path.

TPU-native re-design of the reference's `_update_specialized_impl!`
(`/root/reference/src/sparseupdate.jl:97-129`): for each *unique* table row,
accumulate every gradient row touching it in on-chip VMEM, then apply
`row += scale * acc` with exactly one read and one write of the row — the
bandwidth-roofline discipline the reference gets from TiledSIMD + nontemporal
stores.

Measured reality (v5e, docs/DESIGN.md §1b — read before trusting any number
here): XLA's native scatter-add is the PRODUCTION path (33.6 ms at n=1.7M,
D=128, ~2 row accesses per occurrence); THIS per-occurrence run-scatter
measured 111 ms — the serial `acc +=` walk underuses the VPU and the
boundary DMAs serialize against it. `config.update_impl()`'s "auto" therefore
never selects it. It remains the correctness-tested realization of the
one-write-per-unique-row contract and the base for the vectorized rebuild
(scatter_v2) that targets the unclaimed dedup win on skewed traffic
(Zipf(1.1) duplication is 4.45x and XLA's scatter gets zero benefit from it).

Algorithm:

  1. XLA `sort_key_val(rows, iota)` — sorted rows + permutation (4.9 ms);
  2. permute the value stream (Pallas gather when lane-aligned);
  3. THIS kernel: stream the sorted value blocks through VMEM (pipelined
     contiguous copies); walk each block once, accumulating the current run
     in a VMEM accumulator that persists across sequential grid steps; at
     each run boundary (row change), combine with the old table row
     (DMA-read issued ahead in a batched phase, like the gather) and DMA the
     updated row back. One read + one write per unique row, no aliased
     writes anywhere (runs are disjoint) — race-freedom identical in spirit
     to the reference's IndexerView partitioning (`src/utils.jl:320-338`).

The table buffer is donated (`input_output_aliases`): rows are updated in
place in HBM, untouched rows keep their values — the functional-API analog of
the reference's in-place `update!`.

Layout: table/value/scratch buffers use `(N, 1, D)` 3-D views so row DMAs
slice the untiled leading dim (see gather.py layout note). Row-id chunks ride
scalar prefetch, <= 64Ki per pallas_call (SMEM budget).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config
from ...types import cdiv
from ..indexer import IndexerResult

# Occurrences per grid step.
DEFAULT_TB = 256
# Max occurrences per pallas_call (row-id chunk must fit SMEM).
MAX_OCC_PER_CALL = 65_536


def _runscatter_kernel(tb: int, rows_ref, scale_ref, vals_ref, table_ref,
                       out_ref, acc, rowbuf, sems):
    i = pl.program_id(0)
    base = i * tb
    scale = scale_ref[0]

    # Scratch is uninitialized at launch; the accumulator must start at zero
    # (it then persists across the sequential grid steps of this call).
    @pl.when(i == 0)
    def _():
        acc[:, :] = jnp.zeros(acc.shape, acc.dtype)

    # Phase 1: issue the old-row reads for every run that ENDS in this tile.
    # All reads are in flight together (the gather kernel's discipline).
    for j in range(tb):
        g = base + j
        row = rows_ref[g]
        boundary = jnp.logical_and(row != rows_ref[g + 1], row >= 0)

        @pl.when(boundary)
        def _(j=j, row=row):
            pltpu.make_async_copy(
                out_ref.at[row], rowbuf.at[j], sems.at[j]).start()

    # Phase 2: walk the value block once; the run accumulator lives in VMEM
    # scratch and persists across (sequential) grid steps, so runs spanning
    # tile boundaries accumulate correctly.
    for j in range(tb):
        g = base + j
        row = rows_ref[g]
        boundary = jnp.logical_and(row != rows_ref[g + 1], row >= 0)

        # Padding entries (row < 0) must not leak into the first real run:
        # sorted-ascending streams put negatives FIRST, so an unmasked
        # accumulate would fold their values into the first row >= 0.
        @pl.when(row >= 0)
        def _(j=j):
            acc[:, :] = acc[:, :] + vals_ref[j].astype(acc.dtype)

        @pl.when(boundary)
        def _(j=j, row=row):
            c = pltpu.make_async_copy(out_ref.at[row], rowbuf.at[j],
                                      sems.at[j])
            c.wait()
            rowbuf[j] = (rowbuf[j].astype(acc.dtype)
                         + scale * acc[:, :]).astype(rowbuf.dtype)
            # The read semaphore is consumed; reuse the same slot for the
            # write-back (sflag space is ~2 KB — two tb-sized arrays blow it).
            pltpu.make_async_copy(rowbuf.at[j], out_ref.at[row],
                                  sems.at[j]).start()
            acc[:, :] = jnp.zeros(acc.shape, acc.dtype)

    # Phase 3: drain this tile's write-backs.
    for j in range(tb):
        g = base + j
        row = rows_ref[g]
        boundary = jnp.logical_and(row != rows_ref[g + 1], row >= 0)

        @pl.when(boundary)
        def _(j=j, row=row):
            pltpu.make_async_copy(rowbuf.at[j], out_ref.at[row],
                                  sems.at[j]).wait()


def _runscatter_call(table3, vals3, rows_ext, scale_arr, tb, interpret):
    """One pallas_call over <= MAX_OCC_PER_CALL sorted occurrences.
    rows_ext: (n_c + 1,) row ids with one lookahead element."""
    v, _, d = table3.shape
    n_c = vals3.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # rows_ext, scale
        grid=(n_c // tb,),
        in_specs=[
            pl.BlockSpec((tb, 1, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # sorted value blocks
            pl.BlockSpec(memory_space=pl.ANY),       # table (aliased to out)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),          # run accumulator
            pltpu.VMEM((tb, 1, d), table3.dtype),     # row combine buffers
            pltpu.SemaphoreType.DMA((tb,)),           # read+write sems
        ],
    )
    return pl.pallas_call(
        functools.partial(_runscatter_kernel, tb),
        out_shape=jax.ShapeDtypeStruct((v, 1, d), table3.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},  # table (2 prefetch args + vals, table)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_c * d, transcendentals=0,
            bytes_accessed=3 * n_c * d * table3.dtype.itemsize),
    )(rows_ext, scale_arr, vals3, table3)


@functools.partial(jax.jit, static_argnames=("tb", "interpret"),
                   donate_argnums=(0,))
def scatter_add_rows_sorted(table: jax.Array, sorted_rows: jax.Array,
                            sorted_vals: jax.Array, scale=1.0, *,
                            tb: int = DEFAULT_TB,
                            interpret: bool | None = None) -> jax.Array:
    """`table[r] += scale * Σ_{k in run of r} sorted_vals[k]`, one write per
    unique row. `sorted_rows` must be ascending (runs contiguous); entries
    < 0 are padding and are dropped. Table is donated/updated in place."""
    if interpret is None:
        interpret = config.pallas_interpret()
    v, d = table.shape
    n = sorted_rows.shape[0]
    table3 = table.reshape(v, 1, d)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1)

    for base in range(0, n, MAX_OCC_PER_CALL):
        size = min(MAX_OCC_PER_CALL, n - base)
        tb_c = min(tb, max(8, 1 << (size - 1).bit_length()))
        size_pad = cdiv(size, tb_c) * tb_c
        rows_c = jax.lax.dynamic_slice_in_dim(sorted_rows, base, size)
        # Lookahead slot at index `size` = sentinel -2: forces a flush of the
        # run in progress at the end of every chunk. A run spanning chunks
        # then flushes once per chunk — correct, because each flush ADDs its
        # partial sum to the row and the chunked calls are sequenced by the
        # donated-table dependency. (VMEM scratch does not survive across
        # pallas_calls, so cross-chunk carry is not an option.)
        rows_ext = jnp.full((size_pad + 1,), -1, jnp.int32)
        rows_ext = jax.lax.dynamic_update_slice(
            rows_ext, rows_c.astype(jnp.int32), (0,))
        rows_ext = rows_ext.at[size].set(-2)
        vals_c = jax.lax.dynamic_slice_in_dim(sorted_vals, base, size)
        vals_c = jnp.pad(vals_c, ((0, size_pad - size), (0, 0)))
        table3 = _runscatter_call(table3, vals_c.reshape(size_pad, 1, d),
                                  rows_ext, scale_arr, tb_c, interpret)
    return table3.reshape(v, d)


def scatter_update(table: jax.Array, rows: jax.Array, vals: jax.Array,
                   scale=1.0, *, interpret: bool | None = None) -> jax.Array:
    """Duplicate-accumulating scatter-add via sorted runs: sort the
    occurrence stream, permute values with the Pallas gather, run-scatter.

    Mathematically equivalent to `table.at[rows].add(scale * vals)`. NOT the
    fast path on v5e (XLA scatter 33.6 ms vs this 111 ms at n=1.7M, D=128 —
    docs/DESIGN.md §1b); kept as the forceable one-write-per-unique-row
    realization."""
    from .gather import gather_rows
    n = rows.shape[0]
    sorted_rows, perm = jax.lax.sort_key_val(rows.astype(jnp.int32),
                                             jnp.arange(n, dtype=jnp.int32))
    if interpret is None:
        interpret = config.pallas_interpret()
    if vals.shape[-1] % 128 == 0 and not interpret:
        sorted_vals = gather_rows(vals, perm)
    else:
        sorted_vals = jnp.take(vals, perm, axis=0)
    return scatter_add_rows_sorted(table, sorted_rows, sorted_vals, scale,
                                   interpret=interpret)


def scatter_sgd(table: jax.Array, delta: jax.Array, idx_result: IndexerResult,
                cols: jax.Array, lr, *, tb: int = DEFAULT_TB,
                interpret: bool | None = None) -> jax.Array:
    """Fused sparse-SGD step via the run-scatter (legacy signature kept for
    the indexer-based call sites): `table[r] -= lr * Σ delta[cols[k]]` over
    all occurrences k of row r.

    The IndexerResult is not needed by the new algorithm (the kernel dedups
    via sorted runs); only the original per-occurrence (rows, cols) stream
    matters, which the caller passes via `idx_result.map`-free arguments.
    """
    # The per-occurrence (stream-order) row of occurrence k is
    # unique[group_of[k]] (group ids of real occurrences are always
    # < num_unique by construction, indexer.py).
    rows_of_occ = idx_result.unique[idx_result.group_of]
    vals = delta[cols]
    return scatter_update(table, rows_of_occ, vals, scale=-lr,
                          interpret=interpret)
