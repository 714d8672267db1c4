"""Pallas TPU scatter-FMA update kernel: the fused sparse-SGD fast path.

TPU-native re-design of the reference's `_update_specialized_impl!`
(`/root/reference/src/sparseupdate.jl:97-129`): for each *unique* table row,
accumulate every gradient column touching it in on-chip VMEM, then apply
`row -= lr * acc` with exactly one read and one write of the row — the
bandwidth-roofline discipline the reference gets from TiledSIMD + nontemporal
stores.

Race-freedom story (SURVEY.md §5): identical philosophy to the reference —
dedup before scatter, so no aliased writes exist. Each grid step owns a
disjoint slice of the *unique-row* range (the reference's `IndexerView`
partitioning, `src/utils.jl:320-338`, realized as grid partitioning), hence
rows written by different grid steps never overlap.

Gradient delivery: the host-side wrapper pre-permutes the delta stream into
unique-row-grouped order (`delta[idx.map]`, one XLA gather), so each unique
row's gradient columns are CONTIGUOUS in HBM at `[offsets[g], offsets[g+1])`
and the kernel needs no per-occurrence index lookups — only `unique` and
`offsets` slices ride SMEM, chunked per pallas_call to stay within the ~1 MB
SMEM budget (whole-array prefetch would need 6.8 MB at production batches).

The table buffer is donated (`input_output_aliases`): rows are updated in
place in HBM, untouched rows keep their values — the functional-API analog of
the reference's in-place `update!`.

Layout: like the gather kernels, table/delta/scratch use `(N, 1, D)` 3-D
views so row DMAs slice the untiled leading dim (see gather.py layout note).
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

# Unique rows processed per grid step.
DEFAULT_TU = 64
# Max unique rows handled per pallas_call (bounds SMEM prefetch to ~256 KB).
MAX_UNIQUE_PER_CALL = 32_768


def _scatter_sgd_kernel(tu: int, chunk_base: int, unique_ref, offsets_ref,
                        nuniq_ref, table_ref, dsorted_ref, lr_ref, out_ref,
                        rowbuf, dbuf, acc_buf, rsems, dsem, wsems):
    i = pl.program_id(0)
    nuniq = nuniq_ref[0]
    neg_lr = -lr_ref[0]

    # Phase 1: start DMAs for all TU old table rows (aliased buffer: out_ref
    # IS the table). All TU row-reads are in flight at once.
    for u in range(tu):
        g = i * tu + u

        @pl.when(chunk_base + g < nuniq)
        def _(u=u, g=g):
            row = unique_ref[g]
            pltpu.make_async_copy(
                out_ref.at[row], rowbuf.at[u], rsems.at[u]).start()

    # Phase 2: per unique row, accumulate its (contiguous) gradient slice then
    # one write-back. Occurrence counts are dynamic (CSR offsets) -> fori_loop.
    for u in range(tu):
        g = i * tu + u

        @pl.when(chunk_base + g < nuniq)
        def _(u=u, g=g):
            row = unique_ref[g]
            start = offsets_ref[g]
            end = offsets_ref[g + 1]

            acc_buf[:, :] = jnp.zeros(acc_buf.shape, acc_buf.dtype)

            def body(k, _):
                c = pltpu.make_async_copy(dsorted_ref.at[k], dbuf.at[0], dsem)
                c.start()
                c.wait()
                acc_buf[:, :] = acc_buf[:, :] + dbuf[0].astype(acc_buf.dtype)
                return 0

            jax.lax.fori_loop(start, end, body, 0)

            # Wait for the old row, FMA, write back (one store per unique row).
            pltpu.make_async_copy(
                out_ref.at[row], rowbuf.at[u], rsems.at[u]).wait()
            rowbuf[u] = (rowbuf[u].astype(acc_buf.dtype)
                         + neg_lr * acc_buf[:, :]).astype(rowbuf.dtype)
            pltpu.make_async_copy(
                rowbuf.at[u], out_ref.at[row], wsems.at[u]).start()

    # Drain write-backs before the grid step retires.
    for u in range(tu):
        g = i * tu + u

        @pl.when(chunk_base + g < nuniq)
        def _(u=u, g=g):
            row = unique_ref[g]
            pltpu.make_async_copy(
                rowbuf.at[u], out_ref.at[row], wsems.at[u]).wait()


def _scatter_sgd_call(table3: jax.Array, dsorted3: jax.Array,
                      unique_c: jax.Array, offsets_c: jax.Array,
                      nuniq: jax.Array, lr_arr: jax.Array, chunk_base: int,
                      tu: int, interpret: bool) -> jax.Array:
    """One pallas_call over <= MAX_UNIQUE_PER_CALL unique rows."""
    v, _, d = table3.shape
    n_c = unique_c.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # unique, offsets, num_unique
        grid=(n_c // tu,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # table (aliased to out)
            pl.BlockSpec(memory_space=pl.ANY),      # delta, unique-grouped
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lr
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tu, 1, d), table3.dtype),    # rowbuf
            pltpu.VMEM((1, 1, d), dsorted3.dtype),   # dbuf
            pltpu.VMEM((1, d), jnp.float32),          # acc
            pltpu.SemaphoreType.DMA((tu,)),           # row-read sems
            pltpu.SemaphoreType.DMA(()),              # delta sem
            pltpu.SemaphoreType.DMA((tu,)),           # write-back sems
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter_sgd_kernel, tu, chunk_base),
        out_shape=jax.ShapeDtypeStruct((v, 1, d), table3.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},  # table (after 3 scalar-prefetch args)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_c * d, transcendentals=0,
            bytes_accessed=3 * n_c * d * table3.dtype.itemsize),
    )(unique_c, offsets_c, nuniq, table3, dsorted3, lr_arr)


@functools.partial(jax.jit, static_argnames=("tu", "interpret"),
                   donate_argnums=(0,))
def scatter_sgd(table: jax.Array, delta: jax.Array, idx_result: IndexerResult,
                cols: jax.Array, lr, *, tu: int = DEFAULT_TU,
                interpret: bool | None = None) -> jax.Array:
    """Fused dedup scatter-FMA: `table[unique[g]] -= lr * Σ_{k in group g} delta[map[k]]`.

    table:      (V, D), D % 128 == 0. Donated/aliased — updated in place.
    delta:      (B, D) per-output gradient rows.
    idx_result: CSR dedup structure from ops/indexer.py (capacity n).
    cols:       per-occurrence gradient-column ids in stream order (from
                `flatten_indices`); composed with `idx_result.map` to build
                the unique-row-grouped delta stream.
    """
    if interpret is None:
        interpret = config.pallas_interpret()
    v, d = table.shape
    n = idx_result.capacity
    tu = min(tu, max(8, 1 << (n - 1).bit_length()))

    # Unique-row-grouped contiguous gradient stream (one XLA gather):
    # `map` holds the gradient-column id for each CSR slot (indexer.py).
    dsorted = delta[idx_result.map]
    dsorted3 = dsorted.reshape(n, 1, d)
    table3 = table.reshape(v, 1, d)
    nuniq = idx_result.num_unique.reshape(1).astype(jnp.int32)
    lr_arr = jnp.asarray(lr, dtype=jnp.float32).reshape(1)
    # Clamp padding/sentinel entries to row 0; they are masked by nuniq.
    unique = jnp.maximum(idx_result.unique, 0).astype(jnp.int32)
    offsets = idx_result.offsets.astype(jnp.int32)

    for base in range(0, n, MAX_UNIQUE_PER_CALL):
        size = min(MAX_UNIQUE_PER_CALL, n - base)
        size_pad = cdiv(size, tu) * tu
        uc = jax.lax.dynamic_slice_in_dim(unique, base, size)
        uc = jnp.pad(uc, (0, size_pad - size))
        oc = jax.lax.dynamic_slice_in_dim(offsets, base, size + 1)
        oc = jnp.pad(oc, (0, size_pad + 1 - (size + 1)))
        table3 = _scatter_sgd_call(table3, dsorted3, uc, oc, nuniq, lr_arr,
                                   base, tu, interpret)
    return table3.reshape(v, d)
