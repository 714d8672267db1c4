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


def _scatter_sgd_kernel(tu: int, unique_ref, offsets_ref, map_ref,
                        nuniq_ref, table_ref, delta_ref, lr_ref, out_ref,
                        rowbuf, dbuf, acc_buf, rsems, dsem, wsems):
    i = pl.program_id(0)
    nuniq = nuniq_ref[0]
    neg_lr = -lr_ref[0]

    # Phase 1: start DMAs for all TU old table rows (aliased buffer: out_ref
    # IS the table). All TU row-reads are in flight at once.
    for u in range(tu):
        g = i * tu + u

        @pl.when(g < nuniq)
        def _(u=u, g=g):
            row = unique_ref[g]
            pltpu.make_async_copy(
                out_ref.at[row], rowbuf.at[u], rsems.at[u]).start()

    # Phase 2: per unique row, accumulate its gradient columns then one
    # write-back. Occurrence counts are dynamic (CSR offsets) -> fori_loop.
    for u in range(tu):
        g = i * tu + u

        @pl.when(g < nuniq)
        def _(u=u, g=g):
            row = unique_ref[g]
            start = offsets_ref[g]
            end = offsets_ref[g + 1]

            acc_buf[:, :] = jnp.zeros(acc_buf.shape, acc_buf.dtype)

            def body(k, _):
                col = map_ref[k]
                c = pltpu.make_async_copy(delta_ref.at[col], dbuf.at[0], dsem)
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

        @pl.when(g < nuniq)
        def _(u=u, g=g):
            row = unique_ref[g]
            pltpu.make_async_copy(
                rowbuf.at[u], out_ref.at[row], wsems.at[u]).wait()


@functools.partial(jax.jit, static_argnames=("tu", "interpret"),
                   donate_argnums=(0,))
def scatter_sgd(table: jax.Array, delta: jax.Array, idx_result: IndexerResult,
                cols: jax.Array, lr, *, tu: int = DEFAULT_TU,
                interpret: bool | None = None) -> jax.Array:
    """Fused dedup scatter-FMA: `table[unique[g]] -= lr * Σ delta[map[k]]`.

    table:      (V, D), D % 128 == 0. Donated/aliased — updated in place.
    delta:      (B, D) per-output gradient rows.
    idx_result: CSR dedup structure from ops/indexer.py (capacity n).
    cols:       unused here (`map` already encodes gradient columns); kept for
                signature parity with the generic paths.
    """
    if interpret is None:
        interpret = config.pallas_interpret()
    v, d = table.shape
    b = delta.shape[0]
    n = idx_result.capacity
    tu = min(tu, max(8, 1 << (n - 1).bit_length()))
    n_pad = cdiv(n, tu) * tu

    unique = jnp.pad(idx_result.unique, (0, n_pad - n), constant_values=0)
    # Clamp padding/sentinel entries to row 0; they are masked by nuniq.
    unique = jnp.maximum(unique, 0).astype(jnp.int32)
    offsets = jnp.pad(idx_result.offsets,
                      (0, n_pad + 1 - idx_result.offsets.shape[0]))
    nuniq = idx_result.num_unique.reshape(1).astype(jnp.int32)
    lr_arr = jnp.asarray(lr, dtype=jnp.float32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # unique, offsets, map, num_unique
        grid=(n_pad // tu,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # table (aliased to out)
            pl.BlockSpec(memory_space=pl.ANY),      # delta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lr
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tu, 1, d), table.dtype),     # rowbuf
            pltpu.VMEM((1, 1, d), delta.dtype),      # dbuf
            pltpu.VMEM((1, d), jnp.float32),         # acc
            pltpu.SemaphoreType.DMA((tu,)),           # row-read sems
            pltpu.SemaphoreType.DMA(()),              # delta sem
            pltpu.SemaphoreType.DMA((tu,)),           # write-back sems
        ],
    )
    out = pl.pallas_call(
        functools.partial(_scatter_sgd_kernel, tu),
        out_shape=jax.ShapeDtypeStruct((v, 1, d), table.dtype),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},  # table (after 4 scalar-prefetch args)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d, transcendentals=0,
            bytes_accessed=3 * n * d * table.dtype.itemsize),
    )(unique, offsets, idx_result.map, nuniq, table.reshape(v, 1, d),
      delta.reshape(b, 1, d), lr_arr)
    return out.reshape(v, d)
