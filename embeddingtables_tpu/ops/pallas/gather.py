"""Pallas TPU gather kernels: the forward-lookup fast path.

TPU-native re-design of the reference's static lookup kernels
(`/root/reference/src/lookup.jl:70-87` whole-row SVector copy;
`lookup.jl:134-165` TiledSIMD register accumulation + nontemporal store):

  - `gather_rows`: non-reducing `O[i, :] = T[idx[i], :]`. Grid over batch
    tiles; the table stays HBM-resident; each grid step issues `TB` row DMAs
    HBM->VMEM, all in flight simultaneously (the DMA-parallel analog of the
    reference's one-SVector-copy-per-column hot loop).
  - `gather_bags`: reducing `O[i, :] = Σ_k T[idx[i, k], :]`. Bag rows are
    DMA'd into a VMEM scratch tile and accumulated in VREGs before a single
    store per output row — the accumulate-then-one-store discipline of the
    reference's TiledSIMD path ("nontemporal" needs no analog on TPU; VMEM->
    HBM output writes stream by default).

Index delivery: `PrefetchScalarGridSpec` scalar prefetch (SMEM), available
before the kernel body so DMA source addresses are computable immediately.
SMEM is ~1 MB, so one call cannot prefetch production-sized index streams
(26 tables x 64Ki batch = 6.8 MB); the public entry points CHUNK the batch so
each pallas_call prefetches <= `MAX_PREFETCH_IDX` int32s (256 KB). Chunks are
independent kernel launches inside one jit — XLA overlaps them.
(A per-tile SMEM-blocked index input would avoid chunking, but Mosaic requires
1-D s32 SMEM blocks to match XLA's T(1024) layout — incompatible with
arbitrary tile sizes; verified on v5e.)

Layout note: Mosaic tiles the two minor dims of an HBM memref — (8,128) for
2-D f32 — and slices must be tile-aligned, so single-row `(1, D)` DMAs from a
`(V, D)` table are rejected ("Slice shape along dimension 0 must be aligned to
tiling (8)"). The escape hatch (verified on v5e): view the table as 3-D
`(V, 1, D)` — the *leading* dim is untiled, so `table.at[row]` slices freely,
and the minor dims `(1, D)` take (1,128) tiling with no padding. All row
buffers here (table, output, scratch) use this `(N, 1, D)` shape.

Feature dim must be a multiple of 128 lanes (the `dostatic`-analog dispatch in
ops/lookup.py guarantees this; other dims take the XLA path, mirroring the
reference's static/generic split, `lookup.jl:30-32`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config
from ...types import LANES, cdiv

# Rows per grid step (DMAs in flight per step). Tuned via bench/sweep.
DEFAULT_TB = 256
# Outputs per grid step for the reducing kernel.
DEFAULT_TB_BAG = 32
# Max int32 indices scalar-prefetched per pallas_call (256 KB of ~1 MB SMEM).
MAX_PREFETCH_IDX = 65_536


def _pad_to(x: jax.Array, n: int, axis: int = 0, fill=0):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _fit_tile(tb: int, b: int) -> int:
    """Clamp the tile to the (pow2-rounded) batch so tiny batches don't pad."""
    return min(tb, max(8, 1 << (b - 1).bit_length()))


def _chunked(b: int, chunk: int):
    """Static (start, size) spans covering `b` in steps of `chunk`."""
    return [(s, min(chunk, b - s)) for s in range(0, b, chunk)]


# ---------------------------------------------------------------------------
# Non-reducing gather
# ---------------------------------------------------------------------------

def _gather_rows_kernel(tb: int, idx_ref, table_ref, out_ref, sems):
    i = pl.program_id(0)
    base = i * tb
    copies = []
    for j in range(tb):
        row = idx_ref[base + j]
        c = pltpu.make_async_copy(
            table_ref.at[row],   # (1, D) row of the (V, 1, D) HBM view
            out_ref.at[j],
            sems.at[j],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


def _gather_rows_call(table3: jax.Array, idx: jax.Array, tb: int,
                      interpret: bool) -> jax.Array:
    """One pallas_call over <= MAX_PREFETCH_IDX indices. Returns (b_pad, 1, d)."""
    b = idx.shape[0]
    v, _, d = table3.shape
    tb = _fit_tile(tb, b)
    b_pad = cdiv(b, tb) * tb
    idx_pad = _pad_to(idx.astype(jnp.int32), b_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // tb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tb, 1, d), lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((tb,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_rows_kernel, tb),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1, d), table3.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=2 * b_pad * d * table3.dtype.itemsize),
    )(idx_pad, table3)


def _gather_rows_kernel_v2(tb: int, n_tiles: int, idx_hbm, table_ref, out_ref,
                           idx_smem, isems, rsems):
    """Single-call variant: the kernel streams its own index tiles HBM->SMEM
    (double-buffered), so index size is unbounded by SMEM and there is no
    per-chunk call/concat glue. Measured at XLA-gather parity on v5e
    (22.9 vs 22.4 ms at n=1.7M — both at the ~13 ns/row DMA-issue floor);
    the chunked scalar-prefetch version pays ~30% glue at that size."""
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

    copies = []
    for j in range(tb):
        row = idx_smem[i % 2, 0, j]
        c = pltpu.make_async_copy(table_ref.at[row], out_ref.at[j],
                                  rsems.at[j])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


def _gather_rows_v2(table3: jax.Array, idx: jax.Array, tb: int,
                    interpret: bool) -> jax.Array:
    b = idx.shape[0]
    v, _, d = table3.shape
    b_pad = cdiv(b, tb) * tb
    idx_pad = _pad_to(idx.astype(jnp.int32), b_pad)
    n_tiles = b_pad // tb
    idx3 = idx_pad.reshape(n_tiles, 1, tb)
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel_v2, tb, n_tiles),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tb, 1, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2, 1, tb), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((tb,)),
        ],
        out_shape=jax.ShapeDtypeStruct((b_pad, 1, d), table3.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=2 * b_pad * d * table3.dtype.itemsize),
    )(idx3, table3)
    return out.reshape(b_pad, d)[:b]


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def gather_rows(table: jax.Array, idx: jax.Array, *, tb: int = DEFAULT_TB,
                interpret: bool | None = None) -> jax.Array:
    """Non-reducing lookup: `(V, D) x (B,) -> (B, D)`, D % 128 == 0."""
    if interpret is None:
        interpret = config.pallas_interpret()
    b = idx.shape[0]
    v, d = table.shape
    table3 = table.reshape(v, 1, d)
    if b > MAX_PREFETCH_IDX:
        # Large batch: single call, kernel-side index streaming.
        return _gather_rows_v2(table3, idx, tb, interpret)
    outs = []
    for start, size in _chunked(b, MAX_PREFETCH_IDX):
        part = _gather_rows_call(
            table3, jax.lax.dynamic_slice_in_dim(idx, start, size), tb,
            interpret)
        outs.append(part.reshape(-1, d)[:size])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# Reducing (multi-hot bag-sum) gather
# ---------------------------------------------------------------------------

def _gather_bags_kernel(tb: int, bag: int, d: int, idx_ref, table_ref, out_ref,
                        scratch, sems):
    i = pl.program_id(0)
    base = i * tb * bag
    copies = []
    for jk in range(tb * bag):
        row = idx_ref[base + jk]
        c = pltpu.make_async_copy(
            table_ref.at[row],
            scratch.at[jk],
            sems.at[jk],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()
    # Accumulate each bag in VREGs, one store per output row (the reference's
    # TiledSIMD accumulate + single nontemporal store, lookup.jl:149-165).
    out_ref[:, :] = scratch[:].reshape(tb, bag, d).sum(axis=1)


def _gather_bags_call(table3: jax.Array, idx: jax.Array, tb: int,
                      interpret: bool) -> jax.Array:
    b, bag = idx.shape
    v, _, d = table3.shape
    tb = _fit_tile(tb, b)
    # Keep the scratch tile within a VMEM budget (~4 MB).
    while tb > 8 and tb * bag * d * table3.dtype.itemsize > 4 * 1024 * 1024:
        tb //= 2
    b_pad = cdiv(b, tb) * tb
    idx_pad = _pad_to(idx.astype(jnp.int32), b_pad).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // tb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tb, d), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tb * bag, 1, d), table3.dtype),
            pltpu.SemaphoreType.DMA((tb * bag,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_bags_kernel, tb, bag, d),
        out_shape=jax.ShapeDtypeStruct((b_pad, d), table3.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b_pad * bag * d, transcendentals=0,
            bytes_accessed=(b_pad * bag + b_pad) * d * table3.dtype.itemsize),
    )(idx_pad, table3)


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def gather_bags(table: jax.Array, idx: jax.Array, *, tb: int = DEFAULT_TB_BAG,
                interpret: bool | None = None) -> jax.Array:
    """Reducing lookup: `(V, D) x (B, bag) -> (B, D)`, D % 128 == 0."""
    if interpret is None:
        interpret = config.pallas_interpret()
    b, bag = idx.shape
    v, d = table.shape
    table3 = table.reshape(v, 1, d)
    chunk = max(1, MAX_PREFETCH_IDX // bag)
    outs = []
    for start, size in _chunked(b, chunk):
        part = _gather_bags_call(
            table3, jax.lax.dynamic_slice_in_dim(idx, start, size, axis=0),
            tb, interpret)
        outs.append(part[:size])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
