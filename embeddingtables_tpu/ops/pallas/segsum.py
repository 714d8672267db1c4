"""MXU one-hot segment-accumulate kernel: bounded-id segment sums with ZERO
per-occurrence control flow.

`hot_accumulate(rows, vals, num_segments)` computes, for each segment id
`s < num_segments`, the sum of all `vals[j]` with `rows[j] == s` — i.e.
`jax.ops.segment_sum` restricted to a BOUNDED id range — as a streaming
Pallas kernel:

  per tile of `tb` occurrences (grid-sequential, O(tiles) control):
    1. VPU: one-hot `S[j, s] = (rows[j] == s)` — ids outside
       `[0, num_segments)` match nothing and are dropped;
    2. MXU: `acc += S^T @ vals` into a persistent `(num_segments, D)` VMEM
       accumulator (f32), written out once on the last tile.

Why it exists (measured v5e, docs/DESIGN.md §1c-§1d): every per-occurrence
construct in a Pallas kernel (a DMA, a `pl.when`, a scalar-core walk) costs
15-30 ns; XLA's scatter costs ~14.6 ns/occurrence plus a full-table pass.
This kernel runs at **~5.6 ns/occurrence** (1.7M occurrences, H=1024,
D=128: 9.5 ms) because its only per-occurrence work is a vectorized compare
and a matmul lane. It is the one structure found on a TensorCore-only chip
that absorbs duplicate ids at below scatter cost.

When to use it: segment/bag/aggregation reductions whose id range is small
enough for the `(num_segments, D)` f32 accumulator to sit in VMEM
(num_segments * D * 4 bytes, plus the tile buffers — H=2048 x D=128 = 1 MB
is comfortable; a few MB is the practical ceiling). For full-vocabulary
sparse updates it does NOT pay as a hot-head prefix: the cold residue still
needs an XLA scatter whose cost does not shrink with masked-out operands
(the measured reason the hot/cold hybrid was rejected, DESIGN.md §1d).

Production consumer (round 3): `optim._dense_grad` — the dense-grad
accumulation shared by every sparse optimizer's dedup pass and the plain
small-vocab SGD apply — routes TINY-VOCAB lane-aligned tables here
(padded vocab <= 512; the measured v5e crossover,
`scratch/probe_segsum_apply.py` at n=1.7M/D=128/f32-exact: segsum 11.0
vs scatter 16.0 ms at vpad=256, ~parity at 512, loses from 1024 — the
one-hot FLOPs grow linearly in vpad while the small-table scatter is
flat at ~9.4 ns/occ). Real CTR vocabularies are a power-law mix where
many features have exactly that cardinality; per-table placements (the
planner, `ensemble_update`, `nn`/`compat` per-table optimizers) hit this
path for those tables. Candidates that were cost-modeled and REJECTED:
owner-side post-routing dedup in the a2a butterfly (shard-local row
ranges are V/n ~ 100K+ rows — far past the crossover, and compacting the
cold residue doesn't shrink the remaining scatter, §1d P4); DeepFM
first-order aggregation (D=1 wastes 127/128 MXU lanes for a stream that
is ~3% of step cost).

Precision: the matmul runs in bf16 with f32 accumulation by default
(`compute_dtype=jnp.bfloat16`, ~3 decimal digits on the values; the one-hot
side is exact). Pass `compute_dtype=jnp.float32` for exact-parity
accumulation at reduced MXU rate.

Reference lineage: this is the TPU-native answer to the reference's
accumulate-per-unique-row discipline (`/root/reference/src/sparseupdate.jl:
97-129`) for bounded id ranges — accumulation happens in on-chip memory
with one write per segment, except the "registers" are an MXU systolic pass
over a one-hot matrix instead of a scalar loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config
from ...types import cdiv

DEFAULT_TB = 1024


def _segsum_kernel(tb, h, n_tiles, compute_dtype, rows_ref, vals_ref,
                   out_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    rows = rows_ref[0, 0]                   # (tb,) int32 lane vector
    rows_col = rows.reshape(tb, 1)          # lane -> sublane relayout
    onehot = (rows_col ==
              jax.lax.broadcasted_iota(jnp.int32, (tb, h), 1))
    s = onehot.astype(compute_dtype)
    # On TPU, f32 matmuls run at bf16 MXU precision under the DEFAULT
    # precision config; HIGHEST forces the full-precision passes when the
    # caller asked for f32 accumulation.
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)
    acc[:, :] += jax.lax.dot_general(
        s, vals_ref[...].astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(i == n_tiles - 1)
    def _():
        out_ref[:, :] = acc[:, :]


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "tb", "compute_dtype",
                                    "interpret"))
def hot_accumulate(rows: jax.Array, vals: jax.Array, num_segments: int, *,
                   tb: int = DEFAULT_TB, compute_dtype=jnp.bfloat16,
                   interpret: bool | None = None) -> jax.Array:
    """Bounded-range segment sum: `(n,) int32 x (n, D) -> (num_segments, D)`
    f32, where ids outside `[0, num_segments)` are dropped.

    Requires D % 128 == 0 (lane alignment) and
    `num_segments % 128 == 0` (one-hot lane dim). `n` is padded up to a
    tile multiple internally (pad ids land outside the range).
    """
    if interpret is None:
        interpret = config.pallas_interpret()
    n = rows.shape[0]
    d = vals.shape[1]
    if d % 128 != 0:
        raise ValueError(f"feature dim {d} must be a multiple of 128")
    if num_segments % 128 != 0:
        raise ValueError(
            f"num_segments {num_segments} must be a multiple of 128")
    if n == 0:
        # A zero-size grid would return the output buffer UNINITIALIZED
        # (neither the first-tile zeroing nor the last-tile write runs).
        return jnp.zeros((num_segments, d), jnp.float32)
    tb = min(tb, max(128, 1 << (n - 1).bit_length()))
    n_pad = cdiv(n, tb) * tb
    if n_pad != n:
        rows = jnp.pad(rows, (0, n_pad - n), constant_values=num_segments)
        vals = jnp.pad(vals, ((0, n_pad - n), (0, 0)))
        n = n_pad
    n_tiles = n // tb
    return pl.pallas_call(
        functools.partial(_segsum_kernel, tb, num_segments, n_tiles,
                          compute_dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 1, tb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((num_segments, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((num_segments, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((num_segments, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * num_segments * d, transcendentals=0,
            bytes_accessed=n * (d * 4 + 4) + num_segments * d * 4),
    )(rows.astype(jnp.int32).reshape(n_tiles, 1, tb), vals)
