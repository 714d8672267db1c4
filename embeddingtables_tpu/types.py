"""Core type tags and specs for the TPU-native embedding engine.

Reference parity: these correspond to the reference's type-level configuration
surface (`src/EmbeddingTables.jl:49-156`): the `Static{N}` / `Dynamic` lookup
tags, `featuresize`, and the `IndexingContext` phase tags.

TPU reinterpretation: under `jax.jit` every shape is static, so `Static` vs
`Dynamic` no longer changes *correctness* or code generation the way it does in
Julia. We keep the tags as (a) API parity, (b) a kernel-specialization hint:
`Static` requests the Pallas fast path (feature dim padded/aligned to the
128-lane VPU width), `Dynamic` permits the generic XLA gather path. Both paths
are tested for exact parity, mirroring `test/lookup.jl:70-108`.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax.numpy as jnp

# TPU lane width: last-dim tiling unit for f32 (pallas_guide: min tile (8,128)).
LANES = 128
SUBLANES = 8


class LookupKind(enum.Enum):
    """Analog of the reference's `AbstractLookupType` (`EmbeddingTables.jl:60-63`)."""

    STATIC = "static"
    DYNAMIC = "dynamic"


@dataclasses.dataclass(frozen=True)
class Static:
    """Compile-time feature size tag (reference `Static{N}`, `EmbeddingTables.jl:60`).

    `n` must match the table's feature size; validated at construction like the
    reference's `SimpleEmbedding{Static{N}}` constructor (`simple.jl:9-27`).
    """

    n: int

    def __post_init__(self):
        if not isinstance(self.n, int) or self.n <= 0:
            raise ValueError(f"Static feature size must be a positive Int, got {self.n!r}")

    @property
    def kind(self) -> LookupKind:
        return LookupKind.STATIC


@dataclasses.dataclass(frozen=True)
class Dynamic:
    """Runtime feature size tag (reference `Dynamic`, `EmbeddingTables.jl:62`)."""

    @property
    def kind(self) -> LookupKind:
        return LookupKind.DYNAMIC


class IndexingContext(enum.Enum):
    """Phase tag passed down the access path (reference `EmbeddingTables.jl:74-77`).

    The reference threads `NoContext`/`Forward`/`Update` through `columnpointer`
    so exotic table backends can steer reads vs writes to different memory
    (their heterogeneous-memory research hook, `README.md:292-297`).

    TPU analog: the context selects memory-space/donation behavior — `FORWARD`
    lookups read HBM-resident tables; `UPDATE` donates the table buffer so the
    scatter-FMA kernel updates rows in place (`input_output_aliases`).
    """

    NO_CONTEXT = "no_context"
    FORWARD = "forward"
    UPDATE = "update"


# Short aliases matching reference export names (`EmbeddingTables.jl:7-18`).
NoContext = IndexingContext.NO_CONTEXT
Forward = IndexingContext.FORWARD
Update = IndexingContext.UPDATE


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """Static description of one embedding table.

    vocab:     number of rows (the reference's `size(A, 2)`; our arrays are
               row-major `(vocab, dim)` — the transpose of the Julia layout,
               because TPU wants the feature dim last/lane-aligned).
    dim:       feature size (reference `featuresize`, `EmbeddingTables.jl:99`).
    dtype:     storage dtype.
    lookup:    Static(dim) or Dynamic() tag.
    name:      optional identifier used in ensembles/checkpoints.
    """

    vocab: int
    dim: int
    dtype: jnp.dtype = dataclasses.field(default=jnp.float32)
    lookup: Static | Dynamic = dataclasses.field(default_factory=Dynamic)
    name: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.lookup, Static) and self.lookup.n != self.dim:
            raise ValueError(
                f"Static feature size {self.lookup.n} does not match table dim {self.dim}"
            )

    @property
    def padded_dim(self) -> int:
        """Feature size rounded up to the 128-lane boundary (kernel block dim)."""
        return ((self.dim + LANES - 1) // LANES) * LANES

    @property
    def is_static(self) -> bool:
        return isinstance(self.lookup, Static)


def featuresize(table) -> int:
    """Feature size of a table or raw array (reference `featuresize`,
    `EmbeddingTables.jl:96-99`). Raw `(vocab, dim)` arrays are treated as
    Dynamic tables, mirroring the reference's `AbstractMatrix` fallback."""
    if hasattr(table, "spec"):
        return table.spec.dim
    return table.shape[-1]


def cdiv(a: int, b: int) -> int:
    """Ceiling division (reference `cdiv`, `utils.jl:42-47`)."""
    return -(-a // b)
