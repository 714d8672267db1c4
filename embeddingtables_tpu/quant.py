"""Quantized embedding tables (int8, per-row scale) for serving.

Embedding tables dominate a ranking model's memory; int8 row quantization is
the standard 4x capacity/bandwidth lever at serving time (training stays in
f32/bf16 — sparse updates on quantized rows lose the accumulation
semantics). The reference has no quantization; this is a TPU-era obligation:
HBM capacity bounds the corpus a chip can serve.

`QuantizedEmbedding` implements the EmbeddingTable protocol, so `lookup`,
`maplookup`, and the model eval paths work unchanged: the gather moves int8
rows (128 B at D=128 — 4x fewer bytes than f32) and dequantizes in VREGs.

Scheme: symmetric per-row int8 — `row_f32 ≈ scale_r * row_i8` with
`scale_r = max(|row|) / 127`. Rows of all-zeros get scale 0.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .tables import SimpleEmbedding, as_table
from .types import Dynamic, Static, TableSpec


def quantize_rows(data: jax.Array):
    """(V, D) float -> (int8 rows (V, D), per-row scales (V,) f32)."""
    absmax = jnp.max(jnp.abs(data.astype(jnp.float32)), axis=-1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(data.astype(jnp.float32) * inv[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedEmbedding:
    """Int8 per-row-scaled table implementing the EmbeddingTable protocol
    (read-only: serving/eval). Quantize with `QuantizedEmbedding.quantize`."""

    q: jax.Array        # (V, D) int8
    scale: jax.Array    # (V,)  f32
    spec: TableSpec = dataclasses.field(metadata=dict(static=True))
    out_dtype: jnp.dtype = dataclasses.field(metadata=dict(static=True),
                                             default=jnp.float32)

    @classmethod
    def quantize(cls, table, *, out_dtype=jnp.float32,
                 name: Optional[str] = None) -> "QuantizedEmbedding":
        t = as_table(table)
        data = t.data if isinstance(t, SimpleEmbedding) else \
            t.rows(jnp.arange(t.spec.vocab))
        q, scale = quantize_rows(data)
        spec = TableSpec(vocab=q.shape[0], dim=q.shape[1], dtype=jnp.int8,
                         lookup=t.spec.lookup if hasattr(t, "spec") else Dynamic(),
                         name=name)
        return cls(q=q, scale=scale, spec=spec, out_dtype=out_dtype)

    # --- EmbeddingTable protocol -------------------------------------------
    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return jnp.dtype(self.out_dtype)

    def example(self) -> jax.Array:
        return self.q

    def rows(self, idx: jax.Array) -> jax.Array:
        """Gather int8 rows + their scales, dequantize in-register."""
        rows_q = jnp.take(self.q, idx, axis=0)
        s = jnp.take(self.scale, idx, axis=0)
        return (rows_q.astype(jnp.float32) * s[..., None]).astype(self.out_dtype)

    def dequantize(self) -> jax.Array:
        """Full dense reconstruction (test oracle only)."""
        return (self.q.astype(jnp.float32)
                * self.scale[:, None]).astype(self.out_dtype)

    @property
    def nbytes(self) -> int:
        return self.q.size + self.scale.size * 4


def quantize_rows_int4(data: jax.Array):
    """(V, D) float -> (packed uint8 (V, D//2), per-row scales (V,) f32).

    Symmetric per-row int4: `row ≈ scale_r * q` with q ∈ [-7, 7] and
    `scale_r = max(|row|) / 7`; two nibbles per byte (even column in the
    low nibble). D must be even. 8x HBM capacity vs f32 — the next lever
    after int8 when serving corpus size is HBM-bound; error bound per
    element is scale/2 = absmax/14 (vs absmax/254 for int8)."""
    if data.shape[-1] % 2:
        raise ValueError(f"int4 packing needs an even dim, got {data.shape}")
    absmax = jnp.max(jnp.abs(data.astype(jnp.float32)), axis=-1)
    scale = absmax / 7.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(data.astype(jnp.float32) * inv[:, None]),
                 -7, 7).astype(jnp.int32)
    lo = q[:, 0::2] & 0xF
    hi = (q[:, 1::2] & 0xF) << 4
    return (lo | hi).astype(jnp.uint8), scale.astype(jnp.float32)


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """(..., D//2) uint8 -> (..., D) f32 with 4-bit sign extension."""
    p = packed.astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return jnp.stack([lo, hi], axis=-1).reshape(
        packed.shape[:-1] + (packed.shape[-1] * 2,)).astype(jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Int4QuantizedEmbedding:
    """Int4 per-row-scaled table (packed two values per byte) implementing
    the EmbeddingTable protocol (read-only serving, like
    `QuantizedEmbedding`). The gather moves packed bytes; unpack +
    dequantize run in VREGs on the gathered rows only."""

    packed: jax.Array   # (V, D//2) uint8
    scale: jax.Array    # (V,)  f32
    spec: TableSpec = dataclasses.field(metadata=dict(static=True))
    out_dtype: jnp.dtype = dataclasses.field(metadata=dict(static=True),
                                             default=jnp.float32)

    @classmethod
    def quantize(cls, table, *, out_dtype=jnp.float32,
                 name: Optional[str] = None) -> "Int4QuantizedEmbedding":
        t = as_table(table)
        data = t.data if isinstance(t, SimpleEmbedding) else \
            t.rows(jnp.arange(t.spec.vocab))
        packed, scale = quantize_rows_int4(data)
        spec = TableSpec(vocab=data.shape[0], dim=data.shape[1],
                         dtype=jnp.uint8,
                         lookup=t.spec.lookup if hasattr(t, "spec")
                         else Dynamic(), name=name)
        return cls(packed=packed, scale=scale, spec=spec,
                   out_dtype=out_dtype)

    @property
    def shape(self):
        return (self.packed.shape[0], self.packed.shape[1] * 2)

    @property
    def dtype(self):
        return jnp.dtype(self.out_dtype)

    def example(self) -> jax.Array:
        return self.packed

    def rows(self, idx: jax.Array) -> jax.Array:
        rows_p = jnp.take(self.packed, idx, axis=0)
        s = jnp.take(self.scale, idx, axis=0)
        return (_unpack_int4(rows_p) * s[..., None]).astype(self.out_dtype)

    def dequantize(self) -> jax.Array:
        """Full dense reconstruction (test oracle only)."""
        return (_unpack_int4(self.packed)
                * self.scale[:, None]).astype(self.out_dtype)

    @property
    def nbytes(self) -> int:
        return self.packed.size + self.scale.size * 4


def quantize_dlrm(model, bits: int = 8):
    """Serving conversion: replace a trained DLRM's stacked f32/bf16 tables
    with int8 rows (4x HBM), returning (quantized_tables, eval_fn).

    `eval_fn(dense, cat) -> logits` mirrors `models.dlrm.make_eval_step`'s
    output but gathers from the quantized stack."""
    import jax
    from .models.dlrm import forward_from_embeddings

    cfg = model.config
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    qcls = QuantizedEmbedding if bits == 8 else Int4QuantizedEmbedding
    qt = qcls.quantize(SimpleEmbedding(model.tables.data),
                       out_dtype=jnp.float32)
    offsets = model.tables.offsets
    bottom, top = model.bottom, model.top

    # The table/params enter as jit ARGUMENTS (QuantizedEmbedding is a
    # registered pytree) — closing them over would bake multi-GB constants
    # into the HLO (CLAUDE.md rule; stalls compiles through the tunnel).
    @jax.jit
    def _eval(qt, bottom, top, dense, cat):
        t = len(offsets) - 1
        shifted = jnp.stack([cat[i] + offsets[i] for i in range(t)])
        flat = shifted.reshape((-1,) + shifted.shape[2:])
        rows = qt.rows(flat)
        if flat.ndim == 2:  # bag reduce
            rows = rows.sum(axis=1)
            if cfg.combiner == "mean":
                rows = rows / flat.shape[1]
        emb = rows.reshape(t, shifted.shape[1], cfg.dim)
        return forward_from_embeddings(bottom, top, cfg, dense, emb)

    eval_fn = lambda dense, cat: _eval(qt, bottom, top, dense, cat)  # noqa: E731
    return qt, eval_fn


def quantize_dcn(model, bits: int = 8):
    """Serving conversion for DCN-v2 (`models/dcn.py`), mirroring
    `quantize_dlrm`: int8 rows on the stacked ensemble (4x HBM), dense
    cross/deep/head untouched. Returns (quantized_tables, eval_fn)."""
    import jax
    from .models.dcn import forward_from_embeddings

    cfg = model.config
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    qcls = QuantizedEmbedding if bits == 8 else Int4QuantizedEmbedding
    qt = qcls.quantize(SimpleEmbedding(model.tables.data),
                       out_dtype=jnp.float32)
    offsets = model.tables.offsets
    cross, deep, head = model.cross, model.deep, model.head

    # Table/params as jit ARGUMENTS, not closure constants (see
    # quantize_dlrm — the CLAUDE.md big-array-closure rule).
    @jax.jit
    def _eval(qt, cross, deep, head, dense, cat):
        t = len(offsets) - 1
        shifted = jnp.stack([cat[i] + offsets[i] for i in range(t)])
        flat = shifted.reshape((-1,) + shifted.shape[2:])
        rows = qt.rows(flat)
        if flat.ndim == 2:  # bag reduce
            rows = rows.sum(axis=1)
            if cfg.combiner == "mean":
                rows = rows / flat.shape[1]
        emb = rows.reshape(t, shifted.shape[1], cfg.dim)
        return forward_from_embeddings(cross, deep, head, cfg, dense, emb)

    eval_fn = lambda dense, cat: _eval(qt, cross, deep, head,  # noqa: E731
                                       dense, cat)
    return qt, eval_fn


def quantize_deepfm(model, bits: int = 8):
    """Serving conversion for DeepFM (`models/deepfm.py`): int8/int4 rows on
    the stacked ensemble (the HBM bulk). Folded layout (`cfg.folded`): the
    fused (ΣV, D+1) row quantizes as ONE row — the first-order weight
    shares the per-row scale (its error stays inside the same
    scale/2-per-element bound, and serving keeps the one-gather shape).
    Legacy layout: the dim-1 first-order weight stack stays in storage
    dtype — per-row quantization of scalar rows would spend a scale per
    value, saving nothing. Returns (quantized_tables, eval_fn)."""
    import jax
    from .models.deepfm import forward_from_embeddings, split_fused

    cfg = model.config
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    qcls = QuantizedEmbedding if bits == 8 else Int4QuantizedEmbedding
    qt = qcls.quantize(SimpleEmbedding(model.tables.data),
                       out_dtype=jnp.float32)
    offsets = model.tables.offsets
    dense_params = (model.deep, model.head, model.dense_w, model.bias)
    fm_w_data = (model.fm_w.data
                 if cfg.use_fm and not cfg.folded else None)

    # Table/params as jit ARGUMENTS, not closure constants (see
    # quantize_dlrm — the CLAUDE.md big-array-closure rule).
    @jax.jit
    def _eval(qt, fm_w, dense_params, dense, cat):
        t = len(offsets) - 1
        shifted = jnp.stack([cat[i] + offsets[i] for i in range(t)])
        flat = shifted.reshape((-1,) + shifted.shape[2:])
        rows = qt.rows(flat)
        wrows = (jnp.take(fm_w, flat.reshape(-1), axis=0).reshape(
            flat.shape + (1,)) if fm_w is not None else None)
        if flat.ndim == 2:  # bag reduce
            rows = rows.sum(axis=1)
            if cfg.combiner == "mean":
                rows = rows / flat.shape[1]
            if wrows is not None:
                wrows = wrows.sum(axis=1)
                if cfg.combiner == "mean":
                    wrows = wrows / flat.shape[1]
        g = rows.reshape(t, shifted.shape[1], cfg.stack_dim)
        if cfg.folded:
            w_t, emb = split_fused(g)
        else:
            emb = g
            w_t = (wrows.reshape(t, shifted.shape[1], 1)
                   if wrows is not None else None)
        return forward_from_embeddings(dense_params, cfg, dense, emb, w_t)

    eval_fn = lambda dense, cat: _eval(qt, fm_w_data,         # noqa: E731
                                       dense_params, dense, cat)
    return qt, eval_fn


def max_quantization_error(table) -> float:
    """Worst-case absolute error bound of the scheme: scale/2 per element."""
    t = as_table(table)
    data = t.data
    absmax = jnp.max(jnp.abs(data.astype(jnp.float32)), axis=-1)
    return float(jnp.max(absmax) / 127.0 / 2.0)
