"""Forward lookup: non-reducing and sum-reducing (multi-hot) embedding gather.

Reference parity (citations into /root/reference):
  - `lookup` / `lookup!` / `_lookup`            -> `lookup` (`src/lookup.jl:16-44`)
  - plain-matrix oracle `lookup(::AbstractMatrix, I)` -> `lookup_oracle`
    (`src/lookup.jl:5-13`)
  - `lookup_static!` / `lookup_generic!` dual path -> kernel dispatch here:
    a Pallas DMA-gather fast path (feature dim lane-aligned) and a generic
    XLA gather path, selected by `dostatic`-analog heuristics
    (`src/lookup.jl:30-32,51-87,108-165`)
  - `destination`                                -> `tables.destination`

Semantics (behavioral contract, SURVEY.md §2.4 items 1-2):
  non-reducing: `I` of shape `(B,)`      -> `O[i, :] = A[I[i], :]`
  reducing:     `I` of shape `(B, bag)`  -> `O[i, :] = Σ_k A[I[i, k], :]`
(the reference is column-major `(dim, vocab)`; we are row-major `(vocab, dim)`).

Differentiation: `lookup` is linear in the table, so `jax.grad` through the
XLA path yields the scatter-add transpose automatically. The *lazy* sparse
cotangent of the reference (`rrule` returning `SparseEmbeddingUpdate`,
`src/sparseupdate.jl:35-40`) is exposed as `lookup_vjp`, whose pullback is O(1)
and never materializes a table-sized gradient.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .. import config
from ..tables import SimpleEmbedding, as_table, is_table
from ..types import LANES
from .sparse_update import SparseEmbeddingUpdate


def lookup_oracle(data: jax.Array, indices: jax.Array,
                  combiner: str = "sum", weights=None,
                  pad_idx: int | None = None) -> jax.Array:
    """Naive dense implementation on a raw `(vocab, dim)` array — the test
    oracle (reference `lookup(A::AbstractMatrix, ...)`, `src/lookup.jl:5-13`).
    Extended with mean/weighted combiners and a padding sentinel (beyond the
    reference's sum-only fixed bags).

    pad_idx: occurrences equal to this index value are ABSENT — they
    contribute a zero row, are excluded from the mean denominator, and (via
    `effective_weights`) carry no gradient. Variable-length bags are thus
    fixed-width bags right-padded with `pad_idx` (torch `EmbeddingBag
    padding_idx` semantics). An all-pad bag yields a zero row.
    """
    indices = jnp.asarray(indices)
    if pad_idx is not None:
        valid = indices != pad_idx
        safe = jnp.where(valid, indices, 0)
        if indices.ndim == 1:
            out = data[safe, :] * valid[:, None].astype(data.dtype)
            if weights is not None:
                out = out * jnp.asarray(weights).reshape(-1, 1).astype(
                    out.dtype)
            return out
        w = valid.astype(jnp.float32)
        if weights is not None:
            w = w * jnp.asarray(weights).astype(jnp.float32)
        rows = data[safe, :] * w[..., None].astype(data.dtype)
        out = rows.sum(axis=1)
        if combiner == "mean":
            denom = w.sum(axis=1, keepdims=True)
            out = out / jnp.maximum(denom, 1e-12).astype(out.dtype)
        return out
    if indices.ndim == 1:
        # Non-reducing: combiner is a no-op, weights scale rows (see lookup).
        out = data[indices, :]
        if weights is not None:
            out = out * jnp.asarray(weights).reshape(-1, 1).astype(out.dtype)
        return out
    if indices.ndim == 2:
        rows = data[indices, :]
        if weights is not None:
            rows = rows * jnp.asarray(weights)[..., None]
        out = rows.sum(axis=1)
        if combiner == "mean":
            denom = (jnp.asarray(weights).sum(axis=1, keepdims=True)
                     if weights is not None else indices.shape[1])
            out = out / denom
        return out
    raise ValueError(f"indices must be 1-D or 2-D, got shape {indices.shape}")


def _lookup_xla(data: jax.Array, indices: jax.Array) -> jax.Array:
    """Generic XLA gather path (analog of `lookup_generic!`,
    `src/lookup.jl:51-67,108-132`). `jnp.take` lowers to a single XLA gather;
    the bag-sum fuses into it."""
    if indices.ndim == 1:
        return jnp.take(data, indices, axis=0)
    # Reducing: gather (B, bag, dim) then sum the bag axis. XLA fuses this.
    return jnp.take(data, indices, axis=0).sum(axis=1)


def _use_pallas(data: jax.Array, indices: jax.Array) -> bool:
    """`dostatic`-analog dispatch heuristic (`src/lookup.jl:30-32`).

    Measured on v5e with the only DCE/CSE/hoist-proof methodology (the full
    DLRM train step, docs/DESIGN.md): XLA's native gather runs at the chip's
    ~13 ns/row DMA-issue ceiling and beats the chunked Pallas gather by ~30%
    (78 vs 91 ms/step at T=26 B=64Ki D=128) — the chunking glue (26 calls +
    concat) costs more than the kernel saves. Synthetic microbenches that
    said otherwise were artifacts (XLA dead-code-eliminated unconsumed
    chunks). Auto therefore uses XLA; the Pallas kernels remain forceable
    via config for re-evaluation on other chips/shapes."""
    impl = config.lookup_impl()
    if impl == "xla":
        return False
    dim = data.shape[-1]
    aligned = dim % LANES == 0
    if impl == "pallas":
        return aligned
    return False


def _lookup_dispatch(data: jax.Array, indices: jax.Array) -> jax.Array:
    if _use_pallas(data, indices):
        from .pallas.gather import gather_rows, gather_bags
        if indices.ndim == 1:
            return gather_rows(data, indices)
        return gather_bags(data, indices)
    return _lookup_xla(data, indices)


def _combine(rows: jax.Array, indices: jax.Array, combiner: str,
             weights) -> jax.Array:
    """Reduce `(B, bag, D)` bag rows per the combiner/weights."""
    if weights is not None:
        rows = rows * jnp.asarray(weights)[..., None].astype(rows.dtype)
    out = rows.sum(axis=1)
    if combiner == "mean":
        if weights is not None:
            denom = jnp.asarray(weights).sum(axis=1, keepdims=True)
            out = out / jnp.maximum(denom, 1e-12).astype(out.dtype)
        else:
            out = out / indices.shape[1]
    return out


def lookup(table, indices, context: "IndexingContext | None" = None, *,
           combiner: str = "sum", weights=None,
           pad_idx: int | None = None) -> jax.Array:
    """Embedding lookup (reference `lookup`, `src/lookup.jl:35-44`).

    `table` may be a `SimpleEmbedding`, `SplitEmbedding`, any object
    implementing the EmbeddingTable protocol, or a raw `(vocab, dim)` array.
    `indices`: `(B,)` int -> non-reducing; `(B, bag)` int -> bag-reducing.
    Returns `(B, dim)`.

    combiner: "sum" (the reference's only bag semantics) or "mean";
    weights: optional `(B, bag)` per-occurrence weights (weighted bags; with
    combiner="mean" gives the weighted average). Sum-only unweighted bags
    take the fast dispatch; other combiners reduce the gathered rows.
    On non-reducing `(B,)` indices there is no bag: `combiner` is a no-op
    (mean == sum == the gather) and `weights`, when given, are a `(B,)`
    per-row output scale (the same role they play in the lazy update).
    pad_idx: optional padding sentinel — occurrences equal to it are ABSENT:
    zero row contribution, excluded from the mean denominator, no gradient
    (torch `EmbeddingBag padding_idx` semantics; variable-length bags =
    fixed-width bags right-padded with `pad_idx`). Any int works, including
    -1 or `vocab`; padded slots never reach the table's gather (they are
    remapped to row 0 then masked), so OOB sentinels are safe on every table
    type. An all-pad bag yields a zero row; in non-reducing `(B,)` lookups a
    pad entry yields a zero row too.

    `context` is the reference's `IndexingContext` phase tag
    (`src/EmbeddingTables.jl:74-77`): tables whose `rows()` accepts a
    `context` kwarg (e.g. custom memory-tiered backends like
    `HostOffloadEmbedding`) can steer reads differently per phase; built-in
    dense tables ignore it (defaults to `Forward`).
    """
    from ..types import Forward
    context = Forward if context is None else context
    if combiner not in ("sum", "mean"):
        raise ValueError(f"combiner must be 'sum' or 'mean', got {combiner!r}")
    indices = jnp.asarray(indices)
    if indices.ndim not in (1, 2):
        raise ValueError(f"indices must be 1-D or 2-D, got shape {indices.shape}")
    if pad_idx is not None:
        # Padding folds into the (already-tested) weighted machinery: remap
        # pad slots to row 0 so the gather stays in-bounds on every table
        # type, then mask them out of the combine. Mean denominators use the
        # masked weight mass, so pads are excluded (all-pad bag -> zero row
        # via the clamped denominator).
        valid = indices != pad_idx
        safe = jnp.where(valid, indices, 0)
        if indices.ndim == 1:
            rows = lookup(table, safe, context, weights=weights)
            return rows * valid[:, None].astype(rows.dtype)
        w = valid.astype(jnp.float32)
        if weights is not None:
            w = w * jnp.asarray(weights).astype(jnp.float32)
        return lookup(table, safe, context, combiner=combiner, weights=w)
    if indices.ndim == 1:
        # Non-reducing: there is no bag to reduce, so `combiner` is a no-op
        # (a (B,) stream is a bag of one — mean == sum == the gather) and
        # `weights`, when given, are a per-row output scale — matching how
        # the lazy update applies 1-D weights (occurrence_values), so
        # forward and gradient stay transposes of each other.
        if isinstance(table, SimpleEmbedding):
            out = _lookup_dispatch(table.data, indices)
        elif is_table(table):
            try:
                out = table.rows(indices, context=context)
            except TypeError:
                out = table.rows(indices)
        else:
            out = _lookup_dispatch(jnp.asarray(table), indices)
        if weights is not None:
            out = out * jnp.asarray(weights).reshape(-1, 1).astype(out.dtype)
        return out
    plain = combiner == "sum" and weights is None
    if isinstance(table, SimpleEmbedding):
        if plain:
            return _lookup_dispatch(table.data, indices)
        rows = jnp.take(table.data, indices, axis=0)
        return _combine(rows, indices, combiner, weights)
    if is_table(table):
        # Protocol path: the table's own row gather (e.g. SplitEmbedding's
        # divrem shard routing, or a user-defined table as in the reference's
        # DummyEmbedding extension test, `test/constructors.jl:34-54`).
        try:
            got = table.rows(indices, context=context)
        except TypeError:
            got = table.rows(indices)
        got = _combine(got, indices, combiner, weights)
        return got
    if plain:
        return _lookup_dispatch(jnp.asarray(table), indices)
    rows = jnp.take(jnp.asarray(table), indices, axis=0)
    return _combine(rows, indices, combiner, weights)


def effective_weights(indices: jax.Array, combiner: str, weights,
                      pad_idx: int | None = None):
    """Per-occurrence scale that folds the combiner into the lazy update, so
    downstream fused optimizers need no combiner knowledge: None for plain
    sum bags / non-reducing lookups, else a float32 array — `(B, bag)` for
    bags, `(B,)` for padded non-reducing lookups.

    With `pad_idx`, padded occurrences get weight 0 (no gradient; the mean
    denominator counts only valid mass). The captured indices keep their
    original values — zero-weight occurrences accumulate exact 0.0 through
    every scatter/dedup path, so no update math changes."""
    if indices.ndim != 2:
        # Non-reducing: weights are a per-row output scale (the `lookup`
        # 1-D contract); the pad mask folds in multiplicatively.
        w = (None if weights is None
             else jnp.asarray(weights).astype(jnp.float32).reshape(-1))
        if pad_idx is not None:
            mask = (indices != pad_idx).astype(jnp.float32)
            return mask if w is None else mask * w
        return w
    b, bag = indices.shape
    if pad_idx is not None:
        mask = (indices != pad_idx).astype(jnp.float32)
        w = mask if weights is None else mask * jnp.asarray(weights).astype(
            jnp.float32)
        if combiner == "mean":
            return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        return w
    if combiner == "mean":
        if weights is not None:
            w = jnp.asarray(weights).astype(jnp.float32)
            return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        return jnp.full((b, bag), 1.0 / bag, jnp.float32)
    if weights is not None:
        return jnp.asarray(weights).astype(jnp.float32)
    return None


def lookup_vjp(table, indices, *, combiner: str = "sum", weights=None,
               pad_idx: int | None = None
               ) -> Tuple[jax.Array, Callable[[jax.Array], SparseEmbeddingUpdate]]:
    """Lookup plus the *lazy* pullback (reference `rrule(lookup, A, I)`,
    `src/sparseupdate.jl:35-40`).

    The pullback captures `(delta, indices[, weights])` with NO scatter
    performed — the scatter happens later, fused into the optimizer step
    (`sparse_update.py`). The gradient w.r.t. `indices` is structurally zero
    (reference `NoTangent`). Mean/weighted combiners — and `pad_idx` padding
    masks (padded occurrences carry weight 0, hence no gradient) — fold into
    the update's per-occurrence weights, so downstream fused optimizers need
    no combiner knowledge.
    """
    indices = jnp.asarray(indices)
    out = lookup(table, indices, combiner=combiner, weights=weights,
                 pad_idx=pad_idx)
    eff = effective_weights(indices, combiner, weights, pad_idx)

    def pullback(delta: jax.Array) -> SparseEmbeddingUpdate:
        return SparseEmbeddingUpdate(delta=delta, indices=indices,
                                     weights=eff)

    return out, pullback
