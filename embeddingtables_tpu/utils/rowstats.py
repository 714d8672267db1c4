"""Row-lifecycle management: frequency tracking, stale-row eviction, and
frequency-ordered remapping.

Production CTR tables churn: ids appear, run hot for days, and go stale
(session ids, ad ids). The reference never faced this (static tables); a
serving-scale engine needs:

  - **FrequencyTracker** — host-side exponentially-decayed per-row counts,
    fed from the SAME host batches the input pipeline already holds
    (numpy bincount; overlapped with the device step via the prefetch
    pipeline, so it costs zero device time and no extra transfers).
  - **Eviction** — reinitialize rows that went cold (EMA below threshold):
    one small device scatter for the rows plus an optimizer-state reset,
    preserving the lazy/fused update discipline.
  - **Frequency ordering** — a permutation placing hot rows first, with the
    inverse map the data loader applies to incoming ids. Useful for
    hot-head analyses and as the layout contract for head-based schemes
    (e.g. serving the head from VMEM, QR-ing only the tail).

All device-side operations are functional (return new arrays) and shaped
for jit; the tracker itself is host state, like the rest of the input
pipeline.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class FrequencyTracker:
    """Exponentially-decayed per-row occurrence counts for one table.

    decay: per-OBSERVATION multiplier on the running EMA (0.99 with one
    observe() per step ≈ a ~100-step half-life window). Counts are raw
    occurrence sums within a batch, so hot rows accumulate fast.
    """

    def __init__(self, vocab: int, decay: float = 0.99):
        if not 0.0 < decay <= 1.0:
            raise ValueError("decay must be in (0, 1]")
        self.vocab = vocab
        self.decay = decay
        self.counts = np.zeros(vocab, np.float64)
        self.seen = np.zeros(vocab, bool)   # appeared since last eviction
        self.observations = 0

    def observe(self, indices) -> None:
        """Fold one batch of ids (any shape; host numpy/int array)."""
        flat = np.asarray(indices).reshape(-1)
        self.counts *= self.decay
        self.counts += np.bincount(flat, minlength=self.vocab).astype(
            np.float64)
        self.seen[flat] = True
        self.observations += 1

    def top_rows(self, k: int) -> np.ndarray:
        """Ids of the k most frequent rows, hottest first."""
        k = min(k, self.vocab)
        if k <= 0:
            return np.zeros(0, np.int32)
        part = np.argpartition(self.counts, -k)[-k:]
        return part[np.argsort(self.counts[part])[::-1]].astype(np.int32)

    def cold_rows(self, threshold: float) -> np.ndarray:
        """Ids that APPEARED (since the last `pop_cold`) but whose decayed
        count fell to/below `threshold` — stale learned state. Never-seen
        and already-evicted rows are excluded: they sit at init values, so
        re-evicting them every interval would be wasted scatter traffic and
        inflated eviction counts."""
        return np.nonzero(self.seen & (self.counts <= threshold))[0].astype(
            np.int32)

    def pop_cold(self, threshold: float) -> np.ndarray:
        """`cold_rows` + mark them unseen so the next interval does not
        re-evict the same rows unless they reappear."""
        cold = self.cold_rows(threshold)
        self.seen[cold] = False
        return cold

    def frequency_permutation(self) -> np.ndarray:
        """(V,) permutation `perm` with `perm[rank] = old_id`, hottest
        first. `inverse_permutation(perm)[old_id] = rank` is what the data
        loader applies to incoming ids after a relayout."""
        return np.argsort(-self.counts, kind="stable").astype(np.int32)

    def coverage(self, k: int) -> float:
        """Fraction of (decayed) traffic covered by the top-k rows."""
        total = self.counts.sum()
        if total <= 0:
            return 0.0
        return float(np.sort(self.counts)[::-1][:k].sum() / total)


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    return inv


def evict_rows(data: jax.Array, rows, *,
               init_fn: Optional[Callable] = None,
               key: Optional[jax.Array] = None,
               value: float = 0.0) -> jax.Array:
    """Reinitialize the given rows of a `(V, D)` table (functional).

    init_fn(key, (n, D), dtype) generates replacements (pass `key`); with
    no init_fn rows are set to `value`. Duplicate/OOB ids are dropped.
    """
    rows = jnp.asarray(rows, jnp.int32)
    n = rows.shape[0]
    if n == 0:
        return data
    d = data.shape[1]
    if init_fn is not None:
        if key is None:
            raise ValueError("init_fn needs a PRNG key")
        fresh = init_fn(key, (n, d), data.dtype)
    else:
        fresh = jnp.full((n, d), value, data.dtype)
    return data.at[rows].set(fresh, mode="drop")


def reset_rows_state(state, rows):
    """Reset optimizer state for evicted rows: `(V,)` accumulators (row-wise
    AdaGrad) and `(V, D)` moments (lazy Adam) zero at those rows; scalar
    and empty-placeholder leaves pass through.

    Leaf rule: any array leaf with a non-trivial leading dimension is
    treated as vocab-indexed (shape[0] > 1; the built-in states have only
    vocab-dim-0 arrays, scalars, and `(0,)` placeholders). Custom states
    carrying non-vocab leading dimensions must reset their own leaves."""
    rows = jnp.asarray(rows, jnp.int32)

    def leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] > 1:
            return x.at[rows].set(0, mode="drop")
        return x

    return jax.tree_util.tree_map(leaf, state)


def relayout(data: jax.Array, perm: np.ndarray) -> jax.Array:
    """Physically reorder rows so `new[rank] = old[perm[rank]]` (hot rows
    first under `FrequencyTracker.frequency_permutation`). The data loader
    must then map incoming ids through `inverse_permutation(perm)`."""
    return jnp.take(data, jnp.asarray(perm), axis=0)


def remap_batch(cat: np.ndarray, inverse_perms: Sequence[np.ndarray]
                ) -> np.ndarray:
    """Apply per-table id remaps to a `(T, B[, bag])` host batch — the
    loader-side half of a relayout (vectorized numpy take; overlapped with
    the device step like the rest of the pipeline)."""
    out = np.empty_like(cat)
    for t in range(cat.shape[0]):
        out[t] = inverse_perms[t][cat[t]]
    return out


def evict_rows_sharded(tables, accum, global_rows):
    """Evict global rows of a mod-row-sharded stacked table
    (`parallel.ShardedStackedTables`: global row r -> shard r % n, slot
    r // n). Zeroes the rows and their optimizer-state entries. Functional;
    GSPMD routes each scatter to the owning shard (eviction is occasional,
    so the cross-shard routing cost is irrelevant).

    `accum` is any state layout `parallel.sharded.shard_row_accum`
    produces: the `(n, rows_local)` AdaGrad accumulator, the Adam
    `(m, v, count)` tuple (`(n, rows_local, dim)` moments; the scalar
    count passes through), or the FTRL `(z, n)` tuple. Leaf rule: array
    leaves with a `(n_shards, rows_local, ...)` leading pair reset at the
    evicted (shard, slot) cells; scalars and `(n, 0)` placeholders pass
    through. Zero state is the correct evicted fixed point for every
    built-in optimizer (FTRL's closed form gives w=0 at z=0).
    """
    import dataclasses
    rows = jnp.asarray(global_rows, jnp.int32)
    if rows.size == 0:
        return tables, accum
    n = tables.n_shards
    shard, slot = rows % n, rows // n
    new_data = tables.data.at[shard, slot].set(0.0, mode="drop")

    def leaf(x):
        if (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] == n
                and x.shape[1] > 0):
            return x.at[shard, slot].set(0.0, mode="drop")
        return x

    new_accum = (jax.tree_util.tree_map(leaf, accum)
                 if accum is not None else None)
    return dataclasses.replace(tables, data=new_data), new_accum
