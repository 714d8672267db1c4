"""Tiered embedding tables: hot head in HBM, cold tail in pinned host RAM.

The production serving/training pattern for beyond-HBM vocabularies with
skewed (Zipf) traffic: a small hot set covers most lookups (measured here:
Zipf(1.1) head of 1024 rows covers ~66% of a 6.5M-vocab stream,
docs/DESIGN.md §1d), so keep those rows in HBM and leave the long tail in
host memory — the software analog of GPU UVM caching, built TPU-first.

The design deliberately avoids any per-row translation structure (hash
maps, slot tables — per-occurrence control flow is poison on TPU,
docs/DESIGN.md §1c): it composes with the frequency relayout already in
`utils/rowstats.py`. After `relayout(frequency_permutation)`, the hottest
rows occupy ids `[0, hot_rows)`, so tier routing is ONE vectorized compare
`idx < hot_rows` — no lookup tables, no dynamic shapes, jit-static
everything. `retier()` re-splits the table under a new permutation as
traffic drifts (the loader remaps ids through `inverse_permutation`, same
contract as a plain relayout).

Forward: hot rows gather on-device; the cold tier gathers host-side
(`compute_on("device_host")`, like `offload.HostOffloadEmbedding`) and
only `(B, D)` rows cross PCIe. Update: the delta splits by the same
compare; hot rows scatter in HBM, cold rows scatter host-side, each tier
receiving out-of-bounds drop sentinels for the other's occurrences.

Reference hook being realized: the `SplitEmbedding` alternative-memory
constructor + `IndexingContext` read/write phase tags
(`/root/reference/src/split.jl:29-46`, `src/EmbeddingTables.jl:74-77`) —
the authors' heterogeneous-memory research surface, here as an HBM/host
tiering with stats-driven migration.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import functools

from .offload import _mem_sharding, host_put
from .tables import _as_spec
from .types import TableSpec


@functools.lru_cache(maxsize=None)
def _tier_fns(device):
    """Jitted tier-routed gather/scatter/reorder for one device.

    Everything that mixes memory spaces must live INSIDE one jit with
    explicit `device_put` transfers at the tier boundary: eagerly, the
    host-compute output's aval keeps its Host memory-space annotation even
    after a device_put, and any later op mixing it with device arrays
    fails ("memory_space of all inputs ... must be the same"). Cached per
    device so jit caches persist across the functional table updates."""
    from jax.experimental.compute_on import compute_on
    from jax.sharding import SingleDeviceSharding
    host = SingleDeviceSharding(device, memory_kind="pinned_host")
    dev = SingleDeviceSharding(device, memory_kind="device")

    @compute_on("device_host")
    @jax.jit
    def hgather(t, i):
        return t.at[i].get(mode="promise_in_bounds")

    @compute_on("device_host")
    @jax.jit
    def hscatter(t, i, d):
        return t.at[i].add(d, mode="drop")

    @compute_on("device_host")
    @jax.jit
    def hreorder(hot, cold, p):
        # promise_in_bounds: a plain take emits bound-check constants that
        # live in device space and XLA rejects the mixed-space compare
        # (perm is validated host-side before the call).
        full = jnp.concatenate([hot, cold], axis=0)
        return full.at[p].get(mode="promise_in_bounds")

    @jax.jit
    def rows(hot, cold, idx):
        h, v = hot.shape[0], hot.shape[0] + cold.shape[0]
        idx = jnp.clip(idx, 0, v - 1)
        is_hot = idx < h
        hot_got = jnp.take(hot, jnp.where(is_hot, idx, 0), axis=0)
        cold_idx = jnp.where(is_hot, 0, idx - h).astype(jnp.int32)
        got = hgather(cold, jax.device_put(cold_idx, host))
        cold_got = jax.device_put(got, dev)
        return jnp.where(is_hot[..., None], hot_got, cold_got)

    @jax.jit
    def scatter(hot, cold, idx, delta):
        h, v = hot.shape[0], hot.shape[0] + cold.shape[0]
        idx = jnp.clip(idx, 0, v - 1)
        is_hot = idx < h
        hot_idx = jnp.where(is_hot, idx, h)          # OOB drop sentinel
        new_hot = hot.at[hot_idx].add(delta.astype(hot.dtype), mode="drop")
        cold_idx = jnp.where(is_hot, v - h, idx - h).astype(jnp.int32)
        new_cold = hscatter(cold,
                            jax.device_put(cold_idx, host),
                            jax.device_put(delta.astype(cold.dtype), host))
        return new_hot, new_cold

    @functools.partial(jax.jit, static_argnames="new_h")
    def reorder(hot, cold, perm, new_h):
        full = hreorder(jax.device_put(hot, host), cold,
                        jax.device_put(perm, host))
        new_hot = jax.device_put(full[:new_h], dev)
        new_cold = jax.device_put(full[new_h:], host)
        return new_hot, new_cold

    return rows, scatter, reorder


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TieredEmbedding:
    """`(vocab, dim)` table split at `hot_rows`: rows `[0, hot_rows)` live
    in HBM, rows `[hot_rows, vocab)` in pinned host memory.

    Implements the EmbeddingTable protocol (`spec`/`rows`/`example`), so
    `lookup`, `lookup_vjp`, `maplookup`, and `sgd_update` work unchanged.
    Pair with `utils.rowstats` so hot ids actually are the low ids.
    """

    hot: jax.Array           # (hot_rows, dim), device HBM
    cold: jax.Array          # (vocab - hot_rows, dim), pinned host
    spec: TableSpec = dataclasses.field(metadata=dict(static=True))
    hot_rows: int = dataclasses.field(metadata=dict(static=True))

    # --- constructors ------------------------------------------------------
    @classmethod
    def from_array(cls, data, hot_rows: int, *,
                   name: Optional[str] = None) -> "TieredEmbedding":
        data = jnp.asarray(data)
        spec = _as_spec(data, None, name)
        if not 0 < hot_rows < spec.vocab:
            raise ValueError(
                f"hot_rows must be in (0, vocab={spec.vocab}), got {hot_rows}")
        hot = jax.device_put(data[:hot_rows],
                             _mem_sharding(data, "device"))
        cold = host_put(data[hot_rows:])
        return cls(hot=hot, cold=cold, spec=spec, hot_rows=hot_rows)

    @classmethod
    def create(cls, key: jax.Array, vocab: int, dim: int, hot_rows: int, *,
               dtype=jnp.float32, name: Optional[str] = None
               ) -> "TieredEmbedding":
        scale = 1.0 / (dim ** 0.5)
        data = scale * jax.random.normal(key, (vocab, dim), dtype)
        return cls.from_array(data, hot_rows, name=name)

    # --- EmbeddingTable protocol -------------------------------------------
    @property
    def shape(self):
        return (self.spec.vocab, self.spec.dim)

    @property
    def dtype(self):
        return self.spec.dtype

    def example(self) -> jax.Array:
        return self.hot

    def _device(self):
        try:
            return next(iter(self.hot.sharding.device_set))
        except Exception:
            return jax.devices()[0]

    def rows(self, idx: jax.Array) -> jax.Array:
        """Tier-routed gather: `(..., dim)` for any index shape. Each tier
        gathers the full index stream with the other tier's occurrences
        clamped to row 0, then one `where` on the `idx < hot_rows` compare
        selects; only `(B, dim)` cold rows cross PCIe."""
        rows_fn, _, _ = _tier_fns(self._device())
        return rows_fn(self.hot, self.cold, jnp.asarray(idx))

    def scatter_apply(self, idx: jax.Array,
                      delta: jax.Array) -> "TieredEmbedding":
        """Duplicate-accumulating scatter-add, tier-routed. Hot rows write
        in HBM; cold deltas ship host-ward and scatter there. The other
        tier's occurrences carry out-of-bounds sentinels + mode='drop'."""
        _, scatter_fn, _ = _tier_fns(self._device())
        new_hot, new_cold = scatter_fn(self.hot, self.cold,
                                       jnp.asarray(idx), jnp.asarray(delta))
        return dataclasses.replace(self, hot=new_hot, cold=new_cold)

    def zeros_like(self) -> "TieredEmbedding":
        return dataclasses.replace(self, hot=jnp.zeros_like(self.hot),
                                   cold=host_put(jnp.zeros_like(self.cold)))

    def materialize(self) -> jax.Array:
        """Dense `(vocab, dim)` HBM copy (test oracle only) — routed through
        the tiered gather so the result carries a clean device aval."""
        return self.rows(jnp.arange(self.spec.vocab))

    # --- stats-driven migration -------------------------------------------
    def hot_fraction(self, idx) -> float:
        """Fraction of an index stream served from HBM (host-side probe)."""
        flat = np.asarray(idx).reshape(-1)
        return float((flat < self.hot_rows).mean())

    def retier(self, perm: np.ndarray,
               hot_rows: Optional[int] = None) -> "TieredEmbedding":
        """Re-split under a new frequency permutation (`perm[rank] =
        old_id`, hottest first — `FrequencyTracker.frequency_permutation`).
        Rebuild happens HOST-side (the full table never touches HBM); the
        loader must thereafter remap incoming ids through
        `rowstats.inverse_permutation(perm)`. Occasional-maintenance cost,
        like eviction/relayout."""
        new_h = self.hot_rows if hot_rows is None else hot_rows
        if not 0 < new_h < self.spec.vocab:
            raise ValueError(f"hot_rows out of range: {new_h}")
        perm = np.asarray(perm)
        if perm.shape != (self.spec.vocab,):
            raise ValueError(
                f"perm must be (vocab,)={self.spec.vocab}, got {perm.shape}")
        _, _, reorder_fn = _tier_fns(self._device())
        new_hot, new_cold = reorder_fn(self.hot, self.cold,
                                       jnp.asarray(perm, jnp.int32), new_h)
        return dataclasses.replace(self, hot=new_hot, cold=new_cold,
                                   hot_rows=new_h)
