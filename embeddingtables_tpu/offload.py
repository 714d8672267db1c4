"""Host-memory-offloaded embedding tables (beyond-HBM capacity).

The reference's heterogeneous-memory research hook is the `array` kwarg on
`SplitEmbedding`'s undef initializer (shards allocated in alternative memory,
`/root/reference/src/split.jl:29-46`) plus the `IndexingContext` phase tag so
reads and writes can take different paths (`src/EmbeddingTables.jl:74-77`,
`README.md:292-297`). The TPU analog implemented here: the table lives in the
worker's **pinned host RAM** (`memory_kind="pinned_host"`), lookups run as
host-side gathers (`compute_on("device_host")`) and only the gathered rows
(B x dim, not vocab x dim) cross PCIe into HBM; sparse updates move the delta
rows host-ward and scatter there. HBM holds zero bytes of table state, so
vocabularies larger than HBM train on one chip.

The `IndexingContext` mapping: `Forward` = host gather + H2D of rows;
`Update` = D2H of delta + host scatter. Both clamp indices on-device first so
the host computation can use `promise_in_bounds` (the clamp avoids
mixed-memory-space comparison constants, which XLA rejects).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .tables import _as_spec
from .types import Dynamic, Static, TableSpec


def _mem_sharding(arr_or_dev, kind: str):
    from jax.sharding import SingleDeviceSharding
    if isinstance(arr_or_dev, jax.Array):
        s = arr_or_dev.sharding
        try:
            return s.with_memory_kind(kind)
        except Exception:
            dev = list(s.device_set)[0]
            return SingleDeviceSharding(dev, memory_kind=kind)
    return SingleDeviceSharding(arr_or_dev, memory_kind=kind)


def host_put(x: jax.Array, device=None) -> jax.Array:
    """Place an array in pinned host memory (outside or inside jit)."""
    dev = device if device is not None else (
        x.device if isinstance(x, jax.Array) and hasattr(x, "device")
        else jax.devices()[0])
    return jax.device_put(x, _mem_sharding(x if isinstance(x, jax.Array) else dev,
                                           "pinned_host"))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HostOffloadEmbedding:
    """Embedding table resident in pinned host memory.

    Implements the EmbeddingTable protocol (`spec`/`rows`/`example`), so
    `lookup`, `lookup_vjp`, `maplookup`, and `sgd_update` work unchanged;
    only row traffic crosses PCIe.
    """

    data: jax.Array          # (vocab, dim), memory_kind == "pinned_host"
    spec: TableSpec = dataclasses.field(metadata=dict(static=True))

    def __init__(self, data, lookup: Static | Dynamic | None = None, *,
                 spec: TableSpec | None = None, name: Optional[str] = None):
        if spec is None:
            arr = data if isinstance(data, jax.Array) else jnp.asarray(data)
            spec = _as_spec(arr, lookup, name)
            data = arr
        if isinstance(data, jax.Array) and \
                getattr(data.sharding, "memory_kind", None) != "pinned_host":
            data = host_put(data)
        self.data = data
        self.spec = spec

    # --- EmbeddingTable protocol -------------------------------------------
    @property
    def shape(self):
        return (self.spec.vocab, self.spec.dim)

    @property
    def dtype(self):
        return self.spec.dtype

    def example(self) -> jax.Array:
        return self.data

    def rows(self, idx: jax.Array) -> jax.Array:
        """Forward path: clamp on device, gather on the host CPU, ship only
        the gathered rows to HBM."""
        from jax.experimental.compute_on import compute_on
        idx = jnp.clip(jnp.asarray(idx), 0, self.spec.vocab - 1)
        hidx = jax.device_put(idx, _mem_sharding(self.data, "pinned_host"))

        @compute_on("device_host")
        @jax.jit
        def hgather(t, i):
            return t.at[i].get(mode="promise_in_bounds")

        rows = hgather(self.data, hidx)
        return jax.device_put(rows, _mem_sharding(self.data, "device"))

    def replace_data(self, data: jax.Array) -> "HostOffloadEmbedding":
        return HostOffloadEmbedding(data, spec=self.spec)

    def scatter_apply(self, idx: jax.Array,
                      delta: jax.Array) -> "HostOffloadEmbedding":
        """Update path: ship delta rows host-ward, scatter-add on the host.
        Duplicates accumulate (XLA scatter semantics)."""
        from jax.experimental.compute_on import compute_on
        idx = jnp.clip(jnp.asarray(idx), 0, self.spec.vocab - 1)
        host = _mem_sharding(self.data, "pinned_host")
        hidx = jax.device_put(idx, host)
        hdelta = jax.device_put(delta.astype(self.data.dtype), host)

        @compute_on("device_host")
        @jax.jit
        def hscatter(t, i, d):
            return t.at[i].add(d, mode="promise_in_bounds")

        return self.replace_data(hscatter(self.data, hidx, hdelta))

    def zeros_like(self) -> "HostOffloadEmbedding":
        return self.replace_data(host_put(jnp.zeros_like(self.data)))

    def materialize(self) -> jax.Array:
        """Dense HBM copy (test oracle only)."""
        return jax.device_put(self.data, _mem_sharding(self.data, "device"))
