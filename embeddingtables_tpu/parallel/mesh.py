"""Mesh construction helpers.

The reference has no distributed layer (SURVEY.md §2.3: all parallelism is
Polyester threads + atomic counters on one host). This package is the
TPU-native replacement: a named `jax.sharding.Mesh` over which tables are
row-sharded and batches data-sharded, with XLA collectives riding ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh(axes: Sequence[str] = ("data",),
                 shape: Optional[Tuple[int, ...]] = None,
                 devices=None) -> Mesh:
    """Mesh over all (or given) devices. With one axis, all devices land on
    it; with several, `shape` must multiply out to the device count."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    return Mesh(np.asarray(devices).reshape(shape), tuple(axes))


def local_mesh(n: int, axes: Sequence[str] = ("data",)) -> Mesh:
    """First-n-devices mesh (virtual CPU meshes in tests / dryrun)."""
    return default_mesh(axes, devices=jax.devices()[:n])


def multihost_mesh(axes: Sequence[str] = ("data", "model"),
                   data_parallel_within_host: bool = True,
                   coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> Mesh:
    """Mesh for a multi-host pod slice (DCN across hosts, ICI within).

    Calls `jax.distributed.initialize` when coordinator info is given (no-op
    if already initialized), then lays axes so the **data** axis — which
    carries the heavy embedding-exchange collectives (the batch index
    all_gather and the (T, B, D) psum_scatter both run over the data axis,
    sharded.py) — stays WITHIN a host's ICI domain, and the model axis
    crosses DCN carrying only the smaller residual psum of partials
    (SURVEY.md §5 "Distributed communication backend").
    """
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    devices = np.asarray(jax.devices())
    n = devices.size
    local = jax.local_device_count()
    if data_parallel_within_host and len(axes) == 2 and n % local == 0:
        # (local, hosts) grid: axis 0 = data on ICI, axis 1 = model over DCN.
        return Mesh(devices.reshape(n // local, local).T, tuple(axes))
    return default_mesh(axes, devices=list(devices))
