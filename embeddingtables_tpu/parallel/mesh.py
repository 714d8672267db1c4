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
