"""Checkpoint / resume for (sharded) embedding models.

The reference has no checkpointing (SURVEY.md §5: "tables are AbstractArrays
so Flux/BSON serialization applies externally"); at pod scale the tables are
the dominant state and must be saved/restored *sharded* — each host writes
the rows it owns. This module wraps orbax (the standard JAX checkpointing
library) with pytree-aware handling of this package's model dataclasses:

  - arbitrary pytrees of jax Arrays (DLRM, ShardedDLRM, StackedTables, ...)
    are decomposed into (leaves, treedef-metadata) via jax.tree_util, so the
    registered-dataclass static fields (configs, offsets) round-trip;
  - sharded arrays restore WITH their shardings when a mesh-equipped
    abstract target is provided (`restore_like=`): orbax reads each shard
    directly onto its owning device, never materializing the full table on
    one host.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

import orbax.checkpoint as ocp


def _size(leaf) -> int:
    return getattr(leaf, "size", np.asarray(leaf).size)


def _leaves_dict(tree) -> dict:
    """Index leaves by position; zero-size leaves (e.g. a stateless
    optimizer's empty accumulator) are skipped — orbax refuses them, and the
    restore template recreates them structurally."""
    leaves = jax.tree_util.tree_leaves(tree)
    return {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)
            if _size(leaf) > 0}


def save_checkpoint(path: str, tree, *, step: Optional[int] = None,
                    force: bool = True) -> str:
    """Save a pytree (model/optimizer state) to `path` (a directory).

    Static dataclass fields (TableSpec, DLRMConfig, stacked offsets) are part
    of the treedef and are NOT serialized — restore requires a structural
    template (`restore_like`), which reconstructs them from code. This is the
    standard orbax discipline: code owns structure, checkpoints own data.
    """
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, str(step))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _leaves_dict(tree), force=force)
    return path


def restore_checkpoint(path: str, restore_like) -> Any:
    """Restore a pytree saved by `save_checkpoint`.

    restore_like: a pytree with the SAME structure — either concrete arrays
    (their shardings are reused, enabling direct-to-device sharded restore)
    or `jax.ShapeDtypeStruct`s with `.sharding` set.
    """
    path = os.path.abspath(path)
    leaves, treedef = jax.tree_util.tree_flatten(restore_like)

    def abstract(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return leaf
        if isinstance(leaf, jax.Array):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                        sharding=leaf.sharding)
        arr = np.asarray(leaf)
        return jax.ShapeDtypeStruct(arr.shape, arr.dtype)

    targets = {f"leaf_{i}": abstract(l) for i, l in enumerate(leaves)
               if _size(l) > 0}
    # Plain abstract targets alone don't carry shardings into orbax's
    # restore; explicit restore_args do (otherwise a ShapeDtypeStruct with
    # .sharding silently restores single-device).
    restore_args = ocp.checkpoint_utils.construct_restore_args(targets)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, targets, restore_args=restore_args)
    # Zero-size leaves were not serialized; take them from the template.
    new_leaves = [restored.get(f"leaf_{i}", leaf)
                  for i, leaf in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class CheckpointManager:
    """Step-numbered checkpoint rotation (keep the latest `max_to_keep`).

    A thin, dependency-light manager for training loops:

        mgr = CheckpointManager(dir, max_to_keep=3)
        mgr.save(step, model)
        model = mgr.restore_latest(restore_like=model_template)
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)

    def _steps(self):
        out = []
        for name in os.listdir(self.directory):
            if name.isdigit():
                out.append(int(name))
        return sorted(out)

    def save(self, step: int, tree) -> str:
        p = save_checkpoint(self.directory, tree, step=step)
        steps = self._steps()
        while len(steps) > self.max_to_keep:
            victim = steps.pop(0)
            vpath = os.path.join(self.directory, str(victim))
            import shutil
            shutil.rmtree(vpath, ignore_errors=True)
        return p

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, step: int, restore_like):
        return restore_checkpoint(os.path.join(self.directory, str(step)),
                                  restore_like)

    def restore_latest(self, restore_like):
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, restore_like)
