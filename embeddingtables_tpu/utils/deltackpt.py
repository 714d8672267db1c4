"""Incremental (delta) checkpointing: save only the rows touched since the
last checkpoint.

At production scale the tables ARE the model (a 26x10M-row D=128 f32
ensemble is 133 GB) while a training interval touches a tiny, skewed
fraction of rows (Zipf(1.1): 383K unique of 1.7M occurrences per 64Ki
batch, docs/DESIGN.md §1b). A full-table checkpoint every few minutes
writes gigabytes of rows that have not changed since the last one. The
incremental discipline — the sparse-update analog of log-structured
checkpointing — is:

  - a FULL base checkpoint every `base_every` saves (orbax, sharded,
    via `utils.checkpoint.save_checkpoint`);
  - in between, a DELTA: the touched global row ids, their current values,
    and the matching rows of every row-wise optimizer-state leaf —
    gathered on device in one `take` per leaf (exactly the forward-path
    gather primitive, docs/DESIGN.md §1c) and written as one .npz.

Restore = restore the base, then `at[rows].set(vals)` each delta in step
order. Row-exactness is free: gather and scatter of whole rows are
bit-preserving, so a restored state is BITWISE the live state (tested).

Which rows were touched is known on the HOST for free: the training loops
already hold every batch's categorical indices before feeding the device
(the same stream `utils.rowstats.FrequencyTracker` consumes), and the lazy
sparse update touches exactly the looked-up rows (SURVEY.md §2.4 item 5:
the cotangent is `(delta, indices)`). `TouchedRowTracker.observe` is a
vectorized boolean-mask write, zero device work.

Placement-agnostic by construction: deltas are keyed by GLOBAL row id, so
a delta saved from an 8-device mod-sharded run restores onto a 4-device
mesh, a single chip, or the host — the scatter runs under whatever
sharding the restore target carries (elastic resharding; the base restore
already does this through orbax's `restore_like`). The reference has no
checkpointing at all (SURVEY.md §5).

Optimizer-state convention (matches `optim.py`): a state leaf with leading
dimension == vocab (AdaGrad `(V,)` accum, Adam `(V, D)` moments, FTRL
`(V, D)` z/n) is row-sliced; anything else (Adam's scalar `count`,
zero-size SGD placeholders) is small and saved whole in every delta.
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import restore_checkpoint, save_checkpoint


class TouchedRowTracker:
    """Host-side record of which global rows were touched since `clear()`.

    Feed it the same host-side index batches the input pipeline already
    holds (before device transfer). For a `StackedTables` ensemble pass
    the per-table `(T, B[, bag])` categorical batch plus the stacked
    `offsets` and the tracker shifts to global stacked row ids itself.
    """

    def __init__(self, vocab: int):
        self.vocab = int(vocab)
        self._mask = np.zeros(self.vocab, dtype=bool)

    def observe(self, indices) -> None:
        """Mark global row ids (any shape) as touched."""
        idx = np.asarray(indices).ravel()
        if idx.size:
            self._mask[idx] = True

    def observe_batch(self, cat, offsets: Sequence[int],
                      pad_idx: Optional[int] = None) -> None:
        """Mark a `(T, B[, bag])` per-table batch, shifting table t's ids by
        `offsets[t]` (the `StackedTables.offsets` convention). `pad_idx`
        entries (variable-length-bag sentinels) are not real rows."""
        cat = np.asarray(cat)
        offs = np.asarray(offsets[:cat.shape[0]], dtype=cat.dtype)
        flat = (cat + offs.reshape((-1,) + (1,) * (cat.ndim - 1))).ravel()
        if pad_idx is not None:
            flat = flat[cat.ravel() != pad_idx]
        if flat.size:
            self._mask[flat] = True

    def rows(self) -> np.ndarray:
        """Touched global row ids, ascending, int32."""
        return np.nonzero(self._mask)[0].astype(np.int32)

    def count(self) -> int:
        return int(self._mask.sum())

    def clear(self) -> None:
        self._mask[:] = False


class FlatRowLayout:
    """Canonical `(V, ...)` global-row layout: global row r is leaf[r]."""

    def __init__(self, vocab: int):
        self.vocab = int(vocab)

    def is_rowwise(self, leaf) -> bool:
        shape = getattr(leaf, "shape", ())
        return len(shape) >= 1 and shape[0] == self.vocab and self.vocab > 0

    def take(self, leaf, rows):
        return jnp.take(leaf, rows, axis=0)

    def set(self, leaf, rows, vals):
        return leaf.at[rows].set(vals)


class ModRowLayout:
    """The mod-sharded `(n_shards, rows_per_shard, ...)` layout of
    `parallel.sharded.ShardedStackedTables`: global row r lives at
    `leaf[r % n, r // n]` (docs/DESIGN.md §3). Gather/scatter of global
    rows is one advanced-index op; under jit on a mesh-sharded array XLA
    inserts the collectives."""

    def __init__(self, n_shards: int, rows_per_shard: int):
        self.n = int(n_shards)
        self.rps = int(rows_per_shard)

    @classmethod
    def for_tables(cls, sharded_tables) -> "ModRowLayout":
        return cls(sharded_tables.data.shape[0],
                   sharded_tables.data.shape[1])

    def is_rowwise(self, leaf) -> bool:
        shape = getattr(leaf, "shape", ())
        return len(shape) >= 2 and shape[0] == self.n and shape[1] == self.rps

    def take(self, leaf, rows):
        return leaf[rows % self.n, rows // self.n]

    def set(self, leaf, rows, vals):
        return leaf.at[rows % self.n, rows // self.n].set(vals)


def snapshot_delta(data: jax.Array, state, rows: np.ndarray,
                   layout=None) -> dict:
    """Gather the touched rows of `data` and of every row-wise state leaf
    onto the host. One device gather per leaf; O(rows), never O(vocab).
    `layout` defaults to the flat `(V, ...)` convention; pass a
    `ModRowLayout` for mod-sharded arrays."""
    layout = layout or FlatRowLayout(data.shape[0])
    rows = np.asarray(rows, dtype=np.int32)
    rows_j = jnp.asarray(rows)
    out = {"rows": rows, "vals": np.asarray(layout.take(data, rows_j))}
    leaves = jax.tree_util.tree_leaves(state)
    for i, leaf in enumerate(leaves):
        if layout.is_rowwise(leaf):
            out[f"srow_{i}"] = np.asarray(layout.take(leaf, rows_j))
        else:
            out[f"sfull_{i}"] = np.asarray(leaf)
    return out


def apply_delta(data: jax.Array, state, delta: dict, layout=None):
    """Scatter a `snapshot_delta` dict back into `(data, state)`. Whole-row
    set (not add): the delta holds the rows' full post-update values.
    `layout` must describe the TARGET arrays (flat and mod layouts
    interoperate: deltas are keyed by global row id)."""
    layout = layout or FlatRowLayout(data.shape[0])
    rows = jnp.asarray(delta["rows"])
    data = layout.set(data, rows,
                      jnp.asarray(delta["vals"], dtype=data.dtype))
    leaves, treedef = jax.tree_util.tree_flatten(state)
    new = []
    for i, leaf in enumerate(leaves):
        if layout.is_rowwise(leaf):
            vals = jnp.asarray(delta[f"srow_{i}"],
                               dtype=getattr(leaf, "dtype", None))
            new.append(layout.set(leaf, rows, vals))
        elif f"sfull_{i}" in delta:
            full = delta[f"sfull_{i}"]
            arr = jnp.asarray(full, dtype=getattr(leaf, "dtype", None))
            new.append(arr.reshape(getattr(leaf, "shape", arr.shape)))
        else:
            new.append(leaf)  # zero-size placeholder, never serialized
    return data, jax.tree_util.tree_unflatten(treedef, new)


def _layout_meta(layout, data) -> dict:
    """Serializable description of the row layout a base was saved under."""
    if isinstance(layout, ModRowLayout):
        return {"kind": "mod", "n": layout.n, "rps": layout.rps}
    return {"kind": "flat", "vocab": int(data.shape[0])}


def _rows_to_flat(arr: np.ndarray, meta: dict) -> np.ndarray:
    """Re-lay a row-wise leaf from its SAVED layout into the canonical flat
    global-row order (capacity rows; mod capacity = n*rps >= vocab)."""
    if meta["kind"] == "mod":
        n, rps = meta["n"], meta["rps"]
        # flat[k*n + s] = mod[s, k]  (global row r lives at [r % n, r // n])
        return np.moveaxis(arr, 0, 1).reshape((n * rps,) + arr.shape[2:])
    return arr


def _rows_from_flat(flat: np.ndarray, target_layout,
                    target_shape) -> np.ndarray:
    """Re-lay canonical flat global rows into the TARGET layout, padding
    (rows past the saved capacity are table padding, value-irrelevant) or
    trimming as the capacities differ."""
    if isinstance(target_layout, ModRowLayout):
        n, rps = target_layout.n, target_layout.rps
        cap = n * rps
        if flat.shape[0] < cap:
            pad = np.zeros((cap - flat.shape[0],) + flat.shape[1:],
                           dtype=flat.dtype)
            flat = np.concatenate([flat, pad], axis=0)
        else:
            flat = flat[:cap]
        return np.moveaxis(flat.reshape((rps, n) + flat.shape[1:]), 0, 1)
    return flat[:target_shape[0]]


def _atomic_savez(path: str, payload: dict) -> None:
    """Atomic np.savez with ml_dtypes support: numpy serializes bfloat16 /
    float8 arrays as raw void (`|V2`), which np.load hands back uncastable
    (found by the round-5 on-chip CLI resume of a bf16-table run). Encode
    such arrays as unsigned-int views plus a `<key>__mldt` dtype-name
    sidecar; `_load_npz` restores the view."""
    enc = {}
    for k, v in payload.items():
        v = np.asarray(v)
        if v.dtype.kind == "V":
            enc[k] = v.view(f"u{v.dtype.itemsize}")
            enc[k + "__mldt"] = np.str_(v.dtype.name)
        else:
            enc[k] = v
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **enc)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _load_npz(path: str) -> dict:
    """Load an `_atomic_savez` file, restoring ml_dtypes views."""
    with np.load(path) as z:
        raw = {k: z[k] for k in z.files}
    out = {}
    for k, v in raw.items():
        if k.endswith("__mldt"):
            continue
        dt = raw.get(k + "__mldt")
        if dt is not None:
            out[k] = v.view(np.dtype(str(dt)))
        else:
            out[k] = v
    return out


class DeltaCheckpointManager:
    """Base + delta checkpoint rotation for one table array + its
    (row-wise) optimizer state.

        mgr = DeltaCheckpointManager(dir, base_every=8)
        tracker = TouchedRowTracker(stacked.data.shape[0])
        ... per step: tracker.observe_batch(cat_host, stacked.offsets) ...
        mgr.save(step, stacked.data, opt_state, tracker)   # clears tracker
        data, state = mgr.restore_latest(data, opt_state)  # templates

    Layout under `directory`: `base_<step>/` (orbax pytree of
    `(data, state)`) and `delta_<step>.npz`. Every `base_every`-th save is
    a full base; a new base prunes the previous base and its deltas.
    Deltas are written atomically (tmp + rename), so a crash mid-save
    leaves the previous chain restorable.
    """

    def __init__(self, directory: str, base_every: int = 8, layout=None):
        if base_every < 1:
            raise ValueError("base_every must be >= 1")
        self.directory = os.path.abspath(directory)
        self.base_every = base_every
        self.layout = layout  # None = flat (V, ...); ModRowLayout for sharded
        os.makedirs(self.directory, exist_ok=True)
        self._since_base = self._count_since_latest_base()

    def force_base(self) -> None:
        """Make the NEXT save a full base checkpoint. Call after any event
        that invalidates the delta chain's premise that the live state =
        last checkpoint + touched rows — e.g. a DivergenceGuard rollback
        (the live model jumped to an older snapshot, so rows that differ
        from the last save are no longer knowable from the tracker)."""
        self._since_base = self.base_every

    # -- directory scan helpers -------------------------------------------
    def _bases(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("base_") and name[5:].isdigit():
                out.append(int(name[5:]))
        return sorted(out)

    def _deltas(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("delta_") and name.endswith(".npz"):
                mid = name[6:-4]
                if mid.isdigit():
                    out.append(int(mid))
        return sorted(out)

    def _count_since_latest_base(self) -> int:
        bases = self._bases()
        if not bases:
            return 0
        return sum(1 for d in self._deltas() if d > bases[-1])

    def latest_step(self) -> Optional[int]:
        bases, deltas = self._bases(), self._deltas()
        steps = bases + [d for d in deltas if bases and d > bases[-1]]
        return max(steps) if steps else None

    # -- save / restore ----------------------------------------------------
    def save(self, step: int, data: jax.Array, state,
             tracker: TouchedRowTracker) -> str:
        """Save a checkpoint at `step`; consumes (clears) the tracker."""
        bases = self._bases()
        if not bases or self._since_base >= self.base_every - 1:
            path = save_checkpoint(
                os.path.join(self.directory, f"base_{step}"), (data, state))
            # Record the layout the base's row-wise leaves are laid out in,
            # so a restore into a DIFFERENT placement can convert them
            # (deltas are global-row-keyed and need no conversion).
            with open(os.path.join(self.directory,
                                   f"rowlayout_{step}.json"), "w") as f:
                json.dump(_layout_meta(self.layout, data), f)
            # A committed new base supersedes the old chain — delete ALL
            # deltas, including any with d > step: a directory reused by a
            # run whose step counter restarted would otherwise replay stale
            # deltas from the previous run onto the new base.
            for b in bases:
                shutil.rmtree(os.path.join(self.directory, f"base_{b}"),
                              ignore_errors=True)
                try:
                    os.unlink(os.path.join(self.directory,
                                           f"rowlayout_{b}.json"))
                except FileNotFoundError:
                    pass
            for d in self._deltas():
                os.unlink(os.path.join(self.directory, f"delta_{d}.npz"))
            self._since_base = 0
        else:
            payload = snapshot_delta(data, state, tracker.rows(),
                                     layout=self.layout)
            path = os.path.join(self.directory, f"delta_{step}.npz")
            _atomic_savez(path, payload)
            self._since_base += 1
        tracker.clear()
        return path

    def _saved_meta(self, base: int) -> Optional[dict]:
        p = os.path.join(self.directory, f"rowlayout_{base}.json")
        if not os.path.exists(p):
            return None  # pre-sidecar chain: assume same layout as target
        with open(p) as f:
            return json.load(f)

    def restore_latest(self, data_like, state_like):
        """Restore the newest `(data, state)`: base restore (orbax,
        sharding-aware via the templates) + delta replay in step order.
        Returns None if the directory holds no committed base.

        Placement-agnostic across the BASE too: if the base was saved under
        a different row layout than the target templates (mod-sharded save
        restored onto a single chip, or onto a mesh with a different shard
        count), the row-wise leaves are restored host-side in the saved
        layout, re-laid by global row id, and device_put under the target's
        shardings."""
        bases = self._bases()
        if not bases:
            return None
        base = bases[-1]
        target_layout = self.layout or FlatRowLayout(data_like.shape[0])
        saved = self._saved_meta(base)
        target_meta = _layout_meta(self.layout, data_like)
        if saved is None or \
                {k: saved[k] for k in ("kind", "n", "rps") if k in saved} == \
                {k: target_meta[k] for k in ("kind", "n", "rps")
                 if k in target_meta}:
            # Same layout: direct (possibly sharded, direct-to-device).
            data, state = restore_checkpoint(
                os.path.join(self.directory, f"base_{base}"),
                (data_like, state_like))
        else:
            data, state = self._restore_base_converted(
                base, saved, target_layout, data_like, state_like)
        for d in self._deltas():
            if d > base:
                delta = _load_npz(os.path.join(self.directory,
                                               f"delta_{d}.npz"))
                data, state = apply_delta(data, state, delta,
                                          layout=self.layout)
        return data, state

    def _restore_base_converted(self, base: int, saved: dict, target_layout,
                                data_like, state_like):
        """Cross-layout base restore: read row-wise leaves host-side in the
        SAVED layout's shapes, convert to the target layout by global row
        id, and place them under the target leaves' shardings."""
        mod_target = isinstance(target_layout, ModRowLayout)

        def saved_template(leaf):
            shape = tuple(getattr(leaf, "shape", np.asarray(leaf).shape))
            dtype = getattr(leaf, "dtype", None) or np.asarray(leaf).dtype
            if target_layout.is_rowwise(leaf):
                rest = shape[2:] if mod_target else shape[1:]
                if saved["kind"] == "mod":
                    sshape = (saved["n"], saved["rps"]) + tuple(rest)
                else:
                    sshape = (saved["vocab"],) + tuple(rest)
                return jax.ShapeDtypeStruct(sshape, dtype)
            return jax.ShapeDtypeStruct(shape, dtype)  # saved whole

        templates = jax.tree_util.tree_map(saved_template,
                                           (data_like, state_like))
        raw_data, raw_state = restore_checkpoint(
            os.path.join(self.directory, f"base_{base}"), templates)

        def place(converted, like):
            sharding = getattr(like, "sharding", None)
            if sharding is not None:
                return jax.device_put(converted, sharding)
            return jnp.asarray(converted)

        def convert(raw, like):
            shape = tuple(getattr(like, "shape", np.asarray(like).shape))
            if int(np.prod(shape, dtype=np.int64)) == 0:
                return like  # zero-size placeholder, never serialized
            if target_layout.is_rowwise(like):
                flat = _rows_to_flat(np.asarray(raw), saved)
                out = _rows_from_flat(flat, target_layout,
                                      tuple(like.shape))
            else:
                out = np.asarray(raw)
            return place(out, like)

        data = convert(raw_data, data_like)
        state = jax.tree_util.tree_map(convert, raw_state, state_like)
        return data, state


def load_base_data(directory: str, base: int, like) -> jax.Array:
    """Read ONLY the table array from a base checkpoint (leaf 0 of the
    `(data, state)` pytree — orbax fetches just the requested param), and
    re-lay it into `like`'s flat row layout when the base was saved under
    a different one (rowlayout sidecar). Serving-side primitive: no
    optimizer-state template needed."""
    from .checkpoint import ocp  # same orbax import the saver used
    meta_p = os.path.join(directory, f"rowlayout_{base}.json")
    meta = None
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            meta = json.load(f)
    rest = tuple(like.shape[1:])
    if meta is not None and meta["kind"] == "mod":
        sshape = (meta["n"], meta["rps"]) + rest
    elif meta is not None:
        sshape = (meta["vocab"],) + rest
    else:
        sshape = tuple(like.shape)
    tmpl = {"leaf_0": jax.ShapeDtypeStruct(sshape, like.dtype)}
    restore_args = ocp.checkpoint_utils.construct_restore_args(tmpl)
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(
            os.path.join(directory, f"base_{base}"),
            args=ocp.args.PyTreeRestore(
                item=tmpl, restore_args=restore_args,
                partial_restore=True))["leaf_0"]
    if meta is not None and meta["kind"] == "mod":
        flat = _rows_to_flat(np.asarray(raw), meta)
        return jnp.asarray(flat[:like.shape[0]])
    return jnp.asarray(np.asarray(raw)[:like.shape[0]])


class DeltaFollower:
    """Online model refresh: follow a trainer's delta-checkpoint chain and
    keep a LIVE serving table in sync — the parameter-server "pull"
    realized as incremental file sync. Each `poll()`:

      - a new base -> one partial read of the table leaf (layout-converted
        if the trainer runs sharded and serving is single-chip);
      - new deltas -> `data.at[rows].set(vals)` per file, O(touched rows)
        on device — the whole point: a refresh interval costs the rows it
        changed, not the table.

    Optimizer-state payloads in the chain are ignored (serving doesn't
    carry state). Dense towers are NOT in the chain — pair with a full
    `CheckpointManager` at base cadence if towers must refresh too.
    Robust to the trainer pruning mid-poll (a committing base deletes
    deltas): missing files are skipped and the next poll resyncs.
    """

    def __init__(self, directory: str, data: jax.Array):
        self.directory = os.path.abspath(directory)
        self.data = data
        self._base: Optional[int] = None
        self._last: int = -1

    def _scan(self):
        bases, deltas = [], []
        try:
            for name in os.listdir(self.directory):
                if name.startswith("base_") and name[5:].isdigit():
                    bases.append(int(name[5:]))
                elif name.startswith("delta_") and name.endswith(".npz") \
                        and name[6:-4].isdigit():
                    deltas.append(int(name[6:-4]))
        except FileNotFoundError:
            pass
        return sorted(bases), sorted(deltas)

    def poll(self) -> int:
        """Apply anything new; returns the number of snapshots applied."""
        bases, deltas = self._scan()
        applied = 0
        if bases and bases[-1] != self._base:
            try:
                self.data = load_base_data(self.directory, bases[-1],
                                           self.data)
            except FileNotFoundError:
                return applied          # pruned mid-poll; next poll resyncs
            self._base = bases[-1]
            self._last = bases[-1]
            applied += 1
        if self._base is None:
            return applied
        for d in deltas:
            if d <= self._last:
                continue
            try:
                z = _load_npz(os.path.join(self.directory,
                                           f"delta_{d}.npz"))
                rows = jnp.asarray(z["rows"])
                vals = jnp.asarray(z["vals"], dtype=self.data.dtype)
            except FileNotFoundError:
                continue                # pruned by a concurrent base commit
            self.data = self.data.at[rows].set(vals)
            self._last = d
            applied += 1
        return applied
