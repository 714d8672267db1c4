"""Auto-sharding planner: per-table placement over the mesh.

The reference leaves placement to the caller (`SplitEmbedding`'s `array=`
kwarg is its only memory-placement hook, `/root/reference/src/split.jl:29-46`).
At pod scale placement is a real decision with a real cost model, so this
module makes it a first-class, *testable* component (the role TorchRec's
sharding planner plays in that stack), TPU-first:

  - **replicate** — the table lives whole on every device (`P()`).
    Lookup against a batch-sharded index stream is then a LOCAL gather:
    zero ICI traffic. Cost: `(n-1)/n × table_bytes` of redundant HBM, and
    the update must apply the full global occurrence stream on every
    replica (redundant FLOPs, but tiny for small tables).
  - **row_shard** — mod-row-sharded over the axis (`sharded.py`). HBM cost
    `1/n × table_bytes` per device; lookup pays the exchange: an index
    all-gather (4 B/occurrence) plus a `(B, D)` psum_scatter of partial
    rows; the update all-gathers `(delta, indices)`.

The planner's rule follows directly: replicate while it's cheap (small
tables — the exchange traffic saved per HBM byte spent is highest there),
row-shard the big vocabularies, and verify the whole plan (tables +
optimizer state) fits the per-device HBM budget. Placement is by table;
each group is stacked so the planned ensemble still does ONE local gather
per group (`StackedTables` discipline, ops/ensemble.py).

`PlannedTables` + `planned_lookup` + `planned_apply` execute a plan: the
replicated group at the jnp level (GSPMD keeps replicas in sync — every
device applies the full update stream), the sharded group through the
same `sharded_ensemble_lookup` / `_sharded_sparse_apply` exchange the
model families use. Parity: `tests/test_planner.py` checks mixed-placement
lookups and SGD/AdaGrad updates against single-chip oracles.

Compressed tables (qr/md/tt) are themselves the third placement answer —
their sub-tables are small enough to replicate; use them directly in a
`maplookup` ensemble rather than through the planner (which places dense
`(V, D)` arrays).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ensemble import StackedTables, normalize_indices
from ..ops.sparse_update import SparseEmbeddingUpdate
from ..optim import SparseRowWiseAdaGrad, SparseSGD
from .colshard import (ColShardedStackedTables, col_sharded_lookup,
                       col_sharded_update)
from .dlrm import _sharded_sparse_apply
from .sharded import ShardedStackedTables, _axes_tuple, sharded_ensemble_lookup

REPLICATE = "replicate"
ROW_SHARD = "row_shard"
COL_SHARD = "col_shard"


# ---------------------------------------------------------------------------
# The plan
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PlacementDecision:
    """One table's placement and its cost accounting."""

    name: str
    vocab: int
    dim: int
    placement: str                  # REPLICATE | ROW_SHARD
    table_bytes: int                # full dense size
    bytes_per_device: int           # after placement (incl. shard padding)
    reason: str


@dataclasses.dataclass(frozen=True)
class ShardingPlan:
    decisions: tuple
    n_devices: int
    axis: str | tuple
    opt_state_bytes_per_device: int

    @property
    def replicated(self) -> tuple:
        return tuple(i for i, d in enumerate(self.decisions)
                     if d.placement == REPLICATE)

    @property
    def sharded(self) -> tuple:
        return tuple(i for i, d in enumerate(self.decisions)
                     if d.placement == ROW_SHARD)

    @property
    def col_sharded(self) -> tuple:
        return tuple(i for i, d in enumerate(self.decisions)
                     if d.placement == COL_SHARD)

    @property
    def bytes_per_device(self) -> int:
        return (sum(d.bytes_per_device for d in self.decisions)
                + self.opt_state_bytes_per_device)

    def summary(self) -> str:
        lines = [f"sharding plan over {self.n_devices} device(s), "
                 f"axis={self.axis!r}: "
                 f"{len(self.replicated)} replicated, "
                 f"{len(self.sharded)} row-sharded, "
                 f"{len(self.col_sharded)} col-sharded, "
                 f"{self.bytes_per_device / 2**20:.1f} MiB/device "
                 f"(opt state {self.opt_state_bytes_per_device / 2**20:.1f})"]
        for d in self.decisions:
            lines.append(f"  {d.name:<16} V={d.vocab:<10} D={d.dim:<5} "
                         f"{d.placement:<10} "
                         f"{d.bytes_per_device / 2**20:8.2f} MiB/dev  "
                         f"[{d.reason}]")
        return "\n".join(lines)


def plan_sharding(vocab_sizes: Sequence[int], dim: int, mesh: Mesh,
                  axis: str | tuple = "data", *,
                  dtype=jnp.float32, names: Optional[Sequence[str]] = None,
                  hotness: Optional[Sequence[float]] = None,
                  replicate_max_bytes: int = 4 << 20,
                  replicate_budget_bytes: int = 256 << 20,
                  hbm_budget_bytes: Optional[int] = None,
                  opt_state_scalars: int = 0,
                  col_shard: Optional[Sequence[int]] = None,
                  skew: Optional[Sequence[float]] = None,
                  col_shard_skew_threshold: float = 0.05) -> ShardingPlan:
    """Choose a placement for every table.

    Rule (cost model in the module docstring): a table is replicated iff its
    full bytes are ≤ `replicate_max_bytes` AND the running total of
    replicated bytes stays ≤ `replicate_budget_bytes` — tables are admitted
    by descending exchange-traffic-saved per HBM byte spent. `hotness` is
    the per-table expected lookups per example (bag size / multivalency;
    default 1.0 each): a replicated table saves `hotness × (B, D)-row +
    index` exchange traffic, so value density = hotness / table_bytes.
    With uniform hotness this degenerates to smallest-first. Everything
    else is mod-row-sharded over `mesh[axis]`. `opt_state_scalars` = f32
    scalars of optimizer state per row (1 for row-wise AdaGrad, 0 for SGD);
    the state is placed like its table. If `hbm_budget_bytes` is given and
    the final per-device total exceeds it, raises ValueError carrying the
    plan summary.
    """
    axes = _axes_tuple(axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    esize = jnp.dtype(dtype).itemsize
    names = list(names) if names is not None else \
        [f"table_{i}" for i in range(len(vocab_sizes))]
    if len(names) != len(vocab_sizes):
        raise ValueError("names/vocab_sizes length mismatch")
    if hotness is not None and len(hotness) != len(vocab_sizes):
        raise ValueError("hotness/vocab_sizes length mismatch")
    hot = list(hotness) if hotness is not None else [1.0] * len(vocab_sizes)

    # Admit by descending value density (hotness per byte) into the
    # replicate budget; ties by smaller vocab for determinism.
    order = sorted(range(len(vocab_sizes)),
                   key=lambda i: (-hot[i] / max(vocab_sizes[i] * dim * esize,
                                                1), vocab_sizes[i]))
    col_set = set(col_shard or ())
    if skew is not None:
        if len(skew) != len(vocab_sizes):
            raise ValueError("skew/vocab_sizes length mismatch")
        if not isinstance(axis, str):
            raise NotImplementedError(
                "skew-driven col-sharding is single-axis "
                "(parallel/colshard.py)")
    bad = [i for i in col_set if not 0 <= i < len(vocab_sizes)]
    if bad:
        raise ValueError(f"col_shard indices out of range: {bad}")
    if col_set and not isinstance(axis, str):
        raise NotImplementedError(
            "col_shard is single-axis (parallel/colshard.py); use a 1-D "
            "mesh axis or row-shard on multi-axis meshes")
    placement = {}
    repl_total = 0
    for i in order:
        tb = vocab_sizes[i] * dim * esize
        if i in col_set:
            placement[i] = COL_SHARD if n > 1 else REPLICATE
        elif tb <= replicate_max_bytes and repl_total + tb <= \
                replicate_budget_bytes and n > 1:
            placement[i] = REPLICATE
            repl_total += tb
        elif (skew is not None and n > 1
              and skew[i] >= col_shard_skew_threshold):
            # Would row-shard, but the traffic is hot-row concentrated:
            # the column layout spreads it across all devices.
            placement[i] = COL_SHARD
        elif n == 1:
            # Single device: "replicate" and "shard" coincide; keep the
            # whole ensemble in one stacked group.
            placement[i] = REPLICATE
        else:
            placement[i] = ROW_SHARD

    decisions = []
    opt_bytes = 0
    for i, v in enumerate(vocab_sizes):
        tb = v * dim * esize
        if placement[i] == REPLICATE:
            per_dev = tb
            reason = ("single device" if n == 1 else
                      f"small ({tb / 2**20:.2f} MiB <= "
                      f"{replicate_max_bytes / 2**20:.0f} MiB): local gather, "
                      f"zero exchange")
            opt_bytes += v * 4 * opt_state_scalars
        elif placement[i] == COL_SHARD:
            cols_local = -(-dim // n)
            per_dev = v * cols_local * esize
            reason = ((f"col-shard (explicit)" if i in col_set else
                       f"col-shard (skew {skew[i]:.0%} >= "
                       f"{col_shard_skew_threshold:.0%})")
                      + f": feature slice 1/{n}, no index routing — "
                      f"hot-row skew free")
            # Replicated (V,) accumulator: full V scalars per device.
            opt_bytes += v * 4 * opt_state_scalars
        else:
            rows_local = -(-v // n)           # cdiv: mod-shard padding
            per_dev = rows_local * dim * esize
            reason = (f"large: 1/{n} HBM/device, gather exchange "
                      f"(~{4 * 1}B/idx + (B,D) psum_scatter)")
            opt_bytes += (-(-v // n)) * 4 * opt_state_scalars
        decisions.append(PlacementDecision(
            name=names[i], vocab=v, dim=dim, placement=placement[i],
            table_bytes=tb, bytes_per_device=per_dev, reason=reason))

    plan = ShardingPlan(decisions=tuple(decisions), n_devices=n, axis=axis,
                        opt_state_bytes_per_device=opt_bytes)
    if hbm_budget_bytes is not None and \
            plan.bytes_per_device > hbm_budget_bytes:
        raise ValueError(
            f"plan needs {plan.bytes_per_device / 2**20:.1f} MiB/device, "
            f"budget is {hbm_budget_bytes / 2**20:.1f} MiB\n" + plan.summary())
    return plan


# ---------------------------------------------------------------------------
# Executing a plan
# ---------------------------------------------------------------------------

def _offsets(vocabs) -> tuple:
    offs, acc = [0], 0
    for v in vocabs:
        acc += v
        offs.append(acc)
    return tuple(offs)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlannedTables:
    """A plan, realized: replicated group stacked in `repl` (`P()` on every
    device) + row-sharded group in `shard` (mod-row `ShardedStackedTables`).
    Either group may be absent (zero-size placeholder arrays keep the pytree
    structure static). `repl_accum`/`shard_accum` carry row-wise AdaGrad
    state placed like their tables (empty (0,)/(n, 0) arrays for SGD)."""

    repl: jax.Array                 # (ΣV_repl, D) replicated
    shard: Optional[ShardedStackedTables]
    repl_accum: jax.Array           # (ΣV_repl,) f32 or (0,)
    shard_accum: jax.Array          # (n, rows_local) f32 or (n, 0)
    repl_tables: tuple = dataclasses.field(metadata=dict(static=True))
    shard_tables: tuple = dataclasses.field(metadata=dict(static=True))
    repl_offsets: tuple = dataclasses.field(metadata=dict(static=True))
    vocab_sizes: tuple = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))
    # COL_SHARD group (feature-dim sharding, parallel/colshard.py); its
    # row-wise AdaGrad accumulator is REPLICATED (rows span all column
    # shards). Defaults keep older pytrees/callers structure-compatible.
    col: Optional[ColShardedStackedTables] = None
    col_accum: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0,), jnp.float32))
    col_tables: tuple = dataclasses.field(default=(),
                                          metadata=dict(static=True))

    @property
    def ntables(self) -> int:
        return len(self.vocab_sizes)

    def table(self, t: int) -> jax.Array:
        """Dense view of one member table (test oracle only)."""
        if t in self.repl_tables:
            j = self.repl_tables.index(t)
            return self.repl[self.repl_offsets[j]:self.repl_offsets[j + 1]]
        if t in self.col_tables:
            j = self.col_tables.index(t)
            return self.col.table(j)
        j = self.shard_tables.index(t)
        return self.shard.table(j)

    @classmethod
    def init(cls, key: jax.Array, plan: ShardingPlan, mesh: Mesh, *,
             scale: Optional[float] = None, dtype=jnp.float32,
             adagrad: bool = False) -> "PlannedTables":
        """Initialize per the plan. The sharded group is generated directly
        on its shards (`init_sharded` — the full array never materializes);
        the replicated group is generated once and placed `P()`."""
        dim = plan.decisions[0].dim if plan.decisions else 0
        repl_idx = plan.replicated
        shard_idx = plan.sharded
        kr, ks = jax.random.split(key)
        if scale is None:
            scale = 1.0 / (dim ** 0.5) if dim else 1.0

        repl_vocabs = tuple(plan.decisions[i].vocab for i in repl_idx)
        roffs = _offsets(repl_vocabs)
        vr = roffs[-1]
        repl = jnp.zeros((0, dim), dtype)
        if vr:
            def gen(key):
                u = jax.random.uniform(key, (vr, dim), minval=-1.0,
                                       maxval=1.0)
                return (u * scale).astype(dtype)
            repl = jax.jit(gen, out_shardings=NamedSharding(mesh, P()))(kr)

        shard = None
        n = plan.n_devices
        shard_accum = jnp.zeros((n, 0), jnp.float32)
        if shard_idx:
            shard = ShardedStackedTables.init_sharded(
                mesh, plan.axis,
                tuple(plan.decisions[i].vocab for i in shard_idx), dim, ks,
                scale=scale, dtype=dtype)
            if adagrad:
                rows_local = shard.data.shape[1]
                shard_accum = jax.jit(
                    lambda: jnp.zeros((n, rows_local), jnp.float32),
                    out_shardings=NamedSharding(
                        mesh, P(_axes_tuple(plan.axis))))()
            # (the SGD placeholder stays uncommitted: XLA canonicalizes
            # zero-size arrays to a replicated sharding, which would then
            # conflict with the exchange's P(axes) in_spec)
        repl_accum = (jnp.zeros((vr if adagrad else 0,), jnp.float32))
        if adagrad and vr:
            repl_accum = jax.device_put(repl_accum,
                                        NamedSharding(mesh, P()))
        col_idx = plan.col_sharded
        col = None
        vc = sum(plan.decisions[i].vocab for i in col_idx)
        if col_idx:
            kc = jax.random.fold_in(key, 7)
            u = jax.random.uniform(kc, (vc, dim), minval=-1.0, maxval=1.0)
            st_c = StackedTables(
                data=(u * scale).astype(dtype),
                offsets=_offsets(tuple(plan.decisions[i].vocab
                                       for i in col_idx)), dim=dim)
            col = ColShardedStackedTables.shard(mesh, _axes_tuple(
                plan.axis)[0], st_c)
        col_accum = jnp.zeros((vc if (adagrad and col_idx) else 0,),
                              jnp.float32)
        if adagrad and col_idx:
            col_accum = jax.device_put(col_accum, NamedSharding(mesh, P()))
        return cls(repl=repl, shard=shard, repl_accum=repl_accum,
                   shard_accum=shard_accum, repl_tables=repl_idx,
                   shard_tables=shard_idx, repl_offsets=roffs,
                   vocab_sizes=tuple(d.vocab for d in plan.decisions),
                   dim=dim, col=col, col_accum=col_accum,
                   col_tables=col_idx)

    @classmethod
    def from_tables(cls, plan: ShardingPlan, mesh: Mesh,
                    tables: Sequence, *, adagrad: bool = False,
                    accums: Optional[Sequence] = None) -> "PlannedTables":
        """Place existing `(V, D)` arrays (or tables) per the plan.
        `accums`: per-table `(V,)` row-wise-AdaGrad accumulators to place
        alongside their tables (omit for zeros) — resuming a trained model
        onto a plan must carry its optimizer state."""
        from ..tables import as_table
        arrs = []
        for t in tables:
            tt = as_table(t)
            arrs.append(tt.data if hasattr(tt, "data")
                        else tt.rows(jnp.arange(tt.spec.vocab)))
        if accums is not None:
            adagrad = True
            if len(accums) != len(arrs):
                raise ValueError("accums/tables length mismatch")
        dim = arrs[0].shape[1] if arrs else 0
        repl_idx, shard_idx = plan.replicated, plan.sharded
        repl_vocabs = tuple(arrs[i].shape[0] for i in repl_idx)
        roffs = _offsets(repl_vocabs)
        vr = roffs[-1]
        repl = (jnp.concatenate([arrs[i] for i in repl_idx], axis=0)
                if repl_idx else jnp.zeros((0, dim), jnp.float32))
        repl = jax.device_put(repl, NamedSharding(mesh, P()))
        shard = None
        n = plan.n_devices
        shard_accum = jnp.zeros((n, 0), jnp.float32)
        if shard_idx:
            shard = ShardedStackedTables.shard(
                mesh, plan.axis, [arrs[i] for i in shard_idx])
            if adagrad:
                rows_local = shard.data.shape[1]
                if accums is not None:
                    # Mod-shard the stacked shard-group accum like its rows.
                    acc = jnp.concatenate([jnp.asarray(accums[i])
                                           for i in shard_idx])
                    acc = jnp.pad(acc, (0, n * rows_local - acc.shape[0]))
                    acc = acc.reshape(rows_local, n).T
                else:
                    acc = jnp.zeros((n, rows_local), jnp.float32)
                shard_accum = jax.device_put(
                    acc, NamedSharding(mesh, P(_axes_tuple(plan.axis))))
        repl_accum = jnp.zeros((vr if adagrad else 0,), jnp.float32)
        if adagrad and vr:
            if accums is not None:
                repl_accum = jnp.concatenate([jnp.asarray(accums[i])
                                              for i in repl_idx])
            repl_accum = jax.device_put(repl_accum, NamedSharding(mesh, P()))
        col_idx = plan.col_sharded
        col = None
        vc = sum(arrs[i].shape[0] for i in col_idx)
        if col_idx:
            col = ColShardedStackedTables.shard(
                mesh, _axes_tuple(plan.axis)[0],
                StackedTables(
                    data=jnp.concatenate([arrs[i] for i in col_idx], axis=0),
                    offsets=_offsets(tuple(arrs[i].shape[0]
                                           for i in col_idx)), dim=dim))
        col_accum = jnp.zeros((vc if (adagrad and col_idx) else 0,),
                              jnp.float32)
        if adagrad and col_idx:
            if accums is not None:
                col_accum = jnp.concatenate([jnp.asarray(accums[i])
                                             for i in col_idx])
            col_accum = jax.device_put(col_accum, NamedSharding(mesh, P()))
        return cls(repl=repl, shard=shard, repl_accum=repl_accum,
                   shard_accum=shard_accum, repl_tables=repl_idx,
                   shard_tables=shard_idx, repl_offsets=roffs,
                   vocab_sizes=tuple(a.shape[0] for a in arrs), dim=dim,
                   col=col, col_accum=col_accum, col_tables=col_idx)


def planned_lookup(mesh: Mesh, pt: PlannedTables, indices, *,
                   combiner: str = "sum",
                   pad_idx: int | None = None) -> jax.Array:
    """Ensemble lookup under a plan -> `(T, B, dim)` in ORIGINAL table order,
    batch-sharded like the index stream. Replicated group: one local stacked
    gather (zero ICI). Sharded group: the standard gather exchange.

    pad_idx: variable-length-bag sentinel (ops/lookup.py pad contract).
    When set, `combiner` applies INSIDE (mean = over valid entries); when
    None the caller keeps the legacy contract (plain bag sum; divide by
    bag width for the padless mean)."""
    idx_list = normalize_indices(indices, pt.ntables)
    out = [None] * pt.ntables

    if pt.repl_tables:
        if pad_idx is not None:
            # Pad remap precedes the replicated-group offset shift.
            msub = jnp.stack([jnp.asarray(idx_list[t]) != pad_idx
                              for t in pt.repl_tables])
            shifted = jnp.stack(
                [jnp.where(msub[j], jnp.asarray(idx_list[t]), 0)
                 + pt.repl_offsets[j]
                 for j, t in enumerate(pt.repl_tables)])
        else:
            msub = None
            shifted = jnp.stack([idx_list[t] + pt.repl_offsets[j]
                                 for j, t in enumerate(pt.repl_tables)])
        rows = jnp.take(pt.repl, shifted.reshape(-1), axis=0)
        rows = rows.reshape(shifted.shape + (pt.dim,))
        if msub is not None:
            rows = rows * msub[..., None].astype(rows.dtype)
        if shifted.ndim == 3:           # (Tr, B, bag) -> bag sum
            rows = rows.sum(axis=2)
            if msub is not None and combiner == "mean":
                denom = jnp.maximum(msub.sum(axis=2), 1e-12)
                rows = rows / denom[..., None].astype(rows.dtype)
        for j, t in enumerate(pt.repl_tables):
            out[t] = rows[j]

    if pt.shard_tables:
        sub = [idx_list[t] for t in pt.shard_tables]
        if pad_idx is not None:
            so = sharded_ensemble_lookup(mesh, pt.shard, sub, stacked=True,
                                         combiner=combiner, pad_idx=pad_idx)
        else:
            so = sharded_ensemble_lookup(mesh, pt.shard, sub, stacked=True)
        for j, t in enumerate(pt.shard_tables):
            out[t] = so[j]

    if pt.col_tables:
        # Flatten (table, example) into the batch dim — B leads, so the
        # reshape keeps per-device blocks contiguous under P(axis).
        shifted, eff = _col_group_stream(pt, idx_list, combiner, pad_idx)
        b = shifted.shape[1]
        tc = len(pt.col_tables)
        bt = jnp.swapaxes(shifted, 0, 1)             # (B, Tc[, bag])
        flat = bt.reshape((b * tc,) + bt.shape[2:])
        wflat = (None if eff is None else
                 jnp.swapaxes(eff, 0, 1).reshape(flat.shape))
        co = col_sharded_lookup(mesh, pt.col, flat, weights=wflat)
        co = co.reshape(b, tc, pt.dim)
        for j, t in enumerate(pt.col_tables):
            out[t] = co[:, j]

    return jnp.stack(out)


def _col_group_stream(pt: PlannedTables, idx_list, combiner, pad_idx):
    """(shifted (Tc, B[, bag]) ids into the col stack, eff scale or None)
    for the COL_SHARD group: pads remap pre-shift to local row 0 with
    scale 0 (mean-normalized over valid mass when combiner='mean' and
    pads are in play — matching the other groups' contract)."""
    if pad_idx is None:
        shifted = jnp.stack([idx_list[t] + pt.col.offsets[j]
                             for j, t in enumerate(pt.col_tables)])
        return shifted, None
    masks = jnp.stack([jnp.asarray(idx_list[t]) != pad_idx
                       for t in pt.col_tables])
    shifted = jnp.stack(
        [jnp.where(masks[j], jnp.asarray(idx_list[t]), 0)
         + pt.col.offsets[j]
         for j, t in enumerate(pt.col_tables)])
    w = masks.astype(jnp.float32)
    if w.ndim == 3 and combiner == "mean":
        w = w / jnp.maximum(w.sum(axis=2, keepdims=True), 1e-12)
    return shifted, w


def _col_reshard(mesh: Mesh, ct: ColShardedStackedTables, x: jax.Array):
    """Place a per-coordinate `(V_c, D)` state buffer in the col group's
    layout (`(n, V_c, cols_local)` with `P(axis)` — same transform as
    `ColShardedStackedTables.shard`)."""
    n, vc, cl = ct.data.shape
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n * cl - x.shape[1])))
    x = x.reshape(vc, n, cl).transpose(1, 0, 2)
    return jax.device_put(x, NamedSharding(mesh, P(ct.axis)))


def planned_row_state(mesh: Mesh, pt: PlannedTables, sparse_opt, *,
                      state=None, offsets=None):
    """`(repl_accum, shard_accum, col_accum)` for ANY sparse optimizer —
    the planner counterpart of `sharded.init_sharded_row_state` /
    `colshard.init_col_row_state`, covering all three placements at once.

    Fresh state when `state` is None; otherwise `state` is the single-chip
    optimizer state over the ORIGINAL stacked ensemble (`SparseOptState` /
    `SparseAdamState` / `SparseFTRLState`) with per-table row `offsets`,
    and each group receives its tables' slices (the resume path).

    Layouts: AdaGrad keeps the historical raw arrays — replicated `(V_r,)`
    / mod-sharded `(n, rows_local)` / replicated `(V_c,)`. Adam is
    `(m, v, count)` per group (replicated `(V_r, D)` buffers; mod-sharded
    `(n, rows_local, D)`; col-sharded `(n, V_c, cols_local)`); FTRL is
    `(z, n)` likewise. SGD gets the structural placeholders. Groups the
    plan does not use keep their zero-size placeholders regardless."""
    from ..optim import (SparseAdamState, SparseFTRL, SparseFTRLState,
                         SparseLazyAdam, SparseOptState, ftrl_init_arrays)
    from .colshard import init_col_row_state
    from .sharded import shard_adam_state, shard_ftrl_state
    if state is not None:
        want = (SparseAdamState if isinstance(sparse_opt, SparseLazyAdam)
                else SparseFTRLState if isinstance(sparse_opt, SparseFTRL)
                else SparseOptState)
        if not isinstance(state, want):
            # Switching optimizer families on resume needs an explicit
            # state conversion the caller must own — raise loudly instead
            # of an AttributeError deep in the slicing below.
            raise NotImplementedError(
                f"resume state {type(state).__name__} does not match "
                f"{type(sparse_opt).__name__} (expected "
                f"{want.__name__}); re-init the optimizer state or keep "
                f"the optimizer family")
    repl_sh = NamedSharding(mesh, P())
    vr = pt.repl.shape[0]
    vc = pt.col.vocab if pt.col is not None else 0

    def group_cat(x, table_ids):
        """Concatenate one vocab-leading state buffer's per-table slices
        in group order."""
        if not table_ids:
            return x[:0]
        return jnp.concatenate([x[offsets[t]:offsets[t + 1]]
                                for t in table_ids], axis=0)

    if isinstance(sparse_opt, SparseLazyAdam):
        # Every buffer below must be DISTINCT — donated train steps alias
        # each pytree leaf to an output, and two leaves sharing one buffer
        # (e.g. one `count` array referenced by all three groups, or
        # m-is-v zeros) is a donation conflict at execute time.
        def fresh_count():
            return (jnp.array(state.count, jnp.int32) if state is not None
                    else jnp.zeros((), jnp.int32))
        count = fresh_count()
        if state is not None:
            m_r = group_cat(state.m, pt.repl_tables)
            v_r = group_cat(state.v, pt.repl_tables)
        else:
            m_r = jnp.zeros((vr, pt.dim), jnp.float32)
            v_r = jnp.zeros((vr, pt.dim), jnp.float32)
        repl_acc = (jax.device_put(m_r.astype(jnp.float32), repl_sh),
                    jax.device_put(v_r.astype(jnp.float32), repl_sh),
                    count)
        if pt.shard is not None:
            if state is not None:
                shard_acc = shard_adam_state(mesh, pt.shard, SparseAdamState(
                    m=group_cat(state.m, pt.shard_tables),
                    v=group_cat(state.v, pt.shard_tables),
                    count=fresh_count()))
            else:
                from .sharded import init_sharded_adam_state
                shard_acc = init_sharded_adam_state(mesh, pt.shard)
        else:
            shard_acc = pt.shard_accum
        if pt.col is not None:
            if state is not None:
                col_acc = (_col_reshard(mesh, pt.col,
                                        group_cat(state.m, pt.col_tables)),
                           _col_reshard(mesh, pt.col,
                                        group_cat(state.v, pt.col_tables)),
                           fresh_count())
            else:
                col_acc = init_col_row_state(mesh, pt.col, sparse_opt)
        else:
            col_acc = pt.col_accum
        return repl_acc, shard_acc, col_acc

    if isinstance(sparse_opt, SparseFTRL):
        if state is not None:
            z_r = group_cat(state.z, pt.repl_tables)
            n_r = group_cat(state.n, pt.repl_tables)
        elif vr:
            z_r, n_r = ftrl_init_arrays(pt.repl, sparse_opt.lr,
                                        sparse_opt.beta, sparse_opt.l1,
                                        sparse_opt.l2,
                                        sparse_opt.initial_accum)
        else:
            z_r = jnp.zeros((0, pt.dim), jnp.float32)
            n_r = jnp.zeros((0, pt.dim), jnp.float32)
        repl_acc = (jax.device_put(z_r.astype(jnp.float32), repl_sh),
                    jax.device_put(n_r.astype(jnp.float32), repl_sh))
        if pt.shard is not None:
            if state is not None:
                shard_acc = shard_ftrl_state(mesh, pt.shard, SparseFTRLState(
                    z=group_cat(state.z, pt.shard_tables),
                    n=group_cat(state.n, pt.shard_tables)))
            else:
                from .sharded import init_sharded_ftrl_state
                shard_acc = init_sharded_ftrl_state(mesh, pt.shard,
                                                    sparse_opt)
        else:
            shard_acc = pt.shard_accum
        if pt.col is not None:
            if state is not None:
                col_acc = (_col_reshard(mesh, pt.col,
                                        group_cat(state.z, pt.col_tables)),
                           _col_reshard(mesh, pt.col,
                                        group_cat(state.n, pt.col_tables)))
            else:
                col_acc = init_col_row_state(mesh, pt.col, sparse_opt)
        else:
            col_acc = pt.col_accum
        return repl_acc, shard_acc, col_acc

    if isinstance(sparse_opt, SparseRowWiseAdaGrad):
        iv = float(sparse_opt.initial_accum)
        if state is not None and state.accum.size:
            repl_acc = group_cat(state.accum, pt.repl_tables)
        else:
            repl_acc = jnp.full((vr,), iv, jnp.float32)
        repl_acc = jax.device_put(repl_acc.astype(jnp.float32), repl_sh)
        if pt.shard is not None:
            if state is not None and state.accum.size:
                from ..optim import SparseOptState
                from .sharded import shard_row_accum
                shard_acc = shard_row_accum(
                    mesh, pt.shard.axes, pt.shard,
                    SparseOptState(accum=group_cat(state.accum,
                                                   pt.shard_tables)),
                    sparse_opt)
            else:
                from .sharded import init_sharded_row_state
                shard_acc = init_sharded_row_state(mesh, pt.shard,
                                                   sparse_opt)
        else:
            shard_acc = pt.shard_accum
        if pt.col is not None:
            if state is not None and state.accum.size:
                col_acc = group_cat(state.accum, pt.col_tables)
            else:
                col_acc = jnp.full((vc,), iv, jnp.float32)
            col_acc = jax.device_put(col_acc.astype(jnp.float32), repl_sh)
        else:
            col_acc = pt.col_accum
        return repl_acc, shard_acc, col_acc

    # Stateless SGD: the structural placeholders.
    return (jnp.zeros((0,), jnp.float32), pt.shard_accum,
            jnp.zeros((0,), jnp.float32))


def planned_apply(mesh: Mesh, pt: PlannedTables, indices,
                  delta_t: jax.Array, sparse_opt, *,
                  combiner: str = "sum",
                  pad_idx: int | None = None, lr=None,
                  key=None) -> PlannedTables:
    """Apply the lazy ensemble update `(delta_t (T, B, dim), indices)` per
    the plan, advancing optimizer state (AdaGrad accumulators, Adam
    moments, FTRL z/n — `planned_row_state`'s layouts) where present.

    Sharded group: `_sharded_sparse_apply` (all-gather the occurrence
    stream, disjoint-ownership scatter — one write per owned row).
    Replicated group: every replica applies the FULL stream through the
    same dense-grad bodies (optim.py), so replicas remain bit-identical
    without a parameter all-reduce.

    pad_idx: variable-length-bag sentinel. Pads remap to each group's row 0
    pre-shift carrying an effective weight of 0 (mean-normalized over the
    valid bag mass with combiner='mean'), so they never touch table rows
    or optimizer state; without pad_idx, combiner is the caller's problem
    (legacy contract: deltas pre-scaled by 1/bag for mean)."""
    from ..optim import SparseFTRL, SparseLazyAdam
    if not isinstance(sparse_opt, (SparseSGD, SparseRowWiseAdaGrad,
                                   SparseLazyAdam, SparseFTRL)):
        raise NotImplementedError(
            f"planned_apply supports SparseSGD / SparseRowWiseAdaGrad / "
            f"SparseLazyAdam / SparseFTRL, got "
            f"{type(sparse_opt).__name__}")
    use_sr = bool(getattr(sparse_opt, "stochastic_rounding", False))
    if use_sr and key is None:
        raise ValueError(
            "sparse_opt.stochastic_rounding=True: pass a fresh PRNG key "
            "per step (the train loops fold one in automatically)")
    rk_repl = jax.random.fold_in(key, 0) if use_sr else None
    rk_shard = jax.random.fold_in(key, 1) if use_sr else None
    rk_col = jax.random.fold_in(key, 2) if use_sr else None
    if lr is not None and isinstance(sparse_opt, SparseFTRL):
        raise ValueError(
            "SparseFTRL cannot change lr per step: alpha is baked into "
            "the accumulated z state")
    lr_val = sparse_opt.lr if lr is None else lr
    adagrad = isinstance(sparse_opt, SparseRowWiseAdaGrad)
    adam = isinstance(sparse_opt, SparseLazyAdam)
    ftrl = isinstance(sparse_opt, SparseFTRL)
    idx_list = normalize_indices(indices, pt.ntables)
    # Keep the ORIGINAL stream for _col_group_stream (it detects pads
    # itself; handing it the remapped ids would erase the mask — the
    # remapped-to-0 entries are indistinguishable from real row-0 hits).
    orig_idx_list = idx_list
    masks = None
    if pad_idx is not None:
        masks = [jnp.asarray(idx_list[t]) != pad_idx
                 for t in range(pt.ntables)]
        idx_list = [jnp.where(masks[t], jnp.asarray(idx_list[t]), 0)
                    for t in range(pt.ntables)]

    def eff_scale(table_ids):
        """(Tg, B[, bag]) effective per-occurrence weights for a group."""
        if masks is None:
            return None
        w = jnp.stack([masks[t] for t in table_ids]).astype(jnp.float32)
        if w.ndim == 3 and combiner == "mean":
            w = w / jnp.maximum(w.sum(axis=2, keepdims=True), 1e-12)
        return w

    new_repl, new_repl_acc = pt.repl, pt.repl_accum
    new_shard, new_shard_acc = pt.shard, pt.shard_accum

    if pt.repl_tables:
        shifted = jnp.stack([idx_list[t] + pt.repl_offsets[j]
                             for j, t in enumerate(pt.repl_tables)])
        dsub = jnp.stack([delta_t[t] for t in pt.repl_tables])
        g = dsub.reshape(-1, pt.dim).astype(jnp.float32)
        if shifted.ndim == 3:
            rows = shifted.reshape(-1).astype(jnp.int32)
            g = jnp.repeat(g, shifted.shape[2], axis=0)
        else:
            rows = shifted.reshape(-1).astype(jnp.int32)
        scale = eff_scale(pt.repl_tables)
        if scale is not None:
            g = g * scale.reshape(-1)[:, None]
        if adagrad:
            from ..optim import adagrad_dense_body
            new_repl, new_repl_acc = adagrad_dense_body(
                pt.repl, pt.repl_accum, rows, g, lr_val,
                sparse_opt.eps, sparse_opt.weight_decay,
                sparse_opt.clipnorm, rounding_key=rk_repl,
                grad_dtype=getattr(sparse_opt, "dense_grad_dtype", None))
        elif adam:
            from ..optim import adam_dense_body
            m_r, v_r, count = pt.repl_accum
            t_next = count + 1
            new_repl, new_m, new_v = adam_dense_body(
                pt.repl, m_r, v_r, t_next, rows, g, lr_val,
                sparse_opt.b1, sparse_opt.b2, sparse_opt.eps,
                sparse_opt.weight_decay, sparse_opt.clipnorm,
                rounding_key=rk_repl,
                grad_dtype=getattr(sparse_opt, "dense_grad_dtype", None))
            new_repl_acc = (new_m, new_v, t_next)
        elif ftrl:
            from ..optim import ftrl_dense_body
            z_r, n_r = pt.repl_accum
            new_repl, new_z, new_n = ftrl_dense_body(
                pt.repl, z_r, n_r, rows, g, sparse_opt.lr, sparse_opt.beta,
                sparse_opt.l1, sparse_opt.l2, sparse_opt.clipnorm,
                grad_dtype=getattr(sparse_opt, "dense_grad_dtype", None))
            new_repl_acc = (new_z, new_n)
        else:
            from ..optim import sgd_dense_body
            new_repl = sgd_dense_body(pt.repl, rows, g, lr_val,
                                      sparse_opt.weight_decay,
                                      sparse_opt.clipnorm,
                                      rounding_key=rk_repl,
                                      grad_dtype=getattr(
                                          sparse_opt, "dense_grad_dtype",
                                          None))

    if pt.shard_tables:
        shifted = jnp.stack(
            [idx_list[t] + pt.shard.offsets[j]
             for j, t in enumerate(pt.shard_tables)])
        dsub = jnp.stack([delta_t[t] for t in pt.shard_tables])
        new_shard, new_shard_acc = _sharded_sparse_apply(
            mesh, pt.shard, pt.shard_accum, shifted, dsub, sparse_opt,
            scale_t=eff_scale(pt.shard_tables), lr=lr, key=rk_shard)

    new_col, new_col_acc = pt.col, pt.col_accum
    if pt.col_tables:
        # Same (table, example)->batch flattening as the lookup; pads
        # arrive remapped with eff weight 0, so the column scatter adds
        # exact zeros for them. NOTE: stream built from the ORIGINAL ids
        # (the remapped idx_list above would hide the pads).
        shifted, eff = _col_group_stream(pt, orig_idx_list, combiner,
                                         pad_idx)
        b = shifted.shape[1]
        tc = len(pt.col_tables)
        bt = jnp.swapaxes(shifted, 0, 1)
        flat = bt.reshape((b * tc,) + bt.shape[2:])
        dsub = jnp.stack([delta_t[t] for t in pt.col_tables])  # (Tc, B, D)
        dflat = jnp.swapaxes(dsub, 0, 1).reshape(b * tc, pt.dim)
        wflat = (None if eff is None else
                 jnp.swapaxes(eff, 0, 1).reshape(flat.shape))
        upd = SparseEmbeddingUpdate(delta=dflat, indices=flat,
                                    weights=wflat)
        if isinstance(sparse_opt, SparseSGD):
            new_col = col_sharded_update(mesh, pt.col, upd, sparse_opt,
                                         lr=lr, key=rk_col)
        else:
            new_col, new_col_acc = col_sharded_update(
                mesh, pt.col, upd, sparse_opt, pt.col_accum, lr=lr,
                key=rk_col)

    return dataclasses.replace(pt, repl=new_repl, repl_accum=new_repl_acc,
                               shard=new_shard, shard_accum=new_shard_acc,
                               col=new_col, col_accum=new_col_acc)


# ---------------------------------------------------------------------------
# Planner-driven DLRM: the flagship model on a mixed placement
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlannedDLRM:
    """DLRM whose embedding engine is a `PlannedTables` (mixed
    replicate/row-shard placement) instead of a uniformly sharded stack."""

    bottom: list
    top: list
    tables: PlannedTables
    config: object = dataclasses.field(metadata=dict(static=True))
    # Replicated optax state for the towers (dense_tx steps).
    dense_opt_state: object = None


def init_planned_dlrm(key: jax.Array, cfg, plan: ShardingPlan, mesh: Mesh,
                      sparse_opt=None, dense_tx=None) -> PlannedDLRM:
    """Initialize directly onto the plan: the sharded group generates
    per-shard (full array never materializes), dense towers replicate."""
    from ..models.dlrm import _init_mlp
    sparse_opt = sparse_opt or SparseSGD()
    kd, ke = jax.random.split(key)
    # adagrad=False: planned_row_state builds ALL optimizer state below
    # (allocating accumulators in init just to replace them wastes HBM).
    pt = PlannedTables.init(ke, plan, mesh,
                            dtype=getattr(cfg, "tables_dtype", cfg.param_dtype))
    ra, sa, ca = planned_row_state(mesh, pt, sparse_opt)
    pt = dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                             col_accum=ca)
    repl = NamedSharding(mesh, P())
    kb, kt = jax.random.split(kd)
    bottom = jax.device_put(
        _init_mlp(kb, (cfg.num_dense,) + cfg.bottom_mlp, cfg.param_dtype),
        repl)
    top = jax.device_put(
        _init_mlp(kt, (cfg.interaction_features,) + cfg.top_mlp,
                  cfg.param_dtype), repl)
    dstate = (jax.device_put(dense_tx.init((bottom, top)), repl)
              if dense_tx is not None else None)
    return PlannedDLRM(bottom=bottom, top=top, tables=pt, config=cfg,
                       dense_opt_state=dstate)


def make_planned_train_step(cfg, mesh: Mesh, sparse_opt=None,
                            dense_lr: float = 0.01, jit: bool = True,
                            dense_tx=None, microbatch=None):
    """`step(model: PlannedDLRM, dense, cat, label) -> (model, loss)` with
    `batch_shardings(mesh, plan.axis)` on the batch arrays. Identical math
    to `make_sharded_train_step` (gather exchange); the embedding engine is
    the plan's mixed placement — every sharding derives from the model's
    own placement (the plan's axis), so there is no separate axis knob.
    microbatch=k: gradient accumulation over k `lax.scan` slices of the
    planned lookup + dense fwd/bwd (`models.microbatch.microbatch_grads`);
    ONE planned_apply on the full-batch delta."""
    from ..models.dlrm import bce_loss, forward_from_embeddings
    sparse_opt = sparse_opt or SparseSGD()
    from .dlrm import _check_sharded_opt
    _check_sharded_opt(sparse_opt, allow_sr=True)

    pad = getattr(cfg, "pad_idx", None)

    def step(model: PlannedDLRM, dense, cat, label, lr=None, key=None):
        params = (model.bottom, model.top)

        def lookup_fn(c):
            e = planned_lookup(mesh, model.tables, c,
                               combiner=cfg.combiner, pad_idx=pad)
            if pad is None and cfg.combiner == "mean" and c.ndim == 3:
                e = e / c.shape[2]
            return e

        if microbatch and microbatch > 1:
            from ..models.microbatch import microbatch_grads

            def slice_grads(d_i, c_i, l_i):
                emb_i = lookup_fn(c_i)

                def loss_fn(dense_params, emb_act):
                    bottom, top = dense_params
                    logits = forward_from_embeddings(bottom, top, cfg,
                                                     d_i, emb_act)
                    return bce_loss(logits, l_i)

                loss_i, (dg_i, delta_i) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(params, emb_i)
                return loss_i, dg_i, (delta_i,)

            loss, dense_grads, (delta_t,) = microbatch_grads(
                params, dense, cat, label, microbatch, slice_grads)
        else:
            emb_t = lookup_fn(cat)

            def loss_fn(dense_params, emb_act):
                bottom, top = dense_params
                logits = forward_from_embeddings(bottom, top, cfg, dense,
                                                 emb_act)
                return bce_loss(logits, label)

            loss, (dense_grads, delta_t) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, emb_t)
        if pad is None and cfg.combiner == "mean" and cat.ndim == 3:
            delta_t = delta_t / cat.shape[2]
        from ..optim import apply_dense_tx
        (new_bottom, new_top), new_dstate = apply_dense_tx(
            params, dense_grads, dense_tx, model.dense_opt_state, dense_lr)
        new_pt = planned_apply(mesh, model.tables, cat, delta_t, sparse_opt,
                               combiner=cfg.combiner, pad_idx=pad, lr=lr,
                               key=key)
        return PlannedDLRM(bottom=new_bottom, top=new_top, tables=new_pt,
                           config=cfg, dense_opt_state=new_dstate), loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_planned_eval_step(cfg, mesh: Mesh, jit: bool = True):
    from ..models.dlrm import forward_from_embeddings

    pad = getattr(cfg, "pad_idx", None)

    def step(model: PlannedDLRM, dense, cat):
        emb_t = planned_lookup(mesh, model.tables, cat,
                               combiner=cfg.combiner, pad_idx=pad)
        if pad is None and cfg.combiner == "mean" and cat.ndim == 3:
            emb_t = emb_t / cat.shape[2]
        return forward_from_embeddings(model.bottom, model.top, cfg, dense,
                                       emb_t)
    if jit:
        step = jax.jit(step)
    return step


# ---------------------------------------------------------------------------
# Mixed feature dimensions: one PlannedTables group per distinct dim
# ---------------------------------------------------------------------------

def plan_sharding_mixed(vocab_sizes: Sequence[int], dims: Sequence[int],
                        mesh: Mesh, axis: str | tuple = "data",
                        **kw) -> tuple:
    """Placement for an ensemble with PER-TABLE feature dims (production
    ensembles mix narrow id features with wide content features; stacking
    requires equal dims, so tables group by dim first). Returns
    `(plans, groups)`: `plans[g]` is the `ShardingPlan` for dim-group `g`,
    `groups[g]` the original table indices it covers (order-preserving
    within a group). Budget/threshold kwargs are shared across groups."""
    if len(dims) != len(vocab_sizes):
        raise ValueError("dims/vocab_sizes length mismatch")
    names = kw.pop("names", None)
    hotness = kw.pop("hotness", None)
    # The budgets are PER DEVICE for the WHOLE ensemble, not per dim-group:
    # run the groups sequentially, shrinking the replicate budget by what
    # earlier groups admitted, and check the HBM budget on the combined
    # total (a per-group check would under-guard by a factor of n_groups).
    hbm_budget = kw.pop("hbm_budget_bytes", None)
    repl_budget = kw.pop("replicate_budget_bytes", 256 << 20)
    order = sorted(set(dims))
    plans, groups = [], []
    for d in order:
        idxs = tuple(i for i, dd in enumerate(dims) if dd == d)
        plan = plan_sharding(
            [vocab_sizes[i] for i in idxs], d, mesh, axis,
            names=None if names is None else [names[i] for i in idxs],
            hotness=None if hotness is None else [hotness[i] for i in idxs],
            replicate_budget_bytes=repl_budget, **kw)
        repl_budget -= sum(dec.table_bytes for dec in plan.decisions
                           if dec.placement == REPLICATE)
        plans.append(plan)
        groups.append(idxs)
    if hbm_budget is not None:
        total = sum(p.bytes_per_device for p in plans)
        if total > hbm_budget:
            raise ValueError(
                f"mixed plan needs {total / 2**20:.1f} MiB/device, budget "
                f"is {hbm_budget / 2**20:.1f} MiB\n"
                + "\n".join(p.summary() for p in plans))
    return tuple(plans), tuple(groups)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MixedDimPlannedTables:
    """An executed mixed-dim plan: one `PlannedTables` per distinct dim.
    Lookup/apply scatter per-table work to the owning group and restore
    original table order; per-table results are LISTS (a (T, B, D) stack
    cannot exist across dims)."""

    groups: tuple                   # tuple[PlannedTables, ...]
    table_map: tuple = dataclasses.field(metadata=dict(static=True))
    # table_map[t] = (group_idx, position_in_group)

    @property
    def ntables(self) -> int:
        return len(self.table_map)

    def table(self, t: int) -> jax.Array:
        g, j = self.table_map[t]
        return self.groups[g].table(j)

    @classmethod
    def from_tables(cls, plans, group_idxs, mesh: Mesh, tables: Sequence,
                    *, adagrad: bool = False,
                    sparse_opt=None) -> "MixedDimPlannedTables":
        """sparse_opt: build each group's optimizer state via
        `planned_row_state` (any optimizer; supersedes the legacy
        `adagrad` flag)."""
        groups = []
        for plan, idxs in zip(plans, group_idxs):
            pt = PlannedTables.from_tables(
                plan, mesh, [tables[i] for i in idxs], adagrad=adagrad)
            if sparse_opt is not None:
                ra, sa, ca = planned_row_state(mesh, pt, sparse_opt)
                pt = dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                                         col_accum=ca)
            groups.append(pt)
        table_map = [None] * sum(len(ix) for ix in group_idxs)
        for g, idxs in enumerate(group_idxs):
            for j, t in enumerate(idxs):
                table_map[t] = (g, j)
        return cls(groups=tuple(groups), table_map=tuple(table_map))

    @classmethod
    def init(cls, key: jax.Array, plans, group_idxs, mesh: Mesh, *,
             dtype=jnp.float32, adagrad: bool = False,
             sparse_opt=None) -> "MixedDimPlannedTables":
        keys = jax.random.split(key, len(plans))
        groups = []
        for k, plan in zip(keys, plans):
            pt = PlannedTables.init(k, plan, mesh, dtype=dtype,
                                    adagrad=adagrad)
            if sparse_opt is not None:
                ra, sa, ca = planned_row_state(mesh, pt, sparse_opt)
                pt = dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                                         col_accum=ca)
            groups.append(pt)
        table_map = [None] * sum(len(ix) for ix in group_idxs)
        for g, idxs in enumerate(group_idxs):
            for j, t in enumerate(idxs):
                table_map[t] = (g, j)
        return cls(groups=tuple(groups), table_map=tuple(table_map))


def mixed_planned_lookup(mesh: Mesh, mt: MixedDimPlannedTables,
                         indices, *, combiner: str = "sum",
                         pad_idx: int | None = None) -> list:
    """Per-table lookup list `[ (B, D_t) ... ]` in original order — the
    `maplookup` contract over a mixed-dim planned placement (combiner /
    pad_idx as in `planned_lookup`)."""
    idx_list = normalize_indices(indices, mt.ntables)
    out = [None] * mt.ntables
    for g, pt in enumerate(mt.groups):
        idxs = [t for t, (gg, _) in enumerate(mt.table_map) if gg == g]
        sub = planned_lookup(mesh, pt, [idx_list[t] for t in idxs],
                             combiner=combiner, pad_idx=pad_idx)
        for j, t in enumerate(idxs):
            out[t] = sub[j]
    return out


def mixed_planned_apply(mesh: Mesh, mt: MixedDimPlannedTables, indices,
                        deltas: Sequence, sparse_opt, *,
                        combiner: str = "sum", pad_idx: int | None = None,
                        key=None) -> MixedDimPlannedTables:
    """Apply per-table lazy deltas (list of (B, D_t)) per the mixed plan."""
    idx_list = normalize_indices(indices, mt.ntables)
    new_groups = list(mt.groups)
    for g, pt in enumerate(mt.groups):
        idxs = [t for t, (gg, _) in enumerate(mt.table_map) if gg == g]
        delta_t = jnp.stack([deltas[t] for t in idxs])
        new_groups[g] = planned_apply(
            mesh, pt, [idx_list[t] for t in idxs], delta_t, sparse_opt,
            combiner=combiner, pad_idx=pad_idx,
            key=(jax.random.fold_in(key, g) if key is not None else None))
    return dataclasses.replace(mt, groups=tuple(new_groups))


# ---------------------------------------------------------------------------
# Planner-driven DCN-v2 (same shape as PlannedDLRM: replicated dense
# cross/deep/head + the plan's mixed table placement)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlannedDCN:
    cross: list
    deep: list
    head: tuple
    tables: PlannedTables
    config: object = dataclasses.field(metadata=dict(static=True))
    # Replicated optax state for the dense parts (dense_tx steps).
    dense_opt_state: object = None


def init_planned_dcn(key: jax.Array, cfg, plan: ShardingPlan, mesh: Mesh,
                     sparse_opt=None, dense_tx=None) -> PlannedDCN:
    from ..models.dcn import init_dense_params
    sparse_opt = sparse_opt or SparseSGD()
    kd, ke = jax.random.split(key)
    # adagrad=False: planned_row_state builds ALL optimizer state below
    # (allocating accumulators in init just to replace them wastes HBM).
    pt = PlannedTables.init(ke, plan, mesh,
                            dtype=getattr(cfg, "tables_dtype", cfg.param_dtype))
    ra, sa, ca = planned_row_state(mesh, pt, sparse_opt)
    pt = dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                             col_accum=ca)
    repl = NamedSharding(mesh, P())
    cross, deep, head = init_dense_params(kd, cfg)
    cross = jax.device_put(cross, repl)
    deep = jax.device_put(deep, repl)
    head = jax.device_put(head, repl)
    dstate = (jax.device_put(dense_tx.init((cross, deep, head)), repl)
              if dense_tx is not None else None)
    return PlannedDCN(cross=cross, deep=deep, head=head, tables=pt,
                      config=cfg, dense_opt_state=dstate)


def make_planned_dcn_train_step(cfg, mesh: Mesh, sparse_opt=None,
                                dense_lr: float = 0.01, jit: bool = True,
                                dense_tx=None, microbatch=None):
    """DCN-v2 train step on a planner placement (cf. the uniform
    `parallel.dcn.make_sharded_dcn_train_step`). microbatch=k: see
    `make_planned_train_step`."""
    from ..models.dcn import forward_from_embeddings
    from ..models.dlrm import bce_loss
    sparse_opt = sparse_opt or SparseSGD()
    from .dlrm import _check_sharded_opt
    _check_sharded_opt(sparse_opt, allow_sr=True)

    pad = getattr(cfg, "pad_idx", None)

    def step(model: PlannedDCN, dense, cat, label, lr=None, key=None):
        params = (model.cross, model.deep, model.head)

        def lookup_fn(c):
            e = planned_lookup(mesh, model.tables, c,
                               combiner=cfg.combiner, pad_idx=pad)
            if pad is None and cfg.combiner == "mean" and c.ndim == 3:
                e = e / c.shape[2]
            return e

        if microbatch and microbatch > 1:
            from ..models.microbatch import microbatch_grads

            def slice_grads(d_i, c_i, l_i):
                emb_i = lookup_fn(c_i)

                def loss_fn(dense_params, emb_act):
                    cross, deep, head = dense_params
                    logits = forward_from_embeddings(cross, deep, head,
                                                     cfg, d_i, emb_act)
                    return bce_loss(logits, l_i)

                loss_i, (dg_i, delta_i) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(params, emb_i)
                return loss_i, dg_i, (delta_i,)

            loss, dense_grads, (delta_t,) = microbatch_grads(
                params, dense, cat, label, microbatch, slice_grads)
        else:
            emb_t = lookup_fn(cat)

            def loss_fn(dense_params, emb_act):
                cross, deep, head = dense_params
                logits = forward_from_embeddings(cross, deep, head, cfg,
                                                 dense, emb_act)
                return bce_loss(logits, label)

            loss, (dense_grads, delta_t) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, emb_t)
        if pad is None and cfg.combiner == "mean" and cat.ndim == 3:
            delta_t = delta_t / cat.shape[2]
        from ..optim import apply_dense_tx
        (new_cross, new_deep, new_head), new_dstate = apply_dense_tx(
            params, dense_grads, dense_tx, model.dense_opt_state, dense_lr)
        new_pt = planned_apply(mesh, model.tables, cat, delta_t, sparse_opt,
                               combiner=cfg.combiner, pad_idx=pad, lr=lr,
                               key=key)
        return PlannedDCN(cross=new_cross, deep=new_deep, head=new_head,
                          tables=new_pt, config=cfg,
                          dense_opt_state=new_dstate), loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_planned_dcn_eval_step(cfg, mesh: Mesh, jit: bool = True):
    from ..models.dcn import forward_from_embeddings

    pad = getattr(cfg, "pad_idx", None)

    def step(model: PlannedDCN, dense, cat):
        emb_t = planned_lookup(mesh, model.tables, cat,
                               combiner=cfg.combiner, pad_idx=pad)
        if pad is None and cfg.combiner == "mean" and cat.ndim == 3:
            emb_t = emb_t / cat.shape[2]
        return forward_from_embeddings(model.cross, model.deep, model.head,
                                       cfg, dense, emb_t)
    if jit:
        step = jax.jit(step)
    return step


# ---------------------------------------------------------------------------
# DeepFM on a plan (round 4 — enabled by the folded first-order layout)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlannedDeepFM:
    """DeepFM whose FUSED (ΣV, D+1) stack (models/deepfm.py `fold_fm_w`)
    rides a `PlannedTables` mixed placement. Only the folded layout is
    supported: the fold is exactly what turns DeepFM into the planner's
    one-stack shape (the legacy two-stack layout would need two plans and
    two exchanges — fold first via `models.deepfm.fuse_deepfm`)."""

    deep: list
    head: tuple
    dense_w: jax.Array
    bias: jax.Array
    tables: PlannedTables           # fused stack, dim = cfg.stack_dim
    config: object = dataclasses.field(metadata=dict(static=True))
    dense_opt_state: object = None


def _require_folded_deepfm(cfg, plan: Optional[ShardingPlan] = None):
    if not getattr(cfg, "folded", False):
        raise ValueError(
            "planner placement supports the folded DeepFM layout only "
            "(fold_fm_w=True with use_fm=True); convert a legacy model "
            "with models.deepfm.fuse_deepfm")
    if plan is not None and plan.decisions and \
            plan.decisions[0].dim != cfg.stack_dim:
        raise ValueError(
            f"plan dim {plan.decisions[0].dim} != cfg.stack_dim "
            f"{cfg.stack_dim} — build the plan with dim=cfg.stack_dim "
            f"(D+1: the fused stack carries the first-order column)")


def _zero_fused_w_column(pt: PlannedTables, mesh: Mesh) -> PlannedTables:
    """Zero column 0 (the first-order weights) of every placement group —
    the standard FM linear-term init, matching `init_deepfm`'s fused
    stack. Shardings are preserved per group (replicated / mod-row
    `(n, rows_local, D+1)` / col-sharded `(n, V, cols_local)` where global
    column 0 is shard 0's local column 0)."""
    def zset(x, idx):
        return jax.jit(lambda a: a.at[idx].set(0.0),
                       out_shardings=x.sharding, donate_argnums=0)(x)

    out = pt
    if pt.repl.shape[0]:
        out = dataclasses.replace(
            out, repl=zset(pt.repl, (slice(None), 0)))
    if pt.shard is not None:
        out = dataclasses.replace(
            out, shard=dataclasses.replace(
                pt.shard, data=zset(pt.shard.data, (Ellipsis, 0))))
    if pt.col is not None:
        out = dataclasses.replace(
            out, col=dataclasses.replace(
                pt.col, data=zset(pt.col.data, (0, slice(None), 0))))
    return out


def init_planned_deepfm(key: jax.Array, cfg, plan: ShardingPlan,
                        mesh: Mesh, sparse_opt=None,
                        dense_tx=None) -> PlannedDeepFM:
    """Initialize directly onto the plan (cf. `init_planned_dlrm`): the
    sharded group generates per-shard, dense parts replicate, and the
    fused stack's column 0 zeroes per the FM convention."""
    from ..models.dlrm import _init_mlp
    _require_folded_deepfm(cfg, plan)
    sparse_opt = sparse_opt or SparseSGD()
    kd, kh, ke = jax.random.split(key, 3)
    # Vector-scale init on the D+1-wide stack, then zero the w column.
    pt = PlannedTables.init(
        ke, plan, mesh, scale=1.0 / (cfg.dim ** 0.5),
        dtype=getattr(cfg, "tables_dtype", cfg.param_dtype))
    pt = _zero_fused_w_column(pt, mesh)
    ra, sa, ca = planned_row_state(mesh, pt, sparse_opt)
    pt = dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                             col_accum=ca)
    repl = NamedSharding(mesh, P())
    if cfg.use_deep:
        deep = _init_mlp(kd, (cfg.deep_features,) + cfg.deep_mlp,
                         cfg.param_dtype)
        head = _init_mlp(kh, (cfg.deep_mlp[-1], 1), cfg.param_dtype)[0]
    else:
        deep = []
        head = (jnp.zeros((1, 1), cfg.param_dtype),
                jnp.zeros((1,), cfg.param_dtype))
    deep = jax.device_put(deep, repl)
    head = jax.device_put(head, repl)
    dense_w = jax.device_put(jnp.zeros((cfg.num_dense,), cfg.param_dtype),
                             repl)
    bias = jax.device_put(jnp.zeros((), cfg.param_dtype), repl)
    dstate = (jax.device_put(dense_tx.init((deep, head, dense_w, bias)),
                             repl) if dense_tx is not None else None)
    return PlannedDeepFM(deep=deep, head=head, dense_w=dense_w, bias=bias,
                         tables=pt, config=cfg, dense_opt_state=dstate)


def make_planned_deepfm_train_step(cfg, mesh: Mesh, sparse_opt=None,
                                   dense_lr: float = 0.01, jit: bool = True,
                                   dense_tx=None, microbatch=None):
    """DeepFM train step on a planner placement: ONE planned lookup feeds
    both activation sets (split_fused), ONE planned_apply carries the
    fused delta (fuse_delta) — the same exchange-count halving the fold
    bought the uniform sharded step (docs/DESIGN.md §9), now on the mixed
    replicate/row-shard/col-shard placement."""
    from ..models.deepfm import (forward_from_embeddings, fuse_delta,
                                 split_fused)
    from ..models.dlrm import bce_loss
    _require_folded_deepfm(cfg)
    sparse_opt = sparse_opt or SparseSGD()
    from .dlrm import _check_sharded_opt
    _check_sharded_opt(sparse_opt, allow_sr=True)

    pad = getattr(cfg, "pad_idx", None)

    def step(model: PlannedDeepFM, dense, cat, label, lr=None, key=None):
        params = (model.deep, model.head, model.dense_w, model.bias)

        def lookup_fn(c):
            g = planned_lookup(mesh, model.tables, c,
                               combiner=cfg.combiner, pad_idx=pad)
            if pad is None and cfg.combiner == "mean" and c.ndim == 3:
                g = g / c.shape[2]
            w_t, emb_t = split_fused(g)
            return emb_t, w_t

        if microbatch and microbatch > 1:
            from ..models.microbatch import microbatch_grads

            def slice_grads(d_i, c_i, l_i):
                emb_i, w_i = lookup_fn(c_i)

                def loss_fn(dense_params, emb_act, w_act):
                    logits = forward_from_embeddings(dense_params, cfg,
                                                     d_i, emb_act, w_act)
                    return bce_loss(logits, l_i)

                loss_i, (dg_i, de_i, dw_i) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2))(params, emb_i, w_i)
                return loss_i, dg_i, (de_i, dw_i)

            loss, dense_grads, (delta_emb, delta_w) = microbatch_grads(
                params, dense, cat, label, microbatch, slice_grads)
        else:
            emb_t, w_t = lookup_fn(cat)

            def loss_fn(dense_params, emb_act, w_act):
                logits = forward_from_embeddings(dense_params, cfg, dense,
                                                 emb_act, w_act)
                return bce_loss(logits, label)

            loss, (dense_grads, delta_emb, delta_w) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(params, emb_t, w_t)
        delta_g = fuse_delta(delta_w, delta_emb)
        if pad is None and cfg.combiner == "mean" and cat.ndim == 3:
            delta_g = delta_g / cat.shape[2]
        from ..optim import apply_dense_tx
        (new_deep, new_head, new_dw, new_bias), new_dstate = apply_dense_tx(
            params, dense_grads, dense_tx, model.dense_opt_state, dense_lr)
        new_pt = planned_apply(mesh, model.tables, cat, delta_g, sparse_opt,
                               combiner=cfg.combiner, pad_idx=pad, lr=lr,
                               key=key)
        return PlannedDeepFM(deep=new_deep, head=new_head, dense_w=new_dw,
                             bias=new_bias, tables=new_pt, config=cfg,
                             dense_opt_state=new_dstate), loss

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def make_planned_deepfm_eval_step(cfg, mesh: Mesh, jit: bool = True):
    from ..models.deepfm import forward_from_embeddings, split_fused
    _require_folded_deepfm(cfg)

    pad = getattr(cfg, "pad_idx", None)

    def step(model: PlannedDeepFM, dense, cat):
        g = planned_lookup(mesh, model.tables, cat,
                           combiner=cfg.combiner, pad_idx=pad)
        if pad is None and cfg.combiner == "mean" and cat.ndim == 3:
            g = g / cat.shape[2]
        w_t, emb_t = split_fused(g)
        return forward_from_embeddings(
            (model.deep, model.head, model.dense_w, model.bias), cfg,
            dense, emb_t, w_t)
    if jit:
        step = jax.jit(step)
    return step


def place_stacked_on_plan(plan: ShardingPlan, mesh: Mesh, stacked,
                          emb_state, sparse_opt) -> PlannedTables:
    """Place a trained `StackedTables` (+ its sparse-optimizer state) onto
    a plan — the shared resume path for `train_dlrm(plan=)` and
    `train_dcn(plan=)` (one copy of the offsets/accum-carry logic)."""
    offs = stacked.offsets
    arrs = [stacked.data[offs[t]:offs[t + 1]] for t in range(len(offs) - 1)]
    pt = PlannedTables.from_tables(plan, mesh, arrs)
    has_state = (emb_state is not None
                 and any(getattr(x, "size", 1)
                         for x in jax.tree_util.tree_leaves(emb_state)))
    ra, sa, ca = planned_row_state(
        mesh, pt, sparse_opt,
        state=emb_state if has_state else None, offsets=offs)
    return dataclasses.replace(pt, repl_accum=ra, shard_accum=sa,
                               col_accum=ca)


def hotness_from_trackers(trackers) -> list:
    """Per-table hotness for `plan_sharding(hotness=)` from observed
    traffic: each table's EMA of occurrences per observation
    (`utils.rowstats.FrequencyTracker`s fed by the input pipeline). Tables
    whose ids appear more often per batch — multivalent features, hot
    categorical fields — earn replication first. Falls back to 1.0 for
    trackers that saw no traffic.

    The tracker's counts are exponentially decayed, so they saturate at
    `occ_per_batch / (1 - decay)`; normalizing by the raw observation
    count would let hotness decay toward zero on long runs (and rank
    BELOW the never-seen fallback). Normalize by the decayed observation
    count `(1 - d^N) / (1 - d)` instead — a true per-observation EMA,
    stable in run length."""
    hot = []
    for tr in trackers:
        n = tr.observations
        if n == 0:
            hot.append(1.0)
            continue
        d = tr.decay
        denom = float(n) if d >= 1.0 else (1.0 - d ** n) / (1.0 - d)
        hot.append(max(float(tr.counts.sum()) / denom, 1e-9))
    return hot


def skew_from_trackers(trackers) -> list:
    """Per-table hot-row concentration for `plan_sharding(skew=)`: the
    share of each table's observed (decayed) traffic landing on its single
    hottest row. 0.0 for tables that saw no traffic (skew unknown — don't
    trigger the col-shard rule on silence)."""
    out = []
    for tr in trackers:
        total = float(tr.counts.sum())
        out.append(float(tr.counts.max()) / total if total > 0 else 0.0)
    return out


def evict_rows_planned(pt: PlannedTables, cold_per_table) -> PlannedTables:
    """TTL eviction on a planned placement: zero the given per-table row
    ids (and their AdaGrad accumulator entries) in whichever group owns
    each table. `cold_per_table`: sequence of host int arrays of LOCAL
    table row ids (same contract as the loop's FrequencyTracker output).
    Functional; eviction is occasional so cross-shard scatter routing cost
    is irrelevant."""
    import numpy as np
    from ..utils.rowstats import evict_rows, evict_rows_sharded

    new = pt
    if pt.repl_tables:
        rows = np.concatenate(
            [np.asarray(cold_per_table[t], np.int64) + pt.repl_offsets[j]
             for j, t in enumerate(pt.repl_tables)])
        if rows.size:
            r = jnp.asarray(rows, jnp.int32)
            repl = evict_rows(pt.repl, r)
            vr = pt.repl.shape[0]

            def _reset_repl(x):
                # Vocab-leading state buffers ((V_r,) accum, (V_r, D)
                # Adam/FTRL) reset at the evicted rows; scalars (Adam
                # count) and placeholders pass through.
                if (hasattr(x, "ndim") and x.ndim >= 1
                        and x.shape[0] == vr and vr):
                    return x.at[r].set(0.0, mode="drop")
                return x

            acc = jax.tree_util.tree_map(_reset_repl, pt.repl_accum)
            new = dataclasses.replace(new, repl=repl, repl_accum=acc)
    if pt.shard_tables:
        rows = np.concatenate(
            [np.asarray(cold_per_table[t], np.int64) + pt.shard.offsets[j]
             for j, t in enumerate(pt.shard_tables)])
        if rows.size:
            shard, acc = evict_rows_sharded(pt.shard, pt.shard_accum,
                                            rows)
            new = dataclasses.replace(new, shard=shard, shard_accum=acc)
    if pt.col_tables:
        rows = np.concatenate(
            [np.asarray(cold_per_table[t], np.int64) + pt.col.offsets[j]
             for j, t in enumerate(pt.col_tables)])
        if rows.size:
            r = jnp.asarray(rows, jnp.int32)
            # Zero the evicted rows across every column shard (+ their
            # optimizer-state entries).
            cdata = pt.col.data.at[:, r, :].set(0.0, mode="drop")
            vc = pt.col.vocab
            nsh = pt.col.n_shards

            def _reset_col(x):
                # (V_c,) replicated accum, or (n, V_c, cols_local)
                # col-sharded Adam/FTRL buffers; scalars pass through.
                if not hasattr(x, "ndim"):
                    return x
                if x.ndim == 1 and x.shape[0] == vc and vc:
                    return x.at[r].set(0.0, mode="drop")
                if (x.ndim == 3 and x.shape[0] == nsh
                        and x.shape[1] == vc and vc):
                    return x.at[:, r, :].set(0.0, mode="drop")
                return x

            cacc = jax.tree_util.tree_map(_reset_col, pt.col_accum)
            new = dataclasses.replace(
                new, col=dataclasses.replace(pt.col, data=cdata),
                col_accum=cacc)
    return new


# ---------------------------------------------------------------------------
# Two-tower retrieval on the planner (round 5)
# ---------------------------------------------------------------------------
# Uniform table treatment: the reference gives every table the same API
# surface (`/root/reference/src/EmbeddingTables.jl:49-156`); here the
# retrieval family's two row spaces (query feature stack, item corpus) get
# the same mixed replicate/row-shard placement the CTR families have.

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlannedTwoTower:
    """Two-tower retriever whose BOTH row spaces are `PlannedTables`:
    the query feature stack under `q_plan`, the item corpus as a
    single-table plan under `i_plan` (a huge corpus row-shards; a small
    one replicates — the planner decides per its cost model)."""

    query_tables: PlannedTables
    item_tables: PlannedTables
    query_mlp: list
    item_mlp: list
    config: object = dataclasses.field(metadata=dict(static=True))


def _check_item_plan(i_plan: ShardingPlan, cfg):
    if len(i_plan.decisions) != 1 or \
            i_plan.decisions[0].vocab != cfg.item_vocab:
        raise ValueError(
            "i_plan must be a single-table plan over (item_vocab,) — build "
            "it with plan_sharding([cfg.item_vocab], cfg.dim, mesh)")


def init_planned_two_tower(key: jax.Array, cfg, q_plan: ShardingPlan,
                           i_plan: ShardingPlan, mesh: Mesh,
                           sparse_opt=None) -> PlannedTwoTower:
    """Initialize directly onto the plans (sharded groups generate
    per-shard; MLPs replicate)."""
    from ..models.dlrm import _init_mlp
    sparse_opt = sparse_opt or SparseSGD(0.05)
    _check_item_plan(i_plan, cfg)
    kq, ki, kqm, kim = jax.random.split(key, 4)
    scale = 1.0 / (cfg.dim ** 0.5)
    q_pt = PlannedTables.init(kq, q_plan, mesh, scale=scale,
                              dtype=cfg.tables_dtype)
    ra, sa, ca = planned_row_state(mesh, q_pt, sparse_opt)
    q_pt = dataclasses.replace(q_pt, repl_accum=ra, shard_accum=sa,
                               col_accum=ca)
    i_pt = PlannedTables.init(ki, i_plan, mesh, scale=scale,
                              dtype=cfg.tables_dtype)
    ra, sa, ca = planned_row_state(mesh, i_pt, sparse_opt)
    i_pt = dataclasses.replace(i_pt, repl_accum=ra, shard_accum=sa,
                               col_accum=ca)
    repl = NamedSharding(mesh, P())
    q_in = cfg.num_dense + cfg.num_query_tables * cfg.dim
    qmlp = jax.device_put(
        _init_mlp(kqm, (q_in,) + cfg.query_mlp, cfg.param_dtype), repl)
    imlp = jax.device_put(
        _init_mlp(kim, (cfg.dim,) + cfg.item_mlp, cfg.param_dtype), repl)
    return PlannedTwoTower(query_tables=q_pt, item_tables=i_pt,
                           query_mlp=qmlp, item_mlp=imlp, config=cfg)


def place_two_tower_on_plan(q_plan: ShardingPlan, i_plan: ShardingPlan,
                            mesh: Mesh, model, sparse_opt
                            ) -> PlannedTwoTower:
    """Carry a trained single-chip `TwoTower` (tables + row state) onto the
    plans — the resume path for `train_two_tower(plan=(q_plan, i_plan))`."""
    cfg = model.config
    _check_item_plan(i_plan, cfg)
    q_pt = place_stacked_on_plan(q_plan, mesh, model.query_tables,
                                 model.q_state, sparse_opt)
    item_stack = StackedTables(data=model.item_table.data,
                               offsets=(0, cfg.item_vocab), dim=cfg.dim)
    i_pt = place_stacked_on_plan(i_plan, mesh, item_stack, model.i_state,
                                 sparse_opt)
    repl = NamedSharding(mesh, P())
    return PlannedTwoTower(
        query_tables=q_pt, item_tables=i_pt,
        query_mlp=jax.device_put(model.query_mlp, repl),
        item_mlp=jax.device_put(model.item_mlp, repl), config=cfg)


def make_planned_tt_train_step(cfg, mesh: Mesh, sparse_opt=None,
                               dense_lr: float = 0.05, jit: bool = True):
    """`step(model: PlannedTwoTower, dense, q_cat, item_ids[, key]) ->
    (model, (loss, acc))` — identical math to the single-chip contrastive
    step (models/two_tower.py): both lookups route through
    `planned_lookup`, both lazy updates through `planned_apply` (one per
    row space), MLPs take a replicated SGD step. In-batch-negative softmax
    is GSPMD's job: the (B, B) logits matmul over the batch-sharded towers
    all-gathers automatically."""
    from ..models.two_tower import (in_batch_softmax_loss,
                                    item_embed_from_rows,
                                    query_embed_from_rows)
    sparse_opt = sparse_opt or SparseSGD(0.05)
    from .dlrm import _check_sharded_opt
    _check_sharded_opt(sparse_opt, allow_sr=True)
    use_sr = bool(getattr(sparse_opt, "stochastic_rounding", False))

    def step(model: PlannedTwoTower, dense, q_cat, item_ids, key=None):
        if use_sr and key is None:
            raise ValueError(
                "sparse_opt.stochastic_rounding=True: pass a fresh PRNG "
                "key per step (train_two_tower folds one in automatically)")
        q_rows = planned_lookup(mesh, model.query_tables, q_cat) \
            .transpose(1, 0, 2)                              # (B, T, dim)
        i_rows = planned_lookup(mesh, model.item_tables,
                                item_ids[None])[0]           # (B, dim)

        def loss_fn(mlps, q_act, i_act):
            qmlp, imlp = mlps
            q = query_embed_from_rows(qmlp, cfg, dense, q_act)
            i = item_embed_from_rows(imlp, cfg, i_act)
            return in_batch_softmax_loss(q, i, cfg.temperature)

        (loss, acc), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
            (model.query_mlp, model.item_mlp), q_rows, i_rows)
        mlp_grads, q_delta, i_delta = grads
        new_qmlp, new_imlp = jax.tree.map(
            lambda p, g: (p - dense_lr * g).astype(p.dtype),
            (model.query_mlp, model.item_mlp), mlp_grads)
        kq = jax.random.fold_in(key, 0) if use_sr else None
        ki = jax.random.fold_in(key, 1) if use_sr else None
        new_q = planned_apply(mesh, model.query_tables, q_cat,
                              q_delta.transpose(1, 0, 2).astype(jnp.float32),
                              sparse_opt, key=kq)
        new_i = planned_apply(mesh, model.item_tables, item_ids[None],
                              i_delta[None].astype(jnp.float32),
                              sparse_opt, key=ki)
        return PlannedTwoTower(query_tables=new_q, item_tables=new_i,
                               query_mlp=new_qmlp, item_mlp=new_imlp,
                               config=cfg), (loss, acc)

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def planned_build_item_index(mesh: Mesh, model: PlannedTwoTower,
                             batch: int = 65_536) -> jax.Array:
    """The `(item_vocab, embed_dim)` corpus index from a planned model:
    the item tower over all items, rows served by `planned_lookup`
    (batched; compiled once per shape)."""
    from ..models.two_tower import item_embed_from_rows
    cfg = model.config
    v = cfg.item_vocab

    @jax.jit
    def tower(imlp, it, ids):
        rows = planned_lookup(mesh, it, ids[None])[0]
        return item_embed_from_rows(imlp, cfg, rows)

    outs = []
    for lo in range(0, v, batch):
        hi = min(v, lo + batch)
        n = hi - lo
        # The sharded exchange batch-shards its index stream, so chunks
        # must divide the mesh — pad the ragged tail (id 0) and trim.
        npad = -n % mesh.size
        ids = jnp.arange(lo, lo + n + npad, dtype=jnp.int32) % v
        out = tower(model.item_mlp, model.item_tables, ids)
        outs.append(out[:n] if npad else out)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def planned_retrieve(mesh: Mesh, model: PlannedTwoTower, index: jax.Array,
                     dense, q_cat, k: int = 10):
    """Top-k retrieval on a planned model: planned query lookup + tower +
    one (B, V) MXU matmul + `lax.top_k` (the serving shape of
    models/two_tower.py::retrieve)."""
    from ..models.two_tower import query_embed_from_rows
    cfg = model.config

    @jax.jit
    def run(qmlp, qt, index, dense, q_cat):
        q_rows = planned_lookup(mesh, qt, q_cat).transpose(1, 0, 2)
        q = query_embed_from_rows(qmlp, cfg, dense, q_rows)
        return jax.lax.top_k(q @ index.T, k)

    return run(model.query_mlp, model.query_tables, index,
               jnp.asarray(dense), jnp.asarray(q_cat))
