"""DLRM training loop: the end-to-end driver (BASELINE.md config 4/5).

Single-chip or mesh-sharded, with telemetry phases, periodic AUC evaluation,
and checkpoint rotation. The reference stops at the kernel library (its
training loop lives in the external DLRM repo); this loop is the missing top
of the stack, built on the lazy-sparse-gradient train steps in dlrm.py /
parallel/dlrm.py.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..metrics import auc
from ..utils import telemetry as _telemetry
from .dlrm import DLRMConfig, init_dlrm, make_eval_step, make_train_step


@dataclasses.dataclass
class TrainResult:
    model: object
    losses: list
    aucs: list            # [(step, auc)]
    examples_per_sec: float
    evicted_rows: int = 0


def _collect_scores(eval_step, model, batches, to_device):
    """One device pass over `batches` -> host (labels, logits)."""
    labels, scores = [], []
    for b in batches:
        s = eval_step(model, to_device(b["dense"]), to_device(b["cat"]))
        labels.append(b["label"])
        scores.append(np.asarray(s))
    return np.concatenate(labels), np.concatenate(scores)


def evaluate_auc(eval_step, model, batches, *, to_device=jnp.asarray) -> float:
    return auc(*_collect_scores(eval_step, model, batches, to_device))


def evaluate_metrics(eval_step, model, batches, *,
                     to_device=jnp.asarray) -> dict:
    """Full CTR eval sweep: AUC + log loss + normalized entropy +
    calibration over `batches` (one device pass; metrics on host)."""
    from ..metrics import calibration, log_loss, normalized_entropy
    y, z = _collect_scores(eval_step, model, batches, to_device)
    return dict(auc=auc(y, z), log_loss=log_loss(y, z),
                normalized_entropy=normalized_entropy(y, z),
                calibration=calibration(y, z))




def _maybe_evict(model, trackers, plan, mesh, evict_threshold,
                 stacks=(("tables", "emb_state", "emb_accum"),),
                 delta_tracker=None):
    """Pop each tracker's stale rows and evict them from whichever
    placement `model` uses (single-chip / uniform sharded / planner).
    Shared by the DLRM, DCN, and DeepFM loops. Returns (model, n_evicted).

    stacks: per-ensemble attribute names `(tables, state, accum)` sharing
    the first stack's offsets/trackers — DeepFM passes its second (dim-1
    first-order) stack so a stale row loses BOTH representations and both
    optimizer states. The planner path manages one stack only.

    delta_tracker: the delta-checkpoint `TouchedRowTracker`, if delta
    checkpointing is on. Eviction REWRITES rows (values + optimizer state
    reset) without the input stream seeing them, so they must be marked
    touched or the next delta would omit them and a restore would diverge
    from the live state.
    """
    import dataclasses as _dc
    from ..utils.rowstats import (evict_rows, evict_rows_sharded,
                                  reset_rows_state)
    if plan is not None:
        from ..parallel.planner import evict_rows_planned
        cold_pt = [tr.pop_cold(evict_threshold) for tr in trackers]
        ncold = int(sum(c.size for c in cold_pt))
        if ncold:
            model = _dc.replace(
                model, tables=evict_rows_planned(model.tables, cold_pt))
        return model, ncold
    first_tables = getattr(model, stacks[0][0])
    cold = np.concatenate(
        [tr.pop_cold(evict_threshold) + first_tables.offsets[t]
         for t, tr in enumerate(trackers)])
    if not cold.size:
        return model, 0
    if delta_tracker is not None:
        delta_tracker.observe(cold)
    for tables_attr, state_attr, accum_attr in stacks:
        if mesh is not None:
            # Mod-row ownership (r % n, r // n); accum is the
            # (n, rows_local) row state sharded like the table.
            new_tables, new_accum = evict_rows_sharded(
                getattr(model, tables_attr), getattr(model, accum_attr),
                cold)
            model = _dc.replace(model, **{tables_attr: new_tables,
                                          accum_attr: new_accum})
        else:
            tables = getattr(model, tables_attr)
            new_data = evict_rows(tables.data, cold)
            model = _dc.replace(
                model,
                **{tables_attr: _dc.replace(tables, data=new_data),
                   state_attr: reset_rows_state(getattr(model, state_attr),
                                                cold)})
    return model, int(cold.size)


def _delta_setup(delta_ckpt, delta_every, plan, mesh, model):
    """Shared `delta_ckpt=` plumbing for the CTR train loops: validate,
    point the manager's layout at this model's placement, and build the
    touched-row tracker over the stacked vocab. Returns None when delta
    checkpointing is off."""
    if delta_ckpt is None:
        return None
    if not delta_every:
        raise ValueError("delta_ckpt requires delta_every > 0")
    if plan is not None:
        raise NotImplementedError(
            "delta checkpointing covers single-chip and uniform sharded "
            "placements (a planner placement has no single global row space)")
    from ..utils.deltackpt import ModRowLayout, TouchedRowTracker
    delta_ckpt.layout = (ModRowLayout.for_tables(model.tables)
                         if mesh is not None else None)
    return TouchedRowTracker(model.tables.offsets[-1])


def _delta_observe_save(delta_ckpt, delta_every, tracker, model, batch,
                        cfg, i, tel):
    """Per-step tracker feed + cadence save for `delta_ckpt=` loops."""
    if tracker is None:
        return
    tracker.observe_batch(batch["cat"], model.tables.offsets,
                          pad_idx=getattr(cfg, "pad_idx", None))
    if (i + 1) % delta_every == 0:
        with tel.phase("delta_ckpt"):
            state = (model.emb_accum if hasattr(model, "emb_accum")
                     else model.emb_state)
            delta_ckpt.save(i + 1, model.tables.data, state, tracker)


def train_dlrm(cfg: DLRMConfig, train_iter: Iterator[dict], num_steps: int, *,
               sparse_opt=None, dense_lr: float = 0.01, dense_tx=None,
               model=None,
               seed: int = 0, eval_batches: Optional[list] = None,
               eval_every: int = 0, ckpt_manager=None, ckpt_every: int = 0,
               log_every: int = 100, mesh=None, axis: str = "data",
               exchange: str = "gather", capacity_factor: float = 2.0,
               auto_capacity: bool = False, wire_dtype=None, guard=None,
               evict_every: int = 0, evict_threshold: float = 1e-3,
               freq_decay: float = 0.99, microbatch=None,
               device_prefetch: int = 0, plan=None,
               eval_metrics: bool = False, lr_schedule=None,
               delta_ckpt=None, delta_every: int = 0,
               verbose: bool = True) -> TrainResult:
    """Train a DLRM for `num_steps` batches from `train_iter`.

    mesh=None -> single-chip fused step; mesh given -> the hybrid
    DP-dense x model-parallel-embedding sharded step (parallel/dlrm.py).

    exchange="a2a" routes embeddings through the capacity-bounded butterfly;
    with `auto_capacity=True` the loop watches the step's overflow counter
    (sampled at `log_every` cadence, like the divergence guard) and rebuilds
    the step at `CapacityAutoTuner`'s suggested factor when occurrences are
    being dropped — trading one recompile for no further drops.

    evict_every > 0 turns on row-lifecycle management: a
    `utils.rowstats.FrequencyTracker` (decay `freq_decay`) follows each
    table's traffic from the host batches, and every `evict_every` steps
    rows that appeared and then went stale (decayed count at/below
    `evict_threshold`) are reinitialized to zero and their optimizer state
    reset — TTL eviction for churning id spaces (sessions, ads). Never-seen
    rows are left at their init values. Works on all three placements:
    single-chip, uniform sharded (mod-row ownership via
    `evict_rows_sharded`), and planner (`evict_rows_planned`).

    delta_ckpt (a `utils.DeltaCheckpointManager`) + delta_every > 0 turn on
    incremental table checkpointing: a `TouchedRowTracker` follows the host
    batches and every `delta_every` steps only the rows touched since the
    last save are written (full base at the manager's `base_every` cadence).
    The manager covers `(tables.data, emb_state)`; pair with `ckpt_manager`
    if the dense towers must be checkpointed too. Resume with
    `restore_dlrm_delta`. Single-chip and uniform-sharded placements
    (the planner's mixed placement has no single global row space).
    """
    tel = _telemetry.get_telemetry()
    if plan is not None and mesh is None:
        raise ValueError("plan= requires mesh=")
    if plan is not None and exchange != "gather":
        raise NotImplementedError(
            "planner-placed training supports the gather exchange only")
    if wire_dtype is not None and (mesh is None or exchange != "a2a"):
        raise ValueError(
            "wire_dtype requires mesh= with exchange='a2a' (it compresses "
            "the butterfly's row payloads; other paths would silently "
            "ignore it)")
    if model is None and plan is None:
        with tel.phase("init"):
            model = init_dlrm(jax.random.key(seed), cfg,
                              sparse_opt=sparse_opt, dense_tx=dense_tx)
    tuner = None
    with_overflow = False
    if mesh is not None and plan is not None:
        # Planner-driven mixed placement (parallel/planner.py).
        from jax.sharding import NamedSharding, PartitionSpec as _P
        from ..parallel.dlrm import batch_shardings
        from ..parallel.planner import (PlannedDLRM,
                                        init_planned_dlrm,
                                        make_planned_eval_step,
                                        make_planned_train_step,
                                        place_stacked_on_plan)
        from .dlrm import DLRM
        if model is None:
            with tel.phase("init"):
                model = init_planned_dlrm(jax.random.key(seed), cfg, plan,
                                          mesh, sparse_opt=sparse_opt,
                                          dense_tx=dense_tx)
        elif isinstance(model, DLRM):
            # Carry the trained tables + row state onto the plan (resume
            # semantics must match shard_dlrm's accum reshard).
            pt = place_stacked_on_plan(plan, mesh, model.tables,
                                       model.emb_state, sparse_opt)
            repl = NamedSharding(mesh, _P())
            bt = jax.device_put(model.bottom, repl)
            tp = jax.device_put(model.top, repl)
            dstate = model.dense_opt_state
            if dstate is None and dense_tx is not None:
                dstate = dense_tx.init((bt, tp))
            if dstate is not None:
                dstate = jax.device_put(dstate, repl)
            model = PlannedDLRM(bottom=bt, top=tp, tables=pt, config=cfg,
                                dense_opt_state=dstate)
        elif not isinstance(model, PlannedDLRM):
            raise TypeError(
                f"plan= expects a DLRM or PlannedDLRM model, got "
                f"{type(model).__name__} (unshard a sharded model first)")
        if dense_tx is not None and model.dense_opt_state is None:
            # A planned model resumed from a plain-SGD run: initialize the
            # replicated tower state here (mirrors shard_dlrm's contract).
            model = dataclasses.replace(
                model, dense_opt_state=jax.device_put(
                    dense_tx.init((model.bottom, model.top)),
                    NamedSharding(mesh, _P())))
        step = make_planned_train_step(cfg, mesh, sparse_opt=sparse_opt,
                                       dense_lr=dense_lr, dense_tx=dense_tx,
                                       microbatch=microbatch)
        eval_step = make_planned_eval_step(cfg, mesh)
        # The batch axis follows the PLAN's placement, not the loop's
        # axis= (which only governs the uniform sharded path).
        sd, sc, sl = batch_shardings(mesh, plan.axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["cat"], sc),
                         jax.device_put(b["label"], sl))
    elif mesh is not None:
        from ..parallel.dlrm import (batch_shardings, make_sharded_eval_step,
                                     make_sharded_train_step, shard_dlrm)
        from .dlrm import DLRM
        if isinstance(model, DLRM):
            model = shard_dlrm(model, mesh, axis, sparse_opt=sparse_opt,
                               dense_tx=dense_tx)
        with_overflow = exchange == "a2a" and auto_capacity

        def build_step(cf):
            return make_sharded_train_step(
                cfg, mesh, axis, sparse_opt=sparse_opt, dense_lr=dense_lr,
                exchange=exchange, capacity_factor=cf,
                with_overflow=with_overflow, dense_tx=dense_tx,
                wire_dtype=wire_dtype, microbatch=microbatch)

        step = build_step(capacity_factor)
        if with_overflow:
            from ..parallel.alltoall import CapacityAutoTuner
            tuner = CapacityAutoTuner(capacity_factor, 1)  # occ set on 1st batch
        eval_step = make_sharded_eval_step(cfg, mesh, axis)
        sd, sc, sl = batch_shardings(mesh, axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["cat"], sc),
                         jax.device_put(b["label"], sl))
    else:
        step = make_train_step(cfg, sparse_opt=sparse_opt,
                               dense_lr=dense_lr, microbatch=microbatch,
                               dense_tx=dense_tx)
        eval_step = make_eval_step(cfg)
        put = lambda b: (jnp.asarray(b["dense"]),              # noqa: E731
                         jnp.asarray(b["cat"]),
                         jnp.asarray(b["label"]))

    trackers = None
    if evict_every:
        from ..utils.rowstats import FrequencyTracker
        trackers = [FrequencyTracker(v, decay=freq_decay)
                    for v in cfg.vocab_sizes]

    delta_tracker = _delta_setup(delta_ckpt, delta_every, plan, mesh, model)

    sr_key = None
    if getattr(sparse_opt, "stochastic_rounding", False):
        # Every placement threads per-step keys now (planner: replicated +
        # row-sharded groups; a col_shard group rejects loudly inside
        # planned_apply). Fresh key per step (folded by index): SR's
        # unbiasedness needs independent noise across steps.
        sr_key = jax.random.key(seed + 1_000_003)

    losses, aucs = [], []
    examples = 0
    evicted_total = 0
    t_start = time.perf_counter()
    prefetcher = None
    if device_prefetch:
        from ..io import DevicePrefetcher
        prefetcher = DevicePrefetcher(train_iter, put,
                                      depth=device_prefetch)
    for i in range(num_steps):
        with tel.phase("data"):
            if prefetcher is not None:
                batch, (dense, cat, label) = next(prefetcher)
            else:
                batch = next(train_iter)
                dense, cat, label = put(batch)
        if trackers is not None:
            for t, tr in enumerate(trackers):
                ids = batch["cat"][t]
                if getattr(cfg, "pad_idx", None) is not None:
                    # np.bincount rejects the (negative) sentinel, and a
                    # pad must not count as traffic anyway.
                    ids = ids[ids != cfg.pad_idx]
                tr.observe(ids)
        with tel.phase("step"):
            kw = {}
            if lr_schedule is not None:
                # Traced scalar: a schedule costs ZERO recompiles.
                kw["lr"] = jnp.float32(lr_schedule(i))
            if sr_key is not None:
                kw["key"] = jax.random.fold_in(sr_key, i)
            model, out = step(model, dense, cat, label, **kw)
        if trackers is not None and (i + 1) % evict_every == 0:
            # pop_cold: only rows seen-then-stale, marked so they are not
            # re-evicted every interval (never-seen rows sit at init).
            model, n = _maybe_evict(model, trackers, plan, mesh,
                                    evict_threshold,
                                    delta_tracker=delta_tracker)
            evicted_total += n
        loss, ovf = out if with_overflow else (out, None)
        examples += batch["label"].shape[0]
        if tuner is not None and i == 0:
            # 2x routed occurrences (forward lookup + backward update).
            tuner.occ = 2 * batch["label"].shape[0] * \
                len(cfg.vocab_sizes) * (cfg.bag or 1)
        if log_every and (i % log_every == 0 or i == num_steps - 1):
            lv = float(loss)  # fences the chain; keeps timing honest
            if tuner is not None:
                new_cf = tuner.observe(int(ovf))
                if new_cf is not None:
                    with tel.phase("retune"):
                        step = build_step(new_cf)
                    if verbose:
                        print(f"step {i:6d}  overflow {int(ovf)} — capacity "
                              f"factor -> {new_cf:.2f} (step rebuilt)",
                              flush=True)
            losses.append(lv)
            if guard is not None:
                # Divergence watchdog (checked at log cadence — a per-step
                # device->host fetch would serialize the pipeline).
                model, rolled = guard.observe(lv, model)
                if rolled:
                    if delta_ckpt is not None:
                        # The live model jumped to an older snapshot; the
                        # tracker can no longer name the rows that differ
                        # from the last save. Next save = full base.
                        delta_ckpt.force_base()
                    if verbose:
                        print(f"step {i:6d}  DIVERGED (loss {lv:.3g}) — "
                              f"rolled back to checkpoint", flush=True)
            if verbose:
                print(f"step {i:6d}  loss {lv:.5f}", flush=True)
        if eval_every and eval_batches and (i + 1) % eval_every == 0:
            with tel.phase("eval"):
                if eval_metrics:
                    m = evaluate_metrics(eval_step, model, eval_batches)
                    a = m["auc"]
                else:
                    a = evaluate_auc(eval_step, model, eval_batches)
            aucs.append((i + 1, a))
            if verbose:
                if eval_metrics:
                    print(f"step {i+1:6d}  eval AUC {a:.4f}  logloss "
                          f"{m['log_loss']:.5f}  NE "
                          f"{m['normalized_entropy']:.4f}  calib "
                          f"{m['calibration']:.3f}", flush=True)
                else:
                    print(f"step {i+1:6d}  eval AUC {a:.4f}", flush=True)
        _delta_observe_save(delta_ckpt, delta_every, delta_tracker, model,
                            batch, cfg, i, tel)
        if ckpt_manager is not None and ckpt_every and (i + 1) % ckpt_every == 0:
            with tel.phase("checkpoint"):
                ckpt_manager.save(i + 1, model)

    # Final fence for an honest rate.
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        model)
    dt = time.perf_counter() - t_start
    return TrainResult(model=model, losses=losses, aucs=aucs,
                       evicted_rows=evicted_total,
                       examples_per_sec=examples / dt)


# ---------------------------------------------------------------------------
# DCN-v2 training loop
# ---------------------------------------------------------------------------

def restore_dlrm_delta(delta_ckpt, model):
    """Resume `model`'s tables + sparse-optimizer row state from a
    `DeltaCheckpointManager` chain (the counterpart of `train_dlrm`'s
    `delta_ckpt=` saves). Works on single-chip `DLRM` and uniform
    `ShardedDLRM` models (the restore scatters by global row id through
    the matching layout, so the chain's origin placement is irrelevant).
    Dense towers are untouched — pair with a full `ckpt_manager` when the
    towers must resume too. Returns `model` unchanged if the directory
    holds no committed base."""
    from ..utils.deltackpt import ModRowLayout
    sharded = hasattr(model, "emb_accum")
    state = model.emb_accum if sharded else model.emb_state
    delta_ckpt.layout = (ModRowLayout.for_tables(model.tables)
                         if sharded else None)
    restored = delta_ckpt.restore_latest(model.tables.data, state)
    if restored is None:
        return model
    data, state = restored
    tables = dataclasses.replace(model.tables, data=data)
    key = "emb_accum" if sharded else "emb_state"
    return dataclasses.replace(model, tables=tables, **{key: state})


def train_dcn(cfg, train_iter, num_steps: int, *, sparse_opt=None,
              dense_lr: float = 0.01, dense_tx=None, model=None,
              seed: int = 0,
              eval_batches: Optional[list] = None, eval_every: int = 0,
              ckpt_manager=None, ckpt_every: int = 0, log_every: int = 100,
              mesh=None, axis: str = "data", microbatch=None,
              guard=None, device_prefetch: int = 0, plan=None,
              evict_every: int = 0, evict_threshold: float = 1e-3,
              freq_decay: float = 0.99, eval_metrics: bool = False,
              lr_schedule=None, delta_ckpt=None, delta_every: int = 0,
              verbose: bool = True) -> TrainResult:
    """Train a DCN-v2 (`models/dcn.py`) on the same batch layout as
    `train_dlrm` (dicts with dense/cat/label). mesh=None -> single-chip
    fused step; mesh given -> the sharded gather-exchange step
    (parallel/dcn.py); mesh + plan -> the planner's mixed placement
    (parallel/planner.py). Same telemetry/eval/checkpoint cadence as the
    DLRM loop, including incremental table checkpoints
    (`delta_ckpt=`/`delta_every=`, resume via `restore_dlrm_delta` —
    placement rules as in `train_dlrm`)."""
    from .dcn import init_dcn, make_eval_step as make_dcn_eval, \
        make_train_step as make_dcn_step
    tel = _telemetry.get_telemetry()
    if plan is not None and mesh is None:
        raise ValueError("plan= requires mesh=")
    if model is None and plan is None:
        with tel.phase("init"):
            model = init_dcn(jax.random.key(seed), cfg,
                             sparse_opt=sparse_opt, dense_tx=dense_tx)
    if mesh is not None and plan is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P
        from ..parallel.dlrm import batch_shardings as dcn_shardings
        from ..parallel.planner import (PlannedDCN,
                                        init_planned_dcn,
                                        make_planned_dcn_eval_step,
                                        make_planned_dcn_train_step,
                                        place_stacked_on_plan)
        from .dcn import DCN
        if model is None:
            with tel.phase("init"):
                model = init_planned_dcn(jax.random.key(seed), cfg, plan,
                                         mesh, sparse_opt=sparse_opt,
                                         dense_tx=dense_tx)
        elif isinstance(model, DCN):
            pt = place_stacked_on_plan(plan, mesh, model.tables,
                                       model.emb_state, sparse_opt)
            repl = NamedSharding(mesh, _P())
            cr = jax.device_put(model.cross, repl)
            dp = jax.device_put(model.deep, repl)
            hd = jax.device_put(model.head, repl)
            dstate = model.dense_opt_state
            if dstate is None and dense_tx is not None:
                dstate = dense_tx.init((cr, dp, hd))
            if dstate is not None:
                dstate = jax.device_put(dstate, repl)
            model = PlannedDCN(cross=cr, deep=dp, head=hd, tables=pt,
                               config=cfg, dense_opt_state=dstate)
        elif not isinstance(model, PlannedDCN):
            raise TypeError(
                f"plan= expects a DCN or PlannedDCN model, got "
                f"{type(model).__name__} (unshard a sharded model first)")
        if dense_tx is not None and model.dense_opt_state is None:
            model = dataclasses.replace(
                model, dense_opt_state=jax.device_put(
                    dense_tx.init((model.cross, model.deep, model.head)),
                    NamedSharding(mesh, _P())))
        step = make_planned_dcn_train_step(cfg, mesh, sparse_opt=sparse_opt,
                                           dense_lr=dense_lr,
                                           dense_tx=dense_tx,
                                           microbatch=microbatch)
        eval_step = make_planned_dcn_eval_step(cfg, mesh)
        sd, sc, sl = dcn_shardings(mesh, plan.axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["cat"], sc),
                         jax.device_put(b["label"], sl))
    elif mesh is not None:
        from ..parallel.dcn import (batch_shardings as dcn_shardings,
                                    make_sharded_dcn_eval_step,
                                    make_sharded_dcn_train_step, shard_dcn)
        from .dcn import DCN
        if isinstance(model, DCN):
            model = shard_dcn(model, mesh, axis, sparse_opt=sparse_opt,
                              dense_tx=dense_tx)
        step = make_sharded_dcn_train_step(cfg, mesh, axis,
                                           sparse_opt=sparse_opt,
                                           dense_lr=dense_lr,
                                           dense_tx=dense_tx,
                                           microbatch=microbatch)
        eval_step = make_sharded_dcn_eval_step(cfg, mesh, axis)
        sd, sc, sl = dcn_shardings(mesh, axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["cat"], sc),
                         jax.device_put(b["label"], sl))
    else:
        step = make_dcn_step(cfg, sparse_opt=sparse_opt,
                             dense_lr=dense_lr, microbatch=microbatch,
                             dense_tx=dense_tx)
        eval_step = make_dcn_eval(cfg)
        put = lambda b: (jnp.asarray(b["dense"]),              # noqa: E731
                         jnp.asarray(b["cat"]),
                         jnp.asarray(b["label"]))

    trackers = None
    if evict_every:
        from ..utils.rowstats import FrequencyTracker
        trackers = [FrequencyTracker(v, decay=freq_decay)
                    for v in cfg.vocab_sizes]
    delta_tracker = _delta_setup(delta_ckpt, delta_every, plan, mesh, model)
    sr_key = None
    if getattr(sparse_opt, "stochastic_rounding", False):
        # Every placement threads per-step keys (planner col_shard groups
        # reject loudly inside planned_apply).
        sr_key = jax.random.key(seed + 1_000_003)
    losses, aucs = [], []
    examples = 0
    evicted_total = 0
    t_start = time.perf_counter()
    prefetcher = None
    if device_prefetch:
        from ..io import DevicePrefetcher
        prefetcher = DevicePrefetcher(train_iter, put,
                                      depth=device_prefetch)
    for i in range(num_steps):
        with tel.phase("data"):
            if prefetcher is not None:
                batch, (dense, cat, label) = next(prefetcher)
            else:
                batch = next(train_iter)
                dense, cat, label = put(batch)
        if trackers is not None:
            for t, tr in enumerate(trackers):
                ids = batch["cat"][t]
                if getattr(cfg, "pad_idx", None) is not None:
                    # np.bincount rejects the (negative) sentinel, and a
                    # pad must not count as traffic anyway.
                    ids = ids[ids != cfg.pad_idx]
                tr.observe(ids)
        with tel.phase("step"):
            kw = {}
            if lr_schedule is not None:
                kw["lr"] = jnp.float32(lr_schedule(i))
            if sr_key is not None:
                kw["key"] = jax.random.fold_in(sr_key, i)
            model, loss = step(model, dense, cat, label, **kw)
        if trackers is not None and (i + 1) % evict_every == 0:
            # pop_cold: only rows seen-then-stale, marked so they are not
            # re-evicted every interval (never-seen rows sit at init).
            model, n = _maybe_evict(model, trackers, plan, mesh,
                                    evict_threshold,
                                    delta_tracker=delta_tracker)
            evicted_total += n
        examples += batch["label"].shape[0]
        if log_every and (i % log_every == 0 or i == num_steps - 1):
            lv = float(loss)
            losses.append(lv)
            if guard is not None:
                # Divergence watchdog (log cadence, like the DLRM loop).
                model, rolled = guard.observe(lv, model)
                if rolled:
                    if delta_ckpt is not None:
                        # Rollback invalidates the delta chain's premise;
                        # see the DLRM loop. Next save = full base.
                        delta_ckpt.force_base()
                    if verbose:
                        print(f"step {i:6d}  DIVERGED (loss {lv:.3g}) — "
                              f"rolled back to checkpoint", flush=True)
            if verbose:
                print(f"step {i:6d}  loss {lv:.5f}", flush=True)
        if eval_every and eval_batches and (i + 1) % eval_every == 0:
            with tel.phase("eval"):
                if eval_metrics:
                    m = evaluate_metrics(eval_step, model, eval_batches)
                    a = m["auc"]
                else:
                    a = evaluate_auc(eval_step, model, eval_batches)
            aucs.append((i + 1, a))
            if verbose:
                if eval_metrics:
                    print(f"step {i+1:6d}  eval AUC {a:.4f}  logloss "
                          f"{m['log_loss']:.5f}  NE "
                          f"{m['normalized_entropy']:.4f}  calib "
                          f"{m['calibration']:.3f}", flush=True)
                else:
                    print(f"step {i+1:6d}  eval AUC {a:.4f}", flush=True)
        _delta_observe_save(delta_ckpt, delta_every, delta_tracker, model,
                            batch, cfg, i, tel)
        if ckpt_manager is not None and ckpt_every and \
                (i + 1) % ckpt_every == 0:
            with tel.phase("checkpoint"):
                ckpt_manager.save(i + 1, model)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, model)
    dt = time.perf_counter() - t_start
    return TrainResult(model=model, losses=losses, aucs=aucs,
                       examples_per_sec=examples / dt,
                       evicted_rows=evicted_total)


def train_deepfm(cfg, train_iter, num_steps: int, *, sparse_opt=None,
                 dense_lr: float = 0.01, dense_tx=None, model=None,
                 seed: int = 0,
                 eval_batches: Optional[list] = None, eval_every: int = 0,
                 ckpt_manager=None, ckpt_every: int = 0,
                 log_every: int = 100, mesh=None, axis: str = "data",
                 guard=None, device_prefetch: int = 0, plan=None,
                 evict_every: int = 0, evict_threshold: float = 1e-3,
                 freq_decay: float = 0.99, eval_metrics: bool = False,
                 microbatch=None, lr_schedule=None,
                 delta_ckpt=None, delta_every: int = 0,
                 verbose: bool = True) -> TrainResult:
    """Train a DeepFM (`models/deepfm.py`) on the same batch layout as
    `train_dlrm` (dicts with dense/cat/label). mesh=None -> single-chip
    fused step; mesh given -> the sharded step (parallel/deepfm.py);
    mesh + plan (a `parallel.planner.ShardingPlan` built with
    dim=cfg.stack_dim) -> the planner's mixed placement on the fused
    stack (folded layout only — `parallel.planner.PlannedDeepFM`). Same
    telemetry/eval/checkpoint/guard cadence as the DLRM/DCN loops.

    Row eviction covers every stacked ensemble: a stale row loses its FM
    vector, its first-order weight, and the optimizer state — one fused
    row with the folded layout (`cfg.folded`), both stacks with the
    legacy one.
    """
    from .deepfm import (DeepFM, init_deepfm,
                         make_eval_step as make_fm_eval,
                         make_train_step as make_fm_step)
    tel = _telemetry.get_telemetry()
    if plan is not None and mesh is None:
        raise ValueError("plan= requires mesh=")
    if model is None and plan is None:
        with tel.phase("init"):
            model = init_deepfm(jax.random.key(seed), cfg,
                                sparse_opt=sparse_opt, dense_tx=dense_tx)
    if mesh is not None and plan is not None:
        # Planner-driven mixed placement on the FUSED stack (folded
        # layout only — parallel/planner.py PlannedDeepFM).
        from jax.sharding import NamedSharding, PartitionSpec as _P
        from ..parallel.dlrm import batch_shardings
        from ..parallel.planner import (PlannedDeepFM, init_planned_deepfm,
                                        make_planned_deepfm_eval_step,
                                        make_planned_deepfm_train_step,
                                        place_stacked_on_plan)
        if model is None:
            with tel.phase("init"):
                model = init_planned_deepfm(jax.random.key(seed), cfg,
                                            plan, mesh,
                                            sparse_opt=sparse_opt,
                                            dense_tx=dense_tx)
        elif isinstance(model, DeepFM):
            if model.fm_w is not None:
                raise ValueError(
                    "plan= supports the folded DeepFM layout only; "
                    "convert with models.deepfm.fuse_deepfm first")
            pt = place_stacked_on_plan(plan, mesh, model.tables,
                                       model.emb_state, sparse_opt)
            repl = NamedSharding(mesh, _P())
            dp = jax.device_put(model.deep, repl)
            hd = jax.device_put(model.head, repl)
            dw = jax.device_put(model.dense_w, repl)
            bs = jax.device_put(model.bias, repl)
            dstate = model.dense_opt_state
            if dstate is None and dense_tx is not None:
                dstate = dense_tx.init((dp, hd, dw, bs))
            if dstate is not None:
                dstate = jax.device_put(dstate, repl)
            model = PlannedDeepFM(deep=dp, head=hd, dense_w=dw, bias=bs,
                                  tables=pt, config=cfg,
                                  dense_opt_state=dstate)
        elif not isinstance(model, PlannedDeepFM):
            raise TypeError(
                f"plan= expects a DeepFM or PlannedDeepFM model, got "
                f"{type(model).__name__} (unshard a sharded model first)")
        step = make_planned_deepfm_train_step(
            cfg, mesh, sparse_opt=sparse_opt, dense_lr=dense_lr,
            dense_tx=dense_tx, microbatch=microbatch)
        eval_step = make_planned_deepfm_eval_step(cfg, mesh)
        sd, sc, sl = batch_shardings(mesh, plan.axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["cat"], sc),
                         jax.device_put(b["label"], sl))
    elif mesh is not None:
        from ..parallel.deepfm import (batch_shardings as fm_shardings,
                                       make_sharded_deepfm_eval_step,
                                       make_sharded_deepfm_train_step,
                                       shard_deepfm)
        if isinstance(model, DeepFM):
            model = shard_deepfm(model, mesh, axis, sparse_opt=sparse_opt,
                                 dense_tx=dense_tx)
        step = make_sharded_deepfm_train_step(cfg, mesh, axis,
                                              sparse_opt=sparse_opt,
                                              dense_lr=dense_lr,
                                              dense_tx=dense_tx,
                                              microbatch=microbatch)
        eval_step = make_sharded_deepfm_eval_step(cfg, mesh, axis)
        sd, sc, sl = fm_shardings(mesh, axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["cat"], sc),
                         jax.device_put(b["label"], sl))
    else:
        step = make_fm_step(cfg, sparse_opt=sparse_opt, dense_lr=dense_lr,
                            dense_tx=dense_tx, microbatch=microbatch)
        eval_step = make_fm_eval(cfg)
        put = lambda b: (jnp.asarray(b["dense"]),              # noqa: E731
                         jnp.asarray(b["cat"]),
                         jnp.asarray(b["label"]))

    trackers = None
    if evict_every:
        from ..utils.rowstats import FrequencyTracker
        trackers = [FrequencyTracker(v, decay=freq_decay)
                    for v in cfg.vocab_sizes]
    delta_tracker = _delta_setup(delta_ckpt, delta_every, plan, mesh,
                                 model)
    sr_key = None
    if getattr(sparse_opt, "stochastic_rounding", False):
        # Single-chip, sharded, AND planned steps thread per-step keys.
        sr_key = jax.random.key(seed + 1_000_003)
    losses, aucs = [], []
    examples = 0
    evicted_total = 0
    t_start = time.perf_counter()
    prefetcher = None
    if device_prefetch:
        from ..io import DevicePrefetcher
        prefetcher = DevicePrefetcher(train_iter, put,
                                      depth=device_prefetch)
    for i in range(num_steps):
        with tel.phase("data"):
            if prefetcher is not None:
                batch, (dense, cat, label) = next(prefetcher)
            else:
                batch = next(train_iter)
                dense, cat, label = put(batch)
        if trackers is not None:
            for t, tr in enumerate(trackers):
                ids = batch["cat"][t]
                if getattr(cfg, "pad_idx", None) is not None:
                    # np.bincount rejects the (negative) sentinel, and a
                    # pad must not count as traffic anyway.
                    ids = ids[ids != cfg.pad_idx]
                tr.observe(ids)
        with tel.phase("step"):
            kw = {}
            if lr_schedule is not None:
                kw["lr"] = jnp.float32(lr_schedule(i))
            if sr_key is not None:
                kw["key"] = jax.random.fold_in(sr_key, i)
            model, loss = step(model, dense, cat, label, **kw)
        if trackers is not None and (i + 1) % evict_every == 0:
            # Folded layout (and the planner path): ONE stack carries both
            # representations (a stale row loses its FM vector,
            # first-order weight, and the fused optimizer state in one
            # eviction).
            fm_stacks = (() if getattr(model, "fm_w", None) is None
                         else (("fm_w", "fm_state", "fm_accum"),))
            model, n = _maybe_evict(
                model, trackers, plan, mesh, evict_threshold,
                stacks=(("tables", "emb_state", "emb_accum"),) + fm_stacks,
                delta_tracker=delta_tracker)
            evicted_total += n
        examples += batch["label"].shape[0]
        if log_every and (i % log_every == 0 or i == num_steps - 1):
            lv = float(loss)
            losses.append(lv)
            if guard is not None:
                model, rolled = guard.observe(lv, model)
                if rolled:
                    if delta_ckpt is not None:
                        delta_ckpt.force_base()  # see the DLRM loop
                    if verbose:
                        print(f"step {i:6d}  DIVERGED (loss {lv:.3g}) — "
                              f"rolled back to checkpoint", flush=True)
            if verbose:
                print(f"step {i:6d}  loss {lv:.5f}", flush=True)
        if eval_every and eval_batches and (i + 1) % eval_every == 0:
            with tel.phase("eval"):
                if eval_metrics:
                    m = evaluate_metrics(eval_step, model, eval_batches)
                    a = m["auc"]
                else:
                    a = evaluate_auc(eval_step, model, eval_batches)
            aucs.append((i + 1, a))
            if verbose:
                if eval_metrics:
                    print(f"step {i+1:6d}  eval AUC {a:.4f}  logloss "
                          f"{m['log_loss']:.5f}  NE "
                          f"{m['normalized_entropy']:.4f}  calib "
                          f"{m['calibration']:.3f}", flush=True)
                else:
                    print(f"step {i+1:6d}  eval AUC {a:.4f}", flush=True)
        if delta_tracker is not None:
            delta_tracker.observe_batch(batch["cat"], model.tables.offsets,
                                        pad_idx=getattr(cfg, "pad_idx",
                                                        None))
            if (i + 1) % delta_every == 0:
                with tel.phase("delta_ckpt"):
                    delta_ckpt.save(i + 1, model.tables.data,
                                    _deepfm_delta_state(model),
                                    delta_tracker)
        if ckpt_manager is not None and ckpt_every and \
                (i + 1) % ckpt_every == 0:
            with tel.phase("checkpoint"):
                ckpt_manager.save(i + 1, model)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, model)
    dt = time.perf_counter() - t_start
    return TrainResult(model=model, losses=losses, aucs=aucs,
                       examples_per_sec=examples / dt,
                       evicted_rows=evicted_total)


def _deepfm_delta_state(model):
    """DeepFM's delta-checkpoint 'state' pytree. Folded layout (fm_w is
    None): the fused stack's state alone. Legacy layout: BOTH stacks ride
    one manager — the dim-1 first-order stack's rows and its optimizer
    state are row-wise leaves keyed by the same global row ids as the FM
    stack (shared offsets), so one tracker covers everything."""
    sharded = hasattr(model, "emb_accum")
    st = model.emb_accum if sharded else model.emb_state
    if model.fm_w is None:
        return (st,)
    return (st, model.fm_w.data,
            model.fm_accum if sharded else model.fm_state)


def restore_deepfm_delta(delta_ckpt, model):
    """Resume a DeepFM's two stacks + sparse row state from a
    `DeltaCheckpointManager` chain (counterpart of `train_deepfm`'s
    `delta_ckpt=`). Works single-chip and uniform-sharded, in either
    direction (the manager's layout conversion); dense parts are untouched
    (pair with ckpt_manager). Returns `model` unchanged if the directory
    holds no committed base."""
    from ..utils.deltackpt import ModRowLayout
    sharded = hasattr(model, "emb_accum")
    state = _deepfm_delta_state(model)
    delta_ckpt.layout = (ModRowLayout.for_tables(model.tables)
                         if sharded else None)
    restored = delta_ckpt.restore_latest(model.tables.data, state)
    if restored is None:
        return model
    if model.fm_w is None:              # folded layout: one stack
        data, (est,) = restored
        tables = dataclasses.replace(model.tables, data=data)
        if sharded:
            return dataclasses.replace(model, tables=tables, emb_accum=est)
        return dataclasses.replace(model, tables=tables, emb_state=est)
    data, (est, fmdata, fst) = restored
    tables = dataclasses.replace(model.tables, data=data)
    fm_w = dataclasses.replace(model.fm_w, data=fmdata)
    if sharded:
        return dataclasses.replace(model, tables=tables, fm_w=fm_w,
                                   emb_accum=est, fm_accum=fst)
    return dataclasses.replace(model, tables=tables, fm_w=fm_w,
                               emb_state=est, fm_state=fst)


# ---------------------------------------------------------------------------
# Two-tower training loop
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RetrievalTrainResult:
    model: object            # TwoTower (unsharded view when mesh was given)
    losses: list
    accs: list               # in-batch top-1 accuracy at log cadence
    recalls: list            # [(step, recall@k)]
    examples_per_sec: float


def train_two_tower(cfg, train_iter, num_steps: int, *, sparse_opt=None,
                    dense_lr: float = 0.05, model=None, seed: int = 0,
                    eval_batches=None, eval_every: int = 0, k: int = 10,
                    ckpt_manager=None, ckpt_every: int = 0,
                    log_every: int = 100, mesh=None, axis: str = "data",
                    device_prefetch: int = 0,
                    delta_ckpt=None, delta_every: int = 0,
                    verbose: bool = True) -> RetrievalTrainResult:
    """Train a two-tower retriever for `num_steps` batches from `train_iter`
    (dicts with dense/q_cat/item_ids — `data.SyntheticRetrieval`'s layout).

    mesh=None -> single-chip contrastive step; mesh given -> the sharded
    step (parallel/two_tower.py: DP batch, GSPMD in-batch softmax,
    mod-row-sharded tables). Periodic eval rebuilds the item index and
    measures recall@k of the positive item over `eval_batches`.
    """
    from ..metrics import recall_at_k
    from ..optim import SparseSGD
    from .two_tower import (build_item_index, init_two_tower, make_train_step
                            as make_tt_step, retrieve)
    tel = _telemetry.get_telemetry()
    sparse_opt = sparse_opt or SparseSGD(0.05)
    if model is None:
        with tel.phase("init"):
            model = init_two_tower(jax.random.key(seed), cfg,
                                   sparse_opt=sparse_opt)
    sharded = mesh is not None
    if sharded:
        from ..parallel.two_tower import (make_sharded_tt_train_step,
                                          shard_two_tower,
                                          tt_batch_shardings,
                                          unshard_two_tower)
        from .two_tower import TwoTower
        if isinstance(model, TwoTower):
            model = shard_two_tower(model, mesh, axis, sparse_opt=sparse_opt)
        step = make_sharded_tt_train_step(cfg, mesh, axis,
                                          sparse_opt=sparse_opt,
                                          dense_lr=dense_lr)
        sd, sq, si = tt_batch_shardings(mesh, axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["q_cat"], sq),
                         jax.device_put(b["item_ids"], si))
        to_dense = lambda m: unshard_two_tower(m)              # noqa: E731
    else:
        step = make_tt_step(cfg, sparse_opt=sparse_opt, dense_lr=dense_lr)
        put = lambda b: (jnp.asarray(b["dense"]),              # noqa: E731
                         jnp.asarray(b["q_cat"]),
                         jnp.asarray(b["item_ids"]))
        to_dense = lambda m: m                                 # noqa: E731

    def eval_recall(m):
        dense_m = to_dense(m)
        index = build_item_index(dense_m)
        hits, total = 0.0, 0
        for b in eval_batches:
            _, ids = retrieve(dense_m, index, jnp.asarray(b["dense"]),
                              jnp.asarray(b["q_cat"]), k=k)
            n = b["item_ids"].shape[0]
            hits += recall_at_k(b["item_ids"], ids) * n
            total += n
        return hits / max(total, 1)

    sr_key = None
    if getattr(sparse_opt, "stochastic_rounding", False):
        # Single-chip AND sharded steps thread per-step keys.
        sr_key = jax.random.key(seed + 1_000_003)
    q_tracker = i_tracker = None
    if delta_ckpt is not None:
        # TWO managers — the towers have independent row spaces (query
        # stack vs item corpus), each with its own touched set.
        if not delta_every:
            raise ValueError("delta_ckpt requires delta_every > 0")
        from ..utils.deltackpt import ModRowLayout, TouchedRowTracker
        q_mgr, i_mgr = delta_ckpt
        if sharded:
            q_mgr.layout = ModRowLayout.for_tables(model.query_tables)
            i_mgr.layout = ModRowLayout.for_tables(model.item_table)
        else:
            q_mgr.layout = i_mgr.layout = None
        q_tracker = TouchedRowTracker(model.query_tables.offsets[-1])
        i_tracker = TouchedRowTracker(cfg.item_vocab)
    losses, accs, recalls = [], [], []
    examples = 0
    prefetcher = None
    if device_prefetch:
        from ..io import DevicePrefetcher
        prefetcher = DevicePrefetcher(train_iter, put,
                                      depth=device_prefetch)
    t_start = time.perf_counter()
    for i in range(num_steps):
        with tel.phase("data"):
            if prefetcher is not None:
                batch, args = next(prefetcher)
            else:
                batch = next(train_iter)
                args = put(batch)
        with tel.phase("step"):
            model, (loss, acc) = step(
                model, *args,
                **({"key": jax.random.fold_in(sr_key, i)}
                   if sr_key is not None else {}))
        if q_tracker is not None:
            q_tracker.observe_batch(batch["q_cat"],
                                    model.query_tables.offsets)
            i_tracker.observe(batch["item_ids"])
            if (i + 1) % delta_every == 0:
                with tel.phase("delta_ckpt"):
                    q_mgr.save(i + 1, model.query_tables.data,
                               model.q_accum if sharded else model.q_state,
                               q_tracker)
                    i_mgr.save(i + 1, model.item_table.data,
                               model.i_accum if sharded else model.i_state,
                               i_tracker)
        examples += batch["item_ids"].shape[0]
        if log_every and (i % log_every == 0 or i == num_steps - 1):
            lv, av = float(loss), float(acc)
            losses.append(lv)
            accs.append(av)
            if verbose:
                print(f"step {i:6d}  loss {lv:.5f}  in-batch acc {av:.3f}",
                      flush=True)
        if eval_every and eval_batches and (i + 1) % eval_every == 0:
            with tel.phase("eval"):
                r = eval_recall(model)
            recalls.append((i + 1, r))
            if verbose:
                print(f"step {i+1:6d}  recall@{k} {r:.4f}", flush=True)
        if ckpt_manager is not None and ckpt_every and \
                (i + 1) % ckpt_every == 0:
            with tel.phase("checkpoint"):
                ckpt_manager.save(i + 1, model)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, model)
    dt = time.perf_counter() - t_start
    return RetrievalTrainResult(model=to_dense(model), losses=losses,
                                accs=accs, recalls=recalls,
                                examples_per_sec=examples / dt)


def restore_two_tower_delta(delta_ckpt, model):
    """Resume a two-tower model's tables + sparse row state from the PAIR
    of `DeltaCheckpointManager`s `train_two_tower`'s `delta_ckpt=` wrote
    (query chain, item chain). Works on single-chip `TwoTower` and
    `ShardedTwoTower` targets in either direction (the managers' layout
    conversion). MLPs are untouched (pair with ckpt_manager)."""
    from ..utils.deltackpt import ModRowLayout
    q_mgr, i_mgr = delta_ckpt
    sharded = hasattr(model, "q_accum")
    q_state = model.q_accum if sharded else model.q_state
    i_state = model.i_accum if sharded else model.i_state
    q_mgr.layout = (ModRowLayout.for_tables(model.query_tables)
                    if sharded else None)
    i_mgr.layout = (ModRowLayout.for_tables(model.item_table)
                    if sharded else None)
    rq = q_mgr.restore_latest(model.query_tables.data, q_state)
    ri = i_mgr.restore_latest(model.item_table.data, i_state)
    if rq is not None:
        qdata, q_state = rq
        model = dataclasses.replace(
            model,
            query_tables=dataclasses.replace(model.query_tables,
                                             data=qdata),
            **({"q_accum": q_state} if sharded else {"q_state": q_state}))
    if ri is not None:
        idata, i_state = ri
        if sharded:
            model = dataclasses.replace(
                model,
                item_table=dataclasses.replace(model.item_table,
                                               data=idata),
                i_accum=i_state)
        else:
            model = dataclasses.replace(
                model, item_table=model.item_table.replace_data(idata),
                i_state=i_state)
    return model
