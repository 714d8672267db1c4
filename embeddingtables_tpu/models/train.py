"""Training loops: ONE family-agnostic engine behind four thin entry points.

Single-chip or mesh-sharded (uniform or planner-placed), with telemetry
phases, periodic eval, checkpoint rotation, incremental (delta) table
checkpoints, TTL row eviction, lr schedules, and divergence rollback. The
reference stops at the kernel library (its training loop lives in the
external DLRM repo); this loop is the missing top of the stack, built on the
lazy-sparse-gradient train steps in models/*.py and parallel/*.py.

Structure (round-5 consolidation of four near-identical per-family loops):

  - `_Family` adapters name each family's init / step / eval factories for
    the three placements (single-chip, uniform sharded, planner) plus its
    dense-parameter attributes — the analog of the reference's ONE
    `maplookup`/`update!` surface serving every table type
    (`/root/reference/src/lookup.jl:186-241`, `src/sparseupdate.jl:191-238`).
  - `_resolve_placement` turns (family, mesh, axis, plan) into
    (model, step, eval_step, put) — including the planned-model coercion
    that used to be copy-pasted per family.
  - `_run_loop` owns the per-step cadence: data fetch / prefetch, frequency
    tracking, the jitted step (traced lr + SR keys), eviction, logging with
    the divergence guard and the a2a capacity autotuner, eval, delta saves,
    full checkpoints, and the final fence.
  - `train_dlrm` / `train_dcn` / `train_deepfm` / `train_two_tower` build
    the family hooks and return their result dataclasses; signatures are
    unchanged from the per-family loops they replace.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterator, Optional

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


@dataclasses.dataclass
class RetrievalTrainResult:
    model: object            # TwoTower (unsharded view when mesh was given)
    losses: list
    accs: list               # in-batch top-1 accuracy at log cadence
    recalls: list            # [(step, recall@k)]
    examples_per_sec: float


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


# ---------------------------------------------------------------------------
# Family adapters + placement resolution
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class _Family:
    """Names one model family for `_resolve_placement`: where its init /
    train-step / eval-step factories live at each placement, which model
    classes mark each placement, and which attributes hold the replicated
    dense parameters (the planner coercion device_puts exactly those)."""

    name: str
    modules: Callable[[], tuple]      # () -> (single_mod, sharded_mod)
    planned: Callable[[], tuple]      # () -> (PlannedCls, init, step, eval)
    single_cls: Callable[[], type]
    dense_attrs: tuple                # replicated dense parameter fields
    shard_fn: str                     # sharded_mod attr: single -> sharded
    sharded_step: str
    sharded_eval: str
    single_init: str
    single_step: str = "make_train_step"
    single_eval: str = "make_eval_step"


def _dlrm_family() -> _Family:
    def mods():
        from ..models import dlrm as single
        from ..parallel import dlrm as sharded
        return single, sharded

    def planned():
        from ..parallel.planner import (PlannedDLRM, init_planned_dlrm,
                                        make_planned_eval_step,
                                        make_planned_train_step)
        return (PlannedDLRM, init_planned_dlrm, make_planned_train_step,
                make_planned_eval_step)

    def single_cls():
        from .dlrm import DLRM
        return DLRM

    return _Family(name="dlrm", modules=mods, planned=planned,
                   single_cls=single_cls, dense_attrs=("bottom", "top"),
                   shard_fn="shard_dlrm",
                   sharded_step="make_sharded_train_step",
                   sharded_eval="make_sharded_eval_step",
                   single_init="init_dlrm")


def _dcn_family() -> _Family:
    def mods():
        from ..models import dcn as single
        from ..parallel import dcn as sharded
        return single, sharded

    def planned():
        from ..parallel.planner import (PlannedDCN, init_planned_dcn,
                                        make_planned_dcn_eval_step,
                                        make_planned_dcn_train_step)
        return (PlannedDCN, init_planned_dcn, make_planned_dcn_train_step,
                make_planned_dcn_eval_step)

    def single_cls():
        from .dcn import DCN
        return DCN

    return _Family(name="dcn", modules=mods, planned=planned,
                   single_cls=single_cls,
                   dense_attrs=("cross", "deep", "head"),
                   shard_fn="shard_dcn",
                   sharded_step="make_sharded_dcn_train_step",
                   sharded_eval="make_sharded_dcn_eval_step",
                   single_init="init_dcn")


def _deepfm_family() -> _Family:
    def mods():
        from ..models import deepfm as single
        from ..parallel import deepfm as sharded
        return single, sharded

    def planned():
        from ..parallel.planner import (PlannedDeepFM, init_planned_deepfm,
                                        make_planned_deepfm_eval_step,
                                        make_planned_deepfm_train_step)
        return (PlannedDeepFM, init_planned_deepfm,
                make_planned_deepfm_train_step,
                make_planned_deepfm_eval_step)

    def single_cls():
        from .deepfm import DeepFM
        return DeepFM

    return _Family(name="deepfm", modules=mods, planned=planned,
                   single_cls=single_cls,
                   dense_attrs=("deep", "head", "dense_w", "bias"),
                   shard_fn="shard_deepfm",
                   sharded_step="make_sharded_deepfm_train_step",
                   sharded_eval="make_sharded_deepfm_eval_step",
                   single_init="init_deepfm")


def _coerce_planned(fam: _Family, model, cfg, plan, mesh, sparse_opt,
                    dense_tx, tel, seed):
    """Shared planner-placement model coercion: init fresh, or carry a
    trained single-chip model's tables + row state onto the plan (resume
    semantics match the uniform shard_* accum reshard), or accept an
    already-planned model. Replicates the dense attrs; initializes the
    replicated optax tower state when `dense_tx` is set and absent."""
    from jax.sharding import NamedSharding, PartitionSpec as _P
    from ..parallel.planner import place_stacked_on_plan
    planned_cls, init_planned, _, _ = fam.planned()
    single_cls = fam.single_cls()
    if model is None:
        with tel.phase("init"):
            model = init_planned(jax.random.key(seed), cfg, plan, mesh,
                                 sparse_opt=sparse_opt, dense_tx=dense_tx)
    elif isinstance(model, single_cls):
        if fam.name == "deepfm" and model.fm_w is not None:
            raise ValueError(
                "plan= supports the folded DeepFM layout only; "
                "convert with models.deepfm.fuse_deepfm first")
        pt = place_stacked_on_plan(plan, mesh, model.tables,
                                   model.emb_state, sparse_opt)
        repl = NamedSharding(mesh, _P())
        dense = {a: jax.device_put(getattr(model, a), repl)
                 for a in fam.dense_attrs}
        dstate = model.dense_opt_state
        if dstate is None and dense_tx is not None:
            dstate = dense_tx.init(tuple(dense[a] for a in fam.dense_attrs))
        if dstate is not None:
            dstate = jax.device_put(dstate, repl)
        model = planned_cls(tables=pt, config=cfg, dense_opt_state=dstate,
                            **dense)
    elif not isinstance(model, planned_cls):
        raise TypeError(
            f"plan= expects a {single_cls.__name__} or "
            f"{planned_cls.__name__} model, got {type(model).__name__} "
            "(unshard a sharded model first)")
    if dense_tx is not None and model.dense_opt_state is None:
        # A planned model resumed from a plain-SGD run: initialize the
        # replicated tower state here (mirrors the shard_* contract).
        from jax.sharding import NamedSharding as _NS, PartitionSpec as _PS
        model = dataclasses.replace(
            model, dense_opt_state=jax.device_put(
                dense_tx.init(tuple(getattr(model, a)
                                    for a in fam.dense_attrs)),
                _NS(mesh, _PS())))
    return model


def _batch_put(mesh, axis_or_shardings):
    """dense/cat/label device_put closure for a sharded placement (the
    planner paths all use the DLRM batch shardings)."""
    from ..parallel.dlrm import batch_shardings
    sd, sc, sl = batch_shardings(mesh, axis_or_shardings)
    return lambda b: (jax.device_put(b["dense"], sd),
                      jax.device_put(b["cat"], sc),
                      jax.device_put(b["label"], sl))


def _resolve_placement(fam: _Family, cfg, model, *, mesh, axis, plan,
                       sparse_opt, dense_lr, dense_tx, microbatch, seed,
                       tel, sharded_step_kwargs=None):
    """(model, build_step, eval_step, put) for the requested placement.

    `build_step(capacity_factor)` rebuilds the train step — only the DLRM
    a2a autotuner ever calls it with a new factor; other families ignore
    the argument. `sharded_step_kwargs` carries DLRM's exchange /
    capacity / overflow / wire options into its sharded factory."""
    extra = dict(sharded_step_kwargs or {})
    if mesh is not None and plan is not None:
        model = _coerce_planned(fam, model, cfg, plan, mesh, sparse_opt,
                                dense_tx, tel, seed)
        _, _, make_step, make_eval = fam.planned()

        def build_step(cf):
            return make_step(cfg, mesh, sparse_opt=sparse_opt,
                             dense_lr=dense_lr, dense_tx=dense_tx,
                             microbatch=microbatch)

        return model, build_step, make_eval(cfg, mesh), \
            _batch_put(mesh, plan.axis)
    single_mod, _ = fam.modules()
    if mesh is not None:
        _, sharded_mod = fam.modules()
        if model is None:
            with tel.phase("init"):
                model = getattr(single_mod, fam.single_init)(
                    jax.random.key(seed), cfg, sparse_opt=sparse_opt,
                    dense_tx=dense_tx)
        if isinstance(model, fam.single_cls()):
            model = getattr(sharded_mod, fam.shard_fn)(
                model, mesh, axis, sparse_opt=sparse_opt, dense_tx=dense_tx)
        make_step = getattr(sharded_mod, fam.sharded_step)
        make_eval = getattr(sharded_mod, fam.sharded_eval)

        def build_step(cf):
            kw = dict(extra)
            if "capacity_factor" in kw:
                kw["capacity_factor"] = cf
            return make_step(cfg, mesh, axis, sparse_opt=sparse_opt,
                             dense_lr=dense_lr, dense_tx=dense_tx,
                             microbatch=microbatch, **kw)

        # Uniform sharded batch shardings come from the family's own
        # parallel module (same spec as the DLRM one today).
        sd, sc, sl = getattr(sharded_mod, "batch_shardings")(mesh, axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["cat"], sc),
                         jax.device_put(b["label"], sl))
        return model, build_step, make_eval(cfg, mesh, axis), put
    if model is None:
        with tel.phase("init"):
            model = getattr(single_mod, fam.single_init)(
                jax.random.key(seed), cfg, sparse_opt=sparse_opt,
                dense_tx=dense_tx)

    def build_step(cf):
        return getattr(single_mod, fam.single_step)(
            cfg, sparse_opt=sparse_opt, dense_lr=dense_lr,
            microbatch=microbatch, dense_tx=dense_tx)

    put = lambda b: (jnp.asarray(b["dense"]),                  # noqa: E731
                     jnp.asarray(b["cat"]),
                     jnp.asarray(b["label"]))
    return model, build_step, getattr(single_mod, fam.single_eval)(cfg), put


# ---------------------------------------------------------------------------
# The engine: one loop owning every cadence
# ---------------------------------------------------------------------------

def _run_loop(*, model, step, put, train_iter, num_steps, tel,
              batch_count, lr_schedule=None, sr_key=None,
              track_fn=None, evict_every=0, evict_fn=None,
              post_step_fn=None,
              split_out=None,
              log_every=100, verbose=True, on_log=None,
              guard=None, on_rollback=None,
              tuner=None, tuner_occ_fn=None, rebuild_step=None,
              eval_every=0, eval_batches=None, eval_fn=None,
              delta_fn=None,
              ckpt_manager=None, ckpt_every=0,
              device_prefetch=0):
    """The shared per-step cadence (see module docstring). Hook contract:

      split_out(out) -> (loss_like, overflow_or_None)   default: (out, None)
      track_fn(batch)                 feed frequency trackers
      evict_fn(model) -> (model, n)   at evict_every cadence
      post_step_fn(i, model, batch)   e.g. two-tower delta observe+save
      on_log(i, loss_value)           e.g. two-tower in-batch accuracy
      on_rollback()                   guard rolled the model back
      tuner_occ_fn(batch) -> int      a2a autotuner routed-occurrence count
      eval_fn(model) -> (value, line) at eval_every cadence
      delta_fn(i, model, batch)       CTR delta observe + cadence save

    Returns (model, losses, evals, examples_per_sec, evicted_total).
    """
    split_out = split_out or (lambda out: (out, None))
    losses, evals = [], []
    examples = 0
    evicted_total = 0
    step_fn = step
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
        if track_fn is not None:
            track_fn(batch)
        with tel.phase("step"):
            kw = {}
            if lr_schedule is not None:
                # Traced scalar: a schedule costs ZERO recompiles.
                kw["lr"] = jnp.float32(lr_schedule(i))
            if sr_key is not None:
                kw["key"] = jax.random.fold_in(sr_key, i)
            model, out = step_fn(model, *args, **kw)
        if evict_fn is not None and (i + 1) % evict_every == 0:
            # pop_cold: only rows seen-then-stale, marked so they are not
            # re-evicted every interval (never-seen rows sit at init).
            model, n = evict_fn(model)
            evicted_total += n
        if post_step_fn is not None:
            post_step_fn(i, model, batch)
        loss, ovf = split_out(out)
        examples += batch_count(batch)
        if tuner is not None and i == 0:
            tuner.occ = tuner_occ_fn(batch)
        if log_every and (i % log_every == 0 or i == num_steps - 1):
            lv = float(loss)  # fences the chain; keeps timing honest
            losses.append(lv)
            if tuner is not None:
                new_cf = tuner.observe(int(ovf))
                if new_cf is not None:
                    with tel.phase("retune"):
                        step_fn = rebuild_step(new_cf)
                    if verbose:
                        print(f"step {i:6d}  overflow {int(ovf)} — capacity "
                              f"factor -> {new_cf:.2f} (step rebuilt)",
                              flush=True)
            if guard is not None:
                # Divergence watchdog (checked at log cadence — a per-step
                # device->host fetch would serialize the pipeline).
                model, rolled = guard.observe(lv, model)
                if rolled:
                    if on_rollback is not None:
                        on_rollback()
                    if verbose:
                        print(f"step {i:6d}  DIVERGED (loss {lv:.3g}) — "
                              f"rolled back to checkpoint", flush=True)
            if on_log is not None:
                on_log(i, lv)
            elif verbose:
                print(f"step {i:6d}  loss {lv:.5f}", flush=True)
        if eval_every and eval_batches and (i + 1) % eval_every == 0:
            with tel.phase("eval"):
                value, line = eval_fn(model)
            evals.append((i + 1, value))
            if verbose:
                print(f"step {i+1:6d}  {line}", flush=True)
        if delta_fn is not None:
            delta_fn(i, model, batch)
        if ckpt_manager is not None and ckpt_every and \
                (i + 1) % ckpt_every == 0:
            with tel.phase("checkpoint"):
                ckpt_manager.save(i + 1, model)
    # Final fence for an honest rate.
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, model)
    dt = time.perf_counter() - t_start
    return model, losses, evals, examples / dt, evicted_total


def _sr_key_for(sparse_opt, seed):
    """Per-step SR keys when the optimizer stochastically rounds. Every
    placement threads them (planner: replicated + row-sharded groups; a
    col_shard group rejects loudly inside planned_apply). Fresh key per
    step (folded by index): SR's unbiasedness needs independent noise."""
    if getattr(sparse_opt, "stochastic_rounding", False):
        return jax.random.key(seed + 1_000_003)
    return None


def _ctr_hooks(fam: _Family, cfg, model, *, plan, mesh, evict_every,
               evict_threshold, freq_decay, delta_ckpt, delta_every, tel,
               eval_step, eval_metrics, eval_batches=None,
               evict_stacks_fn=None):
    """The CTR-shared hook bundle: frequency trackers + eviction, delta
    observe/save, eval (AUC or full metric sweep), guard rollback."""
    trackers = None
    track_fn = evict_fn = None
    if evict_every:
        from ..utils.rowstats import FrequencyTracker
        trackers = [FrequencyTracker(v, decay=freq_decay)
                    for v in cfg.vocab_sizes]

        def track_fn(batch):
            for t, tr in enumerate(trackers):
                ids = batch["cat"][t]
                if getattr(cfg, "pad_idx", None) is not None:
                    # np.bincount rejects the (negative) sentinel, and a
                    # pad must not count as traffic anyway.
                    ids = ids[ids != cfg.pad_idx]
                tr.observe(ids)

    delta_tracker = _delta_setup(delta_ckpt, delta_every, plan, mesh, model)

    if evict_every:
        def evict_fn(m):
            stacks = (("tables", "emb_state", "emb_accum"),)
            if evict_stacks_fn is not None:
                stacks = evict_stacks_fn(m)
            return _maybe_evict(m, trackers, plan, mesh, evict_threshold,
                                stacks=stacks, delta_tracker=delta_tracker)

    delta_fn = None
    if delta_tracker is not None:
        def delta_fn(i, m, batch):
            delta_tracker.observe_batch(batch["cat"], m.tables.offsets,
                                        pad_idx=getattr(cfg, "pad_idx",
                                                        None))
            if (i + 1) % delta_every == 0:
                with tel.phase("delta_ckpt"):
                    delta_ckpt.save(i + 1, m.tables.data,
                                    _delta_state(m), delta_tracker)

    def on_rollback():
        if delta_ckpt is not None:
            # The live model jumped to an older snapshot; the tracker can
            # no longer name the rows that differ from the last save.
            # Next save = full base.
            delta_ckpt.force_base()

    def eval_fn(m):
        if eval_metrics:
            met = evaluate_metrics(eval_step, m, eval_batches)
            return met["auc"], (
                f"eval AUC {met['auc']:.4f}  logloss "
                f"{met['log_loss']:.5f}  NE "
                f"{met['normalized_entropy']:.4f}  calib "
                f"{met['calibration']:.3f}")
        a = evaluate_auc(eval_step, m, eval_batches)
        return a, f"eval AUC {a:.4f}"

    return track_fn, evict_fn, delta_fn, on_rollback, eval_fn


def _train_ctr(fam: _Family, cfg, train_iter, num_steps, *, sparse_opt,
               dense_lr, dense_tx, model, seed, eval_batches, eval_every,
               ckpt_manager, ckpt_every, log_every, mesh, axis, microbatch,
               guard, device_prefetch, plan, evict_every, evict_threshold,
               freq_decay, eval_metrics, lr_schedule, delta_ckpt,
               delta_every, verbose, sharded_step_kwargs=None, tuner=None,
               tuner_occ_fn=None, with_overflow=False,
               evict_stacks_fn=None) -> TrainResult:
    """The generic CTR (dense/cat/label) training run."""
    tel = _telemetry.get_telemetry()
    if plan is not None and mesh is None:
        raise ValueError("plan= requires mesh=")
    model, build_step, eval_step, put = _resolve_placement(
        fam, cfg, model, mesh=mesh, axis=axis, plan=plan,
        sparse_opt=sparse_opt, dense_lr=dense_lr, dense_tx=dense_tx,
        microbatch=microbatch, seed=seed, tel=tel,
        sharded_step_kwargs=sharded_step_kwargs)
    step = build_step(None if sharded_step_kwargs is None
                      else sharded_step_kwargs.get("capacity_factor"))
    track_fn, evict_fn, delta_fn, on_rollback, eval_fn = _ctr_hooks(
        fam, cfg, model, plan=plan, mesh=mesh, evict_every=evict_every,
        evict_threshold=evict_threshold, freq_decay=freq_decay,
        delta_ckpt=delta_ckpt, delta_every=delta_every, tel=tel,
        eval_step=eval_step, eval_metrics=eval_metrics,
        eval_batches=eval_batches, evict_stacks_fn=evict_stacks_fn)
    model, losses, aucs, eps, evicted = _run_loop(
        model=model, step=step, put=put, train_iter=train_iter,
        num_steps=num_steps, tel=tel,
        batch_count=lambda b: b["label"].shape[0],
        lr_schedule=lr_schedule, sr_key=_sr_key_for(sparse_opt, seed),
        track_fn=track_fn, evict_every=evict_every, evict_fn=evict_fn,
        split_out=((lambda out: out) if with_overflow else None),
        log_every=log_every, verbose=verbose, guard=guard,
        on_rollback=on_rollback, tuner=tuner, tuner_occ_fn=tuner_occ_fn,
        rebuild_step=build_step,
        eval_every=eval_every, eval_batches=eval_batches, eval_fn=eval_fn,
        delta_fn=delta_fn, ckpt_manager=ckpt_manager, ckpt_every=ckpt_every,
        device_prefetch=device_prefetch)
    return TrainResult(model=model, losses=losses, aucs=aucs,
                       examples_per_sec=eps, evicted_rows=evicted)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

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
    if plan is not None and exchange != "gather":
        raise NotImplementedError(
            "planner-placed training supports the gather exchange only")
    if wire_dtype is not None and (mesh is None or exchange != "a2a"):
        raise ValueError(
            "wire_dtype requires mesh= with exchange='a2a' (it compresses "
            "the butterfly's row payloads; other paths would silently "
            "ignore it)")
    with_overflow = mesh is not None and exchange == "a2a" and auto_capacity
    tuner = None
    tuner_occ_fn = None
    if with_overflow:
        from ..parallel.alltoall import CapacityAutoTuner
        tuner = CapacityAutoTuner(capacity_factor, 1)  # occ set on 1st batch
        # 2x routed occurrences (forward lookup + backward update).
        tuner_occ_fn = lambda b: (2 * b["label"].shape[0]      # noqa: E731
                                  * len(cfg.vocab_sizes) * (cfg.bag or 1))
    sharded_step_kwargs = None
    if mesh is not None and plan is None:
        sharded_step_kwargs = dict(exchange=exchange,
                                   capacity_factor=capacity_factor,
                                   with_overflow=with_overflow,
                                   wire_dtype=wire_dtype)
    return _train_ctr(
        _dlrm_family(), cfg, train_iter, num_steps, sparse_opt=sparse_opt,
        dense_lr=dense_lr, dense_tx=dense_tx, model=model, seed=seed,
        eval_batches=eval_batches, eval_every=eval_every,
        ckpt_manager=ckpt_manager, ckpt_every=ckpt_every,
        log_every=log_every, mesh=mesh, axis=axis, microbatch=microbatch,
        guard=guard, device_prefetch=device_prefetch, plan=plan,
        evict_every=evict_every, evict_threshold=evict_threshold,
        freq_decay=freq_decay, eval_metrics=eval_metrics,
        lr_schedule=lr_schedule, delta_ckpt=delta_ckpt,
        delta_every=delta_every, verbose=verbose,
        sharded_step_kwargs=sharded_step_kwargs, tuner=tuner,
        tuner_occ_fn=tuner_occ_fn, with_overflow=with_overflow)


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
    return _train_ctr(
        _dcn_family(), cfg, train_iter, num_steps, sparse_opt=sparse_opt,
        dense_lr=dense_lr, dense_tx=dense_tx, model=model, seed=seed,
        eval_batches=eval_batches, eval_every=eval_every,
        ckpt_manager=ckpt_manager, ckpt_every=ckpt_every,
        log_every=log_every, mesh=mesh, axis=axis, microbatch=microbatch,
        guard=guard, device_prefetch=device_prefetch, plan=plan,
        evict_every=evict_every, evict_threshold=evict_threshold,
        freq_decay=freq_decay, eval_metrics=eval_metrics,
        lr_schedule=lr_schedule, delta_ckpt=delta_ckpt,
        delta_every=delta_every, verbose=verbose)


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
    def evict_stacks_fn(m):
        # Folded layout (and the planner path): ONE stack carries both
        # representations (a stale row loses its FM vector, first-order
        # weight, and the fused optimizer state in one eviction).
        fm_stacks = (() if getattr(m, "fm_w", None) is None
                     else (("fm_w", "fm_state", "fm_accum"),))
        return (("tables", "emb_state", "emb_accum"),) + fm_stacks

    return _train_ctr(
        _deepfm_family(), cfg, train_iter, num_steps, sparse_opt=sparse_opt,
        dense_lr=dense_lr, dense_tx=dense_tx, model=model, seed=seed,
        eval_batches=eval_batches, eval_every=eval_every,
        ckpt_manager=ckpt_manager, ckpt_every=ckpt_every,
        log_every=log_every, mesh=mesh, axis=axis, microbatch=microbatch,
        guard=guard, device_prefetch=device_prefetch, plan=plan,
        evict_every=evict_every, evict_threshold=evict_threshold,
        freq_decay=freq_decay, eval_metrics=eval_metrics,
        lr_schedule=lr_schedule, delta_ckpt=delta_ckpt,
        delta_every=delta_every, verbose=verbose,
        evict_stacks_fn=evict_stacks_fn)


def train_two_tower(cfg, train_iter, num_steps: int, *, sparse_opt=None,
                    dense_lr: float = 0.05, model=None, seed: int = 0,
                    eval_batches=None, eval_every: int = 0, k: int = 10,
                    ckpt_manager=None, ckpt_every: int = 0,
                    log_every: int = 100, mesh=None, axis: str = "data",
                    device_prefetch: int = 0, plan=None,
                    delta_ckpt=None, delta_every: int = 0,
                    verbose: bool = True) -> RetrievalTrainResult:
    """Train a two-tower retriever for `num_steps` batches from `train_iter`
    (dicts with dense/q_cat/item_ids — `data.SyntheticRetrieval`'s layout).

    mesh=None -> single-chip contrastive step; mesh given -> the sharded
    step (parallel/two_tower.py: DP batch, GSPMD in-batch softmax,
    mod-row-sharded tables); mesh + plan=(q_plan, i_plan) -> the planner's
    mixed placement on BOTH row spaces (query stack under q_plan, the item
    corpus as a single-table plan under i_plan —
    `parallel.planner.PlannedTwoTower`; the result carries the planned
    model, like the CTR planner loops). Periodic eval rebuilds the item
    index and measures recall@k of the positive item over `eval_batches`.
    """
    from ..metrics import recall_at_k
    from ..optim import SparseSGD
    from .two_tower import (build_item_index, init_two_tower, make_train_step
                            as make_tt_step, retrieve)
    tel = _telemetry.get_telemetry()
    sparse_opt = sparse_opt or SparseSGD(0.05)
    if plan is not None and mesh is None:
        raise ValueError("plan= requires mesh=")
    if plan is not None and delta_ckpt is not None:
        raise NotImplementedError(
            "delta checkpointing covers single-chip and uniform sharded "
            "placements (a planner placement has no single global row "
            "space)")
    if model is None and plan is None:
        with tel.phase("init"):
            model = init_two_tower(jax.random.key(seed), cfg,
                                   sparse_opt=sparse_opt)
    sharded = mesh is not None
    if plan is not None:
        from ..parallel.planner import (PlannedTwoTower,
                                        init_planned_two_tower,
                                        make_planned_tt_train_step,
                                        place_two_tower_on_plan,
                                        planned_build_item_index,
                                        planned_retrieve)
        from ..parallel.two_tower import tt_batch_shardings
        from .two_tower import TwoTower
        q_plan, i_plan = plan
        if model is None:
            with tel.phase("init"):
                model = init_planned_two_tower(jax.random.key(seed), cfg,
                                               q_plan, i_plan, mesh,
                                               sparse_opt=sparse_opt)
        elif isinstance(model, TwoTower):
            model = place_two_tower_on_plan(q_plan, i_plan, mesh, model,
                                            sparse_opt)
        elif not isinstance(model, PlannedTwoTower):
            raise TypeError(
                f"plan= expects a TwoTower or PlannedTwoTower model, got "
                f"{type(model).__name__} (unshard a sharded model first)")
        step = make_planned_tt_train_step(cfg, mesh,
                                          sparse_opt=sparse_opt,
                                          dense_lr=dense_lr)
        sd, sq, si = tt_batch_shardings(mesh, q_plan.axis)
        put = lambda b: (jax.device_put(b["dense"], sd),       # noqa: E731
                         jax.device_put(b["q_cat"], sq),
                         jax.device_put(b["item_ids"], si))
        to_dense = lambda m: m                                 # noqa: E731

        def eval_recall_planned(m):
            index = planned_build_item_index(mesh, m)
            hits, total = 0.0, 0
            for b in eval_batches:
                _, ids = planned_retrieve(mesh, m, index, b["dense"],
                                          b["q_cat"], k=k)
                n = b["item_ids"].shape[0]
                hits += recall_at_k(b["item_ids"], ids) * n
                total += n
            return hits / max(total, 1)
    elif sharded:
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

    def eval_fn(m):
        if plan is not None:
            r = eval_recall_planned(m)
            return r, f"recall@{k} {r:.4f}"
        dense_m = to_dense(m)
        index = build_item_index(dense_m)
        hits, total = 0.0, 0
        for b in eval_batches:
            _, ids = retrieve(dense_m, index, jnp.asarray(b["dense"]),
                              jnp.asarray(b["q_cat"]), k=k)
            n = b["item_ids"].shape[0]
            hits += recall_at_k(b["item_ids"], ids) * n
            total += n
        r = hits / max(total, 1)
        return r, f"recall@{k} {r:.4f}"

    post_step_fn = None
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

        def post_step_fn(i, m, batch):
            q_tracker.observe_batch(batch["q_cat"], m.query_tables.offsets)
            i_tracker.observe(batch["item_ids"])
            if (i + 1) % delta_every == 0:
                with tel.phase("delta_ckpt"):
                    q_mgr.save(i + 1, m.query_tables.data,
                               m.q_accum if sharded else m.q_state,
                               q_tracker)
                    i_mgr.save(i + 1, m.item_table.data,
                               m.i_accum if sharded else m.i_state,
                               i_tracker)

    # The two-tower step returns (loss, in-batch top-1 acc); the engine
    # logs loss, the on_log hook records and prints the accuracy.
    accs = []
    acc_box = {}

    def split_out(out):
        loss, acc = out
        acc_box["acc"] = acc
        return loss, None

    def on_log(i, lv):
        av = float(acc_box["acc"])
        accs.append(av)
        if verbose:
            print(f"step {i:6d}  loss {lv:.5f}  in-batch acc {av:.3f}",
                  flush=True)

    model, losses, recalls, eps, _ = _run_loop(
        model=model, step=step, put=put, train_iter=train_iter,
        num_steps=num_steps, tel=tel,
        batch_count=lambda b: b["item_ids"].shape[0],
        sr_key=_sr_key_for(sparse_opt, seed),
        post_step_fn=post_step_fn, split_out=split_out,
        log_every=log_every, verbose=verbose, on_log=on_log,
        eval_every=eval_every, eval_batches=eval_batches, eval_fn=eval_fn,
        ckpt_manager=ckpt_manager, ckpt_every=ckpt_every,
        device_prefetch=device_prefetch)
    return RetrievalTrainResult(model=to_dense(model), losses=losses,
                                accs=accs, recalls=recalls,
                                examples_per_sec=eps)


# ---------------------------------------------------------------------------
# Delta-checkpoint state + restore (one restore for every family)
# ---------------------------------------------------------------------------

def _delta_state(model):
    """The 'state' pytree a CTR delta checkpoint covers for `model`.
    DLRM/DCN: the stacked ensemble's sparse-optimizer row state. DeepFM
    legacy layout additionally carries the dim-1 first-order stack's rows
    + state (same global row ids as the FM stack — shared offsets — so one
    tracker covers everything); folded DeepFM is indistinguishable from
    DLRM here (one fused stack)."""
    sharded = hasattr(model, "emb_accum")
    st = model.emb_accum if sharded else model.emb_state
    fm_w = getattr(model, "fm_w", None)
    if fm_w is None:
        return st
    return (st, fm_w.data, model.fm_accum if sharded else model.fm_state)


_deepfm_delta_state = _delta_state   # former name (round-4 API)


def restore_delta(delta_ckpt, model):
    """Resume `model`'s tables + sparse-optimizer row state from the
    `DeltaCheckpointManager` chain(s) `train_*`'s `delta_ckpt=` wrote.

    One entry point for every family (the three per-family helpers below
    are aliases): DLRM/DCN (single-chip or uniform sharded), DeepFM (both
    layouts — the legacy dim-1 stack restores alongside), and two-tower
    (pass the same (query_mgr, item_mgr) pair `train_two_tower` took).
    Restores scatter by global row id through the matching layout, so the
    chain's origin placement is irrelevant (either direction works).
    Dense towers are untouched — pair with a full `ckpt_manager` when they
    must resume too. Returns `model` unchanged where a directory holds no
    committed base."""
    from ..utils.deltackpt import ModRowLayout
    if hasattr(model, "query_tables"):
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
                **({"q_accum": q_state} if sharded
                   else {"q_state": q_state}))
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

    sharded = hasattr(model, "emb_accum")
    state = _delta_state(model)
    delta_ckpt.layout = (ModRowLayout.for_tables(model.tables)
                         if sharded else None)
    key = "emb_accum" if sharded else "emb_state"
    fm_w = getattr(model, "fm_w", None)
    if fm_w is None:
        restored = delta_ckpt.restore_latest(model.tables.data, state)
        if restored is None:
            return model
        data, st = restored
        tables = dataclasses.replace(model.tables, data=data)
        return dataclasses.replace(model, tables=tables, **{key: st})
    restored = delta_ckpt.restore_latest(model.tables.data, state)
    if restored is None:
        return model
    data, (est, fmdata, fst) = restored
    tables = dataclasses.replace(model.tables, data=data)
    new_fm = dataclasses.replace(fm_w, data=fmdata)
    fm_key = "fm_accum" if sharded else "fm_state"
    return dataclasses.replace(model, tables=tables, fm_w=new_fm,
                               **{key: est, fm_key: fst})


# Per-family names kept from rounds 2-4 (same behavior; one implementation).
restore_dlrm_delta = restore_delta
restore_deepfm_delta = restore_delta
restore_two_tower_delta = restore_delta
