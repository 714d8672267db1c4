#!/usr/bin/env python
"""Train a DCN-v2 on synthetic or Criteo Kaggle data.

Examples:
  # Synthetic smoke run on whatever backend is available
  python scripts/train_dcn.py --steps 200 --batch 4096

  # Criteo Kaggle (native parser + prefetch), sharded over all devices
  python scripts/train_dcn.py --criteo /data/train.txt --mesh \
      --steps 10000 --batch 65536 --dim 128 --ckpt /tmp/dcn_ckpt
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--num-cross", type=int, default=3,
                    help="cross layers (polynomial degree num_cross+1)")
    ap.add_argument("--cross-rank", type=int, default=64,
                    help="low-rank cross width; 0 = full (F, F) weights")
    ap.add_argument("--deep-mlp", type=str, default="512,256",
                    help="comma-separated deep-tower widths")
    ap.add_argument("--structure", choices=["stacked", "parallel"],
                    default="stacked")
    ap.add_argument("--criteo", type=str, default=None,
                    help="path to Criteo Kaggle train.txt (else synthetic)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard over all local devices (data axis)")
    ap.add_argument("--auto-shard", action="store_true",
                    help="with --mesh: plan per-table placement and train on it")
    ap.add_argument("--bag", type=int, default=None,
                    help="multi-hot bag size (synthetic data only)")
    ap.add_argument("--combiner", choices=["sum", "mean"], default="sum")
    ap.add_argument("--var-len-bags", action="store_true",
                    help="with --bag: variable-length bags right-padded\nwith the -1 sentinel (cfg.pad_idx; pads carry no gradient)")
    ap.add_argument("--opt", choices=["sgd", "adagrad", "adam", "ftrl"],
                    default="adagrad")
    ap.add_argument("--l1", type=float, default=0.0,
                    help="FTRL l1 (trained sparsity)")
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--clipnorm", type=float, default=None)
    ap.add_argument("--evict-every", type=int, default=0,
                    help="row-lifecycle: evict stale rows every N steps")
    ap.add_argument("--evict-threshold", type=float, default=1e-3)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--warmup-steps", type=int, default=0,
                    help="linear lr warmup for the sparse optimizer")
    ap.add_argument("--lr-decay", choices=["none", "cosine"],
                    default="none",
                    help="sparse-lr decay after warmup (cosine to 0 at\n--steps); traced scalar, zero recompiles")
    ap.add_argument("--dense-opt", choices=["sgd", "adam"],
                    default="sgd",
                    help="tower optimizer: plain SGD at --lr, or optax\nadam (replicated state on mesh placements)")
    ap.add_argument("--eval-every", type=int, default=0)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--eval-metrics", action="store_true",
                    help="full CTR sweep at eval: log loss, normalized entropy,\ncalibration (else AUC only)")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--delta-ckpt", type=str, default=None,
                    help="incremental table checkpoints (base + touched-row "
                         "deltas, utils.deltackpt) into this dir; resumes "
                         "the tables/row state from the latest chain")
    ap.add_argument("--delta-every", type=int, default=500)
    ap.add_argument("--delta-base-every", type=int, default=8,
                    help="every Nth delta save rolls a full base")
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--table-dtype", choices=["float32", "bfloat16"],
                    default=None,
                    help="embedding-TABLE storage dtype (bf16 halves table "
                         "HBM; towers stay f32 — DESIGN.md §7)")
    ap.add_argument("--stochastic-rounding", action="store_true",
                    help="with bf16 tables: stochastic rounding so sub-ulp "
                         "steps accumulate (rounding.py; sgd/adagrad/adam, "
                         "single-chip)")
    ap.add_argument("--dense-grad-dtype", choices=["float32", "bfloat16"],
                    default=None,
                    help="dense-grad SCRATCH dtype for the stateful "
                         "optimizers (default f32, exact; bfloat16 = "
                         "measured -7.4%% on AdaGrad at ~3e-3 rel grad "
                         "err, DESIGN.md \u00a711)")
    ap.add_argument("--prefetch", type=int, default=2)
    ap.add_argument("--device-prefetch", type=int, default=0,
                    help="stage N batches ON DEVICE ahead of the step (hides\nthe host->device upload; 2 is a good start)")
    ap.add_argument("--microbatch", type=int, default=None,
                    help="gradient accumulation: scan the fwd/bwd over N slices\n(single-chip or --mesh gather; pushes batch past the\nactivation HBM limit)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.io import CriteoFileLoader, PrefetchLoader
    from embeddingtables_tpu.models import DCNConfig
    from embeddingtables_tpu.models.train import train_dcn
    from embeddingtables_tpu.optim import (SparseFTRL, SparseLazyAdam,
                                           SparseRowWiseAdaGrad, SparseSGD)
    from embeddingtables_tpu.utils import CheckpointManager
    from embeddingtables_tpu.utils.telemetry import get_telemetry

    vocabs = tuple([args.vocab] * args.tables)
    deep = tuple(int(w) for w in args.deep_mlp.split(",") if w)
    cfg = DCNConfig(vocab_sizes=vocabs, dim=args.dim,
                    num_cross=args.num_cross,
                    cross_rank=args.cross_rank or None,
                    deep_mlp=deep, structure=args.structure,
                    bag=args.bag, combiner=args.combiner,
                    pad_idx=-1 if args.var_len_bags else None,
                    table_dtype=(getattr(jnp, args.table_dtype)
                                 if args.table_dtype else None))
    if args.criteo:
        assert args.tables == 26, "Criteo has 26 categorical features"
        # Eval takes the FIRST eval_batches of the file; the training stream
        # skips that prefix so periodic AUC is measured on unseen examples.
        # epochs=None: cycle the file so long runs never exhaust the
        # stream; skip_batches drops the held-out eval prefix on EVERY
        # pass (no train/eval overlap on later epochs).
        skip = args.eval_batches if args.eval_every else 0
        train_raw = iter(CriteoFileLoader(args.criteo, vocabs, args.batch,
                                          epochs=None, skip_batches=skip))
        train_it = iter(PrefetchLoader(train_raw, depth=args.prefetch))
        eval_batches = list(CriteoFileLoader(args.criteo, vocabs, args.batch,
                                             max_batches=args.eval_batches))
    else:
        gen = SyntheticCriteo(vocab_sizes=vocabs, batch_size=args.batch,
                              bag=args.bag,
                              pad_idx=-1 if args.var_len_bags else None)
        eval_batches = list(gen.batches(args.eval_batches))
        train_it = iter(PrefetchLoader(gen.batches(), depth=args.prefetch))

    mesh = None
    plan = None
    if args.auto_shard and not args.mesh:
        ap.error("--auto-shard requires --mesh (the planner places tables "
                 "across mesh devices); without it the flag would be "
                 "silently ignored")
    if args.mesh:
        from embeddingtables_tpu.parallel.mesh import default_mesh
        mesh = default_mesh(("data",))
        print(f"mesh: {mesh}", flush=True)
        if args.auto_shard:
            from embeddingtables_tpu.parallel.planner import plan_sharding
            plan = plan_sharding(
                vocabs, args.dim, mesh,
                hotness=[float(args.bag or 1)] * args.tables,
                opt_state_scalars={"adagrad": 1, "adam": 2 * args.dim,
                                   "ftrl": 2 * args.dim}.get(args.opt, 0))
            print(plan.summary(), flush=True)

    reg = dict(weight_decay=args.weight_decay, clipnorm=args.clipnorm)
    if args.dense_grad_dtype and args.dense_grad_dtype != "float32":
        reg["dense_grad_dtype"] = args.dense_grad_dtype
    if args.stochastic_rounding:
        if args.opt == "ftrl":
            ap.error("--stochastic-rounding supports sgd/adagrad/adam")
        if args.table_dtype != "bfloat16":
            ap.error("--stochastic-rounding requires --table-dtype bfloat16")
        reg["stochastic_rounding"] = True
    opt = {"sgd": lambda: SparseSGD(args.lr, **reg),
           "adagrad": lambda: SparseRowWiseAdaGrad(lr=args.lr, **reg),
           "adam": lambda: SparseLazyAdam(lr=args.lr, **reg),
           "ftrl": lambda: SparseFTRL(
               lr=args.lr, l1=args.l1, l2=args.weight_decay,
               clipnorm=args.clipnorm,
               dense_grad_dtype=reg.get("dense_grad_dtype"))
           }[args.opt]()
    dense_tx = None
    if args.dense_opt == "adam":
        import optax
        dense_tx = optax.adam(args.lr)
    mgr = CheckpointManager(args.ckpt) if args.ckpt else None
    delta_mgr = None
    resume_model = None
    if args.delta_ckpt:
        from embeddingtables_tpu.utils import DeltaCheckpointManager
        from embeddingtables_tpu.models import init_dcn
        from embeddingtables_tpu.models.train import restore_dlrm_delta
        delta_mgr = DeltaCheckpointManager(args.delta_ckpt,
                                           base_every=args.delta_base_every)
        if delta_mgr.latest_step() is not None:
            resume_model = restore_dlrm_delta(
                delta_mgr, init_dcn(jax.random.key(0), cfg, sparse_opt=opt,
                          dense_tx=dense_tx))
            print(f"resumed tables from delta chain @ step "
                  f"{delta_mgr.latest_step()}", flush=True)

    print(f"backend={jax.default_backend()} devices={jax.device_count()} "
          f"T={args.tables} V={args.vocab} D={args.dim} B={args.batch} "
          f"cross={args.num_cross}x r={args.cross_rank}", flush=True)

    lr_schedule = None
    if args.warmup_steps or args.lr_decay != "none":
        from embeddingtables_tpu.optim import (warmup_constant_lr,
                                               warmup_cosine_lr)
        lr_schedule = (warmup_cosine_lr(args.lr, args.steps,
                                        args.warmup_steps)
                       if args.lr_decay == "cosine"
                       else warmup_constant_lr(args.lr, args.warmup_steps))

    res = train_dcn(cfg, train_it, args.steps, sparse_opt=opt, lr_schedule=lr_schedule, model=resume_model,
                    delta_ckpt=delta_mgr, delta_every=args.delta_every,
                    dense_lr=args.lr, dense_tx=dense_tx,
                    eval_batches=eval_batches,
                    eval_every=args.eval_every,
                     eval_metrics=args.eval_metrics, ckpt_manager=mgr,
                    ckpt_every=args.ckpt_every, log_every=args.log_every,
                    mesh=mesh, microbatch=args.microbatch, plan=plan,
                    device_prefetch=args.device_prefetch,
                    evict_every=args.evict_every,
                    evict_threshold=args.evict_threshold)
    if args.evict_every:
        print(f"evicted rows: {res.evicted_rows}")
    print(f"\n{res.examples_per_sec:,.0f} examples/s")
    if res.aucs:
        print(f"final AUC {res.aucs[-1][1]:.4f}")
    print("\ntelemetry:\n" + get_telemetry().summary())


if __name__ == "__main__":
    main()
