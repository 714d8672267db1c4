#!/usr/bin/env python
"""Train a two-tower retriever on the synthetic planted-structure stream.

Examples:
  # Single-chip smoke run
  python scripts/train_two_tower.py --steps 500 --batch 256

  # Sharded over all devices, larger corpus, recall@20 eval
  python scripts/train_two_tower.py --mesh --steps 5000 --batch 1024 \
      --item-vocab 100000 --k 20 --ckpt /tmp/tt_ckpt
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--embed-dim", type=int, default=64)
    ap.add_argument("--item-vocab", type=int, default=10_000)
    ap.add_argument("--query-vocabs", type=int, nargs="+",
                    default=[2000, 3000])
    ap.add_argument("--num-dense", type=int, default=4)
    ap.add_argument("--mesh", action="store_true",
                    help="shard over all local devices (data axis)")
    ap.add_argument("--opt", choices=["sgd", "adagrad", "adam", "ftrl"],
                    default="adagrad")
    ap.add_argument("--l1", type=float, default=0.0,
                    help="FTRL l1 (trained sparsity)")
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--eval-every", type=int, default=0)
    ap.add_argument("--eval-batches", type=int, default=2)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--ckpt-every", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--table-dtype", choices=["float32", "bfloat16"],
                    default=None,
                    help="embedding-TABLE storage dtype (bf16 halves table "
                         "HBM; MLPs stay f32 — DESIGN.md §7)")
    ap.add_argument("--stochastic-rounding", action="store_true",
                    help="with bf16 tables: stochastic rounding so sub-ulp "
                         "steps accumulate (rounding.py; sgd/adagrad/adam)")
    ap.add_argument("--dense-grad-dtype", choices=["float32", "bfloat16"],
                    default=None,
                    help="dense-grad SCRATCH dtype for the stateful "
                         "optimizers (default f32, exact; bfloat16 = "
                         "measured -7.4%% on AdaGrad at ~3e-3 rel grad "
                         "err, DESIGN.md \u00a711)")
    ap.add_argument("--device-prefetch", type=int, default=0,
                    help="stage N batches ON DEVICE ahead of the step")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from embeddingtables_tpu.data import SyntheticRetrieval
    from embeddingtables_tpu.models.train import train_two_tower
    from embeddingtables_tpu.models.two_tower import TwoTowerConfig
    from embeddingtables_tpu.optim import (SparseFTRL, SparseLazyAdam,
                                           SparseRowWiseAdaGrad, SparseSGD)
    from embeddingtables_tpu.utils import CheckpointManager
    from embeddingtables_tpu.utils.telemetry import get_telemetry

    import jax.numpy as jnp
    cfg = TwoTowerConfig(query_vocab_sizes=tuple(args.query_vocabs),
                         item_vocab=args.item_vocab,
                         num_dense=args.num_dense, dim=args.dim,
                         embed_dim=args.embed_dim,
                         query_mlp=(256, args.embed_dim),
                         item_mlp=(256, args.embed_dim),
                         table_dtype=(getattr(jnp, args.table_dtype)
                                      if args.table_dtype else None))
    gen = SyntheticRetrieval(query_vocab_sizes=cfg.query_vocab_sizes,
                             item_vocab=cfg.item_vocab,
                             num_dense=cfg.num_dense,
                             batch_size=args.batch, seed=args.seed)
    eval_batches = list(SyntheticRetrieval(
        query_vocab_sizes=cfg.query_vocab_sizes, item_vocab=cfg.item_vocab,
        num_dense=cfg.num_dense, batch_size=args.batch,
        seed=args.seed + 1000).batches(args.eval_batches))

    mesh = None
    if args.mesh:
        from embeddingtables_tpu.parallel.mesh import default_mesh
        mesh = default_mesh(("data",))
        print(f"mesh: {mesh}", flush=True)
    reg = {}
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
               lr=args.lr, l1=args.l1,
               dense_grad_dtype=reg.get("dense_grad_dtype"))
           }[args.opt]()
    mgr = CheckpointManager(args.ckpt) if args.ckpt else None

    print(f"backend={jax.default_backend()} devices={jax.device_count()} "
          f"qT={len(cfg.query_vocab_sizes)} itemV={cfg.item_vocab} "
          f"D={cfg.dim} B={args.batch}", flush=True)
    res = train_two_tower(cfg, gen.batches(), args.steps, sparse_opt=opt,
                          dense_lr=args.lr, seed=args.seed,
                          eval_batches=eval_batches,
                          eval_every=args.eval_every, k=args.k,
                          ckpt_manager=mgr, ckpt_every=args.ckpt_every,
                          log_every=args.log_every, mesh=mesh,
                          device_prefetch=args.device_prefetch)
    print(f"\n{res.examples_per_sec:,.0f} examples/s")
    if res.recalls:
        print(f"final recall@{args.k} {res.recalls[-1][1]:.4f}")
    print("\ntelemetry:\n" + get_telemetry().summary())


if __name__ == "__main__":
    main()
