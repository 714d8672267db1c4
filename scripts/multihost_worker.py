#!/usr/bin/env python
"""Multi-host (multi-process) sharded-DLRM worker — the executable proof that
the distributed layer runs across REAL process boundaries, not just on a
single-process virtual mesh (SURVEY.md §5 "Distributed communication
backend"; round-1 review item 4).

Launched by tests/test_multihost.py (and usable standalone):

  # 2-process distributed run (4 virtual CPU devices each -> 8 global):
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python scripts/multihost_worker.py dist <port> 0 &
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python scripts/multihost_worker.py dist <port> 1

  # Single-process 8-device control with the SAME logical (4, 2) mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/multihost_worker.py single

Each run prints one JSON line: losses of two sharded train steps (AdaGrad —
exercises the dedup/owned-row exchange) plus table/accumulator checksums.
The distributed result must match the single-process control bit-for-bit in
math terms (same logical mesh, same data): collectives ride gloo TCP across
the process boundary instead of intra-process threads.
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main():
    mode = sys.argv[1]
    exchange = sys.argv[4] if len(sys.argv) > 4 else (
        sys.argv[2] if mode == "single" and len(sys.argv) > 2 else "gather")
    import jax
    # JAX_PLATFORMS env is unreliable under the axon wrapper (CLAUDE.md);
    # the pre-init config switch is the supported path.
    jax.config.update("jax_platforms", "cpu")
    if mode == "dist":
        port, pid = sys.argv[2], int(sys.argv[3])
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   init_sharded_dlrm,
                                                   make_sharded_train_step)
    from embeddingtables_tpu.parallel.mesh import multihost_mesh

    devices = np.asarray(jax.devices())
    assert devices.size == 8, devices
    if mode == "dist":
        # (local=4, hosts=2): data axis inside a host, model across hosts.
        mesh = multihost_mesh(("data", "model"))
        assert mesh.devices.shape == (4, 2), mesh
    else:
        # Same logical (4, 2) grid from one process's 8 devices.
        mesh = Mesh(devices.reshape(2, 4).T, ("data", "model"))

    axes = ("data", "model")
    cfg = DLRMConfig(vocab_sizes=(64, 96, 33), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    opt = SparseRowWiseAdaGrad(lr=0.2)
    if exchange == "planner":
        # Mixed placement: the small tables replicate (zero-ICI local
        # gathers), the 96-vocab one row-shards over the axes product —
        # the planner's collectives crossing the process boundary.
        from embeddingtables_tpu.parallel.planner import (
            init_planned_dlrm, make_planned_train_step, plan_sharding)
        plan = plan_sharding(cfg.vocab_sizes, cfg.dim, mesh, axes,
                             replicate_max_bytes=8 * 4 * 70,
                             opt_state_scalars=1)
        assert plan.replicated and plan.sharded, plan.summary()
        model = init_planned_dlrm(jax.random.key(0), cfg, plan, mesh,
                                  sparse_opt=opt)
        step = make_planned_train_step(cfg, mesh, sparse_opt=opt,
                                       dense_lr=0.2)
    else:
        model = init_sharded_dlrm(jax.random.key(0), cfg, mesh, axes,
                                  sparse_opt=opt)
        step = make_sharded_train_step(cfg, mesh, axes, sparse_opt=opt,
                                       dense_lr=0.2, exchange=exchange,
                                       capacity_factor=16.0)

    sd, sc, sl = batch_shardings(mesh, axes)

    def put(arr, sharding):
        # Multi-controller-safe placement: every process holds the full host
        # batch; each device picks its addressable slice.
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    rng = np.random.default_rng(7)
    losses = []
    for _ in range(2):
        dense = rng.normal(size=(32, 4)).astype(np.float32)
        # Duplicates on purpose: the dedup/owned-row exchange must agree
        # across the process boundary.
        cat = np.stack([rng.integers(0, v // 2, (32,)).astype(np.int32)
                        for v in cfg.vocab_sizes])
        label = rng.integers(0, 2, 32).astype(np.float32)
        model, loss = step(model, put(dense, sd), put(cat, sc),
                           put(label, sl))
        losses.append(float(loss))

    if exchange == "planner":
        checks = jax.jit(lambda m: (
            jnp.vdot(m.tables.repl, m.tables.repl)
            + jnp.vdot(m.tables.shard.data, m.tables.shard.data),
            jnp.sum(m.tables.repl_accum) + jnp.sum(m.tables.shard_accum),
            sum(jnp.vdot(w, w) for w, _ in m.bottom)))(model)
    else:
        checks = jax.jit(lambda m: (jnp.vdot(m.tables.data, m.tables.data),
                                    jnp.sum(m.emb_accum),
                                    sum(jnp.vdot(w, w) for w, _ in m.bottom)))(
                                        model)
    out = dict(mode=mode, exchange=exchange, losses=losses,
               table_ss=float(checks[0]), accum_sum=float(checks[1]),
               bottom_ss=float(checks[2]),
               nprocs=jax.process_count(), ndev=jax.device_count())
    if mode != "dist" or jax.process_index() == 0:
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
