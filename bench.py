"""Headline benchmark: DLRM train step — embedding lookup+update bandwidth.

The reference publishes no numbers (BASELINE.md); its implicit baseline is
the memory-bandwidth roofline — every op is a gather/scatter engineered to
one-load-one-store per row (`/root/reference/src/lookup.jl:149-165`,
`src/sparseupdate.jl:97-129`). The BASELINE.json north star therefore sets
the target: **>80% of per-chip HBM roofline** for lookup+update.

Methodology (hard-won; see docs/DESIGN.md): synthetic "gather+scatter" loops
are unreliable on this stack — XLA dead-code-eliminates unconsumed gather
chunks, hoists loop-invariant sorts, and CSEs repeated pure kernels, each of
which silently inflated earlier readouts. The only structurally DCE-proof
measurement is the REAL train step: the full DLRM forward/backward where
every embedding row flows through the interaction + loss, and the update
writes the donated table. That is what this bench runs (dense towers kept
small so the embedding engine dominates), chained `CHUNK` steps inside one
jit (remote-tunnel dispatch costs ~24 ms/call), fenced by a loss fetch.

    bytes/step = fwd:  B*T*D reads + B*T*D writes (emb activations)
               + bwd:  B*T*D delta writes
               + upd:  B*T*D delta reads + 2*B*T*D row read-modify-write
               = 6 * B * T * D * itemsize

`vs_baseline` = achieved_GBps / chip_HBM_roofline_GBps (fraction of
speed-of-light; target >= 0.80).

Prints ONE JSON line on stdout; human-readable detail goes to stderr.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


# Peak HBM bandwidth by device kind (GB/s). Public figures.
HBM_GBPS = {
    "TPU v2": 700.0,
    "TPU v3": 900.0,
    "TPU v4": 1228.0,
    "TPU v4 lite": 614.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "TPU7x": 7400.0,
}


def chip_roofline_gbps() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_GBPS.items():
        if kind.lower().startswith(k.lower()):
            return v
    print(f"# unknown device kind {kind!r}; assuming v5e 819 GB/s",
          file=sys.stderr)
    return 819.0


def main():
    on_tpu = jax.default_backend() == "tpu"
    # DLRM-shaped single-chip workload: 26 tables stacked into one array,
    # dense towers kept minimal so the embedding engine dominates.
    if on_tpu:
        t, vocab, dim, batch, chunk, reps = 26, 250_000, 128, 65_536, 10, 3
    else:  # CPU smoke mode
        t, vocab, dim, batch, chunk, reps = 8, 10_000, 128, 4_096, 3, 2

    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_train_step
    from embeddingtables_tpu.optim import SparseSGD

    cfg = DLRMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13, dim=dim,
                     bottom_mlp=(64, dim), top_mlp=(64, 1))
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))
    step = make_train_step(cfg, sparse_opt=SparseSGD(1e-4), dense_lr=1e-4,
                           jit=False)

    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(batch, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32)
         for _ in range(t)]))
    label = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(model, dense, cat, label):
        def body(k, carry):
            m, _ = carry
            # Vary indices per step so nothing is loop-invariant.
            m, loss = step(m, dense, (cat + k) % vocab, label)
            return m, loss
        return jax.lax.fori_loop(0, chunk, body,
                                 (model, jnp.zeros((), jnp.float32)))

    # Warmup / compile.
    model, loss = run_chunk(model, dense, cat, label)
    _ = float(loss)  # loss fetch = the only honest fence over the tunnel

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        model, loss = run_chunk(model, dense, cat, label)
        lv = float(loss)
        times.append((time.perf_counter() - t0) / chunk)
    sec = float(np.median(times))
    assert np.isfinite(lv), lv

    itemsize = 4
    bytes_per_step = 6 * batch * t * dim * itemsize
    gbps = bytes_per_step / sec / 1e9
    roofline = chip_roofline_gbps() if on_tpu else 100.0
    frac = gbps / roofline
    exps = batch / sec

    print(f"# backend={jax.default_backend()} kind={jax.devices()[0].device_kind} "
          f"T={t} V={vocab} D={dim} B={batch} step={sec*1e3:.3f} ms "
          f"bw={gbps:.1f} GB/s roofline={roofline:.0f} GB/s frac={frac:.3f} "
          f"({exps:,.0f} examples/s)", file=sys.stderr)
    print(json.dumps({
        "metric": "dlrm_train_step_embedding_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()
