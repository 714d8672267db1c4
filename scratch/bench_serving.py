"""Measure the serving stack end-to-end on the real chip: RPC client ->
binary framing -> MicroBatcher coalescing -> jitted DLRM predictor.

Reports examples/s and p50/p95 request latency for a closed-loop load of
`--clients` pipelined connections, each submitting `--per-request` examples.
"""
from __future__ import annotations

import argparse
import sys
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--inflight", type=int, default=8)
    ap.add_argument("--per-request", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--max-batch", type=int, default=2048)
    ap.add_argument("--max-latency-ms", type=float, default=3.0)
    args = ap.parse_args()

    import jax
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.serving import make_dlrm_service
    from embeddingtables_tpu.rpc import ModelRouter, RPCClient, serve_rpc

    cfg = DLRMConfig(vocab_sizes=tuple([args.vocab] * args.tables),
                     num_dense=13, dim=args.dim,
                     bottom_mlp=(256, args.dim), top_mlp=(256, 1))
    model = init_dlrm(jax.random.key(0), cfg)
    svc = make_dlrm_service(model, max_batch=args.max_batch,
                            max_latency_ms=args.max_latency_ms)
    router = ModelRouter()
    router.register("dlrm", svc)
    srv = serve_rpc(router)
    host, port = srv.address
    print(f"backend={jax.default_backend()} serving on {host}:{port}",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    b = args.per_request
    dense = rng.normal(size=(b, 13)).astype(np.float32)
    cat = rng.integers(0, args.vocab, (args.tables, b)).astype(np.int32)

    # Warm the compile cache across the pow2 buckets.
    warm = RPCClient(host, port)
    for _ in range(4):
        warm.predict("dlrm", dense, cat, timeout=120)
    warm.close()

    stop = time.perf_counter() + args.seconds
    lat: list = []
    done = [0] * args.clients
    lock = threading.Lock()

    def worker(wid):
        c = RPCClient(host, port)
        try:
            inflight = []
            while time.perf_counter() < stop:
                while len(inflight) < args.inflight and \
                        time.perf_counter() < stop:
                    inflight.append((time.perf_counter(),
                                     c.submit("dlrm", dense, cat)))
                t0, fut = inflight.pop(0)
                fut.result(60)
                with lock:
                    lat.append(time.perf_counter() - t0)
                done[wid] += 1
            for t0, fut in inflight:
                fut.result(60)
                with lock:
                    lat.append(time.perf_counter() - t0)
                done[wid] += 1
        finally:
            c.close()

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(args.clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    reqs = sum(done)
    ex = reqs * b
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    st = svc.stats
    print(f"requests={reqs} examples={ex} wall={wall:.1f}s "
          f"-> {ex/wall:,.0f} examples/s, {reqs/wall:,.0f} req/s",
          file=sys.stderr, flush=True)
    print(f"latency p50={lat_ms[len(lat_ms)//2]:.1f} ms "
          f"p95={lat_ms[int(len(lat_ms)*0.95)]:.1f} ms "
          f"p99={lat_ms[int(len(lat_ms)*0.99)]:.1f} ms", file=sys.stderr,
          flush=True)
    print(f"batcher: batches={st.batches} "
          f"avg_batch={st.examples/max(1,st.batches):.0f} "
          f"pad_frac={st.padded_examples/max(1,st.examples+st.padded_examples):.3f} "
          f"buckets={sorted(st.bucket_sizes)}", file=sys.stderr, flush=True)
    srv.stop()
    svc.stop()


if __name__ == "__main__":
    main()
