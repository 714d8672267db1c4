"""Serving layer: request micro-batching over a jitted predictor.

The reference stops at the kernel library; a production embedding model is
served behind an RPC endpoint where single-example requests arrive
asynchronously, while the TPU wants large, fixed-shape batches (one XLA
program per distinct shape; MXU utilization grows with batch). This module
bridges the two:

  - `MicroBatcher`: a thread-safe coalescer. Callers `submit()` one request
    (any small batch) and get a `concurrent.futures.Future`; a worker thread
    concatenates queued requests and flushes when `max_batch` fills or
    `max_latency_ms` elapses since the oldest queued request. Flushed
    batches are padded up to power-of-two buckets so the jitted predictor
    compiles O(log max_batch) programs total, not one per request size.
  - `DLRMService`: glue from a trained/quantized DLRM to a `predict_fn`.
  - `serve_http`: a stdlib `ThreadingHTTPServer` JSON endpoint
    (`POST /predict`) over a `MicroBatcher` — the RPC harness; swap in a
    production transport behind the same `submit()` surface.

Shapes follow the library convention: dense `(b, num_dense)` float32, cat
`(T, b[, bag])` int32 (table-major, `normalize_indices`'s 2-D/3-D
containers); scores `(b,)`.
"""
from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np


def _bucket(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n, clamped to max_batch."""
    b = 1
    while b < n:
        b <<= 1
    return min(b, max_batch)


@dataclass
class _Pending:
    dense: np.ndarray
    cat: np.ndarray
    future: Future
    size: int


@dataclass
class BatcherStats:
    requests: int = 0
    examples: int = 0
    batches: int = 0
    padded_examples: int = 0           # wasted compute from bucket padding
    bucket_sizes: set = field(default_factory=set)


class MicroBatcher:
    """Coalesce concurrent single requests into padded device batches.

    predict_fn: `(dense (B, d), cat (T, B[, bag])) -> scores (B,)`; called
    from ONE worker thread (the TPU is a serial resource — one stream of
    device work, matching the one-job-at-a-time discipline), with B drawn
    from power-of-two bucket sizes only.
    """

    def __init__(self, predict_fn: Callable, *, max_batch: int = 1024,
                 max_latency_ms: float = 5.0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._predict = predict_fn
        self.max_batch = max_batch
        self.max_latency = max_latency_ms / 1e3
        self.stats = BatcherStats()
        self._stats_lock = threading.Lock()
        self._q: queue.Queue = queue.Queue()
        self._carry: Optional[_Pending] = None
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="microbatcher")
        self._worker.start()

    # -- client side --------------------------------------------------------
    def submit(self, dense, cat) -> Future:
        """Queue one request; resolves to its `(b,)` float32 scores."""
        if self._stop.is_set():
            raise RuntimeError("MicroBatcher is stopped")
        dense = np.asarray(dense, np.float32)
        cat = np.asarray(cat, np.int32)
        if dense.ndim == 1:                   # single example convenience
            dense = dense[None, :]
            cat = cat[:, None] if cat.ndim == 1 else cat[:, None, :]
        b = dense.shape[0]
        if cat.shape[1] != b:
            raise ValueError(f"dense batch {b} != cat batch {cat.shape[1]}")
        if b > self.max_batch:
            raise ValueError(f"request batch {b} exceeds max_batch "
                             f"{self.max_batch}; split the request")
        fut: Future = Future()
        self._q.put(_Pending(dense, cat, fut, b))
        if self._stop.is_set() and not fut.done():
            # Raced with stop(): the worker may already have run its final
            # drain, so nobody would ever read this entry. Fail it (the
            # worker guards against double-resolution on its side too).
            try:
                fut.set_exception(RuntimeError("MicroBatcher stopped"))
            except Exception:  # already resolved by the worker: fine
                pass
        return fut

    def predict(self, dense, cat, timeout: Optional[float] = None):
        """Blocking convenience wrapper around submit()."""
        return self.submit(dense, cat).result(timeout)

    def stats_snapshot(self) -> dict:
        """Consistent copy of the batching counters (the live `stats`
        fields are mutated by the worker thread; reading them piecemeal —
        or iterating `bucket_sizes` while it grows — races)."""
        with self._stats_lock:
            st = self.stats
            return dict(requests=st.requests, examples=st.examples,
                        batches=st.batches,
                        padded_examples=st.padded_examples,
                        bucket_sizes=sorted(st.bucket_sizes))

    def stop(self, drain: bool = True, timeout: float = 30.0):
        """Stop the worker. drain=True (default) first lets queued work
        flush so in-flight Futures resolve — required for hot-swap
        (`ModelRouter.register` routes NEW requests to the replacement
        before stopping the old batcher, so this queue only shrinks).
        Anything still queued after `timeout` fails with RuntimeError."""
        if drain:
            deadline = time.monotonic() + timeout
            while ((not self._q.empty() or self._carry is not None)
                   and time.monotonic() < deadline
                   and self._worker.is_alive()):
                time.sleep(0.01)
        self._stop.set()
        self._q.put(None)                     # wake the worker
        self._worker.join(timeout=10)

    # -- worker side --------------------------------------------------------
    def _next_pending(self, timeout):
        if self._carry is not None:
            p, self._carry = self._carry, None
            return p
        try:
            return self._q.get(timeout=timeout)
        except queue.Empty:
            return None

    def _run(self):
        while not self._stop.is_set():
            first = self._next_pending(timeout=0.1)
            if first is None:
                continue
            batch = [first]
            size = first.size
            deadline = time.monotonic() + self.max_latency
            while size < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                nxt = self._next_pending(timeout=remaining)
                if nxt is None:
                    break
                if size + nxt.size > self.max_batch:
                    self._carry = nxt         # flush now; nxt leads next batch
                    break
                batch.append(nxt)
                size += nxt.size
            self._flush(batch, size)
        # Drain: fail anything still queued so callers never hang.
        while True:
            p = self._next_pending(timeout=0)
            if p is None:
                break
            p.future.set_exception(RuntimeError("MicroBatcher stopped"))

    def _flush(self, batch, size):
        dense = np.concatenate([p.dense for p in batch], axis=0)
        cat = np.concatenate([p.cat for p in batch], axis=1)
        padded = _bucket(size, self.max_batch)
        if padded > size:
            pad = padded - size
            dense = np.concatenate(
                [dense, np.zeros((pad,) + dense.shape[1:], dense.dtype)], 0)
            cat = np.concatenate(
                [cat, np.zeros((cat.shape[0], pad) + cat.shape[2:],
                               cat.dtype)], 1)
        try:
            out = self._predict(dense, cat)
        except Exception as e:                # noqa: BLE001 — fan the error out
            for p in batch:
                p.future.set_exception(e)
            return
        # predict_fn may return one (B, ...) array or a tuple of them
        # (retrieval returns (scores, ids)); each is sliced per request.
        is_tuple = isinstance(out, (tuple, list))
        outs = [np.asarray(o) for o in (out if is_tuple else (out,))]
        with self._stats_lock:
            st = self.stats
            st.requests += len(batch)
            st.examples += size
            st.batches += 1
            st.padded_examples += padded - size
            st.bucket_sizes.add(padded)
        off = 0
        for p in batch:
            sl = [o[off:off + p.size] for o in outs]
            try:
                p.future.set_result(tuple(sl) if is_tuple else sl[0])
            except Exception:  # submit()'s stop-race already failed it
                pass
            off += p.size


def _sharded_scoring_fn(predict, mesh, axis):
    """Wrap a sharded eval step for MicroBatcher: batch-shard the request
    over the data axis (padding the batch up to a multiple of the axis size
    with a repeated tail row — sliced off the result)."""
    import jax
    from .parallel.dlrm import batch_shardings

    sd, sc, _ = batch_shardings(mesh, axis)
    n = 1
    for a in (axis if isinstance(axis, (tuple, list)) else (axis,)):
        n *= mesh.shape[a]

    def fn(dense, cat):
        b = dense.shape[0]
        pad = (-b) % n
        if pad:
            dense = np.concatenate([dense] + [dense[-1:]] * pad, axis=0)
            cat = np.concatenate([cat] + [cat[:, -1:]] * pad, axis=1)
        out = predict(jax.device_put(dense, sd), jax.device_put(cat, sc))
        return np.asarray(jax.device_get(out))[:b]

    return fn


def make_dlrm_service(model, *, quantized: bool = False,
                      quantize_bits: int = 8, mesh=None,
                      axis="data", max_batch: int = 1024,
                      max_latency_ms: float = 5.0) -> MicroBatcher:
    """Batched DLRM scoring service.

    model: a trained `models.dlrm.DLRM` — or a `parallel.dlrm.ShardedDLRM`
    with `mesh=` given, in which case requests batch-shard over the data
    axis and score through the sharded eval step (serving straight off the
    training placement, no unshard). quantized=True converts tables to
    int8 rows first (`quant.quantize_dlrm` — 4x HBM capacity) and serves the
    dequantize-in-kernel eval path (single-chip only). Returns a running
    `MicroBatcher`; use `.predict`/`.submit`, `.stop()` when done.
    """
    import jax

    if mesh is not None:
        if quantized:
            raise NotImplementedError(
                "quantized serving is single-chip; unshard the model first")
        from .parallel.planner import PlannedDLRM, make_planned_eval_step
        if isinstance(model, PlannedDLRM):
            step = make_planned_eval_step(model.config, mesh)
        else:
            from .parallel.dlrm import make_sharded_eval_step
            step = make_sharded_eval_step(model.config, mesh, axis)
        fn = _sharded_scoring_fn(
            lambda dense, cat: step(model, dense, cat), mesh, axis)
        return MicroBatcher(fn, max_batch=max_batch,
                            max_latency_ms=max_latency_ms)
    if quantized:
        from .quant import quantize_dlrm
        _, predict = quantize_dlrm(model, bits=quantize_bits)  # jitted
    else:
        from .models.dlrm import make_eval_step
        step = make_eval_step(model.config)
        predict = lambda dense, cat: step(model, dense, cat)  # noqa: E731
    fn = lambda dense, cat: np.asarray(                       # noqa: E731
        jax.device_get(predict(dense, cat)))
    return MicroBatcher(fn, max_batch=max_batch,
                        max_latency_ms=max_latency_ms)


def make_dcn_service(model, *, quantized: bool = False,
                     quantize_bits: int = 8, mesh=None,
                     axis="data", max_batch: int = 1024,
                     max_latency_ms: float = 5.0) -> MicroBatcher:
    """Batched DCN-v2 scoring service (same contract as
    `make_dlrm_service`): model is a trained `models.dcn.DCN` (or a
    `parallel.dcn.ShardedDCN` with `mesh=`); quantized=True serves int8
    tables via `quant.quantize_dcn` (single-chip only)."""
    import jax

    if mesh is not None:
        if quantized:
            raise NotImplementedError(
                "quantized serving is single-chip; unshard the model first")
        from .parallel.planner import PlannedDCN, make_planned_dcn_eval_step
        if isinstance(model, PlannedDCN):
            step = make_planned_dcn_eval_step(model.config, mesh)
        else:
            from .parallel.dcn import make_sharded_dcn_eval_step
            step = make_sharded_dcn_eval_step(model.config, mesh, axis)
        fn = _sharded_scoring_fn(
            lambda dense, cat: step(model, dense, cat), mesh, axis)
        return MicroBatcher(fn, max_batch=max_batch,
                            max_latency_ms=max_latency_ms)
    if quantized:
        from .quant import quantize_dcn
        _, predict = quantize_dcn(model, bits=quantize_bits)   # jitted
    else:
        from .models.dcn import make_eval_step
        step = make_eval_step(model.config)
        predict = lambda dense, cat: step(model, dense, cat)  # noqa: E731
    fn = lambda dense, cat: np.asarray(                       # noqa: E731
        jax.device_get(predict(dense, cat)))
    return MicroBatcher(fn, max_batch=max_batch,
                        max_latency_ms=max_latency_ms)


def make_deepfm_service(model, *, quantized: bool = False,
                        quantize_bits: int = 8, mesh=None, axis="data",
                        max_batch: int = 1024,
                        max_latency_ms: float = 5.0) -> MicroBatcher:
    """Batched DeepFM scoring service (same contract as
    `make_dlrm_service`): model is a trained `models.deepfm.DeepFM` (or a
    `parallel.deepfm.ShardedDeepFM` with `mesh=` — serve straight off the
    training placement); quantized=True serves int8/int4 tables via
    `quant.quantize_deepfm` (folded layout: the fused row quantizes as
    one; legacy layout: the dim-1 first-order stack stays full precision
    — see that docstring; single-chip only)."""
    import jax

    if mesh is not None:
        if quantized:
            raise NotImplementedError(
                "quantized serving is single-chip; unshard the model first")
        from .parallel.deepfm import make_sharded_deepfm_eval_step
        step = make_sharded_deepfm_eval_step(model.config, mesh, axis)
        fn = _sharded_scoring_fn(
            lambda dense, cat: step(model, dense, cat), mesh, axis)
        return MicroBatcher(fn, max_batch=max_batch,
                            max_latency_ms=max_latency_ms)
    if quantized:
        from .quant import quantize_deepfm
        _, predict = quantize_deepfm(model, bits=quantize_bits)  # jitted
    else:
        from .models.deepfm import make_eval_step
        step = make_eval_step(model.config)
        predict = lambda dense, cat: step(model, dense, cat)  # noqa: E731
    fn = lambda dense, cat: np.asarray(                       # noqa: E731
        jax.device_get(predict(dense, cat)))
    return MicroBatcher(fn, max_batch=max_batch,
                        max_latency_ms=max_latency_ms)


def make_retrieval_service(model, *, k: int = 10, mesh=None, axis="data",
                           max_batch: int = 1024,
                           max_latency_ms: float = 5.0) -> MicroBatcher:
    """Batched two-tower top-k retrieval service.

    model: a trained `models.two_tower.TwoTower`. Builds the item index once
    (sharded over `mesh` when given — corpus-scale serving) and traces the
    retriever once; requests coalesce through the MicroBatcher. Each request
    resolves to `(scores (b, k), item_ids (b, k))`. The `cat` argument of
    `submit`/`predict` is the `(T, b)` query feature container.
    """
    import jax

    if mesh is not None:
        from .parallel.two_tower import (build_sharded_item_index,
                                         make_sharded_retriever)
        index = build_sharded_item_index(model, mesh, axis)
        run = make_sharded_retriever(model, mesh, k=k, axis=axis)
        fn = lambda dense, cat: tuple(                        # noqa: E731
            np.asarray(jax.device_get(o)) for o in run(index, dense, cat))
    else:
        from .models.two_tower import build_item_index, make_retriever
        index = build_item_index(model)
        run1 = make_retriever(model, k=k)
        fn = lambda dense, cat: tuple(                        # noqa: E731
            np.asarray(jax.device_get(o)) for o in run1(index, dense, cat))
    return MicroBatcher(fn, max_batch=max_batch,
                        max_latency_ms=max_latency_ms)


# ---------------------------------------------------------------------------
# Stdlib HTTP harness
# ---------------------------------------------------------------------------

def serve_http(batcher: MicroBatcher, host: str = "127.0.0.1",
               port: int = 0) -> ThreadingHTTPServer:
    """JSON-over-HTTP front end for a MicroBatcher (started; not blocking).

    POST /predict  {"dense": [[...], ...], "cat": [[...], ...]}
                -> {"scores": [...]}            (shapes as module docstring)
    GET  /stats -> batching counters.

    Returns the server; `server.server_address[1]` is the bound port and
    `server.shutdown()` stops it. Each HTTP thread just blocks on its
    request's Future — batching happens in the MicroBatcher worker.
    """

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):            # quiet
            pass

        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/stats":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, batcher.stats_snapshot())

        def do_POST(self):
            if self.path != "/predict":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                out = batcher.predict(req["dense"], req["cat"],
                                      timeout=30.0)
                if isinstance(out, tuple) and len(out) == 2:
                    # Retrieval service: (scores, item_ids).
                    self._reply(200, {
                        "scores": np.asarray(out[0]).tolist(),
                        "ids": np.asarray(out[1]).tolist()})
                else:
                    self._reply(200,
                                {"scores": np.asarray(out).tolist()})
            except Exception as e:            # noqa: BLE001 — surface to client
                self._reply(400, {"error": str(e)})

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True,
                     name="serving-http").start()
    return server


def _ctr_eval_step_for(model):
    """One jitted eval step for whichever CTR family `model` is
    (DLRM / DCN / DeepFM) — the only family-specific piece of the
    refreshable-serving pattern."""
    from .models.dcn import DCN
    from .models.dcn import make_eval_step as dcn_eval
    from .models.deepfm import DeepFM
    from .models.deepfm import make_eval_step as fm_eval
    from .models.dlrm import DLRM
    from .models.dlrm import make_eval_step as dlrm_eval
    if isinstance(model, DLRM):
        return dlrm_eval(model.config)
    if isinstance(model, DCN):
        return dcn_eval(model.config)
    if isinstance(model, DeepFM):
        return fm_eval(model.config)
    raise TypeError(
        f"refreshable serving covers the CTR families (DLRM/DCN/DeepFM); "
        f"got {type(model).__name__}")


def make_refreshable_service(model, *, max_batch: int = 1024,
                             max_latency_ms: float = 5.0):
    """Online-refresh CTR scoring for ANY family (DLRM / DCN / DeepFM):
    returns `(batcher, swap)` — see `make_refreshable_dlrm_service` (the
    original DLRM-only entry point, now a thin alias) for the
    DeltaFollower pairing and the zero-recompile mechanics. DeepFM's
    folded layout works out of the box: the fused stack is
    `model.tables`, so `swap_tables` carries first-order weights and FM
    vectors in one array."""
    import dataclasses as _dc

    import jax

    step = _ctr_eval_step_for(model)             # ONE compiled step
    holder = {"model": model}

    def fn(dense, cat):
        return np.asarray(jax.device_get(step(holder["model"], dense, cat)))

    batcher = MicroBatcher(fn, max_batch=max_batch,
                           max_latency_ms=max_latency_ms)

    def swap(new_model):
        holder["model"] = new_model

    def swap_tables(data):
        """Swap just the (stacked) table array (a DeltaFollower's
        output), keeping dense parts as served."""
        m = holder["model"]
        holder["model"] = _dc.replace(
            m, tables=_dc.replace(m.tables, data=data))

    batcher.swap = swap
    batcher.swap_tables = swap_tables
    return batcher, swap


def make_refreshable_dlrm_service(model, *, max_batch: int = 1024,
                                  max_latency_ms: float = 5.0):
    """Online-refresh DLRM scoring: returns `(batcher, swap)` where
    `swap(new_model)` replaces the served model with ZERO downtime and
    ZERO recompiles — the jitted eval step is built once and the model
    enters per call through a mutable holder (same shapes -> jit cache
    hit; a Python attribute store is atomic, so in-flight requests read
    either the old or the new model, never a mix).

    The intended pairing is `utils.DeltaFollower` over a trainer's
    delta-checkpoint directory — the parameter-server pattern without a
    parameter server: the trainer writes touched-rows-only deltas, each
    serving replica polls and applies them in O(touched rows), then swaps:

        batcher, swap = make_refreshable_dlrm_service(model)
        follower = DeltaFollower(ckpt_dir, model.tables.data)
        ... every refresh interval:
        if follower.poll():
            swap(dataclasses.replace(
                model, tables=dataclasses.replace(model.tables,
                                                  data=follower.data)))

    Alias of `make_refreshable_service`, which additionally covers DCN
    and DeepFM.
    """
    return make_refreshable_service(model, max_batch=max_batch,
                                    max_latency_ms=max_latency_ms)
