"""Data-loader runtime: native Criteo parsing + background prefetch.

The reference has no data layer; a production embedding engine is fed by a
host-side pipeline that must outrun the chip. Two pieces:

  - Native parser: `native/criteo_parser.cpp` compiled on first use (g++ -O3
    into a per-user cache dir) and bound via ctypes — no pybind11/pip needed.
    Parses Criteo Kaggle TSV at memory speed; `data.criteo_kaggle_batches`
    (pure Python) remains the semantic oracle (exact-match tested).
  - `PrefetchLoader`: a background thread keeps `depth` batches ready so
    host parsing overlaps device steps (the host-side analog of the
    reference's Polyester worker threads, `/root/reference/src/lookup.jl:262-276`,
    redeployed where a TPU system actually needs host threads: the input
    pipeline).
"""
from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import sys
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "criteo_parser.cpp")

_lib = None
_lib_err: Optional[str] = None


def _compile_and_load(src: str, name: str) -> ctypes.CDLL:
    """Compile a native source (cached by source mtime) and dlopen it.

    Shared by every native/ component (parser, synth generator). Raises on
    any failure — callers decide their fallback policy.
    """
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "embeddingtables_tpu")
    os.makedirs(cache, exist_ok=True)
    tag = f"{int(os.path.getmtime(src))}"
    so = os.path.join(cache, f"{name}_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffast-math", "-shared",
             "-fPIC", "-pthread", "-o", tmp, src],
            check=True, capture_output=True)
        os.replace(tmp, so)
    return ctypes.CDLL(so)


def _build_and_load():
    """Load the native parser and declare its prototypes."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        lib = _compile_and_load(_SRC, "criteo_parser")
        lib.criteo_parse.restype = ctypes.c_long
        lib.criteo_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        lib.criteo_fnv1a.restype = ctypes.c_uint64
        lib.criteo_fnv1a.argtypes = [ctypes.c_char_p, ctypes.c_long]
        _lib = lib
    except Exception as e:  # no g++, sandboxed, etc. -> Python fallback
        _lib_err = str(e)
    return _lib


def native_available() -> bool:
    return _build_and_load() is not None


def native_parse_batch(buf: bytes, max_rows: int,
                       vocab_sizes: Sequence[int]):
    """Parse up to `max_rows` Criteo TSV rows from `buf`.

    Returns (rows, dense (rows,13) f32, cat (26,rows) i32, label (rows,) f32,
    consumed_bytes, skipped_lines). Raises RuntimeError if the native library
    is unavailable.
    """
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_lib_err}")
    t = len(vocab_sizes)
    assert t == 26, "Criteo has 26 sparse features"
    dense = np.zeros((max_rows, 13), np.float32)
    cat = np.zeros((t, max_rows), np.int32)
    label = np.zeros((max_rows,), np.float32)
    vs = (ctypes.c_long * t)(*vocab_sizes)
    consumed = ctypes.c_long(0)
    skipped = ctypes.c_long(0)
    rows = lib.criteo_parse(
        buf, len(buf), max_rows, vs,
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        label.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(consumed), ctypes.byref(skipped))
    return (rows, dense[:rows], cat[:, :rows], label[:rows],
            consumed.value, skipped.value)


class CriteoFileLoader:
    """Stream batches from a Criteo Kaggle TSV using the native parser.

    Semantics identical to `data.criteo_kaggle_batches` (exact-match tested);
    ~2 orders of magnitude faster. Falls back to the Python parser when the
    native library cannot be built.
    """

    READ_CHUNK = 16 * 1024 * 1024

    def __init__(self, path: str, vocab_sizes: Sequence[int],
                 batch_size: int = 8192, max_batches: Optional[int] = None,
                 epochs: Optional[int] = 1, skip_batches: int = 0):
        """epochs: passes over the file (None = cycle forever);
        `max_batches` bounds the TOTAL batch count across epochs.
        skip_batches: drop the first N batches of EVERY epoch — the
        held-out-eval-prefix discipline (a train stream that cycles must
        not replay the eval prefix on later passes)."""
        self.path = path
        self.vocab_sizes = tuple(vocab_sizes)
        self.batch_size = batch_size
        self.max_batches = max_batches
        self.epochs = epochs
        self.skip_batches = skip_batches

    # A Criteo line is >= 41 bytes (label + 39 tabs + newline), bounding the
    # rows a buffer can hold; used to size the native parser's output arrays.
    _MIN_LINE_BYTES = 40

    def _row_blocks(self):
        """Yield (dense, cat, label) blocks of parsed rows from the file."""
        leftover = b""
        with open(self.path, "rb") as f:
            eof = False
            while not eof:
                chunk = f.read(self.READ_CHUNK)
                if not chunk:
                    eof = True
                    if not leftover:
                        break
                    if not leftover.endswith(b"\n"):
                        leftover += b"\n"  # flush a final unterminated line
                buf = leftover + chunk
                while buf:
                    cap = len(buf) // self._MIN_LINE_BYTES + 1
                    rows, dense, cat, label, consumed, _ = native_parse_batch(
                        buf, cap, self.vocab_sizes)
                    if consumed == 0:
                        break  # partial line: wait for the next chunk
                    buf = buf[consumed:]
                    if rows:
                        yield dense, cat, label
                leftover = buf

    def _one_epoch(self) -> Iterator[dict]:
        if not native_available():
            from ..data import criteo_kaggle_batches
            yield from criteo_kaggle_batches(self.path, self.vocab_sizes,
                                             self.batch_size, None)
            return
        pend_d, pend_c, pend_l = [], [], []
        pending = 0
        for dense, cat, label in self._row_blocks():
            pend_d.append(dense)
            pend_c.append(cat)
            pend_l.append(label)
            pending += dense.shape[0]
            while pending >= self.batch_size:
                dense = np.concatenate(pend_d) if len(pend_d) > 1 else pend_d[0]
                cat = np.concatenate(pend_c, axis=1) if len(pend_c) > 1 else pend_c[0]
                label = np.concatenate(pend_l) if len(pend_l) > 1 else pend_l[0]
                b = self.batch_size
                yield dict(dense=dense[:b], cat=cat[:, :b], label=label[:b])
                pend_d = [dense[b:]] if dense.shape[0] > b else []
                pend_c = [cat[:, b:]] if cat.shape[1] > b else []
                pend_l = [label[b:]] if label.shape[0] > b else []
                pending -= b
        # Trailing partial batch is dropped — same policy as the Python
        # oracle (data.criteo_kaggle_batches).

    def __iter__(self) -> Iterator[dict]:
        emitted = 0
        epoch = 0
        while self.epochs is None or epoch < self.epochs:
            epoch_yielded = 0
            for j, batch in enumerate(self._one_epoch()):
                if j < self.skip_batches:
                    continue
                yield batch
                epoch_yielded += 1
                emitted += 1
                if self.max_batches and emitted >= self.max_batches:
                    return
            if epoch_yielded == 0 and self.epochs is None:
                # Infinite cycling over a pass that yields nothing (file
                # shorter than the skip prefix / one batch) would re-parse
                # forever — fail loudly instead of hanging. Finite epochs
                # keep the old just-exhaust behavior.
                raise RuntimeError(
                    f"{self.path}: epochs=None with an empty pass (file "
                    f"holds <= skip_batches={self.skip_batches} batches of "
                    f"{self.batch_size}) would cycle forever")
            epoch += 1


def parallel_batches(make_iter, workers: int = 3, depth: int = 4):
    """Interleave `workers` independent batch iterators (each produced by
    `make_iter(worker_id)`) through one queue — for i.i.d. sources (synthetic
    generators, sharded files) where inter-batch order is irrelevant. numpy
    releases the GIL on large ops, so threads scale the host-side pipeline
    until it outruns the device step."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    errs: list = []
    stop = threading.Event()
    done = object()  # per-worker completion sentinel

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def run(wid):
        try:
            for item in make_iter(wid):
                if not put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — reraised at consumer
            errs.append(e)
        finally:
            # Always announce completion so a consumer of finite iterators
            # terminates instead of blocking forever on q.get().
            put(done)

    threads = [threading.Thread(target=run, args=(w,), daemon=True)
               for w in range(workers)]
    for t in threads:
        t.start()

    def gen():
        live = workers
        try:
            while live:
                item = q.get()
                if item is done:
                    if errs:
                        raise errs[0]
                    live -= 1
                    continue
                yield item
        finally:
            stop.set()

    return gen()


class PrefetchLoader:
    """Wrap any batch iterator with a background prefetch thread.

    depth: number of batches staged ahead of the consumer. Exceptions in the
    producer re-raise at the consumer's `next()`.
    """

    _SENTINEL = object()

    def __init__(self, it: Iterator[dict], depth: int = 2):
        self._it = it
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(item)
        except BaseException as e:  # noqa: BLE001 — reraised at consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class DevicePrefetcher:
    """Overlap host->device upload with the device step.

    Wraps a host batch iterator: a background thread runs `put(batch)`
    (typically `jax.device_put` with the step's shardings) for the NEXT
    batch while the device executes the current step, then yields
    `(host_batch, device_args)`. On tunneled/remote devices the per-step
    upload is a serial cost this hides entirely; on local devices it
    overlaps the PCIe copy. `depth` bounds staged batches (device-memory
    backpressure). Exceptions in the producer re-raise at `next()`; the
    producer is a daemon thread, so an abandoned iterator holds at most
    `depth`+1 staged batches until process exit (same policy as
    `PrefetchLoader`).
    """

    _SENTINEL = object()

    def __init__(self, it: Iterator[dict], put, depth: int = 2):
        self._it = it
        self._put = put
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for batch in self._it:
                self._q.put((batch, self._put(batch)))
        except BaseException as e:  # noqa: BLE001 — reraised at consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
