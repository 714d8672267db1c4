"""RPC transport tests: binary framing, persistent-connection pipelining,
multi-model routing, error propagation (ROADMAP §7 serving-transport gap).

Uses host-side fake predictors (no device) — the transport layer is
device-agnostic; on-device serving is covered by test_serving.py and
scratch/verify_tpu.py.
"""
import threading

import numpy as np
import pytest

from embeddingtables_tpu import (MicroBatcher, ModelRouter, RPCClient,
                                 RPCServer, serve_rpc)
from embeddingtables_tpu.rpc import (pack_request, pack_response,
                                     _unpack_array)


def _sum_model(scale=1.0):
    """(dense, cat) -> scores: scale * (dense.sum(1) + cat.sum(0))."""
    def fn(dense, cat):
        return (scale * (dense.sum(axis=1)
                         + cat.sum(axis=0))).astype(np.float32)
    return MicroBatcher(fn, max_batch=64, max_latency_ms=2.0)


def _tuple_model():
    """Retrieval-shaped: returns (scores (b, 2), ids (b, 2))."""
    def fn(dense, cat):
        b = dense.shape[0]
        scores = np.stack([dense.sum(1), -dense.sum(1)], 1).astype(np.float32)
        ids = np.tile(np.arange(2, dtype=np.int32), (b, 1))
        return scores, ids
    return MicroBatcher(fn, max_batch=64, max_latency_ms=2.0)


@pytest.fixture
def server():
    router = ModelRouter()
    router.register("m1", _sum_model(1.0))
    router.register("m2", _sum_model(2.0))
    router.register("retr", _tuple_model())
    srv = serve_rpc(router)
    yield srv
    srv.stop()
    router.stop_all()


def test_frame_roundtrip():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.arange(6, dtype=np.int32).reshape(2, 3)
    frame = pack_request(7, 0, "model", (a, b))
    import struct
    (length,) = struct.unpack_from("<I", frame, 0)
    body = memoryview(frame[4:4 + length])
    req_id, op, nlen = struct.unpack_from("<IBB", body, 0)
    assert (req_id, op) == (7, 0)
    off = 6 + nlen
    (narr,) = struct.unpack_from("<B", body, off)
    got_a, off2 = _unpack_array(body, off + 1)
    got_b, _ = _unpack_array(body, off2)
    assert narr == 2
    np.testing.assert_array_equal(got_a, a)
    np.testing.assert_array_equal(got_b, b)

    err = pack_response(9, error="boom")
    (length,) = struct.unpack_from("<I", err, 0)
    rid, status = struct.unpack_from("<IB", err, 4)
    assert (rid, status) == (9, 1) and err[9:] == b"boom"


def test_predict_and_routing(server):
    host, port = server.address
    c = RPCClient(host, port)
    try:
        assert c.ping()
        assert c.list_models() == ["m1", "m2", "retr"]
        dense = np.ones((3, 4), np.float32)
        cat = np.ones((2, 3), np.int32)
        s1 = c.predict("m1", dense, cat)
        s2 = c.predict("m2", dense, cat)
        np.testing.assert_allclose(s1, [6, 6, 6])
        np.testing.assert_allclose(s2, [12, 12, 12])
        st = c.stats("m1")
        assert st["requests"] >= 1 and st["examples"] >= 3
    finally:
        c.close()


def test_tuple_results_roundtrip(server):
    host, port = server.address
    c = RPCClient(host, port)
    try:
        scores, ids = c.predict("retr", np.ones((2, 4), np.float32),
                                np.zeros((1, 2), np.int32))
        assert scores.shape == (2, 2) and ids.shape == (2, 2)
        np.testing.assert_allclose(scores[:, 0], [4, 4])
        np.testing.assert_array_equal(ids[0], [0, 1])
    finally:
        c.close()


def test_pipelining_out_of_order_many_inflight(server):
    host, port = server.address
    c = RPCClient(host, port)
    try:
        futs = []
        for i in range(50):
            dense = np.full((1, 4), float(i), np.float32)
            cat = np.zeros((2, 1), np.int32)
            futs.append((i, c.submit("m1", dense, cat)))
        for i, f in futs:
            np.testing.assert_allclose(f.result(30), [4.0 * i])
    finally:
        c.close()


def test_concurrent_clients_share_batches(server):
    host, port = server.address
    results = {}

    def worker(wid):
        c = RPCClient(host, port)
        try:
            dense = np.full((2, 4), float(wid), np.float32)
            cat = np.zeros((2, 2), np.int32)
            results[wid] = c.predict("m1", dense, cat)
        finally:
            c.close()

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    for w in range(6):
        np.testing.assert_allclose(results[w], [4.0 * w] * 2)
    # Cross-connection coalescing: fewer flushes than requests is expected
    # but timing-dependent; at minimum all 6 landed on the same batcher.
    st = server.router.get("m1").stats
    assert st.requests >= 6


def test_unknown_model_and_bad_payload_errors(server):
    host, port = server.address
    c = RPCClient(host, port)
    try:
        with pytest.raises(RuntimeError, match="unknown model"):
            c.predict("nope", np.ones((1, 2), np.float32),
                      np.ones((1, 1), np.int32))
        # Mismatched batch dims -> MicroBatcher.submit raises server-side.
        with pytest.raises(RuntimeError, match="!="):
            c.predict("m1", np.ones((2, 4), np.float32),
                      np.ones((2, 3), np.int32))
        # Connection still healthy afterwards.
        assert c.ping()
    finally:
        c.close()


def test_router_hot_swap(server):
    host, port = server.address
    c = RPCClient(host, port)
    try:
        dense = np.ones((1, 4), np.float32)
        cat = np.zeros((2, 1), np.int32)
        np.testing.assert_allclose(c.predict("m1", dense, cat), [4.0])
        server.router.register("m1", _sum_model(10.0))  # hot swap
        np.testing.assert_allclose(c.predict("m1", dense, cat), [40.0])
        server.router.unregister("m1")
        with pytest.raises(RuntimeError, match="unknown model"):
            c.predict("m1", dense, cat)
    finally:
        c.close()


def test_hot_swap_resolves_inflight_requests(server):
    # Review finding: register() must DRAIN the old batcher so queued
    # futures resolve instead of hanging/failing.
    import time as _time
    host, port = server.address
    c = RPCClient(host, port)
    try:
        dense = np.ones((1, 4), np.float32)
        cat = np.zeros((2, 1), np.int32)
        futs = [c.submit("m1", dense * i, cat) for i in range(20)]
        _time.sleep(0.001)
        server.router.register("m1", _sum_model(5.0))  # swap mid-flight
        # Every in-flight future must RESOLVE (the old batcher drains before
        # stopping); whether a given request was served by the old (x1) or
        # new (x5) model depends on when the server dequeued it — both are
        # correct under hot-swap.
        for i, f in enumerate(futs):
            got = f.result(30)
            assert np.allclose(got, [4.0 * i]) or \
                np.allclose(got, [20.0 * i]), (i, got)
    finally:
        c.close()


def test_client_fails_fast_after_server_gone():
    # Review finding: submitting after the connection died must raise, not
    # hang the caller for the full timeout.
    import embeddingtables_tpu as et
    router = et.ModelRouter()
    router.register("m", _sum_model())
    srv = et.serve_rpc(router)
    c = RPCClient(*srv.address)
    try:
        assert c.ping()
        srv.stop()
        import time as _time
        deadline = _time.monotonic() + 10
        while c._reader.is_alive() and _time.monotonic() < deadline:
            _time.sleep(0.02)
        with pytest.raises((ConnectionError, RuntimeError)):
            c.predict("m", np.ones((1, 4), np.float32),
                      np.zeros((2, 1), np.int32), timeout=5)
    finally:
        c.close()
        router.stop_all()
