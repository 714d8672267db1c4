"""Serving layer: micro-batching correctness, bucket padding, HTTP harness."""
import json
import threading
import urllib.request

import numpy as np

import jax

from embeddingtables_tpu.serving import (MicroBatcher, _bucket,
                                         make_dlrm_service, serve_http)

T, D = 3, 4


def ref_scores(dense, cat):
    # Per-example function -> batching must be transparent.
    c = cat.astype(np.float32).reshape(cat.shape[0], cat.shape[1], -1)
    return dense.sum(axis=1) + c.sum(axis=(0, 2)) * 0.1


def make_batcher(**kw):
    sizes = []

    def predict(dense, cat):
        sizes.append(dense.shape[0])
        return ref_scores(dense, cat)

    kw.setdefault("max_latency_ms", 20.0)
    return MicroBatcher(predict, **kw), sizes


def req(rng, b):
    return (rng.normal(size=(b, D)).astype(np.float32),
            rng.integers(0, 50, (T, b)).astype(np.int32))


def test_bucket():
    assert [_bucket(n, 64) for n in (1, 2, 3, 5, 64, 100)] == \
        [1, 2, 4, 8, 64, 64]


def test_coalesces_and_slices_correctly():
    mb, sizes = make_batcher(max_batch=64)
    rng = np.random.default_rng(0)
    reqs = [req(rng, b) for b in (1, 3, 2, 5, 1, 4)]
    futs = [mb.submit(d, c) for d, c in reqs]
    outs = [f.result(timeout=10) for f in futs]
    mb.stop()
    for (d, c), out in zip(reqs, outs):
        np.testing.assert_allclose(out, ref_scores(d, c), rtol=1e-6)
    # Fewer device calls than requests, and only power-of-two batch sizes.
    assert mb.stats.batches < len(reqs)
    assert all(s & (s - 1) == 0 for s in sizes), sizes


def test_single_example_convenience_and_bags():
    mb, _ = make_batcher(max_batch=8)
    rng = np.random.default_rng(1)
    d = rng.normal(size=D).astype(np.float32)
    c = rng.integers(0, 50, T).astype(np.int32)
    out = mb.predict(d, c, timeout=10)
    np.testing.assert_allclose(out, ref_scores(d[None], c[:, None]),
                               rtol=1e-6)
    # 3-D (T, b, bag) containers coalesce along axis 1 too.
    d2, c2 = (rng.normal(size=(2, D)).astype(np.float32),
              rng.integers(0, 50, (T, 2, 2)).astype(np.int32))
    out2 = mb.predict(d2, c2, timeout=10)
    assert out2.shape == (2,)
    mb.stop()


def test_max_batch_split_carry():
    mb, sizes = make_batcher(max_batch=4)
    rng = np.random.default_rng(2)
    reqs = [req(rng, 3) for _ in range(3)]   # 3+3 > 4 -> carried over
    futs = [mb.submit(d, c) for d, c in reqs]
    for (d, c), f in zip(reqs, futs):
        np.testing.assert_allclose(f.result(timeout=10), ref_scores(d, c),
                                   rtol=1e-6)
    mb.stop()
    assert mb.stats.batches == 3             # no coalescing possible at cap
    try:
        mb2, _ = make_batcher(max_batch=4)
        d, c = req(rng, 5)
        raised = False
        try:
            mb2.submit(d, c)
        except ValueError:
            raised = True
        assert raised
    finally:
        mb2.stop()


def test_concurrent_clients_all_correct():
    mb, _ = make_batcher(max_batch=128, max_latency_ms=5.0)
    rng = np.random.default_rng(3)
    results = {}

    def client(i, d, c):
        results[i] = (mb.predict(d, c, timeout=30), ref_scores(d, c))

    threads = []
    for i in range(32):
        d, c = req(rng, int(rng.integers(1, 6)))
        t = threading.Thread(target=client, args=(i, d, c))
        threads.append(t)
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.stop()
    assert len(results) == 32
    for got, want in results.values():
        np.testing.assert_allclose(got, want, rtol=1e-6)
    assert mb.stats.requests == 32


def test_predictor_error_fans_out_to_futures():
    def boom(dense, cat):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(boom, max_batch=8, max_latency_ms=5.0)
    f = mb.submit(np.zeros((1, D), np.float32), np.zeros((T, 1), np.int32))
    err = None
    try:
        f.result(timeout=10)
    except RuntimeError as e:
        err = e
    mb.stop()
    assert err is not None and "device on fire" in str(err)


def test_dlrm_service_matches_direct_eval():
    import jax.numpy as jnp
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_eval_step

    cfg = DLRMConfig(vocab_sizes=(40, 60), num_dense=3, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    dense = rng.normal(size=(5, 3)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 5).astype(np.int32)
                    for v in cfg.vocab_sizes])
    want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(dense),
                                          jnp.asarray(cat)))

    for quantized in (False, True):
        svc = make_dlrm_service(model, quantized=quantized, max_batch=8,
                                max_latency_ms=5.0)
        got = svc.predict(dense, cat, timeout=60)
        svc.stop()
        tol = dict(rtol=1e-5, atol=1e-6) if not quantized else \
            dict(rtol=0.1, atol=0.05)       # int8 rows
        np.testing.assert_allclose(got, want, **tol)


def test_http_harness_roundtrip():
    mb, _ = make_batcher(max_batch=16)
    server = serve_http(mb)
    port = server.server_address[1]
    rng = np.random.default_rng(5)
    d, c = req(rng, 3)
    body = json.dumps({"dense": d.tolist(), "cat": c.tolist()}).encode()
    r = urllib.request.urlopen(urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=body,
        headers={"Content-Type": "application/json"}), timeout=30)
    scores = np.asarray(json.loads(r.read())["scores"], np.float32)
    np.testing.assert_allclose(scores, ref_scores(d, c), rtol=1e-5)

    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/stats", timeout=30).read())
    assert stats["requests"] == 1 and stats["bucket_sizes"] == [4]

    bad = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                 data=b"{}")
    code = None
    try:
        urllib.request.urlopen(bad, timeout=30)
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400
    server.shutdown()
    mb.stop()


def test_tuple_output_predictor_slices_per_request():
    def predict(dense, cat):
        return ref_scores(dense, cat), cat.T.copy()  # (B,), (B, T)

    mb = MicroBatcher(predict, max_batch=32, max_latency_ms=20.0)
    rng = np.random.default_rng(6)
    reqs = [req(rng, b) for b in (2, 3, 1)]
    futs = [mb.submit(d, c) for d, c in reqs]
    for (d, c), f in zip(reqs, futs):
        s, ct = f.result(timeout=10)
        np.testing.assert_allclose(s, ref_scores(d, c), rtol=1e-6)
        np.testing.assert_array_equal(ct, c.T)
    mb.stop()


def test_retrieval_service_matches_direct_retrieve():
    import jax.numpy as jnp
    from embeddingtables_tpu.models.two_tower import (TwoTowerConfig,
                                                      build_item_index,
                                                      init_two_tower,
                                                      make_retriever,
                                                      retrieve)
    from embeddingtables_tpu.serving import make_retrieval_service

    cfg = TwoTowerConfig(query_vocab_sizes=(30, 50), item_vocab=120,
                         num_dense=3, dim=16, embed_dim=16,
                         query_mlp=(32, 16), item_mlp=(32, 16))
    model = init_two_tower(jax.random.key(1), cfg)
    index = build_item_index(model)
    rng = np.random.default_rng(7)
    dense = rng.normal(size=(6, 3)).astype(np.float32)
    q_cat = np.stack([rng.integers(0, v, 6).astype(np.int32)
                      for v in cfg.query_vocab_sizes])
    s1, i1 = retrieve(model, index, jnp.asarray(dense), jnp.asarray(q_cat),
                      k=5)

    # Trace-once factory parity.
    run = make_retriever(model, k=5)
    s2, i2 = run(index, dense, q_cat)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))

    # Micro-batched service parity (single-chip path).
    svc = make_retrieval_service(model, k=5, max_batch=16,
                                 max_latency_ms=5.0)
    s3, i3 = svc.predict(dense, q_cat, timeout=60)
    svc.stop()
    np.testing.assert_allclose(s3, np.asarray(s1), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i3, np.asarray(i1))


def test_retrieval_service_sharded_mesh():
    from embeddingtables_tpu.models.two_tower import (TwoTowerConfig,
                                                      init_two_tower)
    from embeddingtables_tpu.parallel.mesh import default_mesh
    from embeddingtables_tpu.parallel.two_tower import (
        build_sharded_item_index, sharded_retrieve)
    from embeddingtables_tpu.serving import make_retrieval_service

    cfg = TwoTowerConfig(query_vocab_sizes=(30,), item_vocab=203,
                         num_dense=2, dim=16, embed_dim=16,
                         query_mlp=(32, 16), item_mlp=(32, 16))
    model = init_two_tower(jax.random.key(2), cfg)
    mesh = default_mesh(("data",))
    rng = np.random.default_rng(8)
    dense = rng.normal(size=(4, 2)).astype(np.float32)
    q_cat = rng.integers(0, 30, (1, 4)).astype(np.int32)
    index = build_sharded_item_index(model, mesh)
    s1, i1 = sharded_retrieve(model, index, mesh, dense, q_cat, k=5)

    svc = make_retrieval_service(model, k=5, mesh=mesh, max_batch=8,
                                 max_latency_ms=5.0)
    s2, i2 = svc.predict(dense, q_cat, timeout=60)
    svc.stop()
    np.testing.assert_allclose(s2, np.asarray(s1), rtol=1e-5, atol=1e-6)
    for r in range(4):  # ties may reorder equal scores
        assert set(i2[r].tolist()) == set(np.asarray(i1[r]).tolist())


def test_dcn_service_matches_direct_eval():
    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.models import DCNConfig, init_dcn
    from embeddingtables_tpu.models.dcn import make_eval_step
    from embeddingtables_tpu.serving import make_dcn_service

    cfg = DCNConfig(vocab_sizes=(40, 60), num_dense=3, dim=8,
                    num_cross=2, cross_rank=4, deep_mlp=(16, 8),
                    compute_dtype=jnp.float32)
    model = init_dcn(jax.random.key(0), cfg)
    rng = np.random.default_rng(7)
    dense = rng.normal(size=(5, 3)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 5).astype(np.int32)
                    for v in cfg.vocab_sizes])
    want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(dense),
                                          jnp.asarray(cat)))

    for quantized in (False, True):
        svc = make_dcn_service(model, quantized=quantized, max_batch=8,
                               max_latency_ms=5.0)
        got = svc.predict(dense, cat, timeout=60)
        svc.stop()
        tol = dict(rtol=1e-5, atol=1e-6) if not quantized else \
            dict(rtol=0.1, atol=0.05)       # int8 rows
        np.testing.assert_allclose(got, want, **tol)


def test_sharded_dlrm_service_matches_single_chip():
    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_eval_step
    from embeddingtables_tpu.parallel.dlrm import shard_dlrm
    from embeddingtables_tpu.parallel.mesh import default_mesh

    cfg = DLRMConfig(vocab_sizes=(40, 60), num_dense=3, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(0), cfg)
    mesh = default_mesh(("data",))
    smodel = shard_dlrm(model, mesh)
    rng = np.random.default_rng(11)
    b = 5                              # NOT divisible by 8 -> pad path
    dense = rng.normal(size=(b, 3)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                    for v in cfg.vocab_sizes])
    want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(dense),
                                          jnp.asarray(cat)))
    svc = make_dlrm_service(smodel, mesh=mesh, max_batch=8,
                            max_latency_ms=5.0)
    got = svc.predict(dense, cat, timeout=60)
    svc.stop()
    assert got.shape == (b,)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    import pytest
    with pytest.raises(NotImplementedError):
        make_dlrm_service(smodel, mesh=mesh, quantized=True)


def test_sharded_dcn_service_matches_single_chip():
    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.models import DCNConfig, init_dcn
    from embeddingtables_tpu.models.dcn import make_eval_step
    from embeddingtables_tpu.parallel.dcn import shard_dcn
    from embeddingtables_tpu.parallel.mesh import default_mesh
    from embeddingtables_tpu.serving import make_dcn_service

    cfg = DCNConfig(vocab_sizes=(40, 60), num_dense=3, dim=8, num_cross=2,
                    cross_rank=4, deep_mlp=(16, 8),
                    compute_dtype=jnp.float32)
    model = init_dcn(jax.random.key(0), cfg)
    mesh = default_mesh(("data",))
    smodel = shard_dcn(model, mesh)
    rng = np.random.default_rng(12)
    b = 11
    dense = rng.normal(size=(b, 3)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                    for v in cfg.vocab_sizes])
    want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(dense),
                                          jnp.asarray(cat)))
    svc = make_dcn_service(smodel, mesh=mesh, max_batch=16,
                           max_latency_ms=5.0)
    got = svc.predict(dense, cat, timeout=60)
    svc.stop()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dlrm_service_int4():
    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_eval_step

    cfg = DLRMConfig(vocab_sizes=(40, 60), num_dense=3, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    dense = rng.normal(size=(5, 3)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 5).astype(np.int32)
                    for v in cfg.vocab_sizes])
    want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(dense),
                                          jnp.asarray(cat)))
    svc = make_dlrm_service(model, quantized=True, quantize_bits=4,
                            max_batch=8, max_latency_ms=5.0)
    got = svc.predict(dense, cat, timeout=60)
    svc.stop()
    np.testing.assert_allclose(got, want, rtol=0.5, atol=0.3)  # int4 coarse


def test_planned_dlrm_service_matches_single_chip():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_eval_step
    from embeddingtables_tpu.parallel.mesh import default_mesh
    from embeddingtables_tpu.parallel.planner import (PlannedDLRM,
                                                      place_stacked_on_plan,
                                                      plan_sharding)

    cfg = DLRMConfig(vocab_sizes=(64, 4096, 96), num_dense=3, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(0), cfg)
    mesh = default_mesh(("data",))
    plan = plan_sharding(cfg.vocab_sizes, 8, mesh,
                         replicate_max_bytes=8 * 4 * 128)
    pt = place_stacked_on_plan(plan, mesh, model.tables, model.emb_state,
                               None)
    repl = NamedSharding(mesh, P())
    pm = PlannedDLRM(bottom=jax.device_put(model.bottom, repl),
                     top=jax.device_put(model.top, repl),
                     tables=pt, config=cfg)
    rng = np.random.default_rng(13)
    b = 6
    dense = rng.normal(size=(b, 3)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, b).astype(np.int32)
                    for v in cfg.vocab_sizes])
    want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(dense),
                                          jnp.asarray(cat)))
    svc = make_dlrm_service(pm, mesh=mesh, max_batch=8, max_latency_ms=5.0)
    got = svc.predict(dense, cat, timeout=60)
    svc.stop()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deepfm_service_matches_direct_eval():
    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.models import DeepFMConfig, init_deepfm
    from embeddingtables_tpu.models.deepfm import make_eval_step
    from embeddingtables_tpu.serving import make_deepfm_service

    cfg = DeepFMConfig(vocab_sizes=(40, 60), num_dense=3, dim=8,
                       deep_mlp=(16, 8), compute_dtype=jnp.float32)
    model = init_deepfm(jax.random.key(0), cfg)
    rng = np.random.default_rng(7)
    dense = rng.normal(size=(5, 3)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 5).astype(np.int32)
                    for v in cfg.vocab_sizes])
    want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(dense),
                                          jnp.asarray(cat)))

    for quantized in (False, True):
        svc = make_deepfm_service(model, quantized=quantized, max_batch=8,
                                  max_latency_ms=5.0)
        got = svc.predict(dense, cat, timeout=60)
        svc.stop()
        tol = dict(rtol=1e-5, atol=1e-6) if not quantized else \
            dict(rtol=0.1, atol=0.05)       # int8 FM-vector rows
        np.testing.assert_allclose(got, want, **tol)


def test_sharded_deepfm_service_matches_single_chip():
    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.models import DeepFMConfig, init_deepfm
    from embeddingtables_tpu.models.deepfm import make_eval_step
    from embeddingtables_tpu.parallel.deepfm import shard_deepfm
    from embeddingtables_tpu.parallel.mesh import default_mesh
    from embeddingtables_tpu.serving import make_deepfm_service

    cfg = DeepFMConfig(vocab_sizes=(40, 60), num_dense=3, dim=8,
                       deep_mlp=(16, 8), compute_dtype=jnp.float32)
    model = init_deepfm(jax.random.key(0), cfg)
    mesh = default_mesh(("data",))
    smodel = shard_deepfm(model, mesh, "data")
    rng = np.random.default_rng(7)
    dense = rng.normal(size=(5, 3)).astype(np.float32)  # 5 % 8 != 0: pads
    cat = np.stack([rng.integers(0, v, 5).astype(np.int32)
                    for v in cfg.vocab_sizes])
    want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(dense),
                                          jnp.asarray(cat)))
    svc = make_deepfm_service(smodel, mesh=mesh, max_batch=8,
                              max_latency_ms=5.0)
    got = svc.predict(dense, cat, timeout=60)
    svc.stop()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
