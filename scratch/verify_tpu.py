"""End-to-end verification on the REAL TPU chip (axon backend).

Drives the public package surface: lookup (pallas compiled), reducing lookup,
fused sparse SGD update (pallas scatter kernel), odd-dim XLA fallback, and a
toy training loop whose loss must decrease.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

import embeddingtables_tpu as et

print("backend:", jax.default_backend(), jax.devices())
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)

# --- 1. non-reducing lookup, compiled Pallas path ---
V, D, B = 5000, 128, 4096
data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))
table = et.SimpleEmbedding(data)
t0 = time.time()
out = et.lookup(table, idx)
out.block_until_ready()
print(f"1. lookup compiled in {time.time()-t0:.1f}s")
expected = np.asarray(data)[np.asarray(idx)]
assert (np.asarray(out) == expected).all(), "non-reducing lookup mismatch on TPU"
print("   non-reducing lookup matches oracle:", out.shape)

# --- 2. reducing lookup (bags) ---
bag_idx = jnp.asarray(rng.integers(0, V, size=(512, 12)).astype(np.int32))
out2 = et.lookup(table, bag_idx)
exp2 = np.asarray(data)[np.asarray(bag_idx)].sum(axis=1)
err = np.abs(np.asarray(out2) - exp2).max()
assert err < 1e-3, f"reducing lookup err {err}"
print("   reducing lookup matches oracle, max err", err)

# --- 3. fused sparse SGD update (pallas scatter) ---
idx3 = jnp.asarray(rng.integers(0, V, size=1024).astype(np.int32))
delta = jnp.asarray(rng.standard_normal((1024, D)).astype(np.float32))
upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx3)
want = np.asarray(data) - 0.5 * np.asarray(et.uncompress(upd, V))
new = et.sgd_update(et.SimpleEmbedding(data), upd, 0.5, method="pallas")
err = np.abs(np.asarray(new.data) - want).max()
assert err < 1e-3, f"pallas update err {err}"
print("3. pallas scatter-FMA update matches oracle, max err", err)

# --- 4. odd feature dim falls back to XLA path ---
data_odd = jnp.asarray(rng.standard_normal((100, 65)).astype(np.float32))
out_odd = et.lookup(et.SimpleEmbedding(data_odd), idx3[:50] % 100)
assert out_odd.shape == (50, 65)
print("4. odd dim (65) XLA fallback works")

# --- 5. toy training loop: fused ensemble + lazy grads, loss must drop ---
dims = 64
tables = [et.SimpleEmbedding(rng.standard_normal((200, dims)).astype(np.float32))
          for _ in range(4)]
target = jnp.asarray(rng.standard_normal((32, 4 * dims)).astype(np.float32))
# unique indices per table so per-row effective lr is uniform
idxs = jnp.asarray(np.stack([rng.permutation(200)[:32] for _ in range(4)]).astype(np.int32))

n_elem = 32 * 4 * dims
lr = n_elem / 4  # contraction factor 0.5 per step for mean-MSE
losses = []
for step in range(20):
    fused, pull = et.maplookup_vjp(et.PreallocationStrategy(), tables, idxs)
    loss, dfused = jax.value_and_grad(lambda y: ((y - target) ** 2).mean())(fused)
    upds = pull(dfused)
    tables = et.ensemble_sgd_update(tables, upds, lr)
    losses.append(float(loss))
print("5. training losses:", [f"{l:.4f}" for l in losses[::4]])
assert losses[-1] < losses[0] * 0.01, "loss did not decrease"

# --- 6. probes ---
try:
    et.SimpleEmbedding(np.zeros((4, 8), np.float32), et.Static(16))
    raise SystemExit("probe fail: Static mismatch not caught")
except ValueError as e:
    print("6. probe: Static mismatch ->", e)
try:
    et.maplookup(tables, [idxs[0]])
    raise SystemExit("probe fail: wrong container length not caught")
except ValueError as e:
    print("   probe: wrong index-container length ->", e)
try:
    et.lookup(tables[0], np.zeros((2, 2, 2), np.int32))
    raise SystemExit("probe fail: 3-D indices to lookup not caught")
except ValueError as e:
    print("   probe: 3-D indices to single-table lookup ->", e)

# --- 7. DLRM model: a few real train steps on-chip, loss must drop ---
from embeddingtables_tpu.models import DLRMConfig, init_dlrm, make_train_step
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
from embeddingtables_tpu.data import SyntheticCriteo

cfg = DLRMConfig(vocab_sizes=tuple([2000] * 8), num_dense=13, dim=128,
                 bottom_mlp=(64, 128), top_mlp=(64, 1))
gen = SyntheticCriteo(vocab_sizes=cfg.vocab_sizes, num_dense=13,
                      batch_size=1024, seed=3)
model = init_dlrm(jax.random.key(0), cfg,
                  sparse_opt=SparseRowWiseAdaGrad(lr=0.05))
step = make_train_step(cfg, sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                       dense_lr=0.05)
dlrm_losses = []
it = gen.batches()
for _ in range(8):
    b = next(it)
    model, loss = step(model, jnp.asarray(b["dense"]), jnp.asarray(b["cat"]),
                       jnp.asarray(b["label"]))
    dlrm_losses.append(float(loss))
assert dlrm_losses[-1] < dlrm_losses[0], dlrm_losses
print("7. DLRM on-chip train:", [f"{l:.4f}" for l in dlrm_losses])

# --- 8. two-tower retrieval + int8 quantized serving on-chip ---
from embeddingtables_tpu.models.two_tower import (TwoTowerConfig,
                                                  build_item_index,
                                                  init_two_tower, retrieve)
tt_cfg = TwoTowerConfig(query_vocab_sizes=(100, 100), item_vocab=500,
                        num_dense=3, dim=16, embed_dim=16,
                        query_mlp=(32, 16), item_mlp=(32, 16))
tt = init_two_tower(jax.random.key(1), tt_cfg)
index = build_item_index(tt, batch=256)
dq = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
qc = jnp.asarray(rng.integers(0, 100, (2, 8)).astype(np.int32))
scores, ids = retrieve(tt, index, dq, qc, k=5)
assert ids.shape == (8, 5) and (np.asarray(ids) < 500).all()
print("8. two-tower retrieval on-chip:", ids.shape)

# NOTE: `data` was donated (consumed) by the in-place pallas update in
# section 3 — the reference's `update!` semantics; use the updated table.
data_q = new.data
qt = et.QuantizedEmbedding.quantize(et.SimpleEmbedding(data_q))
out_q = et.lookup(qt, idx[:64])
err = np.abs(np.asarray(out_q) - np.asarray(data_q)[np.asarray(idx[:64])]).max()
assert err < 0.05, err
print("   int8 quantized lookup on-chip, max err", err)

# --- 9. serving layer on-chip: micro-batched DLRM scoring + HTTP ---
from embeddingtables_tpu.models.dlrm import make_eval_step
from embeddingtables_tpu.serving import make_dlrm_service, serve_http
svc = make_dlrm_service(model, max_batch=256, max_latency_ms=5.0)
sb = next(it)
want = np.asarray(make_eval_step(cfg)(model, jnp.asarray(sb["dense"][:16]),
                                      jnp.asarray(sb["cat"][:, :16])))
futs = [svc.submit(sb["dense"][i:i + 4], sb["cat"][:, i:i + 4])
        for i in range(0, 16, 4)]
got = np.concatenate([f.result(timeout=60) for f in futs])
np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
server = serve_http(svc)
import json as _json
import urllib.request as _rq
port = server.server_address[1]
body = _json.dumps({"dense": sb["dense"][:2].tolist(),
                    "cat": sb["cat"][:, :2].tolist()}).encode()
resp = _json.loads(_rq.urlopen(_rq.Request(
    f"http://127.0.0.1:{port}/predict", data=body), timeout=60).read())
np.testing.assert_allclose(np.asarray(resp["scores"], np.float32), want[:2],
                           rtol=1e-4, atol=1e-5)
server.shutdown()

# --- 10. RPC transport on-chip: binary framing + routing over the service --
from embeddingtables_tpu.rpc import ModelRouter, RPCClient, serve_rpc
router = ModelRouter()
router.register("dlrm", svc, stop_previous=False)
rpc_srv = serve_rpc(router)
cli = RPCClient(*rpc_srv.address)
assert cli.ping() and cli.list_models() == ["dlrm"]
rpc_got = cli.predict("dlrm", sb["dense"][:8], sb["cat"][:, :8])
np.testing.assert_allclose(rpc_got, want[:8], rtol=1e-4, atol=1e-5)
cli.close()
rpc_srv.stop()
svc.stop()
print("9. serving layer on-chip: micro-batched + HTTP scores match eval")
print("10. RPC transport on-chip: framed predict matches eval")

# --- 11. MXU segment-accumulate kernel on-chip vs segment_sum oracle ------
from embeddingtables_tpu.ops.pallas.segsum import hot_accumulate
_r = np.random.default_rng(0)
_rows = jnp.asarray(_r.integers(0, 1024, 8192).astype(np.int32))
_vals = jnp.asarray(_r.standard_normal((8192, 128)).astype(np.float32))
_got = hot_accumulate(_rows, _vals, 512, compute_dtype=jnp.float32)
_safe = jnp.where(_rows < 512, _rows, 512)
_want = jnp.zeros((512, 128), jnp.float32).at[_safe].add(_vals, mode="drop")
_err = float(jnp.abs(_got - _want).max())
assert _err < 1e-3, _err
print(f"11. MXU segsum kernel on-chip matches oracle, max err {_err:.2g}")

# --- 12. optimizer zoo on-chip: regularized SGD/AdaGrad + lazy Adam -------
from embeddingtables_tpu.optim import (SparseLazyAdam, SparseRowWiseAdaGrad,
                                       SparseSGD)
_d = jnp.asarray(_r.standard_normal((500, 128)).astype(np.float32))
_i = jnp.asarray(_r.integers(0, 500, 64).astype(np.int32))
_dl = jnp.asarray(_r.standard_normal((64, 128)).astype(np.float32))
_u = et.SparseEmbeddingUpdate(delta=_dl, indices=_i)
for _opt in (SparseSGD(0.1, weight_decay=0.01, clipnorm=1.0),
             SparseRowWiseAdaGrad(lr=0.1, weight_decay=0.01),
             SparseLazyAdam(lr=0.01)):
    _nd, _ns = _opt.apply(_d, _u, _opt.init(_d))
    _touched = np.unique(np.asarray(_i))
    _un = np.setdiff1d(np.arange(500), _touched)
    assert (np.asarray(_nd)[_un] == np.asarray(_d)[_un]).all(), type(_opt)
    assert not (np.asarray(_nd)[_touched] == np.asarray(_d)[_touched]).all()
print("12. optimizer zoo on-chip: lazy decay/clip/Adam touch only their rows")

# --- 13. compressed tables (QR + MD) on-chip ------------------------------
from embeddingtables_tpu.qr import QREmbedding, qr_lookup_vjp
from embeddingtables_tpu.md import MDEmbedding, md_lookup_vjp
_qt = QREmbedding.create(jax.random.key(7), 10_000, 128, combine="mult")
_mi = jnp.asarray(_r.integers(0, 10_000, 256).astype(np.int32))
_qd = np.asarray(_qt.materialize())
np.testing.assert_allclose(np.asarray(_qt.rows(_mi)), _qd[np.asarray(_mi)],
                           rtol=1e-5, atol=1e-5)
_out, _pull = qr_lookup_vjp(_qt, _mi)
_uq, _ur = _pull(jnp.ones_like(_out))
assert _uq.indices.shape == (256,) and _ur.indices.shape == (256,)
_mt = MDEmbedding.create(jax.random.key(8), 10_000, 128, 16)
np.testing.assert_allclose(np.asarray(_mt.rows(_mi)),
                           np.asarray(_mt.materialize())[np.asarray(_mi)],
                           rtol=1e-4, atol=1e-4)
from embeddingtables_tpu.tt import TTEmbedding, tt_lookup_vjp
_tt = TTEmbedding.create(jax.random.key(9), 10_000, 128, rank=8)
np.testing.assert_allclose(np.asarray(_tt.rows(_mi)),
                           np.asarray(_tt.materialize())[np.asarray(_mi)],
                           rtol=1e-4, atol=1e-4)
_out, _pull = tt_lookup_vjp(_tt, _mi)
_uts = _pull(jnp.ones_like(_out))
assert len(_uts) == len(_tt.cores)
assert all(u.indices.shape == (256,) for u in _uts)
print(f"13. compressed tables on-chip: QR x{_qt.compression():.0f}, "
      f"MD x{_mt.compression():.1f}, TT x{_tt.compression():.0f} memory, "
      f"lookups match dense")

# --- 14. row lifecycle on-chip: evict + state reset -----------------------
from embeddingtables_tpu.utils import evict_rows, reset_rows_state
_t14 = jnp.asarray(_r.standard_normal((200, 128)).astype(np.float32))
_cold = jnp.asarray([5, 17, 99], jnp.int32)
_t14b = evict_rows(_t14, _cold, init_fn=jax.random.normal,
                   key=jax.random.key(3))
assert not np.allclose(np.asarray(_t14b)[5], np.asarray(_t14)[5])
_keep14 = np.setdiff1d(np.arange(200), np.asarray(_cold))
np.testing.assert_array_equal(np.asarray(_t14b)[_keep14],
                              np.asarray(_t14)[_keep14])
print("14. row lifecycle on-chip: eviction reinit + survivors intact")

# --- 15. tiered hot/cold table on-chip -------------------------------------
from embeddingtables_tpu.tiered import TieredEmbedding
_td = jnp.asarray(_r.standard_normal((5000, 128)).astype(np.float32))
_tt15 = TieredEmbedding.from_array(_td, 512)
assert _tt15.cold.sharding.memory_kind == "pinned_host"
_ti = jnp.asarray(_r.integers(0, 5000, 256).astype(np.int32))
np.testing.assert_allclose(np.asarray(_tt15.rows(_ti)),
                           np.asarray(_td)[np.asarray(_ti)], rtol=1e-6)
_tt15b = _tt15.scatter_apply(jnp.asarray([3, 3, 4000], jnp.int32),
                             jnp.ones((3, 128), jnp.float32))
_m15 = np.asarray(_tt15b.materialize())
np.testing.assert_allclose(_m15[3], np.asarray(_td)[3] + 2.0, rtol=1e-5)
np.testing.assert_allclose(_m15[4000], np.asarray(_td)[4000] + 1.0,
                           rtol=1e-5)
print("15. tiered hot/cold table on-chip: routed gather + tiered scatter")

# --- 16. round-2 optimizer x placement closure on-chip ---------------------
# Single real chip => 1-device mesh; this still drives the full sharded
# code path (shard_map, exchanges, state plumbing) through the compiler.
from embeddingtables_tpu.models import DLRMConfig as _DC16, init_dlrm as _init16
from embeddingtables_tpu.models.dlrm import make_train_step as _mts16
from embeddingtables_tpu.optim import SparseFTRL as _FT16, SparseLazyAdam as _LA16
from embeddingtables_tpu.parallel.dlrm import (batch_shardings as _bs16,
                                               make_sharded_train_step as _sts16,
                                               shard_dlrm as _sd16,
                                               unshard_dlrm as _us16)
from embeddingtables_tpu.parallel.mesh import default_mesh as _dm16
_cfg16 = _DC16(vocab_sizes=(256, 512), num_dense=4, dim=128,
               bottom_mlp=(64, 128), top_mlp=(64, 1),
               compute_dtype=jnp.float32)
_mesh16 = _dm16(("data",))
for _opt16 in (_LA16(lr=0.05), _FT16(lr=0.2, l1=0.001)):
    _m1 = _init16(jax.random.key(0), _cfg16, sparse_opt=_opt16)
    _mN = _sd16(_init16(jax.random.key(0), _cfg16, sparse_opt=_opt16),
                _mesh16, "data", sparse_opt=_opt16)
    _s1 = _mts16(_cfg16, sparse_opt=_opt16, dense_lr=0.1)
    _sN = _sts16(_cfg16, _mesh16, "data", sparse_opt=_opt16, dense_lr=0.1,
                 microbatch=2)
    _sd, _sc, _sl = _bs16(_mesh16, "data")
    _d16 = _r.normal(size=(64, 4)).astype(np.float32)
    _c16 = np.stack([_r.integers(0, v, 64).astype(np.int32)
                     for v in _cfg16.vocab_sizes])
    _l16 = (_r.random(64) < 0.3).astype(np.float32)
    _m1, _loss1 = _s1(_m1, jnp.asarray(_d16), jnp.asarray(_c16),
                      jnp.asarray(_l16))
    _mN, _lossN = _sN(_mN, jax.device_put(_d16, _sd),
                      jax.device_put(_c16, _sc), jax.device_put(_l16, _sl))
    np.testing.assert_allclose(float(_lossN), float(_loss1), rtol=1e-4)
    _got16 = _us16(_mN)
    np.testing.assert_allclose(np.asarray(_got16.tables.data),
                               np.asarray(_m1.tables.data), rtol=5e-4,
                               atol=1e-5)
    print(f"16. sharded {type(_opt16).__name__} + microbatch on-chip: "
          "matches single-chip step")

# --- 17. DeepFM folded layout on-chip (round 4) -----------------------------
# fold_fm_w=True (default): first-order weights ride column 0 of the fused
# (ΣV, D+1) stack — one gather, one lazy update. Check exact fold-vs-legacy
# SGD parity on the real chip plus the quantized fused serving path.
from embeddingtables_tpu.models.deepfm import (DeepFMConfig as _FC17,
                                               deepfm_forward as _fwd17,
                                               fuse_deepfm as _fuse17,
                                               init_deepfm as _ifm17,
                                               make_train_step as _mfs17)
from embeddingtables_tpu.optim import SparseSGD as _SGD17
from embeddingtables_tpu.quant import quantize_deepfm as _qfm17
import dataclasses as _dc17
_cfg17 = _FC17(vocab_sizes=(300, 200), num_dense=4, dim=16,
               deep_mlp=(32, 16), compute_dtype=jnp.float32)
_cfg17l = _dc17.replace(_cfg17, fold_fm_w=False)
# Two independent inits (same key): the jitted steps donate their model,
# and fuse_deepfm shares the dense-tower arrays with its source.
_ml17 = _ifm17(jax.random.key(9), _cfg17l)
_mf17 = _fuse17(_ifm17(jax.random.key(9), _cfg17l))
_d17 = jnp.asarray(_r.normal(size=(64, 4)).astype(np.float32))
_c17 = jnp.asarray(np.stack([_r.integers(0, v, 64).astype(np.int32)
                             for v in _cfg17.vocab_sizes]))
_l17 = jnp.asarray((_r.random(64) < 0.3).astype(np.float32))
np.testing.assert_allclose(np.asarray(_fwd17(_mf17, _d17, _c17)),
                           np.asarray(_fwd17(_ml17, _d17, _c17)),
                           rtol=1e-5, atol=1e-6)
_sf17 = _mfs17(_cfg17, sparse_opt=_SGD17(lr=0.1), dense_lr=0.1)
_sl17 = _mfs17(_cfg17l, sparse_opt=_SGD17(lr=0.1), dense_lr=0.1)
for _ in range(2):
    _mf17, _lf = _sf17(_mf17, _d17, _c17, _l17)
    _ml17, _ll = _sl17(_ml17, _d17, _c17, _l17)
    np.testing.assert_allclose(float(_lf), float(_ll), rtol=1e-5)
np.testing.assert_allclose(np.asarray(_mf17.tables.data[:, 1:]),
                           np.asarray(_ml17.tables.data),
                           rtol=1e-4, atol=1e-6)
np.testing.assert_allclose(np.asarray(_mf17.tables.data[:, :1]),
                           np.asarray(_ml17.fm_w.data),
                           rtol=1e-4, atol=1e-6)
_, _qe17 = _qfm17(_mf17, bits=8)
np.testing.assert_allclose(np.asarray(_qe17(_d17, _c17)),
                           np.asarray(_fwd17(_mf17, _d17, _c17)),
                           rtol=0.1, atol=0.05)
print("17. DeepFM folded stack on-chip: fold==legacy SGD steps, "
      "fused int8 serving in bound")

# --- 18. Planned two-tower on-chip (round 5) --------------------------------
# Both retrieval row spaces behind plan_sharding/PlannedTables on the real
# chip (1-device mesh, same discipline as section 16): planned contrastive
# steps track the single-chip trajectory, planned retrieval matches.
from embeddingtables_tpu.models.two_tower import (
    TwoTowerConfig as _TTC18, build_item_index as _bii18,
    init_two_tower as _itt18, make_train_step as _mts18,
    retrieve as _ret18)
from embeddingtables_tpu.optim import SparseSGD as _SGD18
from embeddingtables_tpu.parallel.mesh import default_mesh as _dm18
from embeddingtables_tpu.parallel.planner import (
    make_planned_tt_train_step as _mpts18, place_two_tower_on_plan as _pt18,
    plan_sharding as _ps18, planned_build_item_index as _pbii18,
    planned_retrieve as _pret18)
_cfg18 = _TTC18(query_vocab_sizes=(80, 200), item_vocab=300, num_dense=3,
                dim=16, embed_dim=16, query_mlp=(32, 16), item_mlp=(32, 16),
                compute_dtype=jnp.float32)
_mesh18 = _dm18(("data",))
_qp18 = _ps18(_cfg18.query_vocab_sizes, _cfg18.dim, _mesh18,
              replicate_max_bytes=80 * _cfg18.dim * 4 + 1)
_ip18 = _ps18([_cfg18.item_vocab], _cfg18.dim, _mesh18,
              replicate_max_bytes=1)
# Two independent inits (same key): on a 1-device mesh device_put can
# ALIAS instead of copy, and the donated single-chip step would delete
# the planned model's buffers (the section-17 discipline).
_m18 = _itt18(jax.random.key(18), _cfg18, sparse_opt=_SGD18(0.1))
_mp18 = _pt18(_qp18, _ip18, _mesh18,
              _itt18(jax.random.key(18), _cfg18, sparse_opt=_SGD18(0.1)),
              _SGD18(0.1))
_s18 = _mts18(_cfg18, sparse_opt=_SGD18(0.1), dense_lr=0.1)
_sp18 = _mpts18(_cfg18, _mesh18, sparse_opt=_SGD18(0.1), dense_lr=0.1)
for _k in range(2):
    _d = jnp.asarray(_r.normal(size=(32, 3)).astype(np.float32))
    _q = jnp.asarray(np.stack([_r.integers(0, v, 32).astype(np.int32)
                               for v in _cfg18.query_vocab_sizes]))
    _i = jnp.asarray(_r.permutation(_cfg18.item_vocab)[:32].astype(np.int32))
    _m18, (_l1, _) = _s18(_m18, _d, _q, _i)
    _mp18, (_lp, _) = _sp18(_mp18, _d, _q, _i)
    np.testing.assert_allclose(float(_lp), float(_l1), rtol=1e-4)
_idx1 = _bii18(_m18, batch=128)
_idxp = _pbii18(_mesh18, _mp18, batch=128)
np.testing.assert_allclose(np.asarray(_idxp), np.asarray(_idx1),
                           rtol=5e-4, atol=1e-5)
_sc1, _id1 = _ret18(_m18, _idx1, _d, _q, k=5)
_scp, _idp = _pret18(_mesh18, _mp18, _idxp, np.asarray(_d), np.asarray(_q),
                     k=5)
np.testing.assert_allclose(np.asarray(_scp), np.asarray(_sc1), rtol=5e-4,
                           atol=1e-5)
print("18. planned two-tower on-chip: planned steps track single chip, "
      "planned retrieval matches")

print("ALL TPU VERIFICATION CHECKS PASSED")
