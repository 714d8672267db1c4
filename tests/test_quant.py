"""Int8 quantized serving tables: round-trip error bounds, protocol compat,
end-to-end eval parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embeddingtables_tpu as et
from embeddingtables_tpu.quant import (QuantizedEmbedding,
                                       max_quantization_error, quantize_rows)


def test_quantize_roundtrip_error_bound():
    data = jax.random.normal(jax.random.key(0), (100, 64), jnp.float32)
    q, scale = quantize_rows(data)
    assert q.dtype == jnp.int8 and scale.shape == (100,)
    recon = np.asarray(q, np.float32) * np.asarray(scale)[:, None]
    err = np.abs(recon - np.asarray(data))
    bound = np.asarray(scale)[:, None] / 2 + 1e-7
    assert (err <= bound).all()


def test_zero_row_and_spike_row():
    data = jnp.zeros((3, 8), jnp.float32).at[1, 4].set(100.0)
    q, scale = quantize_rows(data)
    np.testing.assert_array_equal(np.asarray(q[0]), 0)
    assert float(scale[0]) == 0.0
    assert abs(float(q[1, 4]) * float(scale[1]) - 100.0) < 0.5


def test_lookup_through_protocol():
    data = jax.random.normal(jax.random.key(1), (50, 16), jnp.float32)
    qt = QuantizedEmbedding.quantize(et.SimpleEmbedding(data))
    idx = jnp.array([3, 49, 3], jnp.int32)
    out = et.lookup(qt, idx)
    expect = np.asarray(data)[np.asarray(idx)]
    tol = max_quantization_error(et.SimpleEmbedding(data))
    assert np.abs(np.asarray(out) - expect).max() <= tol + 1e-6
    # reducing
    out2 = et.lookup(qt, jnp.array([[1, 2], [3, 3]], jnp.int32))
    expect2 = np.asarray(data)[[1, 2]].sum(0), np.asarray(data)[[3, 3]].sum(0)
    assert np.abs(np.asarray(out2[0]) - expect2[0]).max() <= 2 * tol + 1e-6


def test_dlrm_eval_with_quantized_tables_tracks_f32():
    """Serving parity: quantizing a trained DLRM's tables changes logits
    only within quantization noise."""
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import forward_from_embeddings
    cfg = DLRMConfig(vocab_sizes=(40, 60), num_dense=4, dim=16,
                     bottom_mlp=(16, 16), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(2), cfg)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    cat = jnp.asarray(np.stack([rng.integers(0, v, 32).astype(np.int32)
                                for v in cfg.vocab_sizes]))

    def fwd(rows_fn):
        emb = jnp.stack([rows_fn(t, cat[t]) for t in range(2)])  # (T, B, D)
        return forward_from_embeddings(model.bottom, model.top, cfg, dense,
                                       emb)

    f32 = fwd(lambda t, i: et.lookup(model.tables.table(t), i))
    qts = [QuantizedEmbedding.quantize(model.tables.table(t))
           for t in range(2)]
    q8 = fwd(lambda t, i: et.lookup(qts[t], i))
    # logits differ by O(quant noise), far below logit scale
    assert np.abs(np.asarray(q8) - np.asarray(f32)).max() < 0.05
    assert qts[0].nbytes < model.tables.table(0).data.nbytes / 3

def test_quantize_dlrm_serving_parity():
    from embeddingtables_tpu.models import (DLRMConfig, init_dlrm,
                                            make_eval_step)
    from embeddingtables_tpu.quant import quantize_dlrm
    cfg = DLRMConfig(vocab_sizes=(40, 60, 30), num_dense=4, dim=16,
                     bottom_mlp=(16, 16), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(3), cfg)
    rng = np.random.default_rng(1)
    dense = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    cat = jnp.asarray(np.stack([rng.integers(0, v, 16).astype(np.int32)
                                for v in cfg.vocab_sizes]))
    f32 = make_eval_step(cfg)(model, dense, cat)
    qt, eval_fn = quantize_dlrm(model)
    q8 = eval_fn(dense, cat)
    assert np.abs(np.asarray(q8) - np.asarray(f32)).max() < 0.05
    assert qt.nbytes < model.tables.data.nbytes / 3


def test_quantize_dcn_serving_parity():
    from embeddingtables_tpu.models import DCNConfig, init_dcn
    from embeddingtables_tpu.models.dcn import make_eval_step
    from embeddingtables_tpu.quant import quantize_dcn
    cfg = DCNConfig(vocab_sizes=(40, 60, 30), num_dense=4, dim=16,
                    num_cross=2, cross_rank=8, deep_mlp=(16, 8),
                    compute_dtype=jnp.float32)
    model = init_dcn(jax.random.key(3), cfg)
    rng = np.random.default_rng(2)
    dense = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    cat = jnp.asarray(np.stack([rng.integers(0, v, 16).astype(np.int32)
                                for v in cfg.vocab_sizes]))
    f32 = make_eval_step(cfg)(model, dense, cat)
    qt, eval_fn = quantize_dcn(model)
    q8 = eval_fn(dense, cat)
    assert np.abs(np.asarray(q8) - np.asarray(f32)).max() < 0.05
    assert qt.nbytes < model.tables.data.nbytes / 3


def test_int4_roundtrip_and_error_bound():
    from embeddingtables_tpu.quant import Int4QuantizedEmbedding
    rng = np.random.default_rng(4)
    data = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    qt = Int4QuantizedEmbedding.quantize(et.SimpleEmbedding(data))
    assert qt.packed.shape == (50, 8) and qt.packed.dtype == jnp.uint8
    assert qt.shape == (50, 16)
    deq = np.asarray(qt.dequantize())
    # Per-element error bound: scale/2 = absmax/14.
    bound = np.abs(np.asarray(data)).max(axis=1, keepdims=True) / 14 + 1e-6
    assert (np.abs(deq - np.asarray(data)) <= bound).all()
    # rows() matches dequantize + gather, incl. bags.
    idx = jnp.asarray(rng.integers(0, 50, (7, 3)).astype(np.int32))
    np.testing.assert_allclose(np.asarray(qt.rows(idx)),
                               deq[np.asarray(idx)], rtol=1e-6)
    # 8x smaller than f32 (plus the scale vector).
    assert qt.nbytes < data.nbytes / 5   # scale vector amortizes with dim
    # Zero rows and odd dims.
    z = Int4QuantizedEmbedding.quantize(
        et.SimpleEmbedding(jnp.zeros((4, 8))))
    assert np.asarray(z.dequantize()).max() == 0.0
    with pytest.raises(ValueError, match="even dim"):
        Int4QuantizedEmbedding.quantize(
            et.SimpleEmbedding(jnp.zeros((4, 7))))


def test_int4_lookup_protocol():
    from embeddingtables_tpu.quant import Int4QuantizedEmbedding
    rng = np.random.default_rng(6)
    data = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    qt = Int4QuantizedEmbedding.quantize(et.SimpleEmbedding(data))
    idx = jnp.asarray(rng.integers(0, 40, 9).astype(np.int32))
    out = et.lookup(qt, idx)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(qt.dequantize())[np.asarray(idx)],
                               rtol=1e-6, atol=1e-6)


def test_quantize_dlrm_int4_parity():
    from embeddingtables_tpu.models import (DLRMConfig, init_dlrm,
                                            make_eval_step)
    from embeddingtables_tpu.quant import quantize_dlrm
    cfg = DLRMConfig(vocab_sizes=(40, 60, 30), num_dense=4, dim=16,
                     bottom_mlp=(16, 16), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    model = init_dlrm(jax.random.key(3), cfg)
    rng = np.random.default_rng(1)
    dense = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    cat = jnp.asarray(np.stack([rng.integers(0, v, 16).astype(np.int32)
                                for v in cfg.vocab_sizes]))
    f32 = make_eval_step(cfg)(model, dense, cat)
    qt, eval_fn = quantize_dlrm(model, bits=4)
    q4 = eval_fn(dense, cat)
    # Coarser than int8 but logits stay close at init scale.
    assert np.abs(np.asarray(q4) - np.asarray(f32)).max() < 0.5
    assert qt.nbytes < model.tables.data.nbytes / 5
    with pytest.raises(ValueError, match="bits"):
        quantize_dlrm(model, bits=2)


def test_quantize_deepfm_serving_parity():
    from embeddingtables_tpu.models import DeepFMConfig, init_deepfm
    from embeddingtables_tpu.models.deepfm import make_eval_step
    from embeddingtables_tpu.quant import quantize_deepfm
    cfg = DeepFMConfig(vocab_sizes=(40, 60, 30), num_dense=4, dim=16,
                       deep_mlp=(16, 8), compute_dtype=jnp.float32,
                       fold_fm_w=False)
    model = init_deepfm(jax.random.key(3), cfg)
    # Give the (zero-init) first-order weights real values so the parity
    # check exercises the full-precision w path alongside the int8 vectors.
    import dataclasses
    rng = np.random.default_rng(2)
    model = dataclasses.replace(
        model, fm_w=dataclasses.replace(
            model.fm_w, data=jnp.asarray(
                rng.normal(size=model.fm_w.data.shape).astype(np.float32))))
    dense = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    cat = jnp.asarray(np.stack([rng.integers(0, v, 16).astype(np.int32)
                                for v in cfg.vocab_sizes]))
    f32 = make_eval_step(cfg)(model, dense, cat)
    qt, eval_fn = quantize_deepfm(model)
    q8 = eval_fn(dense, cat)
    assert np.abs(np.asarray(q8) - np.asarray(f32)).max() < 0.05
    assert qt.nbytes < model.tables.data.nbytes / 3
    # int4 path compiles and stays within its coarser bound
    _, eval4 = quantize_deepfm(model, bits=4)
    q4 = eval4(dense, cat)
    assert np.abs(np.asarray(q4) - np.asarray(f32)).max() < 0.6
