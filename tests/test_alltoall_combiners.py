"""Butterfly (a2a) exchange: combiner / weights / pad_idx parity.

The pad contract on the butterfly is stronger than on the all-gather
exchange: pads are dropped at the ROUTING stage — they consume no capacity
rank, are not counted in the overflow metric, and never cross the wire.
Oracle: single-chip `lookup` on the unsharded stack (itself dense-oracle- and
torch-parity-tested).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from embeddingtables_tpu.ops.lookup import lookup, lookup_vjp
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
from embeddingtables_tpu.parallel.alltoall import (sharded_adagrad_update_a2a,
                                                   sharded_lookup_a2a,
                                                   sharded_sgd_update_a2a)
from embeddingtables_tpu.parallel.sharded import ShardedStackedTables

V, D, B, BAG = 64, 16, 32, 5


def mesh1d():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


def make_data(rng):
    return jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))


def padded_bags(rng, pad, frac=0.3):
    idx = rng.integers(0, V, size=(B, BAG)).astype(np.int32)
    idx = np.where(rng.random((B, BAG)) < frac, pad, idx)
    idx[2, :] = pad
    return jnp.asarray(idx)


@pytest.mark.parametrize("combiner", ["sum", "mean"])
@pytest.mark.parametrize("weighted", [False, True])
def test_a2a_lookup_combiner_pad_parity(combiner, weighted):
    rng = np.random.default_rng(hash((combiner, weighted)) % 2**31)
    data = make_data(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", data)
    idx = padded_bags(rng, -1)
    w = (jnp.asarray(rng.random((B, BAG)).astype(np.float32)) + 0.1
         if weighted else None)
    got, ovf = sharded_lookup_a2a(mesh, st, idx, capacity_factor=8.0,
                                  combiner=combiner, weights=w, pad_idx=-1)
    assert int(ovf) == 0
    exp = lookup(data, idx, combiner=combiner, weights=w, pad_idx=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)


def test_a2a_pads_consume_no_capacity_and_no_overflow():
    rng = np.random.default_rng(3)
    data = make_data(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", data)
    # All occurrences map to row 0 (one owner). Half are pads. With
    # capacity exactly = valid count per device, nothing may overflow —
    # proving pads take no rank slots.
    n = 8
    per_dev = B * BAG // n  # 20 occurrences per device
    idx = np.zeros((B, BAG), np.int32)
    flat = idx.reshape(-1)
    flat[1::2] = -1  # half pads, interleaved
    idx = jnp.asarray(flat.reshape(B, BAG))
    # per-device stream: 20 occurrences, 10 valid, all owner 0.
    # capacity = ceil(20/8 * cf); choose cf so cap == 10 exactly.
    cf = 10 / np.ceil(per_dev / n)
    got, ovf = sharded_lookup_a2a(mesh, st, idx, capacity_factor=cf,
                                  pad_idx=-1)
    assert int(ovf) == 0
    exp = lookup(data, idx, pad_idx=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)
    # Control: WITHOUT pad awareness the same stream must overflow (all 20
    # occurrences now contend for 10 slots).
    safe = jnp.where(idx == -1, 0, idx)
    _, ovf2 = sharded_lookup_a2a(mesh, st, safe, capacity_factor=cf)
    assert int(ovf2) > 0


def test_a2a_nonreducing_pad():
    rng = np.random.default_rng(5)
    data = make_data(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", data)
    idx = np.where(rng.random(B) < 0.4, -1,
                   rng.integers(0, V, size=(B,))).astype(np.int32)
    got, ovf = sharded_lookup_a2a(mesh, st, jnp.asarray(idx),
                                  capacity_factor=8.0, pad_idx=-1)
    assert int(ovf) == 0
    exp = lookup(data, jnp.asarray(idx), pad_idx=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5)


def test_a2a_sgd_update_pad_drops_gradient():
    rng = np.random.default_rng(7)
    data = make_data(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", data)
    idx = padded_bags(rng, -1)
    out, pb = lookup_vjp(data, idx, combiner="mean", pad_idx=-1)
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    upd = pb(delta)
    lr = 0.5
    new_st, ovf = sharded_sgd_update_a2a(mesh, st, upd, lr,
                                         capacity_factor=8.0, pad_idx=-1)
    assert int(ovf) == 0
    from embeddingtables_tpu.ops.lookup import lookup_oracle
    exp = np.asarray(data) - lr * np.asarray(jax.grad(
        lambda d: (lookup_oracle(d, idx, "mean", None, -1) * delta).sum()
    )(data))
    np.testing.assert_allclose(np.asarray(new_st.unshard()), exp, atol=1e-4)


def test_a2a_adagrad_update_pad_preserves_untouched_state():
    rng = np.random.default_rng(9)
    data = make_data(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", data)
    accum = jnp.zeros(st.data.shape[:2], jnp.float32)
    # Only rows < 8 really touched; everything else padded out.
    idx = rng.integers(0, 8, size=(B, BAG)).astype(np.int32)
    idx = np.where(rng.random((B, BAG)) < 0.4, -1, idx)
    out, pb = lookup_vjp(data, jnp.asarray(idx), pad_idx=-1)
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    upd = pb(delta)
    opt = SparseRowWiseAdaGrad(lr=0.1)
    new_st, new_accum, ovf = sharded_adagrad_update_a2a(
        mesh, st, accum, upd, opt, capacity_factor=8.0, pad_idx=-1)
    assert int(ovf) == 0
    # Single-chip control on the unsharded table.
    exp_data, exp_state = opt.apply(data, upd, opt.init(data))
    np.testing.assert_allclose(np.asarray(new_st.unshard()),
                               np.asarray(exp_data), atol=1e-4)
    # Sharded accum back to global order: global row r -> (r % n, r // n).
    n, rows_local = np.asarray(new_accum).shape
    glob = np.asarray(new_accum).T.reshape(-1)[:V]
    np.testing.assert_allclose(glob, np.asarray(exp_state.accum), atol=1e-5)
    assert np.all(glob[8:] == 0.0)


def test_wire_dtype_bf16_close_and_none_exact():
    """wire_dtype=bf16: one rounding per element (payload-only cast, no
    on-wire reduction), so lookup error is bounded by bf16 ulp; None is
    bit-exact with the default."""
    rng = np.random.default_rng(11)
    data = make_data(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", data)
    idx = padded_bags(rng, -1)
    exact, _ = sharded_lookup_a2a(mesh, st, idx, capacity_factor=8.0,
                                  combiner="mean", pad_idx=-1)
    same, _ = sharded_lookup_a2a(mesh, st, idx, capacity_factor=8.0,
                                 combiner="mean", pad_idx=-1,
                                 wire_dtype=None)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(same))
    bf16, _ = sharded_lookup_a2a(mesh, st, idx, capacity_factor=8.0,
                                 combiner="mean", pad_idx=-1,
                                 wire_dtype=jnp.bfloat16)
    # bf16 mantissa = 8 bits: relative error <= 2^-8 per element.
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(exact),
                               rtol=2e-2, atol=2e-2)
    assert not np.array_equal(np.asarray(bf16), np.asarray(exact))


def test_wire_dtype_bf16_update_close():
    rng = np.random.default_rng(13)
    data = make_data(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", data)
    idx = jnp.asarray(rng.integers(0, V, size=(B,)).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    from embeddingtables_tpu.ops.sparse_update import SparseEmbeddingUpdate
    upd = SparseEmbeddingUpdate(delta=delta, indices=idx)
    exact, _ = sharded_sgd_update_a2a(mesh, st, upd, 0.5,
                                      capacity_factor=8.0)
    bf16, _ = sharded_sgd_update_a2a(mesh, st, upd, 0.5,
                                     capacity_factor=8.0,
                                     wire_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(bf16.unshard()),
                               np.asarray(exact.unshard()),
                               rtol=2e-2, atol=2e-2)
    # AdaGrad variant compiles and stays close too.
    accum = jnp.zeros(st.data.shape[:2], jnp.float32)
    ex2, _, _ = sharded_adagrad_update_a2a(
        mesh, st, accum, upd, SparseRowWiseAdaGrad(lr=0.5),
        capacity_factor=8.0)
    b2, _, _ = sharded_adagrad_update_a2a(
        mesh, st, accum, upd, SparseRowWiseAdaGrad(lr=0.5),
        capacity_factor=8.0, wire_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(b2.unshard()),
                               np.asarray(ex2.unshard()),
                               rtol=2e-2, atol=2e-2)


def test_wire_dtype_model_step():
    """The full a2a DLRM train step runs with bf16 wire payloads and stays
    close to the f32-wire step."""
    import dataclasses as dc
    from embeddingtables_tpu.models.dlrm import DLRMConfig, init_dlrm
    from embeddingtables_tpu.optim import SparseSGD
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm)
    from embeddingtables_tpu.parallel.mesh import default_mesh
    cfg = DLRMConfig(vocab_sizes=(64, 96, 33), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1),
                     compute_dtype=jnp.float32)
    mesh = default_mesh(("data",))
    rng = np.random.default_rng(17)
    dense = rng.normal(size=(32, 4)).astype(np.float32)
    cat = np.stack([rng.integers(0, v, 32).astype(np.int32)
                    for v in cfg.vocab_sizes])
    label = rng.integers(0, 2, 32).astype(np.float32)
    sd, sc, sl = batch_shardings(mesh, "data")
    outs = {}
    for wd in (None, jnp.bfloat16):
        m = shard_dlrm(init_dlrm(jax.random.key(0), cfg,
                                 sparse_opt=SparseSGD(0.3)),
                       mesh, "data", sparse_opt=SparseSGD(0.3))
        step = make_sharded_train_step(cfg, mesh, "data",
                                       sparse_opt=SparseSGD(0.3),
                                       dense_lr=0.3, exchange="a2a",
                                       capacity_factor=8.0, wire_dtype=wd)
        m, loss = step(m, jax.device_put(dense, sd),
                       jax.device_put(cat, sc), jax.device_put(label, sl))
        outs[wd is None] = (float(loss), np.asarray(m.tables.unshard()))
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-2)
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               rtol=2e-2, atol=2e-2)
