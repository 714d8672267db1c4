"""Column (feature-dim) sharding: parity with the single-chip contract.

The other TP decomposition (SURVEY.md §2.3): no index routing, so hot-row
skew costs nothing — verified by an all-one-row stream that the row-sharded
butterfly would bottleneck on a single owner.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from embeddingtables_tpu.ops.lookup import lookup, lookup_vjp
from embeddingtables_tpu.ops.sparse_update import (SparseEmbeddingUpdate,
                                                   sgd_update)
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.parallel.colshard import (ColShardedStackedTables,
                                                   col_sharded_lookup,
                                                   col_sharded_update)
from embeddingtables_tpu.tables import SimpleEmbedding

V, B, BAG = 96, 32, 4


def mesh1d():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


def put_batch(mesh, idx):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(idx, NamedSharding(mesh, P("x")))


@pytest.mark.parametrize("dim", [16, 24, 130])  # incl. non-divisible dims
@pytest.mark.parametrize("bag", [None, BAG])
def test_col_sharded_lookup_matches_single_chip(dim, bag):
    rng = np.random.default_rng(hash((dim, bag)) % 2**31)
    data = jnp.asarray(rng.standard_normal((V, dim)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    np.testing.assert_array_equal(np.asarray(ct.unshard()), np.asarray(data))
    shape = (B,) if bag is None else (B, bag)
    idx = jnp.asarray(rng.integers(0, V, shape).astype(np.int32))
    got = col_sharded_lookup(mesh, ct, put_batch(mesh, idx))
    exp = lookup(data, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=1e-6, atol=1e-6)


def test_col_sharded_lookup_replicated_batch():
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.standard_normal((V, 16)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    idx = jnp.asarray(rng.integers(0, V, (B,)).astype(np.int32))
    got = col_sharded_lookup(mesh, ct, idx, batch_sharded=False)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(lookup(data, idx)), atol=1e-6)


def test_col_sharded_stacked_ensemble():
    rng = np.random.default_rng(5)
    tabs = [SimpleEmbedding(jnp.asarray(
        rng.standard_normal((40 + 10 * t, 16)).astype(np.float32)))
        for t in range(3)]
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", tabs)
    assert ct.ntables == 3
    for t in range(3):
        np.testing.assert_array_equal(np.asarray(ct.table(t)),
                                      np.asarray(tabs[t].data))


@pytest.mark.parametrize("bag", [None, BAG])
def test_col_sharded_sgd_update_matches_single_chip(bag):
    rng = np.random.default_rng(7)
    dim = 24
    data = jnp.asarray(rng.standard_normal((V, dim)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    shape = (B,) if bag is None else (B, bag)
    idx = jnp.asarray(rng.integers(0, V, shape).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    upd = SparseEmbeddingUpdate(delta=delta, indices=idx)
    new_ct = col_sharded_update(mesh, ct,
                                SparseEmbeddingUpdate(
                                    delta=put_batch(mesh, delta),
                                    indices=put_batch(mesh, idx)),
                                SparseSGD(0.5))
    exp = sgd_update(data, upd, 0.5)
    np.testing.assert_allclose(np.asarray(new_ct.unshard()),
                               np.asarray(exp), rtol=2e-5, atol=1e-6)


def test_col_sharded_adagrad_matches_single_chip_multistep():
    rng = np.random.default_rng(9)
    dim = 16
    data = jnp.asarray(rng.standard_normal((V, dim)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    opt = SparseRowWiseAdaGrad(lr=0.3, eps=1e-6)
    accum = jnp.zeros((V,), jnp.float32)
    data1 = data
    state1 = opt.init(data)
    for it in range(3):
        idx = jnp.asarray(rng.integers(0, V, (B, BAG)).astype(np.int32))
        delta = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
        upd = SparseEmbeddingUpdate(delta=delta, indices=idx)
        data1, state1 = opt.apply(data1, upd, state1)
        ct, accum = col_sharded_update(
            mesh, ct,
            SparseEmbeddingUpdate(delta=put_batch(mesh, delta),
                                  indices=put_batch(mesh, idx)),
            opt, accum)
        np.testing.assert_allclose(np.asarray(ct.unshard()),
                                   np.asarray(data1), rtol=2e-4, atol=1e-6,
                                   err_msg=f"step {it}")
    np.testing.assert_allclose(np.asarray(accum), np.asarray(state1.accum),
                               rtol=2e-5, atol=1e-7)


def test_col_sharding_is_skew_free():
    """Every occurrence hits ONE row: the column layout has no per-row
    owner, so the lookup still matches exactly (the row-sharded butterfly
    would need capacity ~= the whole stream on one owner for this)."""
    rng = np.random.default_rng(11)
    dim = 16
    data = jnp.asarray(rng.standard_normal((V, dim)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    idx = jnp.full((B, BAG), 7, jnp.int32)   # all traffic on row 7
    got = col_sharded_lookup(mesh, ct, put_batch(mesh, idx))
    exp = lookup(data, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-6)


def test_col_sharded_weighted_update_and_guards():
    rng = np.random.default_rng(13)
    dim = 16
    data = jnp.asarray(rng.standard_normal((V, dim)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    idx = jnp.asarray(rng.integers(0, V, (B, BAG)).astype(np.int32))
    out, pb = lookup_vjp(data, idx, combiner="mean")
    delta = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    upd = pb(delta)
    new_ct = col_sharded_update(
        mesh, ct,
        SparseEmbeddingUpdate(delta=put_batch(mesh, upd.delta),
                              indices=put_batch(mesh, upd.indices),
                              weights=put_batch(mesh, upd.weights)),
        SparseSGD(0.5))
    exp = sgd_update(data, upd, 0.5)
    np.testing.assert_allclose(np.asarray(new_ct.unshard()),
                               np.asarray(exp), rtol=2e-5, atol=1e-6)
    with pytest.raises(ValueError, match="accum"):
        col_sharded_update(mesh, ct, upd, SparseRowWiseAdaGrad(lr=0.1))


def test_col_sharded_ensemble_lookup_reducing_false():
    """(B, T) ensemble layouts are NOT bags: reducing=False returns
    per-table embeddings instead of silently summing across tables."""
    rng = np.random.default_rng(17)
    dim, T = 16, 3
    tabs = [jnp.asarray(rng.standard_normal((40, dim)).astype(np.float32))
            for _ in range(T)]
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(
        mesh, "x", [SimpleEmbedding(t) for t in tabs])
    local = np.stack([rng.integers(0, 40, B).astype(np.int32)
                      for _ in range(T)], axis=1)          # (B, T)
    shifted = local + np.asarray([ct.offsets[t] for t in range(T)])
    got = col_sharded_lookup(mesh, ct, put_batch(mesh, jnp.asarray(shifted)),
                             reducing=False)               # (B, T, dim)
    assert got.shape == (B, T, dim)
    for t in range(T):
        exp = np.asarray(tabs[t])[local[:, t]]
        np.testing.assert_allclose(np.asarray(got[:, t]), exp, atol=1e-6)


def test_col_sharded_guard_matrix():
    rng = np.random.default_rng(19)
    data = jnp.asarray(rng.standard_normal((V, 16)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    upd = SparseEmbeddingUpdate(
        delta=jnp.zeros((B, 16)), indices=jnp.zeros((B,), jnp.int32))
    with pytest.raises(ValueError, match="accum is optimizer state"):
        col_sharded_update(mesh, ct, upd, SparseSGD(0.1),
                           jnp.zeros((V,), jnp.float32))
    # Round 3: SR is WIRED (per-device column noise); a missing key still
    # raises loudly instead of silently rounding to nearest.
    with pytest.raises(ValueError, match="key"):
        col_sharded_update(mesh, ct, upd,
                           SparseSGD(0.1, stochastic_rounding=True))


def test_wire_dtype_requires_a2a():
    from embeddingtables_tpu.models.dlrm import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    from embeddingtables_tpu.parallel.dlrm import make_sharded_train_step
    from embeddingtables_tpu.parallel.mesh import default_mesh
    cfg = DLRMConfig(vocab_sizes=(64,), num_dense=4, dim=8,
                     bottom_mlp=(16, 8), top_mlp=(16, 1))
    mesh = default_mesh(("data",))
    with pytest.raises(ValueError, match="a2a"):
        make_sharded_train_step(cfg, mesh, "data",
                                wire_dtype=jnp.bfloat16)  # gather default
    with pytest.raises(ValueError, match="wire_dtype requires mesh"):
        train_dlrm(cfg, iter([]), 0, wire_dtype=jnp.bfloat16,
                   verbose=False)


@pytest.mark.parametrize("combiner", ["sum", "mean"])
@pytest.mark.parametrize("weighted", [False, True])
def test_col_sharded_lookup_combiner_pad_parity(combiner, weighted):
    rng = np.random.default_rng(hash((combiner, weighted)) % 2**31)
    dim = 16
    data = jnp.asarray(rng.standard_normal((V, dim)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    idx = rng.integers(0, V, (B, BAG)).astype(np.int32)
    idx = np.where(rng.random((B, BAG)) < 0.3, -1, idx)
    idx[2, :] = -1
    w = (jnp.asarray(rng.random((B, BAG)).astype(np.float32)) + 0.1
         if weighted else None)
    got = col_sharded_lookup(mesh, ct, put_batch(mesh, jnp.asarray(idx)),
                             combiner=combiner,
                             weights=None if w is None else put_batch(mesh, w),
                             pad_idx=-1)
    exp = lookup(data, jnp.asarray(idx), combiner=combiner, weights=w,
                 pad_idx=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=1e-5, atol=1e-5)


def test_col_sharded_update_with_padded_lazy_weights():
    """A lookup_vjp(pad_idx=) update applies correctly: pads carry weight 0
    through the transposed exchange (wrapped row adds exactly zero)."""
    rng = np.random.default_rng(61)
    dim = 16
    data = jnp.asarray(rng.standard_normal((V, dim)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    idx = np.where(rng.random((B, BAG)) < 0.3, -1,
                   rng.integers(0, V, (B, BAG))).astype(np.int32)
    out, pb = lookup_vjp(data, jnp.asarray(idx), combiner="mean", pad_idx=-1)
    delta = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    upd = pb(delta)
    # Remap sentinels to a safe in-range row for the local scatter (weight
    # 0 makes the remap a numerical no-op; mode='drop' would wrap -1).
    safe = jnp.where(upd.indices == -1, 0, upd.indices)
    new_ct = col_sharded_update(
        mesh, ct,
        SparseEmbeddingUpdate(delta=put_batch(mesh, upd.delta),
                              indices=put_batch(mesh, safe),
                              weights=put_batch(mesh, upd.weights)),
        SparseSGD(0.5))
    exp = sgd_update(data, upd, 0.5)
    np.testing.assert_allclose(np.asarray(new_ct.unshard()),
                               np.asarray(exp), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("opt_name", ["sgd_reg", "adagrad_reg", "adam",
                                      "adam_reg", "ftrl"])
def test_col_sharded_optimizers_match_single_chip(opt_name):
    """Round-2 colshard closure: regularized SGD/AdaGrad (full-row clip +
    lazy decay via the fused (V, 2) psum) and per-coordinate Adam/FTRL
    state (column-sharded moments / z-n) all match the single-chip
    optimizer over multiple steps — including occurrences whose gradient
    lands entirely in other devices' columns (global touched mask)."""
    from embeddingtables_tpu.optim import SparseFTRL, SparseLazyAdam
    from embeddingtables_tpu.parallel.colshard import init_col_row_state
    opt = {
        "sgd_reg": lambda: SparseSGD(0.3, weight_decay=0.02, clipnorm=0.5),
        "adagrad_reg": lambda: SparseRowWiseAdaGrad(
            lr=0.3, weight_decay=0.02, clipnorm=0.5),
        "adam": lambda: SparseLazyAdam(lr=0.05),
        "adam_reg": lambda: SparseLazyAdam(lr=0.05, weight_decay=0.01,
                                           clipnorm=1.0),
        "ftrl": lambda: SparseFTRL(lr=0.2, l1=0.002, l2=0.01),
    }[opt_name]()
    rng = np.random.default_rng(hash(opt_name) % 2**31)
    dim = 24   # not divisible by 8: exercises the padded column slices
    data = jnp.asarray(rng.standard_normal((V, dim)).astype(np.float32))
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    state_c = init_col_row_state(mesh, ct, opt)
    data_1 = data
    state_1 = opt.init(data)
    for i in range(3):
        idx = rng.integers(0, V, (B, BAG)).astype(np.int32)
        delta = rng.standard_normal((B, dim)).astype(np.float32)
        upd = SparseEmbeddingUpdate(delta=jnp.asarray(delta),
                                    indices=jnp.asarray(idx))
        data_1, state_1 = opt.apply(data_1, upd, state_1)
        upd_c = SparseEmbeddingUpdate(
            delta=put_batch(mesh, jnp.asarray(delta)),
            indices=put_batch(mesh, jnp.asarray(idx)))
        if isinstance(opt, SparseSGD):
            ct = col_sharded_update(mesh, ct, upd_c, opt)
        else:
            ct, state_c = col_sharded_update(mesh, ct, upd_c, opt,
                                             state_c)
    np.testing.assert_allclose(np.asarray(ct.unshard()),
                               np.asarray(data_1), rtol=2e-4, atol=1e-6)
    if isinstance(opt, SparseRowWiseAdaGrad):
        np.testing.assert_allclose(np.asarray(state_c),
                                   np.asarray(state_1.accum),
                                   rtol=2e-4, atol=1e-7)
    elif isinstance(opt, SparseLazyAdam):
        m, v, count = state_c
        n = ct.n_shards
        cl = ct.data.shape[2]
        m_full = np.asarray(m).transpose(1, 0, 2).reshape(V, n * cl)[:, :dim]
        np.testing.assert_allclose(m_full, np.asarray(state_1.m),
                                   rtol=2e-4, atol=1e-7)
        assert int(count) == 3
    elif isinstance(opt, SparseFTRL):
        z, n_st = state_c
        n = ct.n_shards
        cl = ct.data.shape[2]
        z_full = np.asarray(z).transpose(1, 0, 2).reshape(V, n * cl)[:, :dim]
        np.testing.assert_allclose(z_full, np.asarray(state_1.z),
                                   rtol=2e-4, atol=1e-6)


def test_col_sharded_cross_slice_touched():
    """A gradient that is nonzero ONLY in device 0's columns must still
    advance the full-row state everywhere (global touched via the psum)."""
    from embeddingtables_tpu.optim import SparseLazyAdam
    from embeddingtables_tpu.parallel.colshard import init_col_row_state
    opt = SparseLazyAdam(lr=0.1)
    dim = 16   # cols_local = 2 per device on the 8-mesh
    data = jnp.ones((V, dim), jnp.float32)
    mesh = mesh1d()
    ct = ColShardedStackedTables.shard(mesh, "x", data)
    state = init_col_row_state(mesh, ct, opt)
    delta = np.zeros((B, dim), np.float32)
    delta[:, 0] = 1.0   # gradient only in the first column (device 0)
    idx = np.full((B,), 7, np.int32)
    upd = SparseEmbeddingUpdate(delta=put_batch(mesh, jnp.asarray(delta)),
                                indices=put_batch(mesh, jnp.asarray(idx)))
    ct2, state2 = col_sharded_update(mesh, ct, upd, opt, state)
    d1, s1 = opt.init(data), None
    d1, s1 = opt.apply(data, SparseEmbeddingUpdate(
        delta=jnp.asarray(delta), indices=jnp.asarray(idx)),
        opt.init(data))
    np.testing.assert_allclose(np.asarray(ct2.unshard()), np.asarray(d1),
                               rtol=1e-5, atol=1e-6)
    # Row 7's moments advanced in EVERY column slice (decay applies to the
    # whole touched row, as on a single chip).
    m, v, count = state2
    m_full = np.asarray(m).transpose(1, 0, 2).reshape(
        V, -1)[:, :dim]
    np.testing.assert_allclose(m_full, np.asarray(s1.m), atol=1e-7)
