"""Sharded lookup combiner/padding parity: the single-chip `lookup` contract
(mean/weighted bags, pad_idx sentinel) on the mesh exchange.

Oracle: single-chip `maplookup`/`lookup` on the unsharded stack — itself
dense-oracle-tested in tests/test_combiners.py and tests/test_padding.py.
The exchange must stay ONE weighted-sum gather (mean pre-normalizes, pads
fold in as zero-scale occurrences), so parity here proves the collectives
carry the weights correctly on 1-D and 2-D (data x model) meshes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from embeddingtables_tpu.ops.ensemble import StackedTables, maplookup
from embeddingtables_tpu.ops.lookup import lookup, lookup_vjp
from embeddingtables_tpu.parallel.sharded import (ShardedStackedTables,
                                                  sharded_ensemble_lookup,
                                                  sharded_ensemble_update,
                                                  sharded_lookup)
from embeddingtables_tpu.tables import SimpleEmbedding

T, V, D, B, BAG = 3, 64, 16, 32, 5


def mesh1d():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


def mesh2d():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))


def make_tables(rng):
    return [SimpleEmbedding(jnp.asarray(
        rng.standard_normal((V, D)).astype(np.float32))) for _ in range(T)]


@pytest.mark.parametrize("combiner", ["sum", "mean"])
@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("pad", [None, -1])
def test_sharded_ensemble_lookup_combiner_parity(combiner, weighted, pad):
    rng = np.random.default_rng(hash((combiner, weighted, pad)) % 2**31)
    tabs = make_tables(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", tabs)
    idx = rng.integers(0, V, size=(T, B, BAG)).astype(np.int32)
    if pad is not None:
        idx = np.where(rng.random((T, B, BAG)) < 0.3, pad, idx)
        idx[0, 1, :] = pad  # an all-pad bag
    idx = jnp.asarray(idx)
    w = (jnp.asarray(rng.random((T, B, BAG)).astype(np.float32)) + 0.1
         if weighted else None)
    got = sharded_ensemble_lookup(mesh, st, idx, combiner=combiner,
                                  weights=w, pad_idx=pad)
    exp = maplookup(tabs, idx, combiner=combiner, weights=w, pad_idx=pad)
    for g, e in zip(got, exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-4)


def test_sharded_ensemble_lookup_nonreducing_pad():
    rng = np.random.default_rng(9)
    tabs = make_tables(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", tabs)
    idx = np.where(rng.random((T, B)) < 0.3, -1,
                   rng.integers(0, V, size=(T, B))).astype(np.int32)
    got = sharded_ensemble_lookup(mesh, st, jnp.asarray(idx), pad_idx=-1)
    exp = maplookup(tabs, jnp.asarray(idx), pad_idx=-1)
    for g, e in zip(got, exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-5)


def test_sharded_lookup_single_table_weighted_mean_2d_mesh():
    rng = np.random.default_rng(11)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    mesh = mesh2d()
    st = ShardedStackedTables.shard(mesh, ("data", "model"), data)
    idx = np.where(rng.random((B, BAG)) < 0.25, -1,
                   rng.integers(0, V, size=(B, BAG))).astype(np.int32)
    w = jnp.asarray(rng.random((B, BAG)).astype(np.float32)) + 0.1
    got = sharded_lookup(mesh, st, jnp.asarray(idx), combiner="mean",
                         weights=w, pad_idx=-1)
    exp = lookup(data, jnp.asarray(idx), combiner="mean", weights=w,
                 pad_idx=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-4)


def test_sharded_lookup_fused_and_stacked_with_pad():
    rng = np.random.default_rng(13)
    tabs = make_tables(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", tabs)
    idx = np.where(rng.random((T, B, BAG)) < 0.3, V,  # sentinel = vocab
                   rng.integers(0, V, size=(T, B, BAG))).astype(np.int32)
    fused = sharded_ensemble_lookup(mesh, st, jnp.asarray(idx), fused=True,
                                    prependrows=4, combiner="mean",
                                    pad_idx=V)
    parts = maplookup(tabs, jnp.asarray(idx), combiner="mean", pad_idx=V)
    exp = np.concatenate([np.zeros((B, 4), np.float32)]
                         + [np.asarray(p) for p in parts], axis=-1)
    np.testing.assert_allclose(np.asarray(fused), exp, atol=1e-4)


def test_sharded_update_with_padded_lazy_weights():
    """A lazy update built via lookup_vjp(pad_idx=...) applies correctly on
    the mesh: pad occurrences carry weight 0 through the exchange."""
    rng = np.random.default_rng(17)
    tabs = make_tables(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", tabs)
    lr = 0.5
    upds, dense_after = [], []
    for t in range(T):
        idx = np.where(rng.random((B, BAG)) < 0.3, -1,
                       rng.integers(0, V, size=(B, BAG))).astype(np.int32)
        out, pb = lookup_vjp(tabs[t].data, jnp.asarray(idx), combiner="mean",
                             pad_idx=-1)
        delta = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        upd = pb(delta)
        # Pad indices must be REMAPPED before the global shift (the shift
        # would turn -1 into a real row of the previous table). Weight-0
        # occurrences make the remap a no-op numerically.
        import dataclasses
        upd = dataclasses.replace(upd, indices=jnp.where(upd.indices == -1, 0,
                                                         upd.indices))
        upds.append(upd)
        from embeddingtables_tpu.ops.sparse_update import sgd_update
        dense_after.append(np.asarray(sgd_update(tabs[t].data, upd, lr)))
    new_st = sharded_ensemble_update(mesh, st, upds, lr)
    for t in range(T):
        np.testing.assert_allclose(np.asarray(new_st.table(t)),
                                   dense_after[t], atol=1e-4)


def test_scale_free_path_unchanged():
    # combiner="sum", no weights, no pad: must hit the original no-scale
    # exchange — same two-operand shard_map (no scale operand traced in)
    # and parity with the unsharded gather (allclose: the psum partial-sum
    # order differs from the single-chip bag sum).
    rng = np.random.default_rng(19)
    tabs = make_tables(rng)
    mesh = mesh1d()
    st = ShardedStackedTables.shard(mesh, "x", tabs)
    idx = jnp.asarray(rng.integers(0, V, size=(T, B, BAG)).astype(np.int32))
    got = sharded_ensemble_lookup(mesh, st, idx)
    exp = maplookup(tabs, idx)
    for g, e in zip(got, exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-5)
