"""Ensemble maplookup tests — mirrors /root/reference/test/map.jl.

All strategies compared against the concat-of-single-lookups oracle for every
index container shape (map.jl:14-102); end-to-end gradient through an MSE
loss checks gradient type, captured indices, and delta equality across
strategies incl. PreallocationStrategy(prepend) (map.jl:109-177).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et

STRATEGIES = [et.DefaultStrategy(), et.SimpleParallelStrategy(),
              et.PreallocationStrategy()]


def make_ensemble(rng, dims, nrows=60):
    return [et.SimpleEmbedding(rng.standard_normal((nrows, d)).astype(np.float32))
            for d in dims]


def oracle_concat(tables, idx_list):
    return jnp.concatenate(
        [et.lookup_oracle(t.data, i) for t, i in zip(tables, idx_list)], axis=-1)


REPS = 5  # fresh random indices per repetition (reference runs 100-rep
          # loops, test/map.jl:14-102; shapes are static so jit reuses)


@pytest.mark.parametrize("dim", [16, 64, 512])
@pytest.mark.parametrize("container", ["list_vec", "list_mat", "array2d", "array3d"])
def test_strategies_match_oracle(dim, container):
    _strategies_match_oracle(dim, container, REPS)


@pytest.mark.thorough
@pytest.mark.parametrize("dim", [16, 64, 512])
@pytest.mark.parametrize("container", ["list_vec", "list_mat", "array2d", "array3d"])
def test_strategies_match_oracle_thorough(dim, container):
    """Reference-scale volume: the 100-repetition strategy x container
    matrix of /root/reference/test/map.jl:14-102 (default tier runs 5)."""
    _strategies_match_oracle(dim, container, 100)


def _strategies_match_oracle(dim, container, reps):
    rng = np.random.default_rng(dim)
    ntables, batch, bag = 4, 24, 3
    tables = make_ensemble(rng, [dim] * ntables)

    for _ in range(reps):
        if container == "list_vec":
            indices = [jnp.asarray(rng.integers(0, 60, size=batch).astype(np.int32))
                       for _ in range(ntables)]
            idx_list = indices
        elif container == "list_mat":
            indices = [jnp.asarray(rng.integers(0, 60, size=(batch, bag)).astype(np.int32))
                       for _ in range(ntables)]
            idx_list = indices
        elif container == "array2d":
            indices = jnp.asarray(
                rng.integers(0, 60, size=(ntables, batch)).astype(np.int32))
            idx_list = [indices[t] for t in range(ntables)]
        else:
            indices = jnp.asarray(
                rng.integers(0, 60, size=(ntables, batch, bag)).astype(np.int32))
            idx_list = [indices[t] for t in range(ntables)]

        expected = oracle_concat(tables, idx_list)

        for strategy in STRATEGIES:
            out = et.maplookup(strategy, tables, indices)
            if isinstance(strategy, et.PreallocationStrategy):
                assert (out == expected).all()
            else:
                assert isinstance(out, list) and len(out) == ntables
                got = jnp.concatenate(out, axis=-1)
                assert (got == expected).all()


def test_maplookup_without_strategy():
    rng = np.random.default_rng(1)
    tables = make_ensemble(rng, [16, 32])
    idx = [jnp.asarray(rng.integers(0, 60, size=10).astype(np.int32))
           for _ in range(2)]
    outs = et.maplookup(tables, idx)
    for o, t, i in zip(outs, tables, idx):
        assert (o == et.lookup_oracle(t.data, i)).all()


def test_preallocation_identity():
    # §2.4 item 4: maplookup(PreallocationStrategy(), t, i) ==
    # reduce(vcat, maplookup(t, i)), with prependrows reserved at the front.
    rng = np.random.default_rng(2)
    tables = make_ensemble(rng, [16, 24, 8])
    idx = [jnp.asarray(rng.integers(0, 60, size=12).astype(np.int32))
           for _ in range(3)]
    plain = jnp.concatenate(et.maplookup(tables, idx), axis=-1)

    fused = et.maplookup(et.PreallocationStrategy(), tables, idx)
    assert (fused == plain).all()

    p = 20
    fused_p = et.maplookup(et.PreallocationStrategy(p), tables, idx)
    assert fused_p.shape == (12, p + 48)
    assert (fused_p[:, p:] == plain).all()
    assert (fused_p[:, :p] == 0).all()  # reserved region (zero-filled)


def test_preallocation_dtype_override():
    # PreallocationStrategy{U} eltype override (lookup.jl:284-294).
    rng = np.random.default_rng(3)
    tables = make_ensemble(rng, [16, 16])
    idx = [jnp.asarray(rng.integers(0, 60, size=8).astype(np.int32))] * 2
    out = et.maplookup(et.PreallocationStrategy(0, jnp.bfloat16), tables, idx)
    assert out.dtype == jnp.bfloat16


def test_maplookup_vjp_per_table_updates():
    # rrule parity (lookup.jl:247-258): pullback yields one
    # SparseEmbeddingUpdate per table, capturing that table's indices.
    rng = np.random.default_rng(4)
    dims = [16, 32]
    tables = make_ensemble(rng, dims)
    idx = [jnp.asarray(rng.integers(0, 60, size=10).astype(np.int32))
           for _ in range(2)]
    outs, pull = et.maplookup_vjp(et.DefaultStrategy(), tables, idx)
    deltas = [jnp.asarray(rng.standard_normal(o.shape).astype(np.float32))
              for o in outs]
    upds = pull(deltas)
    assert len(upds) == 2
    for u, d, i in zip(upds, deltas, idx):
        assert (u.delta == d).all() and (u.indices == i).all()


def test_maplookup_vjp_preallocation_slicing():
    # §2.4 item 7: pullback of PreallocationStrategy(p) hands table i the
    # feature-slice delta[:, p + cumoffset_i : ...] (lookup.jl:374-389).
    rng = np.random.default_rng(5)
    dims = [16, 24, 8]
    p = 20
    tables = make_ensemble(rng, dims)
    idx = [jnp.asarray(rng.integers(0, 60, size=12).astype(np.int32))
           for _ in range(3)]
    out, pull = et.maplookup_vjp(et.PreallocationStrategy(p), tables, idx)
    delta = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    upds = pull(delta)
    off = p
    for u, d, i in zip(upds, dims, idx):
        assert (u.delta == delta[:, off:off + d]).all()
        assert (u.indices == i).all()
        off += d


def test_end_to_end_gradient_mse():
    # End-to-end grad through an MSE loss: same deltas across strategies
    # (map.jl:109-177), applied as SGD updates must agree with the dense path.
    rng = np.random.default_rng(6)
    dims = [16, 16]
    tables = make_ensemble(rng, dims)
    idx = [jnp.asarray(rng.integers(0, 60, size=10).astype(np.int32))
           for _ in range(2)]
    target = jnp.asarray(rng.standard_normal((10, 32)).astype(np.float32))

    def mse_delta(fused):
        return jax.grad(lambda y: ((y - target) ** 2).mean())(fused)

    # Strategy A: default, per-table outputs concat'd manually.
    outs, pull_a = et.maplookup_vjp(et.DefaultStrategy(), tables, idx)
    fused_a = jnp.concatenate(outs, axis=-1)
    d_a = mse_delta(fused_a)
    upds_a = pull_a([d_a[:, :16], d_a[:, 16:]])

    # Strategy B: preallocation with prepend=0.
    fused_b, pull_b = et.maplookup_vjp(et.PreallocationStrategy(), tables, idx)
    upds_b = pull_b(mse_delta(fused_b))

    for ua, ub in zip(upds_a, upds_b):
        np.testing.assert_allclose(ua.delta, ub.delta, rtol=1e-6)
        assert (ua.indices == ub.indices).all()

    new = et.ensemble_sgd_update(tables, upds_a, 1.0)
    for t, u, n in zip(tables, upds_a, new):
        expected = t.data - 1.0 * et.uncompress(u, 60)
        np.testing.assert_allclose(n.data, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_maplookup_combiner_weights_match_oracle(combiner, weighted):
    # The ensemble entry point honors the same combiner/weights contract as
    # single-table `lookup` (round-1 asymmetry fix): every strategy and the
    # stacked container must match the per-table lookup_oracle.
    rng = np.random.default_rng(42)
    ntables, batch, bag, dim = 3, 14, 4, 32
    tables = make_ensemble(rng, [dim] * ntables)
    idx = [jnp.asarray(rng.integers(0, 60, size=(batch, bag)).astype(np.int32))
           for _ in range(ntables)]
    w = None
    w_list = [None] * ntables
    if weighted:
        w = jnp.asarray(rng.random((ntables, batch, bag)).astype(np.float32)
                        + 0.1)
        w_list = [w[t] for t in range(ntables)]

    expected = [et.lookup_oracle(t.data, i, combiner=combiner, weights=wt)
                for t, i, wt in zip(tables, idx, w_list)]

    for strategy in STRATEGIES:
        out = et.maplookup(strategy, tables, idx, combiner=combiner, weights=w)
        if isinstance(strategy, et.PreallocationStrategy):
            got = [out[:, t * dim:(t + 1) * dim] for t in range(ntables)]
        else:
            got = out
        for g, e in zip(got, expected):
            np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6)

    # Stacked container takes the same kwargs through the one-gather path.
    st = et.StackedTables.stack(tables)
    outs = et.maplookup(st, idx, combiner=combiner, weights=w)
    for g, e in zip(outs, expected):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_maplookup_vjp_combiner_weights_match_dense_grad(combiner):
    # Ensemble pullback with combiner/weights: uncompressed updates must equal
    # the dense autodiff gradient of the combined lookup (matches the
    # single-table lookup_vjp contract).
    rng = np.random.default_rng(43)
    ntables, batch, bag, dim = 2, 10, 3, 16
    tables = make_ensemble(rng, [dim] * ntables)
    idx = [jnp.asarray(rng.integers(0, 60, size=(batch, bag)).astype(np.int32))
           for _ in range(ntables)]
    w = [jnp.asarray(rng.random((batch, bag)).astype(np.float32) + 0.1)
         for _ in range(ntables)]

    out, pull = et.maplookup_vjp(et.PreallocationStrategy(), tables, idx,
                                 combiner=combiner, weights=w)
    delta = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    upds = pull(delta)
    off = 0
    for t, i, wt, u in zip(tables, idx, w, upds):
        d = delta[:, off:off + dim]
        off += dim
        want = jax.grad(lambda dat: (et.lookup_oracle(
            dat, i, combiner=combiner, weights=wt) * d).sum())(t.data)
        got = et.uncompress(u, 60)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_stacked_tables():
    # TPU-native ensemble container: one gather for N same-width tables.
    rng = np.random.default_rng(7)
    dims = [32, 32, 32]
    vocabs = [40, 60, 20]
    tables = [et.SimpleEmbedding(rng.standard_normal((v, 32)).astype(np.float32))
              for v in vocabs]
    st = et.StackedTables.stack(tables)
    assert st.ntables == 3 and st.vocabs == (40, 60, 20)

    idx = [jnp.asarray(rng.integers(0, v, size=15).astype(np.int32))
           for v in vocabs]
    expected = [et.lookup_oracle(t.data, i) for t, i in zip(tables, idx)]

    outs = et.maplookup(st, idx)
    for o, e in zip(outs, expected):
        assert (o == e).all()

    fused = et.maplookup(et.PreallocationStrategy(4), st, idx)
    want = jnp.concatenate([jnp.zeros((15, 4), jnp.float32)] + expected, axis=-1)
    assert (fused == want).all()

    # Reducing bags through the stacked path.
    bag_idx = [jnp.asarray(rng.integers(0, v, size=(9, 3)).astype(np.int32))
               for v in vocabs]
    outs2 = et.maplookup(st, bag_idx)
    for o, t, i in zip(outs2, tables, bag_idx):
        np.testing.assert_allclose(o, et.lookup_oracle(t.data, i), rtol=1e-6)


def test_maplookup_mixed_table_types():
    """An ensemble mixing SimpleEmbedding, SplitEmbedding, QREmbedding,
    MDEmbedding, and a raw array — every container speaking the table
    protocol — matches the per-table oracles through every strategy."""
    from embeddingtables_tpu.md import MDEmbedding
    from embeddingtables_tpu.qr import QREmbedding
    rng = np.random.default_rng(77)
    V, D, B = 64, 16, 12
    simple = et.SimpleEmbedding(
        rng.standard_normal((V, D)).astype(np.float32))
    split = et.SplitEmbedding(
        rng.standard_normal((V, D)).astype(np.float32), 20)
    qr = QREmbedding.create(jax.random.key(1), V, D, num_remainder=8)
    md = MDEmbedding.create(jax.random.key(2), V, D, 4)
    raw = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    tables = [simple, split, qr, md, raw]
    dense_views = [simple.data, split.materialize(), qr.materialize(),
                   md.materialize(), raw]

    idx = [jnp.asarray(rng.integers(0, V, B).astype(np.int32))
           for _ in tables]
    expected = [et.lookup_oracle(d, i) for d, i in zip(dense_views, idx)]

    for strategy in STRATEGIES:
        out = et.maplookup(strategy, tables, idx)
        if isinstance(strategy, et.PreallocationStrategy):
            got = [out[:, t * D:(t + 1) * D] for t in range(len(tables))]
        else:
            got = out
        for g, e in zip(got, expected):
            np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                       rtol=1e-5, atol=1e-5)
