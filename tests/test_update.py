"""Backward + sparse update tests — mirrors /root/reference/test/update.jl.

Pattern: (1) pullback on the table vs autodiff on a dense matrix — lookup
outputs equal, sparse grad `uncompress`ed ≈ dense grad (update.jl:20-45);
(2) SGD applied to both a dense matrix and a table must match (update.jl:49-61);
(3) large learning rate (η=10) to amplify errors (update.jl:14);
(4) split-update equivalence across IndexerView partitions (update.jl:90-120);
(5) static/dynamic parity (update.jl:127-161).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et

LR = 10.0  # large to amplify errors, like the reference
NROWS = 100


def dense_grad(data, idx, delta):
    """Oracle: full autodiff through the dense lookup."""
    def f(d):
        return (et.lookup_oracle(d, idx) * delta).sum()
    return jax.grad(f)(data)


@pytest.mark.parametrize("dim", [16, 64, 256])
@pytest.mark.parametrize("reducing", [False, True])
def test_lazy_pullback_matches_dense_grad(dim, reducing):
    rng = np.random.default_rng(dim + reducing)
    data = jnp.asarray(rng.standard_normal((NROWS, dim)).astype(np.float32))
    if reducing:
        idx = jnp.asarray(rng.integers(0, NROWS, size=(30, 5)).astype(np.int32))
    else:
        # include repeats deliberately (duplicate-index correctness, §2.4 item 6)
        idx = jnp.asarray(rng.integers(0, NROWS, size=60).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((idx.shape[0], dim)).astype(np.float32))

    table = et.SimpleEmbedding(data)
    out, pull = et.lookup_vjp(table, idx)
    assert (out == et.lookup_oracle(data, idx)).all()

    upd = pull(delta)
    assert isinstance(upd, et.SparseEmbeddingUpdate)
    # Laziness: the update holds exactly (delta, indices) — no scatter yet.
    assert upd.delta is delta and upd.indices is idx

    got = et.uncompress(upd, NROWS)
    want = dense_grad(data, idx, delta)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method", ["scatter", "dedup"])
@pytest.mark.parametrize("reducing", [False, True])
def test_sgd_update_matches_dense(method, reducing):
    # Reference: update! applied to a zeroed dense matrix and a zeroed table
    # must match (update.jl:49-61). We start from random data instead of zeros
    # to also exercise the FMA against existing rows.
    rng = np.random.default_rng(99)
    dim = 32
    data = jnp.asarray(rng.standard_normal((NROWS, dim)).astype(np.float32))
    if reducing:
        idx = jnp.asarray(rng.integers(0, NROWS, size=(20, 4)).astype(np.int32))
    else:
        idx = jnp.asarray(rng.integers(0, NROWS, size=50).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((idx.shape[0], dim)).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)

    # SGD math (§2.4 item 8): table[k] -= lr * sum of delta cols touching k.
    dense_expected = data - LR * et.uncompress(upd, NROWS)

    table = et.SimpleEmbedding(data)
    new = et.sgd_update(table, upd, LR, method=method)
    np.testing.assert_allclose(new.data, dense_expected, rtol=1e-4, atol=1e-4)

    # Raw-array path returns a raw array.
    new_raw = et.sgd_update(data, upd, LR, method=method)
    np.testing.assert_allclose(new_raw, dense_expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("indexer", [et.SparseIndexer(), et.DenseIndexer()])
@pytest.mark.parametrize("num_splits", [1, 2, 4])
def test_split_update_equivalence(indexer, num_splits):
    # Partitioned update bit-matches the unsplit update (update.jl:90-120) for
    # both indexer backends — the de-facto race regression test.
    rng = np.random.default_rng(123)
    dim = 48
    data = jnp.asarray(rng.standard_normal((NROWS, dim)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, NROWS, size=80).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((80, dim)).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)

    ir = et.index(idx, vocab=NROWS, indexer=indexer)

    full = et.sgd_update(et.SimpleEmbedding(data), upd, LR,
                         idx_result=ir, method="dedup").data

    cur = data
    for j in range(num_splits):
        view = et.indexer_view(ir, num_splits, j)
        cur = et.sgd_update(et.SimpleEmbedding(cur), upd, LR,
                            idx_result=ir, view=view, method="dedup").data
    assert (np.asarray(cur) == np.asarray(full)).all()


def test_static_dynamic_update_parity():
    rng = np.random.default_rng(5)
    dim = 64
    data = rng.standard_normal((NROWS, dim)).astype(np.float32)
    idx = rng.integers(0, NROWS, size=40).astype(np.int32)
    delta = rng.standard_normal((40, dim)).astype(np.float32)
    upd = et.SparseEmbeddingUpdate(delta=jnp.asarray(delta), indices=jnp.asarray(idx))
    a = et.sgd_update(et.SimpleEmbedding(data, et.Static(dim)), upd, LR)
    b = et.sgd_update(et.SimpleEmbedding(data, et.Dynamic()), upd, LR)
    assert (np.asarray(a.data) == np.asarray(b.data)).all()


def test_split_embedding_update():
    rng = np.random.default_rng(17)
    dim = 32
    data = rng.standard_normal((NROWS, dim)).astype(np.float32)
    idx = rng.integers(0, NROWS, size=30).astype(np.int32)
    delta = rng.standard_normal((30, dim)).astype(np.float32)
    upd = et.SparseEmbeddingUpdate(delta=jnp.asarray(delta), indices=jnp.asarray(idx))

    expected = jnp.asarray(data) - LR * et.uncompress(upd, NROWS)
    split = et.SplitEmbedding(data, 30)
    new = et.sgd_update(split, upd, LR)
    np.testing.assert_allclose(new.materialize(), expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reducing", [False, True])
def test_pallas_scatter_update_parity(reducing):
    # The Pallas scatter-FMA kernel (interpreter mode on CPU) must match the
    # uncompress-based dense SGD oracle.
    rng = np.random.default_rng(55)
    dim = 128
    data = jnp.asarray(rng.standard_normal((NROWS, dim)).astype(np.float32))
    if reducing:
        idx = jnp.asarray(rng.integers(0, NROWS, size=(12, 3)).astype(np.int32))
    else:
        idx = jnp.asarray(rng.integers(0, NROWS, size=40).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((idx.shape[0], dim)).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)
    expected = data - LR * et.uncompress(upd, NROWS)

    new = et.sgd_update(et.SimpleEmbedding(data), upd, LR, method="pallas")
    np.testing.assert_allclose(new.data, expected, rtol=1e-4, atol=1e-4)


def test_pallas_scatter_sorted_negative_padding_dropped():
    # Contract: entries < 0 in a sorted run stream are padding and must be
    # DROPPED even when they carry nonzero values (sorted-ascending puts them
    # first; an unmasked accumulator would leak them into the first real run).
    from embeddingtables_tpu.ops.pallas.scatter import scatter_add_rows_sorted
    dim = 128
    table = jnp.zeros((8, dim), jnp.float32)
    rows = jnp.asarray([-1, -1, 2, 2, 5, -1, -1, -1], jnp.int32)
    # Ascending real rows with leading negative padding carrying garbage.
    rows = jnp.sort(rows)  # [-1,-1,-1,-1,-1,2,2,5]
    vals = jnp.full((8, dim), 100.0, jnp.float32)
    vals = vals.at[5].set(1.0).at[6].set(2.0).at[7].set(7.0)
    new = scatter_add_rows_sorted(table, rows, vals, 1.0, interpret=True)
    expect = jnp.zeros((8, dim)).at[2].set(3.0).at[5].set(7.0)
    np.testing.assert_allclose(np.asarray(new), np.asarray(expect))


def test_ensemble_update_stateful_protocol_table():
    # Round-1 bug: a stateful optimizer on a protocol table silently ran SGD.
    # Now: SplitEmbedding applies correctly (matches SimpleEmbedding result);
    # an opaque protocol table raises.
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    rng = np.random.default_rng(11)
    opt = SparseRowWiseAdaGrad(lr=0.5)
    data = rng.standard_normal((40, 16)).astype(np.float32)
    upd = et.SparseEmbeddingUpdate(
        delta=jnp.asarray(rng.standard_normal((9, 16)).astype(np.float32)),
        indices=jnp.asarray(rng.integers(0, 40, 9).astype(np.int32)))

    [simple_new], [simple_state] = et.ensemble_update(
        opt, [et.SimpleEmbedding(jnp.asarray(data))], [upd])
    [split_new], [split_state] = et.ensemble_update(
        opt, [et.SplitEmbedding(data, 13)], [upd])
    np.testing.assert_allclose(np.asarray(split_new.materialize()),
                               np.asarray(simple_new.data), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(split_state.accum),
                               np.asarray(simple_state.accum), rtol=1e-6)

    class Opaque:
        spec = et.TableSpec(vocab=40, dim=16, dtype=jnp.float32,
                            lookup=et.Dynamic())
        def rows(self, idx):
            return jnp.take(jnp.asarray(data), idx, axis=0)
        def example(self):
            return jnp.asarray(data)
        def scatter_apply(self, idx, delta):
            return self

    with pytest.raises(TypeError, match="stateful"):
        et.ensemble_update(opt, [Opaque()], [upd])

    # Stateless SGD through the scatter protocol still works.
    from embeddingtables_tpu.optim import SparseSGD
    [sgd_new], _ = et.ensemble_update(SparseSGD(2.0), [et.SplitEmbedding(data, 13)], [upd])
    expect = jnp.asarray(data) - 2.0 * et.uncompress(upd, 40)
    np.testing.assert_allclose(np.asarray(sgd_new.materialize()),
                               np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_split_stateful_no_materialize():
    """VERDICT r2 item 5: the stateful SplitEmbedding path must be
    per-shard (O(rows_per_shard * D) scratch), never an O(V*D)
    materialize. Parity vs the SimpleEmbedding apply for the full
    stateful zoo, incl. bags + weights and a second chained step (Adam's
    decay-on-touch makes zero-masking wrong — the sentinel-row routing
    must keep foreign occurrences out of real rows and real state)."""
    from unittest import mock
    from embeddingtables_tpu.optim import (SparseFTRL, SparseLazyAdam,
                                           SparseRowWiseAdaGrad)
    rng = np.random.default_rng(12)
    data = rng.standard_normal((50, 8)).astype(np.float32)
    for opt in (SparseRowWiseAdaGrad(lr=0.3), SparseLazyAdam(lr=0.1),
                SparseFTRL(lr=0.2)):
        for bag in (None, 3):
            shape = (9,) if bag is None else (9, bag)
            idx = rng.integers(0, 50, shape).astype(np.int32)
            weights = (jnp.asarray(rng.uniform(0.5, 1.5, shape)
                                   .astype(np.float32)) if bag else None)
            upds = [et.SparseEmbeddingUpdate(
                delta=jnp.asarray(
                    rng.standard_normal((9, 8)).astype(np.float32)),
                indices=jnp.asarray(idx), weights=weights) for _ in range(2)]

            simple = et.SimpleEmbedding(jnp.asarray(data))
            split = et.SplitEmbedding(data, 13)  # shards 13/13/13/11 ragged
            s_state = p_state = None
            with mock.patch.object(
                    et.SplitEmbedding, "materialize",
                    side_effect=AssertionError("O(V*D) materialize called")):
                for upd in upds:  # two chained steps: state layout must
                    [simple], s_states = et.ensemble_update(  # round-trip
                        opt, [simple], [upd],
                        states=s_state and [s_state])
                    [split], p_states = et.ensemble_update(
                        opt, [split], [upd],
                        states=p_state and [p_state])
                    s_state, p_state = s_states[0], p_states[0]
            tag = f"{type(opt).__name__} bag={bag}"
            np.testing.assert_allclose(
                np.asarray(split.materialize()), np.asarray(simple.data),
                rtol=1e-5, atol=1e-6, err_msg=tag)
            for a, b in zip(jax.tree_util.tree_leaves(p_state),
                            jax.tree_util.tree_leaves(s_state)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6, err_msg=tag)


@pytest.mark.parametrize("reducing", [False, True])
def test_adagrad_dense_matches_indexer(reducing):
    # The sort-free dense-grad AdaGrad realization must match the indexer
    # path bit-for-bit in semantics (one state advance + one row write per
    # unique row, duplicates accumulated first).
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    rng = np.random.default_rng(3)
    V, D = 60, 16
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    if reducing:
        idx = jnp.asarray(rng.integers(0, V, (15, 3)).astype(np.int32))
    else:
        idx = jnp.asarray(rng.integers(0, V, (40,)).astype(np.int32))
    delta = jnp.asarray(
        rng.standard_normal((idx.shape[0], D)).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)
    opt = SparseRowWiseAdaGrad(lr=0.7, initial_accum=0.05)
    st = opt.init(data)
    d_dense, s_dense = opt.apply(data, upd, st, method="dense")
    d_idx, s_idx = opt.apply(data, upd, st, method="indexer")
    np.testing.assert_allclose(np.asarray(d_dense), np.asarray(d_idx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_dense.accum),
                               np.asarray(s_idx.accum), rtol=1e-5, atol=1e-7)
    # Untouched rows are exact fixed points on the dense path.
    touched = np.unique(np.asarray(idx).ravel())
    untouched = np.setdiff1d(np.arange(V), touched)
    np.testing.assert_array_equal(np.asarray(d_dense)[untouched],
                                  np.asarray(data)[untouched])
    np.testing.assert_array_equal(np.asarray(s_dense.accum)[untouched],
                                  np.full(len(untouched), 0.05, np.float32))


def test_grad_through_jax_autodiff_dense_cotangent():
    # Plain jax.grad through `lookup` must agree with the uncompressed lazy
    # update (the reference's ProjectTo bridge makes Zygote accept the sparse
    # tangent; in JAX the dense path is the bridge, lookup.jl:246).
    rng = np.random.default_rng(31)
    dim = 16
    data = jnp.asarray(rng.standard_normal((NROWS, dim)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, NROWS, size=25).astype(np.int32))
    delta = jnp.asarray(rng.standard_normal((25, dim)).astype(np.float32))

    g = jax.grad(lambda d: (et.lookup(et.SimpleEmbedding(d), idx) * delta).sum())(data)
    want = et.uncompress(et.SparseEmbeddingUpdate(delta, idx), NROWS)
    np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-5)


def test_ensemble_update():
    rng = np.random.default_rng(77)
    dims = [16, 16, 32]
    tables = [et.SimpleEmbedding(rng.standard_normal((50, d)).astype(np.float32))
              for d in dims]
    idxs = [jnp.asarray(rng.integers(0, 50, size=20).astype(np.int32)) for _ in dims]
    upds = [et.SparseEmbeddingUpdate(
        jnp.asarray(rng.standard_normal((20, d)).astype(np.float32)), i)
        for d, i in zip(dims, idxs)]

    fired = []
    new = et.ensemble_sgd_update(tables, upds, LR, telemetry_cb=lambda: fired.append(1))
    assert fired == [1]  # telemetry hook between phases (sparseupdate.jl:208,214)
    for t, u, n in zip(tables, upds, new):
        expected = t.data - LR * et.uncompress(u, 50)
        np.testing.assert_allclose(n.data, expected, rtol=1e-4, atol=1e-4)


def test_ensemble_update_generic_optimizer():
    """ensemble_update with row-wise AdaGrad matches per-table opt.apply
    (generic form of the reference's SGD-only ensemble update!)."""
    import jax
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    rng = np.random.default_rng(0)
    opt = SparseRowWiseAdaGrad(lr=0.5)
    tables = [et.SimpleEmbedding(
        jnp.asarray(rng.standard_normal((30, 16)).astype(np.float32)))
        for _ in range(3)]
    upds = [et.SparseEmbeddingUpdate(
        delta=jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)),
        indices=jnp.asarray(rng.integers(0, 30, 8).astype(np.int32)))
        for _ in range(3)]
    fired = []
    new_tables, new_states = et.ensemble_update(
        opt, tables, upds, telemetry_cb=lambda: fired.append(1))
    assert fired == [1]
    for t, u, nt, ns in zip(tables, upds, new_tables, new_states):
        expect_data, expect_state = opt.apply(t.data, u, opt.init(t.data))
        np.testing.assert_allclose(np.asarray(nt.data),
                                   np.asarray(expect_data), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ns.accum),
                                   np.asarray(expect_state.accum), rtol=1e-6)


def test_accumulate_updates_matches_merged_scatter():
    """Gradient accumulation: K lazy updates concat into one whose
    uncompress equals the sum of the parts (and drives one fused step)."""
    from embeddingtables_tpu.ops.sparse_update import accumulate_updates
    rng = np.random.default_rng(0)
    V, D = 30, 8
    parts = []
    for k in range(3):
        parts.append(et.SparseEmbeddingUpdate(
            delta=jnp.asarray(rng.standard_normal((5, D)).astype(np.float32)),
            indices=jnp.asarray(rng.integers(0, V, 5).astype(np.int32))))
    merged = accumulate_updates(parts)
    assert merged.delta.shape == (15, D)
    total = sum(np.asarray(et.uncompress(p, V)) for p in parts)
    np.testing.assert_allclose(np.asarray(et.uncompress(merged, V)), total,
                               rtol=1e-6)

    # weighted + unweighted mix promotes to ones
    w = jnp.full((5,), 2.0)
    mixed = accumulate_updates([parts[0],
                                et.SparseEmbeddingUpdate(
                                    delta=parts[1].delta,
                                    indices=parts[1].indices, weights=w)])
    expect = (np.asarray(et.uncompress(parts[0], V))
              + 2 * np.asarray(et.uncompress(parts[1], V)))
    np.testing.assert_allclose(np.asarray(et.uncompress(mixed, V)), expect,
                               rtol=1e-6)

    import pytest
    bag = et.SparseEmbeddingUpdate(delta=parts[0].delta,
                                   indices=jnp.zeros((5, 2), jnp.int32))
    with pytest.raises(ValueError):
        accumulate_updates([parts[0], bag])


def test_dense_grad_dtype_bf16_close_and_untouched_exact():
    # dense_grad_dtype="bfloat16" (the opt-in scratch-halving knob,
    # docs/DESIGN.md §11; probe_ada_bf16.py measured -4.4 ms/step on v5e)
    # must stay CLOSE to the exact f32 scratch on touched rows, keep
    # untouched rows exact fixed points (a bf16 zeros scratch accumulates
    # nothing there), and passing grad_dtype=float32 explicitly must be
    # bitwise the default.
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    rng = np.random.default_rng(9)
    V, D = 120, 16          # D not lane-aligned -> the scatter realization
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, (200,)).astype(np.int32))  # dups
    delta = jnp.asarray(
        (0.1 * rng.standard_normal((200, D))).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)

    exact = SparseRowWiseAdaGrad(lr=0.5, initial_accum=0.01)
    lossy = SparseRowWiseAdaGrad(lr=0.5, initial_accum=0.01,
                                 dense_grad_dtype="bfloat16")
    explicit = SparseRowWiseAdaGrad(lr=0.5, initial_accum=0.01,
                                    dense_grad_dtype="float32")
    st = exact.init(data)
    d32, s32 = exact.apply(data, upd, st, method="dense")
    d16, s16 = lossy.apply(data, upd, st, method="dense")
    dex, sex = explicit.apply(data, upd, st, method="dense")

    np.testing.assert_array_equal(np.asarray(d32), np.asarray(dex))
    np.testing.assert_array_equal(np.asarray(s32.accum),
                                  np.asarray(sex.accum))
    # bf16 accumulation: ~8 mantissa bits on the summed gradient.
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32),
                               rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(np.asarray(s16.accum), np.asarray(s32.accum),
                               rtol=0.05, atol=1e-4)
    untouched = np.setdiff1d(np.arange(V), np.unique(np.asarray(idx)))
    assert untouched.size > 0
    np.testing.assert_array_equal(np.asarray(d16)[untouched],
                                  np.asarray(data)[untouched])
    np.testing.assert_array_equal(np.asarray(s16.accum)[untouched],
                                  np.full(untouched.size, 0.01, np.float32))


def test_dense_grad_dtype_reaches_regularized_sgd_and_adam():
    # The knob threads through every dense body (SGD-with-decay, Adam):
    # results stay close to the f32 scratch, never equal-by-accident when
    # duplicates actually collide in bf16.
    from embeddingtables_tpu.optim import SparseLazyAdam, SparseSGD
    rng = np.random.default_rng(11)
    V, D = 80, 16
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 30, (150,)).astype(np.int32))
    delta = jnp.asarray(
        (0.1 * rng.standard_normal((150, D))).astype(np.float32))
    upd = et.SparseEmbeddingUpdate(delta=delta, indices=idx)

    for exact, lossy in [
        (SparseSGD(lr=0.3, weight_decay=1e-3),
         SparseSGD(lr=0.3, weight_decay=1e-3, dense_grad_dtype="bfloat16")),
        (SparseLazyAdam(lr=0.05),
         SparseLazyAdam(lr=0.05, dense_grad_dtype="bfloat16")),
    ]:
        st = exact.init(data)
        d32 = exact.apply(data, upd, st)[0]
        d16 = lossy.apply(data, upd, st)[0]
        np.testing.assert_allclose(np.asarray(d16), np.asarray(d32),
                                   rtol=0.05, atol=5e-3)
        # ...and the bf16 scratch actually ENGAGED: if the plumbing
        # regressed to f32 everywhere, the results would be bitwise equal
        # (duplicates collide in bf16 here, so engagement must show).
        assert not np.array_equal(np.asarray(d16), np.asarray(d32))
