"""Indexer unit tests — mirrors /root/reference/test/misc.jl.

The reference checks: `columns` iteration order (misc.jl:9-10), histogram
parity between Dictionary and Vector backends (misc.jl:33-72), and exact
expected cumulative/map contents for a hand-worked index stream, run twice to
prove reusability (misc.jl:74-109). Functional JAX has no buffer reuse to
test; instead we check jit-recompilation-free reuse.
"""
import jax
import jax.numpy as jnp
import numpy as np

import embeddingtables_tpu as et


def test_flatten_vector_indices():
    # columns(): vector indices — occurrence o has gradient column o.
    rows, cols = et.flatten_indices(jnp.array([5, 3, 5, 1]))
    assert rows.tolist() == [5, 3, 5, 1]
    assert cols.tolist() == [0, 1, 2, 3]


def test_flatten_matrix_indices():
    # columns(): matrix indices — one delta column fans out to its whole bag
    # (reference utils.jl:69-83; stream order = output-major).
    idx = jnp.array([[5, 3], [2, 5]])  # batch=2, bag=2
    rows, cols = et.flatten_indices(idx)
    assert rows.tolist() == [5, 3, 2, 5]
    assert cols.tolist() == [0, 0, 1, 1]


def hand_worked_stream():
    # Stream: 4 1 4 2 1 4  -> unique (first occurrence order): 4 1 2
    # occurrences: 4 -> cols [0, 2, 5]; 1 -> cols [1, 4]; 2 -> cols [3]
    return jnp.array([4, 1, 4, 2, 1, 4], dtype=jnp.int32)


def check_hand_worked(res):
    nu = int(res.num_unique)
    assert nu == 3
    assert res.unique[:3].tolist() == [4, 1, 2]
    assert res.offsets[:4].tolist() == [0, 3, 5, 6]
    assert res.map[:6].tolist() == [0, 2, 5, 1, 4, 3]
    # group_of: stream-order occurrence -> insertion group
    assert res.group_of.tolist() == [0, 1, 0, 2, 1, 0]
    # padding sentinel
    assert (np.asarray(res.unique[3:]) == -1).all()


def test_sparse_indexer_hand_worked():
    res = et.index(hand_worked_stream())
    check_hand_worked(res)
    # run twice (reference runs the indexer twice to prove reuse, misc.jl:104-109)
    check_hand_worked(et.index(hand_worked_stream()))


def test_dense_indexer_hand_worked():
    res = et.index(hand_worked_stream(), vocab=8, indexer=et.DenseIndexer())
    check_hand_worked(res)


def test_backend_parity_random():
    # Dictionary-vs-Vector backend parity (reference misc.jl:33-72).
    rng = np.random.default_rng(42)
    for n, vocab in [(50, 10), (200, 1000), (64, 64)]:
        idx = rng.integers(0, vocab, size=n).astype(np.int32)
        a = et.index(jnp.asarray(idx), indexer=et.SparseIndexer())
        b = et.index(jnp.asarray(idx), vocab=vocab, indexer=et.DenseIndexer())
        assert int(a.num_unique) == int(b.num_unique)
        nu = int(a.num_unique)
        assert (np.asarray(a.unique[:nu]) == np.asarray(b.unique[:nu])).all()
        assert (np.asarray(a.offsets[:nu + 1]) == np.asarray(b.offsets[:nu + 1])).all()
        ntot = idx.size
        assert (np.asarray(a.map[:ntot]) == np.asarray(b.map[:ntot])).all()
        assert (np.asarray(a.group_of) == np.asarray(b.group_of)).all()


def test_first_occurrence_order_property():
    # SURVEY.md §2.4 item 11: unique rows ordered by first occurrence; within
    # a row, occurrences keep stream order (utils.jl:178-180).
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 30, size=100).astype(np.int32)
    res = et.index(jnp.asarray(idx))
    nu = int(res.num_unique)

    seen, expected_unique = set(), []
    for v in idx.tolist():
        if v not in seen:
            seen.add(v)
            expected_unique.append(v)
    assert res.unique[:nu].tolist() == expected_unique

    offs = np.asarray(res.offsets)
    mp = np.asarray(res.map)
    for g, v in enumerate(expected_unique):
        got_cols = mp[offs[g]:offs[g + 1]].tolist()
        want_cols = [o for o, x in enumerate(idx.tolist()) if x == v]
        assert got_cols == want_cols


def test_indexer_under_jit():
    idx = hand_worked_stream()
    res = jax.jit(lambda i: et.index(i))(idx)
    check_hand_worked(res)


def test_indexer_matrix_indices():
    idx = jnp.array([[4, 1], [4, 2]], dtype=jnp.int32)  # stream: 4 1 4 2
    res = et.index(idx)
    assert int(res.num_unique) == 3
    assert res.unique[:3].tolist() == [4, 1, 2]
    # 4 <- cols {0 (bag of output 0), 1 (output 1)}; 1 <- col 0; 2 <- col 1
    assert res.offsets[:4].tolist() == [0, 2, 3, 4]
    assert res.map[:4].tolist() == [0, 1, 0, 1]
