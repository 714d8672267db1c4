"""Forward lookup property tests — mirrors /root/reference/test/lookup.jl.

Pattern: every optimized path is compared against the naive dense oracle
(`lookup_oracle` == reference `lookup(::AbstractMatrix, I)`, lookup.jl:5-13).
Equality is EXACT for the XLA paths (same-order summation is part of the
contract, test/lookup.jl:66-108); the Pallas interpreter path is also exact.

Coverage matrix (reference test/lookup.jl:66-138):
  feature sizes {32, 64, 128, 256, 512, 1024, 1504} x index patterns
  {permutation (no repeats), uniform random (repeats)} x
  {non-reducing, reducing bags} x {Dynamic, Static, SplitEmbedding}.
1024 is the reference's MAX_ACCUMULATOR_SIZE boundary (lookup.jl:30,66-67);
1504 its oversized-oddball. NROWS matches the reference's 1000-row tables.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et

NROWS = 1000
FEATURE_SIZES = [32, 64, 128, 256, 512, 1024, 1504]
BAG = 12


def make_table(rng, nrows, dim, dtype=np.float32):
    return rng.standard_normal((nrows, dim)).astype(dtype)


def perm_indices(rng, nrows, n):
    # Permutation-style: no repeats (reference test/lookup.jl:14-18).
    return rng.permutation(nrows)[:n].astype(np.int32)


def rand_indices(rng, nrows, n):
    # Uniform random: repeats expected (reference test/lookup.jl:20-24).
    return rng.integers(0, nrows, size=n).astype(np.int32)


@pytest.mark.parametrize("dim", FEATURE_SIZES)
@pytest.mark.parametrize("pattern", ["perm", "rand"])
def test_nonreducing_simple(dim, pattern):
    rng = np.random.default_rng(0xC0FFEE + dim)
    data = make_table(rng, NROWS, dim)
    n = 150
    idx = (perm_indices if pattern == "perm" else rand_indices)(rng, NROWS, n)
    expected = et.lookup_oracle(jnp.asarray(data), jnp.asarray(idx))

    for table in (et.SimpleEmbedding(data),                 # Dynamic
                  et.SimpleEmbedding(data, et.Static(dim))):  # Static
        out = et.lookup(table, idx)
        assert out.shape == (n, dim)
        assert (out == expected).all(), f"{table.spec.lookup} mismatch"

    # Raw-array path (reference AbstractMatrix fallback).
    assert (et.lookup(jnp.asarray(data), idx) == expected).all()


@pytest.mark.parametrize("dim", [32, 128, 512, 1024, 1504])
def test_reducing_simple(dim):
    rng = np.random.default_rng(0xBEEF + dim)
    data = make_table(rng, NROWS, dim)
    batch = 50
    idx = rng.integers(0, NROWS, size=(batch, BAG)).astype(np.int32)
    expected = et.lookup_oracle(jnp.asarray(data), jnp.asarray(idx))
    for table in (et.SimpleEmbedding(data),
                  et.SimpleEmbedding(data, et.Static(dim))):
        out = et.lookup(table, idx)
        assert out.shape == (batch, dim)
        # EXACT equality: the XLA path sums the bag axis of the same gathered
        # (B, bag, D) array as the oracle — same-order summation is part of
        # the contract (reference test/lookup.jl:43-57 uses `==`).
        assert (out == expected).all()


@pytest.mark.parametrize("rows_per_shard", [10, 20, 30, 40, 50])
def test_split_embedding_lookup(rows_per_shard):
    # Reference runs every case across SplitEmbedding shard widths
    # {10,20,30,40,50} (test/lookup.jl:110-138).
    rng = np.random.default_rng(7)
    dim = 64
    data = make_table(rng, NROWS, dim)
    split = et.SplitEmbedding(data, rows_per_shard)
    assert split.nshards == et.cdiv(NROWS, rows_per_shard)

    idx = rand_indices(rng, NROWS, 120)
    expected = et.lookup_oracle(jnp.asarray(data), jnp.asarray(idx))
    assert (et.lookup(split, idx) == expected).all()

    bag_idx = rng.integers(0, NROWS, size=(40, BAG)).astype(np.int32)
    expected2 = et.lookup_oracle(jnp.asarray(data), jnp.asarray(bag_idx))
    np.testing.assert_allclose(et.lookup(split, bag_idx), expected2, rtol=1e-6)


def test_static_dynamic_parity():
    # SURVEY.md §2.4 item 10.
    rng = np.random.default_rng(11)
    data = make_table(rng, NROWS, 128)
    idx = rand_indices(rng, NROWS, 64)
    a = et.lookup(et.SimpleEmbedding(data, et.Static(128)), idx)
    b = et.lookup(et.SimpleEmbedding(data, et.Dynamic()), idx)
    assert (a == b).all()


def test_lookup_under_jit():
    rng = np.random.default_rng(3)
    data = make_table(rng, NROWS, 128)
    table = et.SimpleEmbedding(data)
    idx = rand_indices(rng, NROWS, 64)

    @jax.jit
    def f(t, i):
        return et.lookup(t, i)

    assert (f(table, idx) == et.lookup_oracle(jnp.asarray(data), jnp.asarray(idx))).all()


def test_pallas_interpret_parity_nonreducing():
    # The Pallas kernel path, run in interpreter mode on CPU, must match the
    # oracle exactly (the reference's static-vs-generic parity discipline).
    rng = np.random.default_rng(21)
    data = make_table(rng, 64, 128)
    idx = rand_indices(rng, 64, 48)
    expected = et.lookup_oracle(jnp.asarray(data), jnp.asarray(idx))
    with et.config.use_impl(lookup="pallas"):
        out = et.lookup(et.SimpleEmbedding(data), idx)
    assert (out == expected).all()


def test_pallas_interpret_parity_reducing():
    rng = np.random.default_rng(22)
    data = make_table(rng, 64, 128)
    idx = rng.integers(0, 64, size=(16, 4)).astype(np.int32)
    expected = et.lookup_oracle(jnp.asarray(data), jnp.asarray(idx))
    with et.config.use_impl(lookup="pallas"):
        out = et.lookup(et.SimpleEmbedding(data), idx)
    # The kernel accumulates the bag axis of the same gathered tile in the
    # same order as the oracle: exact equality holds.
    assert (np.asarray(out) == np.asarray(expected)).all()


def test_destination_shape():
    rng = np.random.default_rng(5)
    t = et.SimpleEmbedding(make_table(rng, 10, 16))
    d = et.destination(t, np.zeros(7, np.int32))
    assert d.shape == (7, 16) and d.dtype == np.float32
    d2 = et.destination(t, np.zeros((7, 3), np.int32))
    assert d2.shape == (7, 16)


def test_gather_rows_v2_large_batch_interpret():
    """Single-call kernel-side-index-streaming gather (B > 64Ki path),
    exercised in interpret mode at a reduced threshold."""
    import embeddingtables_tpu.ops.pallas.gather as G
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((300, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 300, 1500).astype(np.int32))
    old = G.MAX_PREFETCH_IDX
    try:
        G.MAX_PREFETCH_IDX = 512  # force the v2 path
        out = G.gather_rows(table, idx, interpret=True)
    finally:
        G.MAX_PREFETCH_IDX = old
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])
