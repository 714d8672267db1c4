"""MXU one-hot segment-accumulate kernel (ops/pallas/segsum.py) vs the
jax.ops.segment_sum oracle, interpret mode on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.ops.pallas.segsum import hot_accumulate


def oracle(rows, vals, h):
    safe = jnp.where((rows >= 0) & (rows < h), rows, h)
    return jnp.zeros((h, vals.shape[1]), jnp.float32).at[safe].add(
        vals.astype(jnp.float32), mode="drop")


@pytest.mark.parametrize("h", [128, 512])
@pytest.mark.parametrize("n", [1000, 4096])
def test_segsum_matches_oracle(h, n):
    rng = np.random.default_rng(h + n)
    d = 128
    # Ids straddle the bound: in-range, out-of-range, heavy duplication.
    rows = jnp.asarray(rng.integers(0, 2 * h, n).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    got = hot_accumulate(rows, vals, h, interpret=True)
    want = oracle(rows, vals, h)
    # bf16 matmul accumulation: absolute error scales with the segment's
    # summed magnitude (cancellation makes RELATIVE error unbounded on
    # near-zero sums), so bound it against sum(|vals|) per segment.
    mag = np.asarray(oracle(rows, jnp.abs(vals), h))
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert (err <= 0.02 * mag + 2e-2).all(), float(err.max())
    # f32 mode is near-exact (fp summation order only).
    got32 = hot_accumulate(rows, vals, h, compute_dtype=jnp.float32,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_segsum_duplication_and_empty_segments():
    d, h = 128, 128
    rows = jnp.asarray([0] * 50 + [3] * 20 + [127] * 5 + [500] * 10,
                       jnp.int32)
    vals = jnp.ones((85, d), jnp.float32)
    got = hot_accumulate(rows, vals, h, compute_dtype=jnp.float32,
                         interpret=True)
    expect = np.zeros((h, d), np.float32)
    expect[0] = 50.0
    expect[3] = 20.0
    expect[127] = 5.0   # id 500 out of range -> dropped
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)


def test_segsum_validation():
    with pytest.raises(ValueError, match="multiple of 128"):
        hot_accumulate(jnp.zeros(8, jnp.int32), jnp.zeros((8, 64)), 128,
                       interpret=True)
    with pytest.raises(ValueError, match="multiple of 128"):
        hot_accumulate(jnp.zeros(8, jnp.int32), jnp.zeros((8, 128)), 100,
                       interpret=True)


def test_segsum_empty_stream_returns_zeros():
    got = hot_accumulate(jnp.zeros((0,), jnp.int32),
                         jnp.zeros((0, 128), jnp.float32), 128,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.zeros((128, 128)))
