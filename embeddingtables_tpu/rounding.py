"""Stochastic rounding for low-precision embedding training.

bf16 tables halve HBM capacity per row, but nearest-rounding kills
training: an SGD step smaller than half a bf16 ulp (relative step below
~2^-9) rounds back to the old value EVERY time, so small-gradient rows
stop learning. Stochastic rounding (SR) rounds to the two neighboring
representables with probability proportional to proximity — unbiased
(`E[SR(x)] = x`), so tiny steps accumulate in expectation. This is the
standard recipe for sub-f32 embedding training in production recsys
stacks, and the right fit for TPUs, where bf16 is the native matmul
format.

Implementation is the classic bit trick, fully vectorized (VPU-friendly,
zero per-element control flow): view f32 as uint32, add a uniform random
16-bit integer, truncate the low 16 bits -> the bf16 pattern. Truncation
after the random add lands on `floor(x)` with probability `1 - frac` and
on the next representable with probability `frac` (carries propagate
through the exponent, which is exactly right at binade boundaries).
NaN/Inf inputs pass through unchanged.

Wired into the sparse optimizers via `stochastic_rounding=True` + a `key`
argument on `apply` (the dense-body realizations compute the new rows in
f32 and SR-cast exactly once on the way back to storage dtype).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _noise_u16(key: jax.Array, shape) -> jax.Array:
    """Uniform 16-bit noise as uint32, via the HARDWARE bit generator:
    the SR cast needs table-sized noise every step (O(V*D) values), and
    jax's default threefry costs ~8 ms/step at the bench's (6.5M, 128)
    table on v5e; XLA's RngBitGenerator (jax's "rbg" impl) is VPU-cheap.
    The caller's (threefry) key seeds an rbg key — the key itself was
    already uniquified upstream (per-step fold_in + per-shard fold), and
    rounding noise needs uniformity, not cryptographic independence."""
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    rbg = jax.random.wrap_key_data(jnp.tile(kd, 4)[:4], impl="rbg")
    return jax.random.bits(rbg, shape, dtype=jnp.uint16).astype(jnp.uint32)


def stochastic_round_to_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """SR-cast f32 -> bf16: unbiased, output is always one of the two
    bf16 neighbors of `x` (or `x` itself when exactly representable)."""
    x = jnp.asarray(x, jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = _noise_u16(key, x.shape)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(rounded, jnp.float32)
    # NaN/Inf (exponent all-ones): the add could carry out of the exponent;
    # pass the original pattern through.
    special = (bits & jnp.uint32(0x7F800000)) == jnp.uint32(0x7F800000)
    out = jnp.where(special, x, out)
    return out.astype(jnp.bfloat16)


def stochastic_cast(x: jax.Array, dtype, key) -> jax.Array:
    """Cast `x` (f32 math result) to the table storage dtype.

    bf16 + a key -> stochastic rounding; anything else -> plain `astype`
    (f32 storage needs no rounding; nearest is the honest default when no
    key is provided)."""
    dtype = jnp.dtype(dtype)
    if key is not None and dtype == jnp.bfloat16:
        return stochastic_round_to_bf16(x, key)
    return x.astype(dtype)
