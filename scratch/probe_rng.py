"""Probe: what does the SR noise pass REALLY cost? (round 5)

bench.py's bf16_sr model charges the stochastic-rounding noise as one
(ΣV, D) u16 stream at HBM rate (1.66 GB -> 2.0 ms at bench scale). But
the noise comes from XLA's hardware RngBitGenerator, whose GENERATION
rate may be the binding constraint, not the write stream. Measure it
standalone (§1 methodology: chained, consumed, key varies per step so
nothing hoists):

  R1  RngBitGenerator u32 (ΣV, D/2) == the u16 volume rounding.py draws,
      consumed by a fold to scalar
  R2  same volume but threefry (the pre-round-3 path, for scale)
  R3  the full SR cast body at bench scale: f32 rows + noise -> bf16
      (rounding.stochastic_round), consumed

If R1 >> 2.0 ms, the model's noise term underestimates the physical
floor and the honest bf16_sr denominator should carry the MEASURED
generator rate."""
from __future__ import annotations
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")


def main():
    assert jax.default_backend() == "tpu"
    from embeddingtables_tpu import rounding

    sum_v, dim = 26 * 250_000, 128
    chunk, reps = 8, 3

    def timeit(name, run):
        print(f"stage: {name} compile", flush=True)
        r = run(jax.random.key(0))
        _ = float(r)
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            r = run(jax.random.key(i + 1))
            _ = float(r)
            ts.append((time.perf_counter() - t0) / chunk)
        sec = float(np.median(ts))
        print(f"RESULT {name:34s} {sec*1e3:7.2f} ms", flush=True)
        return sec

    @jax.jit
    def r1(key):
        def body(k, carry):
            kk = jax.random.fold_in(key, k)
            bits = rounding._noise_u16(kk, (sum_v, dim))
            return carry + jnp.sum(bits.astype(jnp.uint32)).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, chunk, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def r2(key):
        def body(k, carry):
            kk = jax.random.fold_in(key, k)
            bits = jax.random.bits(kk, (sum_v, dim), jnp.uint16)
            return carry + jnp.sum(bits.astype(jnp.uint32)).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, chunk, body, jnp.zeros((), jnp.float32))

    rows = jax.jit(lambda k: jax.random.normal(k, (sum_v, dim),
                                               jnp.float32))(
        jax.random.key(9))
    jax.block_until_ready(rows)

    @jax.jit
    def r3(key, rows):
        def body(k, carry):
            kk = jax.random.fold_in(key, k)
            cast = rounding.stochastic_round_to_bf16(rows + carry, kk)
            return jnp.sum(cast.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, chunk, body, jnp.zeros((), jnp.float32))

    timeit("R1 hardware RngBitGenerator u16", r1)
    timeit("R2 threefry u16 (scale ref)", r2)
    timeit("R3 full SR cast pass f32->bf16",
           functools.partial(r3, rows=rows))


if __name__ == "__main__":
    main()
