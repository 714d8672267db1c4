"""Dissect the DLRM forward's embedding portion: where do 29 ms go when the
flat materialized gather is 14.2 ms and the MLPs are ~4 ms?

  F1 embedding_forward (the step's gather) alone, consumed
  F2 same but output consumed AFTER the (B, T, D) transpose
  F3 gather with FLAT (T*B,) indices, no reshape
  F4 F1 + interaction + MLPs + loss (= D1, for closure)
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() == "tpu"
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import (bce_loss, embedding_forward,
                                                 forward_from_embeddings)
    from embeddingtables_tpu.optim import SparseSGD

    t, vocab, dim, batch, chunk, reps = 26, 250_000, 128, 65_536, 10, 3
    cfg = DLRMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13, dim=dim,
                     bottom_mlp=(64, dim), top_mlp=(64, 1))
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(batch, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32)
         for _ in range(t)]))
    label = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))
    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=SparseSGD(1e-4))
    table = model.tables.data
    offs = jnp.asarray(model.tables.offsets[:-1], jnp.int32)[:, None]

    def timeit(name, fn):
        @jax.jit
        def run(table, cat):
            def step(k, s):
                return s + fn(table, (cat + k) % vocab)
            return jax.lax.fori_loop(0, chunk, step,
                                     jnp.zeros((), jnp.float32))
        r = run(table, cat)
        _ = float(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(table, cat))
            ts.append((time.perf_counter() - t0) / chunk)
        print(f"{name:36s} {float(np.median(ts))*1e3:7.2f} ms",
              file=sys.stderr, flush=True)

    def consume(x):
        return jnp.sum(jax.lax.optimization_barrier(x))

    import dataclasses as _dc
    st0 = model.tables

    def with_table(tb):
        # NEVER close over the 3.3 GB table (it would bake in as a jit
        # constant); rebuild the container around the traced argument.
        return _dc.replace(st0, data=tb)

    timeit("F1 embedding_forward (T,B,D)",
           lambda tb, c: consume(embedding_forward(with_table(tb), c)))
    timeit("F2 + transpose to (B,T,D)",
           lambda tb, c: consume(jnp.transpose(
               embedding_forward(with_table(tb), c), (1, 0, 2))))
    timeit("F3 flat (T*B,) gather",
           lambda tb, c: consume(jnp.take(tb, (c + offs).reshape(-1),
                                          axis=0)))

    def full_fwd(tb, c):
        emb = embedding_forward(with_table(tb), c)
        return bce_loss(forward_from_embeddings(model.bottom, model.top,
                                                cfg, dense, emb), label)
    timeit("F4 full fwd+loss", full_fwd)


if __name__ == "__main__":
    main()
