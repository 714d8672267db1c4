"""Probe: bf16 delta operand for the plain-SGD scatter (VERDICT r4 item 1).

DESIGN.md §11 measured that a bf16 cast of the (B*T, D) delta halves the
scatter's operand-read stream inside the AdaGrad step (part of why the
system win exceeded the probe's -4.4 ms). That lever was never probed for
plain SGD, where the scatter reads the delta straight from the backward's
materialized buffer. V2 casts the (-lr * delta) value stream to bf16
before the scatter — if XLA pushes the cast into the backward's delta
materialization, BOTH the delta write (backward) and the scatter operand
read halve (~0.5 ms each at 872 MB / 819 GB/s), which is the whole
0.9 ms gap to vs_dma_sol >= 0.80.

MEASURED (2026-08-20, v5e): V1 72.15 ms, V2 72.11 ms — a WASH. The SGD
scatter is issue-bound, not operand-bound (§1b), and the convert feeding
an f32 scatter does not shrink any binding stream. REFUTED; the knob was
removed from SparseSGD (DESIGN.md §12).

Methodology: the REAL DLRM train step (bench.py's §1 discipline — chained
fori_loop inside one jit, donated model, varying indices, loss fetch as the
fence), baseline vs the bf16-cast variant back-to-back in ONE process.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    t, vocab, dim, batch, chunk, reps = 26, 250_000, 128, 65_536, 10, 3
    print(f"stage: init (T={t} V={vocab} D={dim} B={batch})", flush=True)

    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_train_step
    from embeddingtables_tpu.optim import SparseSGD

    cfg = DLRMConfig(vocab_sizes=tuple([vocab] * t), num_dense=13, dim=dim,
                     bottom_mlp=(64, dim), top_mlp=(64, 1))
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(batch, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, vocab, (batch,)).astype(np.int32)
         for _ in range(t)]))
    label = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))

    class _BF16DeltaSGD(SparseSGD):
        """The probed variant: cast the scatter's value operand to bf16
        (the knob this probe refuted — kept local so the probe stays
        runnable after its removal from the library)."""

        def apply(self, data, upd, state, *, row_offset=0, lr=None,
                  key=None):
            from embeddingtables_tpu.optim import _occurrence_grads
            lr = self.lr if lr is None else lr
            rows, g = _occurrence_grads(upd, row_offset)
            vals = (-lr * g).astype(jnp.bfloat16)
            return data.at[rows].add(vals.astype(data.dtype)), state

    def bench_one(name, opt):
        step = make_train_step(cfg, sparse_opt=opt, dense_lr=1e-4, jit=False)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_chunk(model, dense, cat, label):
            def body(k, carry):
                m, _ = carry
                m, loss = step(m, dense, (cat + k) % vocab, label)
                return m, loss
            return jax.lax.fori_loop(0, chunk, body,
                                     (model, jnp.zeros((), jnp.float32)))

        print(f"stage: {name} compile+warmup", flush=True)
        model = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt)
        model, loss = run_chunk(model, dense, cat, label)
        _ = float(loss)
        times = []
        for r in range(reps):
            t0 = time.perf_counter()
            model, loss = run_chunk(model, dense, cat, label)
            lv = float(loss)
            times.append((time.perf_counter() - t0) / chunk)
        assert np.isfinite(lv), lv
        del model
        ms = float(np.median(times)) * 1e3
        print(f"RESULT {name}: {ms:.2f} ms/step (reps "
              f"{[f'{x*1e3:.2f}' for x in times]})", flush=True)
        return ms

    base = bench_one("V1_f32_delta", SparseSGD(1e-4))
    b16 = bench_one("V2_bf16_delta", _BF16DeltaSGD(1e-4))
    print(f"SUMMARY: f32 {base:.2f} ms, bf16-delta {b16:.2f} ms, "
          f"delta {b16 - base:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
