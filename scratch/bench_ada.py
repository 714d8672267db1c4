"""Minimal uniform-AdaGrad step bench for the 94.4-vs-98.4 ms drift bisect
(VERDICT r2 item 2). Mirrors bench.py's uniform_adagrad configuration
exactly; runs against whatever embeddingtables_tpu PYTHONPATH resolves, so
it can drive historical worktrees unmodified.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import embeddingtables_tpu as et  # noqa: F401 (resolve before models)
from embeddingtables_tpu.models import DLRMConfig, init_dlrm
from embeddingtables_tpu.models.dlrm import make_train_step
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad

T, V, D, B, CHUNK, REPS = 26, 250_000, 128, 65_536, 10, 3


def main():
    import embeddingtables_tpu
    print(f"# package: {embeddingtables_tpu.__file__}", file=sys.stderr)
    gdt = None
    if "--dense-grad-dtype" in sys.argv:
        gdt = sys.argv[sys.argv.index("--dense-grad-dtype") + 1]
    cfg = DLRMConfig(vocab_sizes=tuple([V] * T), num_dense=13, dim=D,
                     bottom_mlp=(64, D), top_mlp=(64, 1))
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(B, 13)).astype(np.float32))
    cat = jnp.asarray(np.stack(
        [rng.integers(0, V, (B,)).astype(np.int32) for _ in range(T)]))
    label = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))

    ada = SparseRowWiseAdaGrad(lr=1e-3, dense_grad_dtype=gdt)
    step = make_train_step(cfg, sparse_opt=ada, dense_lr=1e-4, jit=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(model, dense, cat, label):
        def body(k, carry):
            m, _ = carry
            m, loss = step(m, dense, (cat + k) % V, label)
            return m, loss
        return jax.lax.fori_loop(0, CHUNK, body,
                                 (model, jnp.zeros((), jnp.float32)))

    model = init_dlrm(jax.random.key(0), cfg, sparse_opt=ada)
    model, loss = run_chunk(model, dense, cat, label)
    _ = float(loss)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        model, loss = run_chunk(model, dense, cat, label)
        _ = float(loss)
        times.append((time.perf_counter() - t0) / CHUNK)
    print(f"uniform_adagrad[grad_dtype={gdt or 'f32'}] "
          f"{float(np.median(times))*1e3:.2f} ms "
          f"(all: {[round(t*1e3, 2) for t in times]})")


if __name__ == "__main__":
    main()
