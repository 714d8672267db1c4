"""SparseFTRL (FTRL-Proximal) — McMahan et al. 2013 Alg. 1 semantics.

Oracle: an independent scalar-loop numpy implementation of per-coordinate
FTRL, applied to the duplicate-ACCUMULATED row gradients (the unique-row
single-write contract, /root/reference/src/sparseupdate.jl:97-129 — with
state, dedup is a correctness requirement, SURVEY.md §2.4 item 8).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingtables_tpu.ops.lookup import lookup_oracle, lookup_vjp
from embeddingtables_tpu.ops.sparse_update import SparseEmbeddingUpdate
from embeddingtables_tpu.optim import SparseFTRL, SparseFTRLState

V, D = 60, 8


class NumpyFTRL:
    """Scalar-faithful FTRL-Proximal reference."""

    def __init__(self, w0, alpha, beta, l1, l2, n0=0.0):
        self.alpha, self.beta, self.l1, self.l2 = alpha, beta, l1, l2
        self.w = w0.astype(np.float64).copy()
        self.n = np.full_like(self.w, n0)
        denom = (beta + np.sqrt(self.n)) / alpha + l2
        self.z = np.where(w0 != 0.0, -w0 * denom - np.sign(w0) * l1, 0.0)

    def step(self, row_grads):
        """row_grads: {row: (D,) accumulated gradient}."""
        for r, g in row_grads.items():
            n, z, w = self.n[r], self.z[r], self.w[r]
            new_n = n + g * g
            sigma = (np.sqrt(new_n) - np.sqrt(n)) / self.alpha
            new_z = z + g - sigma * w
            denom = (self.beta + np.sqrt(new_n)) / self.alpha + self.l2
            new_w = np.where(np.abs(new_z) > self.l1,
                             -(new_z - np.sign(new_z) * self.l1) / denom, 0.0)
            self.n[r], self.z[r], self.w[r] = new_n, new_z, new_w


def accumulated(idx, delta, weights=None):
    out = {}
    flat_idx = np.asarray(idx).reshape(-1)
    if np.asarray(idx).ndim == 2:
        b, bag = np.asarray(idx).shape
        vals = np.repeat(np.asarray(delta), bag, axis=0)
    else:
        vals = np.asarray(delta)
    if weights is not None:
        vals = vals * np.asarray(weights).reshape(-1, 1)
    for r, v in zip(flat_idx, vals):
        out.setdefault(int(r), np.zeros(D))
        out[int(r)] += v
    return out


@pytest.mark.parametrize("l1,l2", [(0.0, 0.0), (0.01, 0.1), (0.5, 0.0)])
def test_ftrl_matches_scalar_reference_multistep(l1, l2):
    rng = np.random.default_rng(hash((l1, l2)) % 2**31)
    w0 = rng.standard_normal((V, D)).astype(np.float32) * 0.1
    opt = SparseFTRL(lr=0.1, beta=1.0, l1=l1, l2=l2)
    data = jnp.asarray(w0)
    state = opt.init(data)
    ref = NumpyFTRL(w0, 0.1, 1.0, l1, l2)
    for step in range(5):
        idx = rng.integers(0, V, size=(16,)).astype(np.int32)
        delta = rng.standard_normal((16, D)).astype(np.float32)
        upd = SparseEmbeddingUpdate(delta=jnp.asarray(delta),
                                    indices=jnp.asarray(idx))
        data, state = opt.apply(data, upd, state)
        ref.step(accumulated(idx, delta))
        np.testing.assert_allclose(np.asarray(data), ref.w, atol=1e-4,
                                   err_msg=f"step {step}")


def test_init_reproduces_weights_and_untouched_rows_are_fixed():
    rng = np.random.default_rng(2)
    w0 = rng.standard_normal((V, D)).astype(np.float32)
    opt = SparseFTRL(lr=0.05, l1=0.2, l2=0.3)
    data = jnp.asarray(w0)
    state = opt.init(data)
    # Touch only rows < 10; every other row must be BITWISE unchanged.
    idx = rng.integers(0, 10, size=(32,)).astype(np.int32)
    delta = rng.standard_normal((32, D)).astype(np.float32)
    new, _ = opt.apply(data, SparseEmbeddingUpdate(
        delta=jnp.asarray(delta), indices=jnp.asarray(idx)), state)
    np.testing.assert_array_equal(np.asarray(new)[10:], w0[10:])
    assert not np.array_equal(np.asarray(new)[:10], w0[:10])


def test_duplicate_occurrences_accumulate_before_state_advance():
    # Two occurrences of one row in one step == one occurrence with the
    # summed gradient (dedup-before-update; FTRL state is nonlinear in g).
    w0 = np.ones((V, D), np.float32) * 0.5
    opt = SparseFTRL(lr=0.1, l1=0.05, l2=0.01)
    data = jnp.asarray(w0)
    state = opt.init(data)
    g1 = np.full((1, D), 0.3, np.float32)
    g2 = np.full((1, D), -0.1, np.float32)
    dup, _ = opt.apply(data, SparseEmbeddingUpdate(
        delta=jnp.asarray(np.concatenate([g1, g2])),
        indices=jnp.asarray(np.array([7, 7], np.int32))), state)
    summed, _ = opt.apply(data, SparseEmbeddingUpdate(
        delta=jnp.asarray(g1 + g2),
        indices=jnp.asarray(np.array([7], np.int32))), state)
    np.testing.assert_allclose(np.asarray(dup), np.asarray(summed),
                               atol=1e-6)


def test_lr_override_rejected():
    # alpha is baked into the z state: a per-step lr override would
    # reinterpret all accumulated state at the new alpha and snap weights.
    opt = SparseFTRL(lr=0.05)
    data = jnp.ones((4, 2), jnp.float32)
    state = opt.init(data)
    upd = SparseEmbeddingUpdate(delta=jnp.ones((1, 2)) * 1e-9,
                                indices=jnp.array([0], jnp.int32))
    with pytest.raises(ValueError, match="cannot change lr"):
        opt.apply(data, upd, state, lr=0.01)
    # The fixed value passes through (uniform-interface compatibility).
    out, _ = opt.apply(data, upd, state, lr=0.05)
    np.testing.assert_allclose(np.asarray(out)[1:], np.asarray(data)[1:])


def test_l1_drives_exact_zeros():
    # From the origin (z0 = 0), any |accumulated z| <= l1 stays EXACTLY 0 —
    # FTRL's trained-sparsity signature. (Weights initialized away from 0
    # carry |z0| > l1 by construction of the weight-preserving init, so
    # they shrink but do not snap.)
    rng = np.random.default_rng(4)
    opt = SparseFTRL(lr=0.1, l1=50.0)
    data = jnp.zeros((V, D), jnp.float32)
    state = opt.init(data)
    idx = jnp.asarray(np.arange(V, dtype=np.int32))
    delta = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32) * 0.1)
    new, _ = opt.apply(data, SparseEmbeddingUpdate(delta=delta, indices=idx),
                       state)
    assert np.all(np.asarray(new) == 0.0)  # EXACT zeros


def test_bag_update_with_pad_and_weights():
    rng = np.random.default_rng(5)
    w0 = rng.standard_normal((V, D)).astype(np.float32) * 0.1
    opt = SparseFTRL(lr=0.1, l1=0.01, l2=0.05)
    data = jnp.asarray(w0)
    state = opt.init(data)
    idx = np.where(rng.random((8, 4)) < 0.3, -1,
                   rng.integers(0, V, size=(8, 4))).astype(np.int32)
    out, pb = lookup_vjp(data, jnp.asarray(idx), combiner="mean", pad_idx=-1)
    delta = rng.standard_normal((8, D)).astype(np.float32)
    upd = pb(jnp.asarray(delta))
    new, _ = opt.apply(data, upd, state)
    ref = NumpyFTRL(w0, 0.1, 1.0, 0.01, 0.05)
    acc = accumulated(idx, delta, np.asarray(upd.weights))
    acc.pop(-1, None)  # pad occurrences carry weight 0: no contribution
    # zero-weight accumulations to real rows must not advance them either
    acc = {r: g for r, g in acc.items() if np.any(g != 0.0)}
    ref.step(acc)
    np.testing.assert_allclose(np.asarray(new), ref.w, atol=1e-4)


@pytest.mark.parametrize("bag", [None, 3])
@pytest.mark.parametrize("l1,l2", [(0.0, 0.0), (0.02, 0.1)])
def test_sharded_ftrl_matches_single_chip(bag, l1, l2):
    """Mesh FTRL (shared ftrl_dense_body per owned shard) bit-matches the
    single-chip SparseFTRL over multiple steps, incl. the weight-preserving
    z init realized per shard."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from embeddingtables_tpu.ops.ensemble import StackedTables
    from embeddingtables_tpu.parallel.sharded import (ShardedStackedTables,
                                                      init_sharded_ftrl_state,
                                                      sharded_ftrl_apply)
    from embeddingtables_tpu.tables import SimpleEmbedding

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rng = np.random.default_rng(hash((bag, l1, l2)) % 2**31)
    vocabs = (60, 90)
    dim = 8
    arrs = [jnp.asarray(rng.normal(size=(v, dim)).astype(np.float32) * 0.1)
            for v in vocabs]
    stacked = StackedTables.stack([SimpleEmbedding(a) for a in arrs])
    opt = SparseFTRL(lr=0.1, l1=l1, l2=l2)

    st = ShardedStackedTables.shard(mesh, "data", stacked)
    z, n = init_sharded_ftrl_state(mesh, st, opt)
    state1 = opt.init(stacked.data)

    b = 32
    shape = (b,) if bag is None else (b, bag)
    data1 = stacked.data
    sd = NamedSharding(mesh, P(None, "data"))
    for it in range(3):
        idx = [rng.integers(0, vv, shape).astype(np.int32) for vv in vocabs]
        delta = rng.normal(size=(2, b, dim)).astype(np.float32)
        shifted = jnp.stack([jnp.asarray(idx[t]) + stacked.offsets[t]
                             for t in range(2)])
        flat_idx = shifted.reshape((-1,) + shifted.shape[2:])
        upd = SparseEmbeddingUpdate(
            delta=jnp.asarray(delta).reshape(-1, dim), indices=flat_idx)
        data1, state1 = opt.apply(data1, upd, state1)
        st, z, n = sharded_ftrl_apply(
            mesh, st, z, n, jax.device_put(shifted, sd),
            jax.device_put(jnp.asarray(delta), sd), opt)
        np.testing.assert_allclose(np.asarray(st.unshard()),
                                   np.asarray(data1), rtol=2e-5, atol=1e-6,
                                   err_msg=f"step {it}")


def test_training_loop_converges():
    # Fit a tiny regression: embedding rows -> fixed targets.
    rng = np.random.default_rng(6)
    target = rng.standard_normal((V, D)).astype(np.float32)
    opt = SparseFTRL(lr=0.5, beta=1.0)
    data = jnp.zeros((V, D), jnp.float32)
    state = opt.init(data)
    losses = []
    for step in range(80):
        idx = jnp.asarray(rng.integers(0, V, size=(64,)).astype(np.int32))
        out, pb = lookup_vjp(data, idx)
        err = out - jnp.asarray(target)[idx]
        losses.append(float((err ** 2).mean()))
        data, state = opt.apply(data, pb(err), state)
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
