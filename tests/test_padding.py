"""Padding-sentinel (`pad_idx`) semantics: variable-length bags.

The reference supports only FIXED-size multi-hot bags (`inds[i,j]`,
/root/reference/README.md:22-25) — this is a beyond-reference extension for
TPU-static shapes: variable-length bags are fixed-width bags right-padded
with a sentinel index. Contract (torch `EmbeddingBag padding_idx` semantics):

  - a pad occurrence contributes a ZERO row to the bag reduction;
  - mean denominators count only valid (non-pad) weight mass;
  - an all-pad bag yields a zero output row (incl. mean);
  - pad occurrences carry NO gradient (folded as weight-0 occurrences into
    the lazy update — `lookup.effective_weights`);
  - in non-reducing `(B,)` lookups a pad entry yields a zero row;
  - any sentinel value works (e.g. -1 or vocab) on every table type: pads
    are remapped to row 0 before the gather, then masked.

Oracles: the dense `lookup_oracle`, `jax.grad` through it, and (external)
torch.nn.EmbeddingBag with padding_idx.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.optim import SparseRowWiseAdaGrad, SparseSGD
from embeddingtables_tpu.ops.ensemble import (PreallocationStrategy,
                                              StackedTables, maplookup,
                                              maplookup_vjp)
from embeddingtables_tpu.ops.lookup import (effective_weights, lookup,
                                            lookup_oracle, lookup_vjp)
from embeddingtables_tpu.ops.sparse_update import uncompress
from embeddingtables_tpu.tables import SimpleEmbedding, SplitEmbedding

V, D, B, BAG = 200, 16, 32, 6


def make_case(rng, pad, pad_frac=0.3, all_pad_row=True):
    idx = rng.integers(0, V, size=(B, BAG)).astype(np.int32)
    idx = np.where(rng.random((B, BAG)) < pad_frac, pad, idx)
    if all_pad_row:
        idx[B // 2, :] = pad  # one fully-empty bag
    return jnp.asarray(idx)


def numpy_ref(data, idx, pad, combiner, weights):
    """Independent scalar-loop reference (not lookup_oracle)."""
    data = np.asarray(data)
    out = np.zeros((idx.shape[0], data.shape[1]), np.float32)
    for i in range(idx.shape[0]):
        acc = np.zeros(data.shape[1], np.float32)
        wsum = 0.0
        for k in range(idx.shape[1]):
            if int(idx[i, k]) == pad:
                continue
            w = float(weights[i, k]) if weights is not None else 1.0
            acc += w * data[int(idx[i, k])]
            wsum += w
        if combiner == "mean":
            acc = acc / max(wsum, 1e-12)
        out[i] = acc
    return out


@pytest.mark.parametrize("pad", [-1, 0, V])
@pytest.mark.parametrize("combiner", ["sum", "mean"])
@pytest.mark.parametrize("weighted", [False, True])
def test_forward_bags_vs_scalar_reference(pad, combiner, weighted):
    rng = np.random.default_rng(hash((pad, combiner, weighted)) % 2**31)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = make_case(rng, pad)
    w = (jnp.asarray(rng.random((B, BAG)).astype(np.float32)) + 0.1
         if weighted else None)
    exp = numpy_ref(data, np.asarray(idx), pad, combiner, w)
    for table in (data, SimpleEmbedding(data), SplitEmbedding(data, 37)):
        got = lookup(table, idx, combiner=combiner, weights=w, pad_idx=pad)
        np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5)
    orc = lookup_oracle(data, idx, combiner, w, pad_idx=pad)
    np.testing.assert_allclose(np.asarray(orc), exp, atol=1e-5)


def test_all_pad_bag_is_zero_even_for_mean():
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32)) + 5.0
    idx = jnp.full((4, BAG), -1, jnp.int32)
    for combiner in ("sum", "mean"):
        out = lookup(data, idx, combiner=combiner, pad_idx=-1)
        assert np.all(np.asarray(out) == 0.0)


def test_forward_nonreducing_pad_rows_are_zero():
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = rng.integers(0, V, size=(B,)).astype(np.int32)
    padded = np.where(rng.random(B) < 0.4, -1, idx)
    for table in (data, SimpleEmbedding(data), SplitEmbedding(data, 61)):
        out = np.asarray(lookup(table, jnp.asarray(padded), pad_idx=-1))
        for i in range(B):
            if padded[i] == -1:
                assert np.all(out[i] == 0.0)
            else:
                np.testing.assert_array_equal(out[i],
                                              np.asarray(data)[padded[i]])


def test_pad_idx_none_is_bitwise_unchanged():
    # The pad feature must not perturb the default path (fast dispatch).
    rng = np.random.default_rng(11)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, size=(B, BAG)).astype(np.int32))
    a = lookup(data, idx)
    b = lookup(data, idx, pad_idx=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("combiner", ["sum", "mean"])
@pytest.mark.parametrize("weighted", [False, True])
def test_grad_matches_dense_autodiff(combiner, weighted):
    rng = np.random.default_rng(hash((combiner, weighted)) % 2**31)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = make_case(rng, -1)
    w = (jnp.asarray(rng.random((B, BAG)).astype(np.float32)) + 0.1
         if weighted else None)
    out, pb = lookup_vjp(data, idx, combiner=combiner, weights=w, pad_idx=-1)
    delta = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    g_lazy = uncompress(pb(delta), V)

    def loss(d):
        return (lookup_oracle(d, idx, combiner, w, pad_idx=-1) * delta).sum()

    g_dense = jax.grad(loss)(data)
    np.testing.assert_allclose(np.asarray(g_lazy), np.asarray(g_dense),
                               atol=1e-4)


def test_grad_nonreducing_pad_has_no_gradient():
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = np.where(rng.random(B) < 0.4, -1,
                   rng.integers(0, V, size=(B,))).astype(np.int32)
    out, pb = lookup_vjp(data, jnp.asarray(idx), pad_idx=-1)
    delta = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    g = np.asarray(uncompress(pb(delta), V))

    def loss(d):
        return (lookup_oracle(d, jnp.asarray(idx), pad_idx=-1) * delta).sum()

    np.testing.assert_allclose(g, np.asarray(jax.grad(loss)(data)), atol=1e-4)
    # The effective weights are exactly the validity mask.
    eff = effective_weights(jnp.asarray(idx), "sum", None, -1)
    np.testing.assert_array_equal(np.asarray(eff), (idx != -1).astype(np.float32))


def test_sgd_update_with_padded_bags_matches_manual():
    """End-to-end: padded occurrences leave the table untouched under the
    fused SGD step (weight-0 occurrences accumulate exact zero)."""
    rng = np.random.default_rng(13)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = make_case(rng, -1)
    out, pb = lookup_vjp(data, idx, pad_idx=-1)
    delta = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    upd = pb(delta)
    lr = 0.5
    for method in ("scatter", "dedup"):
        new = et.sgd_update(data, upd, lr, method=method)
        exp = np.asarray(data) - lr * np.asarray(
            jax.grad(lambda d: (lookup_oracle(d, idx, "sum", None, -1)
                                * delta).sum())(data))
        np.testing.assert_allclose(np.asarray(new), exp, atol=1e-4)


def test_adagrad_rowstate_advances_only_on_valid_rows():
    rng = np.random.default_rng(17)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    # Rows >= 100 appear ONLY as pad-masked occurrences -> their state and
    # values must not move.
    idx = rng.integers(0, 100, size=(B, BAG)).astype(np.int32)
    mask = rng.random((B, BAG)) < 0.3
    idx = np.where(mask, 150, idx)  # row 150 occurrences, all padded out
    out, pb = lookup_vjp(data, jnp.asarray(idx), pad_idx=150)
    delta = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    upd = pb(delta)
    opt = SparseRowWiseAdaGrad(lr=0.1)
    state = opt.init(data)
    new_data, new_state = opt.apply(data, upd, state)
    np.testing.assert_array_equal(np.asarray(new_data)[100:],
                                  np.asarray(data)[100:])
    assert np.all(np.asarray(new_state.accum)[100:] == 0.0)


def test_nonreducing_combiner_and_weights_contract():
    """1-D contract: combiner is a no-op (mean == sum == gather), weights
    are a per-row output scale, and the lazy gradient is its transpose —
    uniformly across table types, with and without pad_idx."""
    rng = np.random.default_rng(53)
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, size=(B,)).astype(np.int32))
    w = jnp.asarray(rng.random(B).astype(np.float32)) + 0.1
    plain = np.asarray(data)[np.asarray(idx)]
    for table in (data, SimpleEmbedding(data), SplitEmbedding(data, 61)):
        got_mean = lookup(table, idx, combiner="mean")
        np.testing.assert_allclose(np.asarray(got_mean), plain, atol=1e-6)
        got_w = lookup(table, idx, weights=w)
        np.testing.assert_allclose(np.asarray(got_w),
                                   plain * np.asarray(w)[:, None], atol=1e-5)
    orc = lookup_oracle(data, idx, "mean", w)
    np.testing.assert_allclose(np.asarray(orc),
                               plain * np.asarray(w)[:, None], atol=1e-5)
    # Gradient transposes the forward scale.
    out, pb = lookup_vjp(data, idx, weights=w)
    delta = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    g = uncompress(pb(delta), V)
    g_dense = jax.grad(lambda d: (lookup_oracle(d, idx, "sum", w)
                                  * delta).sum())(data)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_dense), atol=1e-4)
    # With pad: scale and mask compose.
    idxp = jnp.asarray(np.where(rng.random(B) < 0.4, -1,
                                np.asarray(idx)).astype(np.int32))
    got = lookup(data, idxp, weights=w, pad_idx=-1)
    exp = np.where(np.asarray(idxp)[:, None] >= 0,
                   np.asarray(data)[np.maximum(np.asarray(idxp), 0)]
                   * np.asarray(w)[:, None], 0.0)
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5)


# ---------------------------------------------------------------------------
# Ensemble paths
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_maplookup_stacked_matches_per_table(combiner):
    rng = np.random.default_rng(23)
    T = 4
    tabs = [SimpleEmbedding(jnp.asarray(
        rng.standard_normal((V, D)).astype(np.float32))) for _ in range(T)]
    st = StackedTables.stack(tabs)
    idx = np.where(rng.random((T, B, BAG)) < 0.3, -1,
                   rng.integers(0, V, size=(T, B, BAG))).astype(np.int32)
    idx = jnp.asarray(idx)
    stacked = maplookup(st, idx, combiner=combiner, pad_idx=-1)
    listed = maplookup(tabs, idx, combiner=combiner, pad_idx=-1)
    for a, b in zip(stacked, listed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for t in range(T):
        exp = numpy_ref(tabs[t].data, np.asarray(idx[t]), -1, combiner, None)
        np.testing.assert_allclose(np.asarray(stacked[t]), exp, atol=1e-5)


def test_maplookup_stacked_nonreducing_prealloc():
    rng = np.random.default_rng(29)
    T, P = 3, 5
    tabs = [SimpleEmbedding(jnp.asarray(
        rng.standard_normal((V, D)).astype(np.float32))) for _ in range(T)]
    st = StackedTables.stack(tabs)
    idx = np.where(rng.random((T, B)) < 0.3, -1,
                   rng.integers(0, V, size=(T, B))).astype(np.int32)
    fused = maplookup(PreallocationStrategy(P), st, jnp.asarray(idx),
                      pad_idx=-1)
    parts = [np.asarray(lookup(t, jnp.asarray(idx[i]), pad_idx=-1))
             for i, t in enumerate(tabs)]
    exp = np.concatenate([np.zeros((B, P), np.float32)] + parts, axis=-1)
    np.testing.assert_allclose(np.asarray(fused), exp, atol=1e-5)


def test_maplookup_vjp_padded_grads_match_dense():
    rng = np.random.default_rng(31)
    T, P = 3, 2
    tabs = [SimpleEmbedding(jnp.asarray(
        rng.standard_normal((V, D)).astype(np.float32))) for _ in range(T)]
    st = StackedTables.stack(tabs)
    idx = jnp.asarray(np.where(rng.random((T, B, BAG)) < 0.3, -1,
                               rng.integers(0, V, size=(T, B, BAG))
                               ).astype(np.int32))
    out, pb = maplookup_vjp(PreallocationStrategy(P), st, idx,
                            combiner="mean", pad_idx=-1)
    delta = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    upds = pb(delta)
    for t in range(T):
        g_lazy = uncompress(upds[t], V)

        def loss(d, t=t):
            o = lookup_oracle(d, idx[t], "mean", None, pad_idx=-1)
            return (o * delta[:, P + t * D: P + (t + 1) * D]).sum()

        g_dense = jax.grad(loss)(tabs[t].data)
        np.testing.assert_allclose(np.asarray(g_lazy), np.asarray(g_dense),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# CSR/offsets ingestion (torch EmbeddingBag(input, offsets) format)
# ---------------------------------------------------------------------------

def test_csr_roundtrip_and_truncation():
    from embeddingtables_tpu.data import csr_to_padded, padded_to_csr
    values = np.array([5, 9, 2, 7, 7, 1, 3, 8, 4], np.int64)
    offsets = np.array([0, 2, 2, 6], np.int64)   # lengths 2, 0, 4, 3
    padded, trunc = csr_to_padded(values, offsets)
    assert padded.shape == (4, 4) and trunc == 0
    np.testing.assert_array_equal(padded[1], [-1, -1, -1, -1])  # empty bag
    v2, o2 = padded_to_csr(padded)
    np.testing.assert_array_equal(v2, values)
    np.testing.assert_array_equal(o2, offsets)
    # Truncation is counted, never silent.
    p3, trunc3 = csr_to_padded(values, offsets, bag=2)
    assert trunc3 == 3 and p3.shape == (4, 2)
    with pytest.raises(ValueError, match="nondecreasing"):
        csr_to_padded(values, np.array([0, 3, 2]))


@pytest.mark.parametrize("mode", ["sum", "mean"])
def test_csr_matches_torch_offsets_embedding_bag(mode):
    torch = pytest.importorskip("torch")
    from embeddingtables_tpu.data import csr_to_padded
    rng = np.random.default_rng(59)
    values = rng.integers(0, V, size=40).astype(np.int64)
    offsets = np.sort(rng.choice(np.arange(1, 40), 7, replace=False))
    offsets = np.concatenate([[0], offsets]).astype(np.int64)
    data = rng.standard_normal((V, D)).astype(np.float32)

    bag = torch.nn.EmbeddingBag(V, D, mode=mode)
    with torch.no_grad():
        bag.weight.copy_(torch.from_numpy(data))
    t_out = bag(torch.from_numpy(values), torch.from_numpy(offsets))

    padded, trunc = csr_to_padded(values, offsets)
    assert trunc == 0
    out = lookup(jnp.asarray(data), jnp.asarray(padded), combiner=mode,
                 pad_idx=-1)
    np.testing.assert_allclose(np.asarray(out), t_out.detach().numpy(),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# flax modules
# ---------------------------------------------------------------------------

def test_nn_embed_pad_idx():
    from embeddingtables_tpu.nn import Embed
    rng = np.random.default_rng(37)
    m = Embed(vocab=V, dim=D, combiner="mean", pad_idx=-1)
    idx = make_case(rng, -1)
    vars_ = m.init(jax.random.PRNGKey(0), idx)
    out = m.apply(vars_, idx)
    exp = numpy_ref(vars_["params"]["table"], np.asarray(idx), -1, "mean",
                    None)
    np.testing.assert_allclose(np.asarray(out), exp, atol=1e-5)


def test_nn_sparse_embed_pad_idx_grads():
    from embeddingtables_tpu.nn import (SparseEmbed, apply_sparse_updates,
                                        sparse_updates_from_grads)
    rng = np.random.default_rng(41)
    m = SparseEmbed(vocab=V, dim=D, pad_idx=-1)
    idx = make_case(rng, -1)
    vars_ = m.init(jax.random.PRNGKey(0), idx)
    params = vars_["params"]
    perts = vars_["perturbations"]

    def loss_fn(params, perts):
        out, inter = m.apply({"params": params, "perturbations": perts}, idx,
                             mutable=["intermediates"])
        return (out ** 2).sum(), inter

    (_, inter), grads = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)(
        params, perts)
    upds = sparse_updates_from_grads(grads, inter["intermediates"])
    upd = upds["delta"]
    g_lazy = uncompress(upd, V)

    def dense_loss(table):
        return (lookup_oracle(table, idx, "sum", None, pad_idx=-1) ** 2).sum()

    g_dense = jax.grad(dense_loss)(params["table"])
    np.testing.assert_allclose(np.asarray(g_lazy), np.asarray(g_dense),
                               atol=1e-4)
    new_params, _ = apply_sparse_updates(params, upds, SparseSGD(lr=0.1))
    exp = np.asarray(params["table"]) - 0.1 * np.asarray(g_dense)
    np.testing.assert_allclose(np.asarray(new_params["table"]), exp,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# External oracle: torch.nn.EmbeddingBag(padding_idx=...)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["sum", "mean"])
def test_torch_embedding_bag_parity(mode):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(43)
    data = rng.standard_normal((V, D)).astype(np.float32)
    pad = 0  # torch requires 0 <= padding_idx < vocab
    idx = rng.integers(1, V, size=(B, BAG)).astype(np.int64)
    idx = np.where(rng.random((B, BAG)) < 0.3, pad, idx)
    idx[1, :] = pad  # empty bag

    bag = torch.nn.EmbeddingBag(V, D, mode=mode, padding_idx=pad)
    with torch.no_grad():
        bag.weight.copy_(torch.from_numpy(data))
        bag.weight[pad] = 0.0  # torch zeroes the pad row at init; match it
    t_idx = torch.from_numpy(idx)
    t_out = bag(t_idx)
    delta = rng.standard_normal((B, D)).astype(np.float32)
    (t_out * torch.from_numpy(delta)).sum().backward()
    t_grad = bag.weight.grad.detach().numpy()

    data_j = jnp.asarray(data).at[pad].set(0.0)
    out, pb = lookup_vjp(data_j, jnp.asarray(idx.astype(np.int32)),
                         combiner=mode, pad_idx=pad)
    np.testing.assert_allclose(np.asarray(out), t_out.detach().numpy(),
                               atol=1e-5)
    g = np.asarray(uncompress(pb(jnp.asarray(delta)), V))
    np.testing.assert_allclose(g, t_grad, atol=1e-4)


def test_torch_embedding_bag_weighted_sum_parity():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(47)
    data = rng.standard_normal((V, D)).astype(np.float32)
    pad = 0
    idx = rng.integers(1, V, size=(B, BAG)).astype(np.int64)
    idx = np.where(rng.random((B, BAG)) < 0.3, pad, idx)
    w = rng.random((B, BAG)).astype(np.float32) + 0.1

    bag = torch.nn.EmbeddingBag(V, D, mode="sum", padding_idx=pad)
    with torch.no_grad():
        bag.weight.copy_(torch.from_numpy(data))
        bag.weight[pad] = 0.0
    t_out = bag(torch.from_numpy(idx),
                per_sample_weights=torch.from_numpy(w))
    data_j = jnp.asarray(data).at[pad].set(0.0)
    out = lookup(data_j, jnp.asarray(idx.astype(np.int32)), combiner="sum",
                 weights=jnp.asarray(w), pad_idx=pad)
    np.testing.assert_allclose(np.asarray(out), t_out.detach().numpy(),
                               atol=1e-5)
