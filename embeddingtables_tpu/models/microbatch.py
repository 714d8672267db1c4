"""Gradient accumulation (microbatching): the ONE home of the
slice -> scan -> unslice scaffolding.

Every model family's `microbatch=k` step (single-chip AND mesh) runs the
same shape program: split the batch into k equal slices, `lax.scan` the
forward/backward over them accumulating the dense-parameter gradients,
then reassemble the per-slice lazy embedding deltas into the full-batch
`(T, B, D)` arrays for ONE fused sparse-optimizer application. Only B/k
examples' activations are live at once — the lever for pushing B past the
activation-HBM limit (SURVEY.md §6 roofline framing; the reference's
single-node threads never faced it).

The math is grouping-independent — pointwise BCE, mean-of-means loss, a
1/B per-example delta scale — so any slicing reproduces the monolithic
step up to float re-association (parity-tested per family).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def microbatch_grads(params, dense, cat, label, k: int, slice_grads):
    """Run `slice_grads` over k batch slices and reassemble.

    slice_grads(d_i, c_i, l_i) -> (loss_i, dense_grads_i, deltas_i) where
    `deltas_i` is a tuple of per-slice `(T, mb, D_x)` lazy-delta arrays
    (one per stacked ensemble — DLRM/DCN pass one, DeepFM two).

    Returns `(loss, dense_grads, deltas)`: the mean-of-means loss, the
    dense grads averaged over slices (matching the full-batch mean-loss
    gradient), and each delta reassembled to `(T, B, D_x)` scaled by 1/k
    (full-batch loss = mean of the k slice means).
    """
    b = dense.shape[0]
    if b % k:
        raise ValueError(f"batch {b} not divisible by microbatch {k}")
    mb = b // k
    dense_s = dense.reshape(k, mb, dense.shape[1])
    cat_s = jnp.moveaxis(
        cat.reshape(cat.shape[0], k, mb, *cat.shape[2:]), 1, 0)
    label_s = label.reshape(k, mb)

    def micro(dg_acc, xs):
        loss_i, dg_i, deltas_i = slice_grads(*xs)
        return jax.tree.map(jnp.add, dg_acc, dg_i), \
            (loss_i,) + tuple(deltas_i)

    zeros = jax.tree.map(jnp.zeros_like, params)
    dg_sum, ys = jax.lax.scan(micro, zeros, (dense_s, cat_s, label_s))
    losses, deltas = ys[0], ys[1:]
    dense_grads = jax.tree.map(lambda x: x / k, dg_sum)
    t = cat.shape[0]
    full = tuple(
        d.transpose(1, 0, 2, 3).reshape(t, b, d.shape[3]) / k
        for d in deltas)
    return losses.mean(), dense_grads, full
