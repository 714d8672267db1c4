"""Framework-compat shims: optax and plain-`jax.grad` integration.

Reference L6 (SURVEY.md §1): the reference plugs its lazy sparse gradients
into Flux/Zygote via a `ProjectTo` overload and a `Flux.Optimise.update!`
method (`/root/reference/src/lookup.jl:246`, `src/sparseupdate.jl:180-189`),
so a stock Flux training loop "just works" on embedding tables. The JAX
equivalents:

1. `jax.grad` just works already — `lookup` on any table pytree is built
   from differentiable XLA ops, so differentiating a loss w.r.t. the table
   yields the (dense) scatter-add gradient, exactly like Zygote on a plain
   matrix. Fine for small tables; for big ones use the lazy path.

2. `sparse_gradient_transform(...)`: an optax `GradientTransformation` whose
   update accepts `SparseEmbeddingUpdate` leaves (mixed freely with dense
   leaves), letting embedding tables ride a stock optax training loop — the
   `Flux.Optimise.update!` overload analog. SGD and row-wise AdaGrad flavors.

3. `split_sparse` / `merge_sparse`: helpers to carve a grads pytree into its
   dense and sparse parts (optax chains for the dense towers, fused sparse
   updates for the tables).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ops.sparse_update import SparseEmbeddingUpdate
from .optim import SparseOptState, SparseRowWiseAdaGrad, SparseSGD


class GradientTransformation(NamedTuple):
    """Mirror of optax.GradientTransformation (init, update) so this module
    imports without optax; real optax transforms interoperate since the
    protocol is structural."""

    init: Any
    update: Any


def sparse_gradient_transform(sparse_opt=None) -> GradientTransformation:
    """Optax-style transform over pytrees whose leaves are jax Arrays (dense)
    or `SparseEmbeddingUpdate`s (lazy embedding gradients).

    `update(grads, state, params)` returns *updates to add* (optax
    convention: `params + updates`): dense leaves get `-lr * g`; sparse
    leaves get a fused one-write-per-unique-row sparse step computed against
    the corresponding param leaf (params are REQUIRED, as for any
    transform that needs them).
    """
    sparse_opt = sparse_opt or SparseSGD()

    def is_leaf(x):
        return isinstance(x, SparseEmbeddingUpdate)

    def init(params):
        def leaf_state(p):
            return sparse_opt.init(p) if isinstance(p, jax.Array) and p.ndim == 2 \
                else SparseOptState(accum=jnp.zeros((0,)))
        return jax.tree_util.tree_map(leaf_state, params)

    def update(grads, state, params=None):
        if params is None:
            raise ValueError(
                "sparse_gradient_transform requires params (the tables)")

        def one(g, s, p):
            if isinstance(g, SparseEmbeddingUpdate):
                new_p, new_s = sparse_opt.apply(p, g, s)
                return new_p - p, new_s          # optax delta convention
            lr = getattr(sparse_opt, "lr", 0.01)
            return jax.tree_util.tree_map(lambda x: -lr * x, g), s

        flat_g, treedef = jax.tree_util.tree_flatten(grads, is_leaf=is_leaf)
        flat_s = treedef.flatten_up_to(state)
        flat_p = treedef.flatten_up_to(params)
        out = [one(g, s, p) for g, s, p in zip(flat_g, flat_s, flat_p)]
        updates = treedef.unflatten([u for u, _ in out])
        new_state = treedef.unflatten([s for _, s in out])
        return updates, new_state

    return GradientTransformation(init=init, update=update)


def apply_updates(params, updates):
    """optax.apply_updates, restated so the shim stands alone."""
    return jax.tree_util.tree_map(lambda p, u: (p + u).astype(p.dtype)
                                  if u is not None else p, params, updates)


def split_sparse(grads):
    """Split a grads pytree into (dense_only, sparse_only) with None holes,
    for routing dense leaves through a stock optax chain and sparse leaves
    through the fused path."""
    def is_leaf(x):
        return isinstance(x, SparseEmbeddingUpdate)

    dense = jax.tree_util.tree_map(
        lambda g: None if isinstance(g, SparseEmbeddingUpdate) else g,
        grads, is_leaf=is_leaf)
    sparse = jax.tree_util.tree_map(
        lambda g: g if isinstance(g, SparseEmbeddingUpdate) else None,
        grads, is_leaf=is_leaf)
    return dense, sparse
