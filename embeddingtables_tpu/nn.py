"""flax.linen integration: embedding-table modules for stock flax models.

Reference L6 analog (SURVEY.md §1): the reference plugs into its ecosystem's
NN library (Flux) so embedding tables drop into ordinary models and training
loops (`/root/reference/src/sparseupdate.jl:160-189`). flax is that library
here. Two modules:

  - `Embed`: plain dense-gradient embedding — `jax.grad` produces the
    scatter-add table gradient through flax's standard loop, exactly the
    Zygote-on-a-dense-matrix behavior (`src/lookup.jl:5-13`). Right for
    small tables or when a stock optax chain owns everything.

  - `SparseEmbed`: the LAZY discipline inside stock flax. The table is
    `stop_gradient`-ed (no dense table cotangent is ever built) and the
    looked-up activations are routed through `Module.perturb`, so
    `jax.grad` w.r.t. the "perturbations" collection yields exactly the
    per-example `delta` rows; the module `sow`s its indices (and effective
    combiner weights). `sparse_updates_from_grads` then pairs the two into
    `SparseEmbeddingUpdate`s, and `apply_sparse_updates` runs the fused
    optimizer step on the tables — one write per unique row, no table-sized
    gradient anywhere (the reference's rrule + `update!` flow,
    `src/sparseupdate.jl:35-40,160-178`).

Training-loop shape (see tests/test_nn.py for the runnable version):

    vars_ = model.init(key, idx)                  # params + perturbations
    def loss_fn(params, perturbations):
        out, inter = model.apply(
            {"params": params, "perturbations": perturbations}, idx,
            mutable=["intermediates"])
        return loss(out), inter
    (l, inter), grads = jax.value_and_grad(loss_fn, argnums=1,
                                           has_aux=True)(params, perts)
    upds = sparse_updates_from_grads(grads, inter)
    params = apply_sparse_updates(params, upds, opt, opt_states)
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

import flax.linen as fnn

from .ops.lookup import effective_weights, lookup
from .ops.sparse_update import SparseEmbeddingUpdate


def _default_init(key, shape, dtype):
    vocab, dim = shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(dim, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -scale, scale)


class Embed(fnn.Module):
    """Dense-gradient embedding table (the plain-matrix behavior).

    indices `(B,)` or `(B, bag)` -> `(B, dim)`; combiner/weights as in
    `lookup`. Gradients flow densely to the `table` param.
    """

    vocab: int
    dim: int
    combiner: str = "sum"
    pad_idx: Optional[int] = None
    param_dtype: Any = jnp.float32
    table_init: Callable = _default_init

    @fnn.compact
    def __call__(self, indices, weights=None):
        table = self.param("table", self.table_init,
                           (self.vocab, self.dim), self.param_dtype)
        return lookup(table, indices, combiner=self.combiner,
                      weights=weights, pad_idx=self.pad_idx)


class SparseEmbed(fnn.Module):
    """Lazy-gradient embedding table for stock flax training loops.

    The table never receives a dense cotangent: activations pass through a
    zero `perturb` slot (grads w.r.t. the "perturbations" collection ARE
    the per-example delta rows), and the lookup indices + effective
    combiner weights are `sow`n into "intermediates". Pair them with
    `sparse_updates_from_grads` + `apply_sparse_updates`.
    """

    vocab: int
    dim: int
    combiner: str = "sum"
    pad_idx: Optional[int] = None
    param_dtype: Any = jnp.float32
    table_init: Callable = _default_init

    @fnn.compact
    def __call__(self, indices, weights=None):
        table = self.param("table", self.table_init,
                           (self.vocab, self.dim), self.param_dtype)
        indices = jnp.asarray(indices)
        out = lookup(jax.lax.stop_gradient(table), indices,
                     combiner=self.combiner, weights=weights,
                     pad_idx=self.pad_idx)
        out = self.perturb("delta", out)
        eff = effective_weights(indices, self.combiner, weights,
                                self.pad_idx)
        self.sow("intermediates", "lookup",
                 (indices, eff if eff is not None else ()))
        return out


def sparse_updates_from_grads(perturb_grads, intermediates):
    """Pair perturbation gradients with sown (indices, weights) into a
    pytree of `SparseEmbeddingUpdate`s, keyed like the modules.

    perturb_grads: grad w.r.t. the "perturbations" collection (same tree
    structure as the collection: {module_path: {"delta": (B, D)}}).
    intermediates: the mutable "intermediates" collection from apply().
    """
    def walk(g, inter):
        if isinstance(g, dict):
            out = {}
            for k, v in g.items():
                if k == "delta":
                    idx, eff = inter["lookup"][0]
                    # sow stores () when there are no effective weights.
                    w = None if isinstance(eff, tuple) else eff
                    out[k] = SparseEmbeddingUpdate(delta=v, indices=idx,
                                                   weights=w)
                else:
                    out[k] = walk(v, inter[k])
            return out
        raise TypeError(f"unexpected grads leaf {type(g)}")

    return walk(perturb_grads, intermediates)


def apply_sparse_updates(params, updates, opt, states=None):
    """Apply fused sparse steps to every `table` param that has a paired
    update. Returns (new_params, new_states); `states` maps the same tree
    positions to `SparseOptState`s (None initializes them).
    """
    def walk(p, u, s):
        if isinstance(p, dict):
            new_p, new_s = {}, {}
            for k, v in p.items():
                uk = u.get(k) if isinstance(u, dict) else None
                sk = s.get(k) if isinstance(s, dict) else None
                if k == "table" and isinstance(
                        u, dict) and "delta" in u:
                    upd = u["delta"]
                    st = sk if sk is not None else opt.init(v)
                    nv, ns = opt.apply(v, upd, st)
                    new_p[k], new_s[k] = nv, ns
                else:
                    nv, ns = walk(v, uk if uk is not None else {},
                                  sk if sk is not None else {})
                    new_p[k], new_s[k] = nv, ns
            return new_p, new_s
        return p, s

    return walk(params, updates, states or {})
