"""PyTorch interop: import/export embedding weights across ecosystems.

The reference's compat layer plugs its tables into Flux/Zygote
(`/root/reference/src/sparseupdate.jl:160-189`); the ecosystem a TPU
engine must interoperate with is PyTorch — production DLRM checkpoints
live in `nn.Embedding` / `nn.EmbeddingBag` state dicts (torchrec et al.).
This module moves weights both ways with exact semantics:

  - torch `nn.Embedding(V, D).weight`            <-> `SimpleEmbedding`
    (both row-major `(vocab, dim)`: zero-copy semantics, no transpose —
    one advantage of this package's layout choice over the reference's
    `(dim, vocab)`).
  - a list of per-table weights                  <-> `StackedTables`
    (the one-gather ensemble), offsets rebuilt from the vocab sizes.
  - `lookup(t, idx)`   == `nn.Embedding(idx)`     (non-reducing)
  - `lookup(t, bags)`  == `nn.EmbeddingBag(mode="sum"|"mean")(bags)`
    (reducing; same fixed-bag contract as the reference `README.md:22-25`)

torch is imported lazily: the package works without it; these helpers
raise a clear error if torch is missing.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax.numpy as jnp

from .ops.ensemble import StackedTables
from .tables import SimpleEmbedding, as_table


def _torch():
    try:
        import torch
        return torch
    except ImportError as e:   # pragma: no cover - torch is in this image
        raise ImportError("torch interop requires pytorch installed") from e


def _weight_of(src) -> np.ndarray:
    """Accept an nn.Embedding/nn.EmbeddingBag, a Parameter/Tensor, or a
    numpy array; return a `(vocab, dim)` float numpy array."""
    torch = _torch()
    if hasattr(src, "weight"):
        src = src.weight
    if isinstance(src, torch.Tensor):
        src = src.detach().cpu().numpy()
    arr = np.asarray(src)
    if arr.ndim != 2:
        raise ValueError(f"expected (vocab, dim) weights, got {arr.shape}")
    return arr


def from_torch(src, *, name: str | None = None) -> SimpleEmbedding:
    """`nn.Embedding` / `nn.EmbeddingBag` / `(V, D)` tensor -> table."""
    return SimpleEmbedding(jnp.asarray(_weight_of(src)), name=name)


def to_torch_embedding(table, *, bag: bool = False, mode: str = "sum"):
    """Table -> `nn.Embedding` (or `nn.EmbeddingBag` with `bag=True`),
    weights copied. Works for any protocol table with a dense
    materialization (`SimpleEmbedding.data`, or `materialize()` on the
    compressed/tiered types)."""
    torch = _torch()
    t = as_table(table)
    data = getattr(t, "data", None)
    if data is None:
        data = t.materialize()
    w = torch.from_numpy(np.asarray(data).astype(np.float32, copy=True))
    v, d = w.shape
    if bag:
        m = torch.nn.EmbeddingBag(v, d, mode=mode)
    else:
        m = torch.nn.Embedding(v, d)
    with torch.no_grad():
        m.weight.copy_(w)
    return m


def stacked_from_torch(sources: Sequence) -> StackedTables:
    """Per-table torch weights -> ONE stacked `(ΣV, D)` ensemble array
    (the engine's one-gather ensemble form)."""
    ws = [_weight_of(s) for s in sources]
    dims = {w.shape[1] for w in ws}
    if len(dims) != 1:
        raise ValueError(f"stacked tables need one dim, got {sorted(dims)}")
    offs, acc = [0], 0
    for w in ws:
        acc += w.shape[0]
        offs.append(acc)
    data = jnp.asarray(np.concatenate(ws, axis=0))
    return StackedTables(data=data, offsets=tuple(offs), dim=ws[0].shape[1])


def stacked_to_torch(tables: StackedTables) -> List:
    """StackedTables -> list of `nn.Embedding`s (one per sub-table)."""
    torch = _torch()
    arr = np.asarray(tables.data)
    out = []
    for i in range(tables.ntables):
        w = arr[tables.offsets[i]:tables.offsets[i + 1]]
        m = torch.nn.Embedding(w.shape[0], w.shape[1])
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(w.astype(np.float32, copy=True)))
        out.append(m)
    return out
