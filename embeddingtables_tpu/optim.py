"""Sparse optimizers: fused, dedup-correct row updates for embedding tables.

Reference parity (citations into /root/reference):
  - `Flux.Optimise.update!(opt::Descent, table, upd::SparseEmbeddingUpdate)`
    (`src/sparseupdate.jl:160-189`)      -> `SparseSGD`
  - the accumulate-per-unique-row-then-one-write discipline
    (`src/sparseupdate.jl:97-129`)       -> dedup path used by stateful
    optimizers here (a requirement, not an optimization, once per-row state
    exists: each unique row's state must advance exactly once per step).

The reference specializes only SGD. Production DLRM training (the workload
this engine serves, `README.md:174-176` in the reference) uses row-wise
AdaGrad for embeddings, so that is provided as well — `SparseRowWiseAdaGrad`
keeps ONE scalar accumulator per vocab row (V floats, not V*D), the standard
memory-frugal variant.

Dense (MLP) parameters use plain optax; these classes exist only for the
sparse/lazy-gradient path where materializing a table-sized gradient would
defeat the point (SURVEY.md §2.4 item 5).

All updates are functional: `apply` returns (new_table_data, new_state).
Under jit with donated buffers XLA performs them in place.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ops.indexer import IndexerResult, flatten_indices, index
from .ops.sparse_update import SparseEmbeddingUpdate
from .rounding import stochastic_cast


class SparseOptState(NamedTuple):
    """Per-table optimizer state. `accum` is `(vocab,)` for row-wise AdaGrad,
    or a zero-size placeholder for stateless SGD."""

    accum: jax.Array


class SparseAdamState(NamedTuple):
    """Lazy-Adam state: full `(vocab, dim)` f32 first/second moments plus
    the global step count (bias correction uses the global step, the
    TF-LazyAdam convention)."""

    m: jax.Array
    v: jax.Array
    count: jax.Array


class SparseFTRLState(NamedTuple):
    """FTRL-Proximal state: per-coordinate `(vocab, dim)` f32 accumulated
    adjusted gradient `z` and squared-gradient sum `n` (McMahan et al. 2013,
    "Ad Click Prediction: a View from the Trenches", Alg. 1)."""

    z: jax.Array
    n: jax.Array


def _occurrence_grads(upd: SparseEmbeddingUpdate, row_offset: int = 0):
    """Per-occurrence (rows, grad) streams; `row_offset` shifts local table
    rows into a stacked-ensemble global row space. Streaming-repeat bag
    fan-out + optional weights (ops.sparse_update.occurrence_values)."""
    from .ops.sparse_update import occurrence_values
    rows, vals = occurrence_values(upd)
    return rows + row_offset, vals


# Measured crossover on v5e (scratch/probe_segsum_apply.py, n=1.7M, D=128,
# f32-exact accumulation): segsum 11.0 ms vs scatter 16.0 at vpad=256,
# ~parity at 512, LOSES from 1024 up (21.6 vs 16.0 — the one-hot FLOPs
# grow linearly in vpad while the scatter stays flat at ~9.4 ns/occ for
# small tables). The VMEM budget is never the binding constraint.
_SEGSUM_MAX_VPAD = 512


def _segsum_vpad(data) -> Optional[int]:
    """Padded segment count when the MXU one-hot segment-accumulate
    (`ops.pallas.segsum`) beats the XLA scatter for this table's
    dense-grad accumulation: tiny-vocab tables (measured crossover
    ~512 padded rows on v5e) with lane-aligned feature dims. Returns
    None when the scatter is the right tool."""
    v, d = data.shape
    vpad = -(-v // 128) * 128
    if d % 128 == 0 and vpad <= _SEGSUM_MAX_VPAD:
        return vpad
    return None


def _dense_grad(data, rows, g, grad_dtype=None):
    """Duplicate-accumulated (V, D) f32 dense gradient (the sort-free dedup
    primitive, docs/DESIGN.md §1e).

    Realization dispatch: tiny-vocab lane-aligned tables (padded vocab
    <= 512, the measured v5e crossover — see _SEGSUM_MAX_VPAD above) use
    the MXU one-hot segment-accumulate in f32-exact mode; everything else
    uses the XLA scatter-add. Both honor drop semantics for out-of-range
    row sentinels (segment ids outside the padded range match no one-hot
    lane; ids in the pad region land on rows the trim discards).

    `grad_dtype` (None = f32, the exact default) sets the SCRATCH dtype of
    the scatter realization — the perf/precision knob behind the
    optimizers' `dense_grad_dtype` field (docs/DESIGN.md §11): a bf16
    scratch halves the grad buffer's write+read streams, measured
    -4.4 ms/step at bench scale (probe_ada_bf16.py U1 50.1 -> U2 45.7),
    at ~3e-3 max relative gradient error from bf16 accumulation on
    duplicate hits. The result is ALWAYS f32 (downstream math unchanged);
    the segsum realization stays f32-exact (tiny scratch, dtype cannot
    matter)."""
    vpad = _segsum_vpad(data)
    if vpad is not None and rows.size > 0:
        from .ops.pallas.segsum import hot_accumulate
        try:
            return hot_accumulate(rows, g.astype(jnp.float32), vpad,
                                  compute_dtype=jnp.float32)[:data.shape[0]]
        except ValueError:
            # Trace-time constraint, e.g. pallas_call inside shard_map
            # requires a vma spec (the sharded exchanges run these bodies
            # per shard) — the scatter realization below is always legal.
            pass
    sdt = jnp.float32 if grad_dtype is None else jnp.dtype(grad_dtype)
    if not jnp.issubdtype(sdt, jnp.floating):
        # e.g. "int32" would silently truncate every sub-1 gradient to
        # zero, turning the whole update into a no-op.
        raise ValueError(
            f"dense_grad_dtype must be a floating dtype, got {sdt}")
    return jnp.zeros(data.shape, sdt).at[rows].add(
        g.astype(sdt), mode="drop").astype(jnp.float32)


def _touched(grad_dense):
    """(V,) bool: rows carrying any gradient this step. (A true-zero
    accumulated gradient is indistinguishable from untouched — for LAZY
    regularization semantics that coincidence is harmless.)"""
    return jnp.any(grad_dense != 0.0, axis=-1)


def _clip_rows(grad_dense, clipnorm):
    """Per-row L2 clip of the ACCUMULATED row gradient (clipping must
    follow dedup: clip(Σg), not Σclip(g))."""
    if clipnorm is None:
        return grad_dense
    norm = jnp.linalg.norm(grad_dense, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, clipnorm / jnp.maximum(norm, 1e-12))
    return grad_dense * scale


# ---------------------------------------------------------------------------
# Shard-shaped dense-grad update bodies — the ONE source of truth for the
# sort-free dedup math (docs/DESIGN.md §1e). Used by the single-chip
# optimizers below AND by the sharded exchanges (parallel/dlrm.py,
# parallel/alltoall.py), so clip/decay/eps fixes land everywhere at once.
# `rows` may carry out-of-bounds drop sentinels (>= data.shape[0]).
# ---------------------------------------------------------------------------

def sgd_dense_body(data: jax.Array, rows: jax.Array, g: jax.Array,
                   lr, weight_decay: float = 0.0,
                   clipnorm: Optional[float] = None,
                   rounding_key=None, grad_dtype=None) -> jax.Array:
    """`data[r] -= lr * clip(Σ g_r)` with lazy decay on touched rows.
    `rounding_key` + bf16 storage -> stochastic rounding on the ONE cast
    back to storage dtype (rounding.py); untouched rows must stay exact
    fixed points, so SR applies only where a gradient landed."""
    grad = _clip_rows(_dense_grad(data, rows, g, grad_dtype), clipnorm)
    new = data.astype(jnp.float32) - lr * grad
    if weight_decay == 0.0:
        # Mask-free, SR included: untouched rows give new == data exactly
        # (grad = 0), and the SR cast is EXACT on already-representable
        # values (low mantissa bits are zero; sub-ulp noise truncates
        # back) — so no touched select is needed.
        return stochastic_cast(new, data.dtype, rounding_key)
    touched = _touched(grad)
    new = new * jnp.where(touched, 1.0 - lr * weight_decay, 1.0)[:, None]
    out = stochastic_cast(new, data.dtype, rounding_key)
    if rounding_key is not None:
        out = jnp.where(touched[:, None], out, data)
    return out


def adagrad_dense_body(data: jax.Array, accum: jax.Array, rows: jax.Array,
                       g: jax.Array, lr, eps, weight_decay: float = 0.0,
                       clipnorm: Optional[float] = None,
                       rounding_key=None, grad_dtype=None):
    """Row-wise-AdaGrad dense-grad pass: returns (new_data, new_accum).
    accum: (V,) f32. One state advance + one row write per touched row;
    untouched rows are exact fixed points (incl. the eps=0 case — the step
    is masked so 0 * rsqrt(0) never surfaces)."""
    grad = _clip_rows(_dense_grad(data, rows, g, grad_dtype), clipnorm)
    g2 = jnp.mean(jnp.square(grad), axis=-1)
    new_accum = accum + g2
    denom = jax.lax.rsqrt(jnp.maximum(new_accum + eps, 1e-30))
    step = lr * grad * denom[:, None]
    if weight_decay == 0.0:
        # Untouched rows are exact fixed points WITHOUT a mask, SR
        # included: grad = 0 gives step = 0 * denom = 0 exactly (the
        # 1e-30 clamp keeps rsqrt finite even at eps = 0, accum = 0), and
        # the SR cast is EXACT on already-representable values (low
        # mantissa bits zero; sub-ulp noise truncates back). The touched
        # mask's extra table-wide passes cost +4.7 ms/step on the benched
        # config and buy nothing here — the round-2 94.4->98.7 ms drift
        # was bisected to exactly that mask (docs/DESIGN.md §1g).
        return stochastic_cast(data.astype(jnp.float32) - step,
                               data.dtype, rounding_key), new_accum
    touched = _touched(grad)
    new = (data.astype(jnp.float32)
           - jnp.where(touched[:, None], step, 0.0))
    new = new * jnp.where(touched, 1.0 - lr * weight_decay, 1.0)[:, None]
    out = stochastic_cast(new, data.dtype, rounding_key)
    if rounding_key is not None:
        out = jnp.where(touched[:, None], out, data)
    return out, new_accum


def adam_dense_body(data: jax.Array, m: jax.Array, v: jax.Array, t,
                    rows: jax.Array, g: jax.Array, lr, b1, b2, eps,
                    weight_decay: float = 0.0,
                    clipnorm: Optional[float] = None, rounding_key=None,
                    grad_dtype=None):
    """Lazy-Adam dense-grad pass: returns (new_data, new_m, new_v).
    m/v: (V, D) f32 moments; `t` the GLOBAL step (bias correction uses the
    global count, the TF-LazyAdam convention). Touched rows advance their
    moments and take a step; untouched rows are exact fixed points. Shared
    by the single-chip `SparseLazyAdam.apply` and the sharded exchange
    (rows may carry an out-of-bounds drop sentinel there)."""
    grad = _clip_rows(_dense_grad(data, rows, g, grad_dtype), clipnorm)
    touched = _touched(grad)[:, None]
    new_m = jnp.where(touched, b1 * m + (1 - b1) * grad, m)
    new_v = jnp.where(touched, b2 * v + (1 - b2) * grad * grad, v)
    tf = t.astype(jnp.float32) if hasattr(t, "astype") else float(t)
    mhat = new_m / (1 - b1 ** tf)
    vhat = new_v / (1 - b2 ** tf)
    step = lr * mhat / (jnp.sqrt(vhat) + eps)
    new_data = data.astype(jnp.float32) - jnp.where(touched, step, 0.0)
    if weight_decay != 0.0:
        new_data = new_data * jnp.where(touched, 1.0 - lr * weight_decay,
                                        1.0)
    out = stochastic_cast(new_data, data.dtype, rounding_key)
    if rounding_key is not None:
        out = jnp.where(touched, out, data)
    return out, new_m, new_v


def apply_dense_tx(params, grads, dense_tx, state, lr):
    """Dense (tower) parameter update, shared by every model family's
    single-chip AND sharded train steps: plain SGD when `dense_tx` is None,
    else the optax GradientTransformation (state rides the model pytree —
    replicated on meshes, since towers are replicated).
    Returns (new_params, new_state)."""
    if dense_tx is None:
        return jax.tree.map(lambda p, g: (p - lr * g).astype(p.dtype),
                            params, grads), state
    updates, new_state = dense_tx.update(grads, state, params)
    return jax.tree.map(lambda p, u: (p + u).astype(p.dtype),
                        params, updates), new_state


def ftrl_init_arrays(data: jax.Array, alpha, beta, l1, l2, initial_accum):
    """(z0, n0) that REPRODUCE the current weights under FTRL's closed form:
    z0 = -w0·((beta + sqrt(n0))/alpha + l2) - sign(w0)·l1 (zero where w0 is
    zero). The ONE source of this invariant — `SparseFTRL.init` and the
    sharded `init_sharded_ftrl_state` both call it; without it the first
    touch of a row would snap its weights to the l1-shrunk origin."""
    w0 = data.astype(jnp.float32)
    n0 = jnp.full(data.shape, initial_accum, jnp.float32)
    denom = (beta + jnp.sqrt(n0)) / alpha + l2
    z0 = jnp.where(w0 != 0.0, -w0 * denom - jnp.sign(w0) * l1, 0.0)
    return z0, n0


def ftrl_dense_body(data: jax.Array, z: jax.Array, n: jax.Array,
                    rows: jax.Array, g: jax.Array, alpha, beta, l1, l2,
                    clipnorm: Optional[float] = None, rounding_key=None,
                    grad_dtype=None):
    """FTRL-Proximal dense-grad pass: returns (new_data, new_z, new_n).

    Per touched row (per-coordinate math, McMahan et al. 2013 Alg. 1):

        n' = n + g^2
        z' = z + g - ((sqrt(n') - sqrt(n)) / alpha) * w
        w' = 0                                   if |z'| <= l1
             -(z' - sign(z') * l1) / ((beta + sqrt(n')) / alpha + l2)  else

    The weight is a CLOSED FORM of (z, n), so dedup is mandatory (duplicate
    occurrences must accumulate into g before the one state advance) and
    untouched rows are exact fixed points. `rows` may carry OOB drop
    sentinels. The l1 term yields exact zeros — FTRL's trained-sparsity
    property, the reason it is the classic CTR optimizer."""
    grad = _clip_rows(_dense_grad(data, rows, g, grad_dtype), clipnorm)
    touched = _touched(grad)[:, None]
    w = data.astype(jnp.float32)
    new_n = n + grad * grad
    sigma = (jnp.sqrt(new_n) - jnp.sqrt(n)) / alpha
    new_z = jnp.where(touched, z + grad - sigma * w, z)
    new_n = jnp.where(touched, new_n, n)
    denom = (beta + jnp.sqrt(new_n)) / alpha + l2
    w_new = jnp.where(jnp.abs(new_z) > l1,
                      -(new_z - jnp.sign(new_z) * l1) / denom, 0.0)
    new_data = jnp.where(touched, w_new, w)
    out = stochastic_cast(new_data, data.dtype, rounding_key)
    out = jnp.where(touched, out, data)
    return out, new_z, new_n


@dataclasses.dataclass(frozen=True)
class SparseFTRL:
    """FTRL-Proximal for embedding tables (beyond the reference) — the
    classic sparse CTR optimizer (McMahan et al. 2013; TF `FtrlOptimizer`
    semantics): per-coordinate adaptive learning rate plus l1/l2
    regularization with EXACT zeros (trained sparsity).

    lr is FTRL's alpha. State: two table-sized f32 buffers (z, n). The
    weight is a closed form of the state, so `init(data)` solves for the z
    that reproduces the initial table exactly (z0 = -w0 * ((beta +
    sqrt(n0)) / alpha + l2) - sign(w0) * l1); without that, the first touch
    of a row would snap its weights to the l1-shrunk origin. Lazy: only
    rows with gradient this step advance (touched-row granularity; within a
    touched row, zero-gradient coordinates recompute to their current value
    exactly in f32 — for bf16 tables the recompute re-rounds, so use f32
    tables with FTRL)."""

    lr: float = 0.05          # FTRL alpha
    beta: float = 1.0
    l1: float = 0.0
    l2: float = 0.0
    initial_accum: float = 0.0  # n0
    clipnorm: Optional[float] = None
    stochastic_rounding: bool = False
    # Dense-grad SCRATCH dtype (None = f32, exact) — see
    # SparseRowWiseAdaGrad.dense_grad_dtype / docs/DESIGN.md §11.
    dense_grad_dtype: Optional[str] = None

    def init(self, data: jax.Array) -> SparseFTRLState:
        return SparseFTRLState(*ftrl_init_arrays(
            data, self.lr, self.beta, self.l1, self.l2, self.initial_accum))

    def apply(self, data: jax.Array, upd: SparseEmbeddingUpdate,
              state: SparseFTRLState, *, row_offset: int = 0, lr=None,
              key=None):
        # Unlike SGD/AdaGrad/Adam, alpha is BAKED INTO the accumulated z
        # state (w is a closed form of (z, n) at this alpha, and init
        # solved z0 at self.lr). Honoring a different lr here would
        # reinterpret all past state at the new alpha and snap every
        # touched row (e.g. 5x weight shrink for lr/5) — so the uniform
        # schedule kwarg is accepted only at its fixed value.
        if lr is not None and lr != self.lr:
            raise ValueError(
                "SparseFTRL cannot change lr per step: alpha is baked into "
                "the accumulated z state. Build a new SparseFTRL and "
                "re-init (or keep lr fixed).")
        if self.stochastic_rounding and key is None:
            raise ValueError("stochastic_rounding=True needs apply(key=...)")
        rows, g = _occurrence_grads(upd, row_offset)
        out, new_z, new_n = ftrl_dense_body(
            data, state.z, state.n, rows, g, self.lr, self.beta, self.l1,
            self.l2, self.clipnorm,
            rounding_key=key if self.stochastic_rounding else None,
            grad_dtype=self.dense_grad_dtype)
        return out, SparseFTRLState(z=new_z, n=new_n)


@dataclasses.dataclass(frozen=True)
class SparseSGD:
    """Stateless sparse SGD: `table[r] -= lr * Σ_{occ of r} delta` — the
    reference's only specialized optimizer (`src/sparseupdate.jl:42-129`).

    SGD is linear in the gradient, so a duplicate-accumulating scatter-add is
    bit-equivalent to the dedup path; the direct scatter is used (one XLA op,
    no sort).

    weight_decay / clipnorm (beyond the reference; both LAZY — they touch
    only rows with gradient this step, the standard sparse-training
    semantics): nonzero values route through the dense-grad dedup pass
    (decay needs one multiply per touched row; clipping must apply to the
    ACCUMULATED row gradient), costing one extra table pass."""

    lr: float = 0.01
    weight_decay: float = 0.0
    clipnorm: Optional[float] = None
    # bf16 tables: round the f32 step result stochastically so sub-ulp
    # steps accumulate in expectation (rounding.py). Requires `key=` on
    # apply and routes through the dense-grad realization (the direct
    # scatter RMWs in storage precision, where SR cannot be expressed).
    stochastic_rounding: bool = False
    # Dense-grad SCRATCH dtype (None = f32, exact). "bfloat16" halves the
    # scratch's write+read streams — measured -4.4 ms/step at bench scale
    # (docs/DESIGN.md §11) at ~3e-3 max relative gradient error from bf16
    # accumulation. Only reaches the DENSE realization (decay/clip/SR
    # here); the plain-SGD fast path scatters straight into the table
    # with no scratch and is already operand-stream-insensitive: a bf16
    # cast of its (-lr * delta) scatter operand measured a WASH at bench
    # scale (72.15 -> 72.11 ms, scratch/probe_sgd_delta16.py — the
    # scatter is issue-bound, DESIGN.md §12), so no analogous knob ships.
    dense_grad_dtype: Optional[str] = None

    def init(self, data: jax.Array) -> SparseOptState:
        return SparseOptState(accum=jnp.zeros((0,), data.dtype))

    def apply(self, data: jax.Array, upd: SparseEmbeddingUpdate,
              state: SparseOptState, *, row_offset: int = 0, lr=None,
              key=None):
        lr = self.lr if lr is None else lr
        rows, g = _occurrence_grads(upd, row_offset)
        if self.stochastic_rounding and key is None:
            raise ValueError("stochastic_rounding=True needs apply(key=...)")
        rkey = key if self.stochastic_rounding else None
        if (self.weight_decay == 0.0 and self.clipnorm is None
                and rkey is None):
            if _segsum_vpad(data) is not None:
                # Tiny-vocab lane-aligned tables: the MXU one-hot
                # segment-accumulate beats the scatter below the measured
                # vpad<=512 crossover (probe_segsum_apply.py); the dense
                # body also accumulates in f32 before the one cast back
                # to storage (tighter than per-occurrence RMW).
                return sgd_dense_body(data, rows, g, lr), state
            new = data.at[rows].add((-lr * g).astype(data.dtype))
            return new, state
        return sgd_dense_body(data, rows, g, lr, self.weight_decay,
                              self.clipnorm, rounding_key=rkey,
                              grad_dtype=self.dense_grad_dtype), state


@dataclasses.dataclass(frozen=True)
class SparseRowWiseAdaGrad:
    """Row-wise AdaGrad: one scalar accumulator per vocab row.

        G_r   += mean(g_r^2)            (g_r = deduped row gradient)
        row_r -= lr * g_r / sqrt(G_r + eps)

    Stateful, so the dedup discipline is mandatory: all occurrences of a row
    are segment-summed first, then the row and its accumulator are each
    written exactly once (the reference's unique-row single-write contract,
    `src/sparseupdate.jl:97-129`, SURVEY.md §2.4 item 8)."""

    lr: float = 0.01
    eps: float = 1e-8
    initial_accum: float = 0.0
    # LAZY regularizers (touched rows only); nonzero values force the
    # dense-grad realization (see SparseSGD docstring for why).
    weight_decay: float = 0.0
    clipnorm: Optional[float] = None
    # bf16 tables: SR on the one cast back to storage (rounding.py).
    # Needs apply(key=...) and the dense realization (the indexer path
    # RMWs rows in storage precision).
    stochastic_rounding: bool = False
    # Dense-grad SCRATCH dtype (None = f32, exact). "bfloat16" halves the
    # (V, D) grad buffer's write+read streams: measured -4.4 ms/step on
    # the bench-scale AdaGrad update (probe_ada_bf16.py: 50.1 -> 45.7 ms;
    # docs/DESIGN.md §11) at ~3e-3 max relative gradient error from bf16
    # accumulation on duplicate hits. Only the dense realization has the
    # knob, so setting it makes method="auto" pick dense. Two semantic
    # edges of the quantized scratch: a row whose accumulated gradient
    # quantizes to exactly bf16 zero is classified untouched (lazy
    # decay/clip/SR skip it that step), and sub-bf16-ulp per-occurrence
    # deltas can vanish before accumulation.
    dense_grad_dtype: Optional[str] = None
    # Dedup realization: "auto" | "dense" | "indexer".
    #   dense  : scatter-add deltas into a (V, D) f32 gradient buffer, then
    #            ONE fused elementwise table pass applies the row/state
    #            update — exactly-deduped by construction (untouched rows
    #            see g = 0 -> no state advance, no row step), ZERO sorts.
    #            Measured v5e (docs/DESIGN.md §1e): cuts the stacked-DLRM
    #            AdaGrad step from 196 ms to ~its scatter+pass floor.
    #   indexer: the round-1 sort-based path (index + segment_sum +
    #            drop-scatter) — O(n log n) and V-independent; right when
    #            the touched set is tiny relative to the vocabulary or the
    #            (V, D) scratch does not fit.
    #   auto   : dense when the occurrence count is a non-trivial fraction
    #            of the vocab (n * 16 >= V), else indexer.
    method: str = "auto"

    def init(self, data: jax.Array) -> SparseOptState:
        return SparseOptState(
            accum=jnp.full((data.shape[0],), self.initial_accum, jnp.float32))

    def apply(self, data: jax.Array, upd: SparseEmbeddingUpdate,
              state: SparseOptState, *, row_offset: int = 0, lr=None,
              idx_result: Optional[IndexerResult] = None,
              method: str | None = None, key=None):
        lr = self.lr if lr is None else lr
        rows, g = _occurrence_grads(upd, row_offset)
        method = method or self.method
        if self.stochastic_rounding and key is None:
            raise ValueError("stochastic_rounding=True needs apply(key=...)")
        regularized = (self.weight_decay != 0.0 or self.clipnorm is not None
                       or self.stochastic_rounding)
        if method == "auto":
            # An explicit idx_result means the caller amortized the sort.
            # A set dense_grad_dtype forces dense: the knob only exists on
            # the dense realization, and silently ignoring it (indexer
            # segment-sums in f32) would be a no-op the user asked against.
            if regularized or self.dense_grad_dtype is not None:
                method = "dense"
            elif idx_result is not None:
                method = "indexer"
            else:
                method = ("dense" if rows.size * 16 >= data.shape[0]
                          else "indexer")
        if regularized and method != "dense":
            raise ValueError(
                "weight_decay/clipnorm/stochastic_rounding require the "
                "dense realization (they apply per touched row)")
        if method == "dense":
            return self._apply_dense(
                data, rows, g, state, lr,
                rounding_key=key if self.stochastic_rounding else None)
        if idx_result is None:
            # Dedup over the (possibly shifted) occurrence stream.
            idx_result = index(rows.reshape(-1))
        n = idx_result.capacity
        acc_g = jax.ops.segment_sum(g.astype(jnp.float32), idx_result.group_of,
                                    num_segments=n)
        active = jnp.arange(n) < idx_result.num_unique
        # Out-of-bounds row id + mode="drop" disables padding lanes.
        target = jnp.where(active, idx_result.unique, data.shape[0])
        g2 = jnp.mean(jnp.square(acc_g), axis=-1)
        new_accum_rows = state.accum[jnp.clip(target, 0, data.shape[0] - 1)] + g2
        step = -lr * acc_g * jax.lax.rsqrt(new_accum_rows + self.eps)[:, None]
        new_data = data.at[target].add(step.astype(data.dtype), mode="drop")
        new_accum = state.accum.at[target].set(new_accum_rows, mode="drop")
        return new_data, SparseOptState(accum=new_accum)

    def _apply_dense(self, data, rows, g, state, lr, rounding_key=None):
        """Sort-free dedup: one duplicate-accumulating scatter into a dense
        (V, D) f32 gradient, then one fused elementwise pass.

        The accumulate-per-unique-row-then-single-write contract
        (`/root/reference/src/sparseupdate.jl:97-129`) holds exactly: the
        scatter performs the accumulation; the elementwise pass writes each
        row and its state once. Rows with zero gradient are fixed points
        (g = 0 -> accum += 0, row -= 0)."""
        new_data, new_accum = adagrad_dense_body(
            data, state.accum, rows, g, lr, self.eps, self.weight_decay,
            self.clipnorm, rounding_key=rounding_key,
            grad_dtype=self.dense_grad_dtype)
        return new_data, SparseOptState(accum=new_accum)


@dataclasses.dataclass(frozen=True)
class SparseLazyAdam:
    """Lazy Adam for embedding tables (beyond the reference): moments and
    rows advance ONLY for rows touched this step — the standard sparse-Adam
    semantics (a strict Adam would decay every row's moments every step,
    costing a full-table pass of state churn and changing untouched rows).

    Realized with the dense-grad dedup pass (docs/DESIGN.md §1e): one
    duplicate-accumulating scatter + fused elementwise passes over the
    `(V, D)` moments. Memory: two table-sized f32 buffers — right for
    models where quality wants Adam and the vocab fits; row-wise AdaGrad
    remains the memory-frugal default.

        m_r = b1*m_r + (1-b1)*g_r         (touched rows only)
        v_r = b2*v_r + (1-b2)*g_r^2
        row_r -= lr * (m_r/(1-b1^t)) / (sqrt(v_r/(1-b2^t)) + eps)

    weight_decay (lazy, decoupled/AdamW-style) and per-row clipnorm apply
    to touched rows only, like the other optimizers here.
    """

    lr: float = 0.001
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    clipnorm: Optional[float] = None
    # bf16 tables: SR on the cast back to storage (rounding.py); the f32
    # moments are exact either way. Needs apply(key=...).
    stochastic_rounding: bool = False
    # Dense-grad SCRATCH dtype (None = f32, exact) — see
    # SparseRowWiseAdaGrad.dense_grad_dtype / docs/DESIGN.md §11.
    dense_grad_dtype: Optional[str] = None

    def init(self, data: jax.Array) -> SparseAdamState:
        # m and v must be DISTINCT buffers: donated train steps alias each
        # pytree leaf to an output, and two leaves sharing one buffer is a
        # donation conflict (opaque TPU InvalidArgument at fetch time).
        return SparseAdamState(m=jnp.zeros(data.shape, jnp.float32),
                               v=jnp.zeros(data.shape, jnp.float32),
                               count=jnp.zeros((), jnp.int32))

    def apply(self, data: jax.Array, upd: SparseEmbeddingUpdate,
              state: SparseAdamState, *, row_offset: int = 0, lr=None,
              key=None):
        lr = self.lr if lr is None else lr
        if self.stochastic_rounding and key is None:
            raise ValueError("stochastic_rounding=True needs apply(key=...)")
        rows, g = _occurrence_grads(upd, row_offset)
        t = state.count + 1
        rkey = key if self.stochastic_rounding else None
        out, new_m, new_v = adam_dense_body(
            data, state.m, state.v, t, rows, g, lr, self.b1, self.b2,
            self.eps, self.weight_decay, self.clipnorm, rounding_key=rkey,
            grad_dtype=self.dense_grad_dtype)
        return out, SparseAdamState(m=new_m, v=new_v, count=t)


# ---------------------------------------------------------------------------
# Learning-rate schedules (beyond the reference: the reference's update! is
# fixed-eta SGD, /root/reference/src/sparseupdate.jl:160-178). These return
# plain callables step -> lr for the train loops' `lr_schedule=`; the value
# is passed into the jitted step as a TRACED scalar, so a schedule costs
# zero recompiles. FTRL cannot take a per-step lr (alpha is baked into its
# accumulated z state) — the loops reject that combination loudly.
# ---------------------------------------------------------------------------

def warmup_cosine_lr(base_lr: float, total_steps: int,
                     warmup_steps: int = 0, final_scale: float = 0.0):
    """Linear warmup to `base_lr` over `warmup_steps`, then cosine decay to
    `final_scale * base_lr` at `total_steps` (the standard CTR/LLM shape)."""
    import math

    def schedule(step: int) -> float:
        if warmup_steps and step < warmup_steps:
            return base_lr * (step + 1) / warmup_steps
        if total_steps <= warmup_steps:
            return base_lr
        frac = min(1.0, (step - warmup_steps)
                   / max(1, total_steps - warmup_steps))
        cos = 0.5 * (1.0 + math.cos(math.pi * frac))
        return base_lr * (final_scale + (1.0 - final_scale) * cos)

    return schedule


def warmup_constant_lr(base_lr: float, warmup_steps: int):
    """Linear warmup to `base_lr`, then constant."""

    def schedule(step: int) -> float:
        if warmup_steps and step < warmup_steps:
            return base_lr * (step + 1) / warmup_steps
        return base_lr

    return schedule
