"""Column (feature-dim) sharding: the other tensor-parallel axis.

SURVEY.md §2.3's TP row names two decompositions of a `(V, D)` table:
rows (vocab) — `sharded.py`'s mod-row sharding with index routing — and
COLUMNS (features), realized here: device d owns the contiguous feature
slice `[d·D/n, (d+1)·D/n)` of EVERY row (the Megatron-style column-parallel
embedding).

When it wins (the tradeoff vs row sharding):

  - No index routing at all: every device gathers the full index stream
    against its column slice, so there is no per-row ownership, no capacity
    factor, no butterfly — POWER-LAW SKEW IS FREE (the row-sharded schemes
    concentrate hot-row traffic on single owners).
  - Exchange volume is the same `(B, D)` as the gather exchange (the
    all_to_all below moves each element once), plus the index all-gather.
  - HBM cost is `V·D/n` per device like row sharding — but the WHOLE vocab
    id space lives on every device, so it suits moderate-vocab wide-dim
    tables (content embeddings); beyond-HBM vocabularies still need rows.
  - Row-wise AdaGrad needs one extra `(V,)` psum per step: the accumulator
    tracks `mean_d(grad²)` over ALL features, and each device only sees
    D/n of them. That collective is proportional to the vocab — acceptable
    for the wide-dim tables this layout targets, wasteful for huge-V ones
    (use row sharding there).

Exchange shape (batch and columns sharded over the SAME axis, the standard
hybrid): lookup all-gathers the local `(B/n,)` indices, gathers `(B, D/n)`
locally, then ONE all_to_all turns the (batch-replicated, col-sharded)
block into the (batch-sharded, col-complete) output. The update runs the
same exchange transposed: all_to_all the `(B/n, D)` deltas into `(B, D/n)`
column slices, then scatter-add on the local slice — race-free by COLUMN
ownership (each device writes only its features; duplicates accumulate in
the scatter like the single-chip path).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ensemble import StackedTables
from ..ops.sparse_update import SparseEmbeddingUpdate
from ..optim import SparseRowWiseAdaGrad, SparseSGD
from ..tables import SimpleEmbedding, as_table
from ..types import cdiv


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ColShardedStackedTables:
    """A (stacked) table column-sharded over one mesh axis.

    data:    `(n_shards, vocab, cols_local)` with the leading axis sharded
             `P(axis)` — device d holds columns `[d·cols_local, ...)` of
             every row (feature dim padded up to a multiple of n).
    offsets: per-table global row offsets (static).
    dim:     the true (unpadded) feature width.
    """

    data: jax.Array
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    dim: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.data.shape[0]

    @property
    def vocab(self) -> int:
        return self.data.shape[1]

    @property
    def ntables(self) -> int:
        return len(self.offsets) - 1

    @classmethod
    def shard(cls, mesh: Mesh, axis: str, tables) -> "ColShardedStackedTables":
        """Stack `tables` along the vocab axis and split the FEATURE dim
        over `mesh[axis]` (padded to a multiple of the axis size)."""
        if isinstance(tables, StackedTables):
            st = tables
        elif isinstance(tables, (list, tuple)):
            st = StackedTables.stack(tables)
        else:
            t = as_table(tables)
            st = StackedTables(data=t.data if isinstance(t, SimpleEmbedding)
                               else t.rows(jnp.arange(t.spec.vocab)),
                               offsets=(0, t.spec.vocab), dim=t.spec.dim)
        n = mesh.shape[axis]
        vocab, dim = st.data.shape
        d_pad = cdiv(dim, n) * n
        data = jnp.pad(st.data, ((0, 0), (0, d_pad - dim)))
        data = data.reshape(vocab, n, d_pad // n).transpose(1, 0, 2)
        data = jax.device_put(data, NamedSharding(mesh, P(axis)))
        return cls(data=data, offsets=st.offsets, dim=dim, axis=axis)

    def unshard(self) -> jax.Array:
        """Dense `(vocab, dim)` view (test oracle only)."""
        n, v, cl = self.data.shape
        return self.data.transpose(1, 0, 2).reshape(v, n * cl)[:, :self.dim]

    def table(self, t: int) -> jax.Array:
        return self.unshard()[self.offsets[t]:self.offsets[t + 1]]


def col_sharded_lookup(mesh: Mesh, ct: ColShardedStackedTables,
                       idx: jax.Array, *, batch_sharded: bool = True,
                       reducing: bool | None = None, combiner: str = "sum",
                       weights=None,
                       pad_idx: int | None = None) -> jax.Array:
    """Lookup on a column-sharded table: `(B,)` or `(B, bag)` GLOBAL stacked
    row ids (batch-sharded over the table's axis) -> `(B, dim)` batch-sharded
    the same way. No index routing; skew-free by construction.

    reducing: override bag detection — pass False for 2-D index streams
    that are NOT bags (e.g. an ensemble's `(B, T)` layout, returning
    `(B, T, dim)`), exactly like `sharded_lookup_a2a`.

    combiner / weights `(B, bag)` / pad_idx: the single-chip `lookup`
    contract on this exchange too — the fold (`sharded._fold_combiner`)
    turns them into one per-occurrence scale riding the index all-gather;
    pads remap to row 0 with scale 0 (global sentinels like -1 or
    `ct.vocab` both work: the remap happens before the gather)."""
    from .sharded import _fold_combiner
    axis = ct.axis
    n = ct.n_shards
    if reducing is None:
        reducing = idx.ndim == 2
    cols_local = ct.data.shape[2]
    scale = None
    if weights is not None or combiner != "sum" or pad_idx is not None:
        if not reducing and idx.ndim == 2:
            raise NotImplementedError(
                "combiner/weights/pad_idx with reducing=False (ensemble "
                "layouts) is not supported here — fold per-table masks "
                "outside, as the planner group does")
        idx, scale = _fold_combiner(idx, combiner, weights, pad_idx)

    def body(shard, lidx, *lscale):
        gidx = (jax.lax.all_gather(lidx, axis, tiled=True)
                if batch_sharded else lidx)
        flat = gidx.reshape(-1)
        part = jnp.take(shard[0], flat, axis=0)     # (B*?, cols_local)
        part = part.reshape(gidx.shape + (cols_local,))
        if lscale:
            gs = (jax.lax.all_gather(lscale[0], axis, tiled=True)
                  if batch_sharded else lscale[0])
            part = part * gs[..., None].astype(part.dtype)
        if reducing:
            part = part.sum(axis=1)                 # (B, cols_local)
        if not batch_sharded:
            # Replicated batch: assemble full features on every device.
            full = jax.lax.all_gather(part, axis, axis=-1, tiled=True)
            return full
        b = part.shape[0]
        inner = part.shape[1:-1]                    # () or (T,) non-reducing
        # (B, ..., cols_local) -> (B/n, ..., D_pad): one all_to_all
        # redistributes batch blocks against column blocks.
        blocks = part.reshape((n, b // n) + inner + (cols_local,))
        got = jax.lax.all_to_all(blocks, axis, split_axis=0, concat_axis=0,
                                 tiled=True)        # (n, B/n, ..., cl)
        moved = jnp.moveaxis(got, 0, -2)            # (B/n, ..., n, cl)
        return moved.reshape((b // n,) + inner + (n * cols_local,))

    spec = P(axis) if batch_sharded else P()
    operands = (ct.data, idx) + (() if scale is None else (scale,))
    in_specs = (P(axis), spec) + (() if scale is None else (spec,))
    out = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                        out_specs=spec,
                        # The replicated-batch branch assembles full
                        # features via all_gather — replicated by
                        # construction, unprovable statically.
                        check_vma=batch_sharded)(*operands)
    return out[..., :ct.dim]


def init_col_row_state(mesh: Mesh, ct: ColShardedStackedTables, opt):
    """Fresh optimizer state for a column-sharded stack, placed like the
    table (the colshard counterpart of `sharded.init_sharded_row_state`):

      - `SparseSGD`: None (stateless).
      - `SparseRowWiseAdaGrad`: replicated `(V,)` f32 accumulator (rows
        span all column shards; every device advances the identical copy
        after the step's psum).
      - `SparseLazyAdam`: `(m, v, count)` — moments shaped/sharded like
        `ct.data` (`(n, V, cols_local)` with `P(axis)`; per-coordinate
        state column-shards cleanly), replicated scalar count.
      - `SparseFTRL`: `(z, n)` like `ct.data`, solved per column slice
        from the current weights (`ftrl_init_arrays` is elementwise, so
        the padded zero columns get z=0/n=initial_accum harmlessly).
    """
    from ..optim import SparseFTRL, SparseLazyAdam, ftrl_init_arrays
    sharding = NamedSharding(mesh, P(ct.axis))
    if isinstance(opt, SparseLazyAdam):
        zeros = jax.jit(lambda: jnp.zeros(ct.data.shape, jnp.float32),
                        out_shardings=sharding)
        return zeros(), zeros(), jnp.zeros((), jnp.int32)
    if isinstance(opt, SparseFTRL):
        def gen(data):
            s = data.shape
            z, n_st = ftrl_init_arrays(
                data.reshape(-1, s[2]), opt.lr, opt.beta, opt.l1,
                opt.l2, opt.initial_accum)
            return z.reshape(s), n_st.reshape(s)
        return jax.jit(gen, out_shardings=(sharding, sharding))(ct.data)
    if isinstance(opt, SparseRowWiseAdaGrad):
        return jax.device_put(
            jnp.full((ct.vocab,), float(opt.initial_accum), jnp.float32),
            NamedSharding(mesh, P()))
    return None


def col_sharded_update(mesh: Mesh, ct: ColShardedStackedTables,
                       upd: SparseEmbeddingUpdate, opt,
                       accum=None, *, batch_sharded: bool = True, lr=None,
                       key=None):
    """Sparse update on a column-sharded table: SGD, row-wise AdaGrad,
    lazy Adam, or FTRL-Proximal.

    Each device receives every occurrence's slice of the delta via the
    transposed all_to_all, scatter-accumulates into a dense `(V, cols_local)`
    gradient (the sort-free dedup pass), and writes only its own columns —
    race-free by column ownership.

    Cross-slice row facts ride ONE fused `(V, 2)` psum when needed: the
    touched mask (a row whose gradient lands entirely in OTHER devices'
    columns must still advance its state here — single-chip `_touched`
    semantics) and the full-row sumsq, which serves both `clipnorm` (clip
    the ACCUMULATED full-row gradient) and AdaGrad's row second moment.
    Plain unregularized SGD skips the collective entirely. Per-coordinate
    state (Adam moments, FTRL z/n) column-shards cleanly and advances
    locally — each branch mirrors its `optim.*_dense_body` exactly (the
    bodies cannot be called directly because of the mid-body collective;
    keep them in sync when touching either).

    `accum` per optimizer (see `init_col_row_state`): None for SGD
    (returns `new_ct`), replicated `(V,)` for AdaGrad, `(m, v, count)`
    for Adam, `(z, n)` for FTRL (each returns `(new_ct, new_state)`).
    """
    from ..optim import SparseFTRL, SparseLazyAdam
    kind = ("adagrad" if isinstance(opt, SparseRowWiseAdaGrad) else
            "adam" if isinstance(opt, SparseLazyAdam) else
            "ftrl" if isinstance(opt, SparseFTRL) else
            "sgd" if isinstance(opt, SparseSGD) else None)
    if kind is None:
        raise NotImplementedError(type(opt).__name__)
    use_sr = bool(getattr(opt, "stochastic_rounding", False))
    if use_sr and key is None:
        raise ValueError(
            "opt.stochastic_rounding=True: pass a fresh PRNG key per step "
            "(col_sharded_update(key=); the train loops fold one in)")
    if kind == "sgd" and accum is not None:
        raise ValueError("accum is optimizer state; SparseSGD takes none "
                         "(and returns only the table)")
    if kind != "sgd" and accum is None:
        raise ValueError(f"{type(opt).__name__} needs accum= state "
                         "(init_col_row_state)")
    if lr is not None and kind == "ftrl":
        raise ValueError(
            "SparseFTRL cannot change lr per step: alpha is baked into "
            "the accumulated z state")
    lr_val = opt.lr if lr is None else lr
    wd = getattr(opt, "weight_decay", 0.0)
    clip = getattr(opt, "clipnorm", None)
    axis = ct.axis
    n = ct.n_shards
    cols_local = ct.data.shape[2]
    d_pad = n * cols_local
    reducing = upd.indices.ndim == 2
    w = (upd.weights if upd.weights is not None
         else jnp.ones(upd.indices.shape, jnp.float32))

    def local_grad(shard, lidx, ldelta, lw):
        """Dense-grad dedup of this device's column slice (sort-free)."""
        if batch_sharded:
            gidx = jax.lax.all_gather(lidx, axis, tiled=True)
        else:
            gidx = lidx
        # Deltas: pad features, then all_to_all so this device holds ITS
        # column slice of EVERY example's delta.
        d = ldelta.astype(jnp.float32)
        d = jnp.pad(d, ((0, 0), (0, d_pad - d.shape[1])))
        if batch_sharded:
            bl = d.shape[0]
            blocks = jnp.transpose(
                d.reshape(bl, n, cols_local), (1, 0, 2))   # (n, B/n, cl)
            mine = jax.lax.all_to_all(blocks, axis, split_axis=0,
                                      concat_axis=0, tiled=True)
            gdelta = mine.reshape(n * bl, cols_local)       # (B, cl)
        else:
            me = jax.lax.axis_index(axis)
            gdelta = jax.lax.dynamic_slice_in_dim(
                d, me * cols_local, cols_local, axis=1)
        gw = (jax.lax.all_gather(lw, axis, tiled=True)
              if batch_sharded else lw)
        flat = gidx.reshape(-1)
        vals = gdelta
        if reducing:
            vals = jnp.repeat(vals, gidx.shape[1], axis=0)
        vals = vals * gw.reshape(-1)[:, None]
        # Scratch dtype mirrors optim._dense_grad's opt-in knob
        # (dense_grad_dtype, docs/DESIGN.md §11); result stays f32.
        gdt = getattr(opt, "dense_grad_dtype", None)
        sdt = jnp.float32 if gdt is None else jnp.dtype(gdt)
        return jnp.zeros(shard[0].shape, sdt).at[flat].add(
            vals.astype(sdt), mode="drop").astype(jnp.float32)

    def row_stats(grad):
        """(touched, clipped grad, clipped full-row sumsq) via the ONE
        fused (V, 2) psum of [sumsq, touched]. Pad columns carry zero
        gradient, so they contribute nothing."""
        sumsq_local = jnp.square(grad).sum(axis=1)
        # _touched semantics (any nonzero grad element across ALL columns;
        # NOT sumsq > 0, which FTZ squaring can miss for tiny grads).
        touched_local = jnp.any(grad != 0.0, axis=1).astype(jnp.float32)
        stats = jax.lax.psum(
            jnp.stack([sumsq_local, touched_local], axis=1), axis)
        sumsq, touched = stats[:, 0], stats[:, 1] > 0
        if clip is not None:
            # optim._clip_rows with the norm from the psum; the row
            # second moment scales by s**2 without a second collective.
            norm = jnp.sqrt(sumsq)
            s = jnp.minimum(1.0, clip / jnp.maximum(norm, 1e-12))
            grad = grad * s[:, None]
            sumsq = sumsq * jnp.square(s)
        return touched, grad, sumsq

    def decay(new, touched):
        if wd != 0.0:
            new = new * jnp.where(touched, 1.0 - lr_val * wd, 1.0)[:, None]
        return new

    def body(shard, acc, lidx, ldelta, lw, *kd):
        # SR: per-device noise (fold the column index in); the cast is
        # EXACT on untouched rows (they recompute to their representable
        # value, and sub-ulp noise truncates back), so no select needed.
        from ..rounding import stochastic_cast
        rkey = (jax.random.fold_in(jax.random.wrap_key_data(kd[0]),
                                   jax.lax.axis_index(axis))
                if kd else None)
        grad = local_grad(shard, lidx, ldelta, lw)
        if kind == "sgd" and wd == 0.0 and clip is None:
            new = stochastic_cast(shard[0].astype(jnp.float32)
                                  - lr_val * grad, shard.dtype, rkey)
            return (new[None],)
        touched, grad, sumsq = row_stats(grad)
        wloc = shard[0].astype(jnp.float32)
        if kind == "sgd":
            new = decay(wloc - lr_val * grad, touched)
            return (stochastic_cast(new, shard.dtype, rkey)[None],)
        if kind == "adagrad":
            g2 = sumsq / ct.dim                             # (V,)
            new_acc = acc + g2
            denom = jax.lax.rsqrt(jnp.maximum(new_acc + opt.eps, 1e-30))
            step = lr_val * grad * denom[:, None]
            new = decay(wloc - jnp.where(touched[:, None], step, 0.0),
                        touched)
            new_acc = jnp.where(touched, new_acc, acc)
            return stochastic_cast(new, shard.dtype, rkey)[None], new_acc
        if kind == "adam":
            lm, lv, t_next = acc
            tmask = touched[:, None]
            new_m = jnp.where(tmask, opt.b1 * lm[0] + (1 - opt.b1) * grad,
                              lm[0])
            new_v = jnp.where(tmask,
                              opt.b2 * lv[0] + (1 - opt.b2) * grad * grad,
                              lv[0])
            tf = t_next.astype(jnp.float32)
            mhat = new_m / (1 - opt.b1 ** tf)
            vhat = new_v / (1 - opt.b2 ** tf)
            step = lr_val * mhat / (jnp.sqrt(vhat) + opt.eps)
            new = decay(wloc - jnp.where(tmask, step, 0.0), touched)
            return (stochastic_cast(new, shard.dtype, rkey)[None],
                    new_m[None], new_v[None])
        # FTRL-Proximal: per-coordinate closed form with the global
        # touched mask (zero-grad coordinates of a touched row recompute
        # to their current value exactly in f32, as on a single chip).
        lz, ln = acc
        tmask = touched[:, None]
        new_n = ln[0] + grad * grad
        sigma = (jnp.sqrt(new_n) - jnp.sqrt(ln[0])) / opt.lr
        new_z = jnp.where(tmask, lz[0] + grad - sigma * wloc, lz[0])
        new_n = jnp.where(tmask, new_n, ln[0])
        denom = (opt.beta + jnp.sqrt(new_n)) / opt.lr + opt.l2
        w_new = jnp.where(jnp.abs(new_z) > opt.l1,
                          -(new_z - jnp.sign(new_z) * opt.l1) / denom, 0.0)
        new = jnp.where(tmask, w_new, wloc)
        return (new[None].astype(shard.dtype), new_z[None], new_n[None])

    spec = P(axis) if batch_sharded else P()
    extra = () if not use_sr else (jax.random.key_data(key),)
    extra_spec = () if not use_sr else (P(),)
    if kind == "adagrad":
        new_data, new_acc = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(), spec, spec, spec) + extra_spec,
            out_specs=(P(axis), P()))(ct.data, accum, upd.indices,
                                      upd.delta, w, *extra)
        return dataclasses.replace(ct, data=new_data), new_acc
    if kind == "adam":
        m, v, count = accum
        t_next = count + 1
        new_data, new_m, new_v = jax.shard_map(
            lambda shard, lm, lv, lidx, ldelta, lw, *kd: body(
                shard, (lm, lv, t_next), lidx, ldelta, lw, *kd),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), spec, spec, spec)
            + extra_spec,
            out_specs=(P(axis), P(axis), P(axis)))(
                ct.data, m, v, upd.indices, upd.delta, w, *extra)
        return (dataclasses.replace(ct, data=new_data),
                (new_m, new_v, t_next))
    if kind == "ftrl":
        z, n_state = accum
        new_data, new_z, new_n = jax.shard_map(
            lambda shard, lz, ln, lidx, ldelta, lw: body(
                shard, (lz, ln), lidx, ldelta, lw),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), spec, spec, spec),
            out_specs=(P(axis), P(axis), P(axis)))(
                ct.data, z, n_state, upd.indices, upd.delta, w)
        return (dataclasses.replace(ct, data=new_data), (new_z, new_n))
    new_data = jax.shard_map(
        lambda shard, lidx, ldelta, lw, *kd: body(shard, None, lidx,
                                                  ldelta, lw, *kd)[0],
        mesh=mesh, in_specs=(P(axis), spec, spec, spec) + extra_spec,
        out_specs=P(axis))(ct.data, upd.indices, upd.delta, w, *extra)
    return dataclasses.replace(ct, data=new_data)
