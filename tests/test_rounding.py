"""Stochastic rounding: bit-level contract + bf16 training effect."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embeddingtables_tpu as et
from embeddingtables_tpu.optim import (SparseLazyAdam, SparseRowWiseAdaGrad,
                                       SparseSGD)
from embeddingtables_tpu.rounding import (stochastic_cast,
                                          stochastic_round_to_bf16)


def _bf16_neighbors(x: float):
    lo = np.float32(jnp.asarray(x, jnp.float32).astype(jnp.bfloat16)
                    .astype(jnp.float32))
    # Walk one bf16 ulp in each direction via the bit pattern.
    b = np.frombuffer(np.float32(lo).tobytes(), np.uint32)[0]
    up = np.frombuffer(np.uint32(b + (1 << 16)).tobytes(), np.float32)[0]
    dn = np.frombuffer(np.uint32(b - (1 << 16)).tobytes(), np.float32)[0]
    return float(dn), float(lo), float(up)


def test_sr_lands_on_neighbors_only():
    # x strictly between two bf16 representables: SR must return one of
    # exactly those two, never anything else.
    x = np.float32(1.0 + 2 ** -10)       # between 1.0 and 1.0078125
    outs = set()
    for i in range(200):
        out = stochastic_round_to_bf16(jnp.full((4,), x), jax.random.key(i))
        outs.update(np.asarray(out.astype(jnp.float32)).tolist())
    assert outs == {1.0, 1.0078125}, outs


def test_sr_unbiased():
    # E[SR(x)] = x: frequency of rounding up equals the fractional
    # distance. x = 1.0 + k/8 ulp -> P(up) = k/8.
    ulp = 2 ** -7                         # bf16 ulp in [1, 2)
    for k in (1, 3, 5, 7):
        x = np.float32(1.0 + (k / 8) * ulp)
        ups = 0
        n = 3000
        out = stochastic_round_to_bf16(
            jnp.full((n,), x), jax.random.key(k))
        ups = float((np.asarray(out.astype(jnp.float32)) > 1.0).mean())
        assert abs(ups - k / 8) < 0.05, (k, ups)


def test_sr_exact_and_special_values():
    vals = jnp.asarray([0.0, -0.0, 1.0, -2.5, 2.0 ** -100,
                        np.inf, -np.inf, np.nan], jnp.float32)
    out = stochastic_round_to_bf16(vals, jax.random.key(0))
    got = np.asarray(out.astype(jnp.float32))
    # Exactly-representable values unchanged; specials preserved.
    assert got[0] == 0.0 and got[2] == 1.0 and got[3] == -2.5
    assert np.isposinf(got[5]) and np.isneginf(got[6]) and np.isnan(got[7])


def test_sr_negative_unbiased():
    # Same contract on the negative side (sign-magnitude truncation).
    ulp = 2 ** -7
    x = np.float32(-(1.0 + 0.5 * ulp))
    out = stochastic_round_to_bf16(jnp.full((4000,), x), jax.random.key(9))
    frac_dn = float((np.asarray(out.astype(jnp.float32)) < -1.0).mean())
    assert abs(frac_dn - 0.5) < 0.05, frac_dn


def test_stochastic_cast_passthrough():
    x = jnp.asarray([1.1, 2.2], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(stochastic_cast(x, jnp.float32, jax.random.key(0))),
        np.asarray(x))
    assert stochastic_cast(x, jnp.bfloat16, None).dtype == jnp.bfloat16


def test_bf16_sub_ulp_steps_accumulate_under_sr():
    # The motivating failure: a step of 1/16 ulp rounds to nothing under
    # nearest, forever. Under SR the row drifts by the true sum in
    # expectation.
    V, D, steps = 4, 8, 400
    ulp = 2 ** -7
    step = ulp / 16
    data0 = jnp.ones((V, D), jnp.bfloat16)
    idx = jnp.arange(V, dtype=jnp.int32)
    upd = et.SparseEmbeddingUpdate(
        delta=jnp.full((V, D), step, jnp.float32), indices=idx)

    nearest = SparseSGD(lr=1.0)
    sr = SparseSGD(lr=1.0, stochastic_rounding=True)
    d_n, d_s = data0, data0
    s_n, s_s = nearest.init(d_n), sr.init(d_s)
    for i in range(steps):
        d_n, s_n = nearest.apply(d_n, upd, s_n)
        d_s, s_s = sr.apply(d_s, upd, s_s, key=jax.random.key(i))
    # Nearest: frozen at 1.0 exactly.
    np.testing.assert_array_equal(np.asarray(d_n.astype(jnp.float32)), 1.0)
    # SR: mean drift ~= steps * step = 25/128 ~= 0.195 (downward, since
    # the update subtracts) within statistical tolerance.
    drift = 1.0 - float(np.asarray(d_s.astype(jnp.float32)).mean())
    expect = steps * step
    assert 0.6 * expect < drift < 1.4 * expect, (drift, expect)


def test_sr_untouched_rows_are_exact_fixed_points():
    V, D = 10, 4
    data = (1.0 + jnp.arange(V * D, dtype=jnp.float32).reshape(V, D)
            / 64.0).astype(jnp.bfloat16)
    # Step > one bf16 ulp so touched rows move under ANY noise draw (a
    # sub-ulp step only moves with ~step/ulp probability per element —
    # asserting "touched changed" on that would be draw-dependent).
    upd = et.SparseEmbeddingUpdate(
        delta=jnp.ones((2, D), jnp.float32) * 0.02,
        indices=jnp.asarray([3, 7], jnp.int32))
    for opt in (SparseSGD(lr=0.5, stochastic_rounding=True),
                SparseRowWiseAdaGrad(lr=0.5, stochastic_rounding=True,
                                     method="dense"),
                SparseLazyAdam(lr=0.5, stochastic_rounding=True)):
        new, _ = opt.apply(data, upd, opt.init(data), key=jax.random.key(0))
        keep = np.setdiff1d(np.arange(V), [3, 7])
        np.testing.assert_array_equal(
            np.asarray(new.astype(jnp.float32))[keep],
            np.asarray(data.astype(jnp.float32))[keep])
        assert not np.array_equal(
            np.asarray(new.astype(jnp.float32))[[3, 7]],
            np.asarray(data.astype(jnp.float32))[[3, 7]])


def test_sr_requires_key_and_dense_method():
    data = jnp.ones((4, 4), jnp.bfloat16)
    upd = et.SparseEmbeddingUpdate(delta=jnp.ones((1, 4)),
                                   indices=jnp.asarray([0]))
    sgd = SparseSGD(stochastic_rounding=True)
    with pytest.raises(ValueError, match="key"):
        sgd.apply(data, upd, sgd.init(data))
    ada = SparseRowWiseAdaGrad(stochastic_rounding=True, method="indexer")
    with pytest.raises(ValueError, match="dense"):
        ada.apply(data, upd, ada.init(data), key=jax.random.key(0))


def test_sr_matches_f32_training_in_expectation():
    # bf16+SR training tracks the f32 trajectory: train the same toy
    # regression in f32 and bf16+SR; final losses must be close.
    rng = np.random.default_rng(0)
    V, D, B = 32, 16, 16
    target = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    init = 0.1 * jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    opt32 = SparseSGD(lr=2.0)
    opt16 = SparseSGD(lr=2.0, stochastic_rounding=True)
    d32, d16 = init, init.astype(jnp.bfloat16)
    s32, s16 = opt32.init(d32), opt16.init(d16)
    for i in range(200):
        idx = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
        for which in ("f32", "bf16"):
            if which == "f32":
                out = jnp.take(d32, idx, axis=0)
                err = out - target[idx]
                upd = et.SparseEmbeddingUpdate(delta=2 * err / err.size,
                                               indices=idx)
                d32, s32 = opt32.apply(d32, upd, s32)
            else:
                out = jnp.take(d16, idx, axis=0).astype(jnp.float32)
                err = out - target[idx]
                upd = et.SparseEmbeddingUpdate(delta=2 * err / err.size,
                                               indices=idx)
                d16, s16 = opt16.apply(d16, upd, s16,
                                       key=jax.random.key(1000 + i))
    l32 = float(((d32 - target) ** 2).mean())
    l16 = float(((d16.astype(jnp.float32) - target) ** 2).mean())
    assert l32 < 0.05, l32
    # bf16+SR lands within noise of the f32 result (quantization noise
    # floor ~ulp^2), far below the initial loss (~1.0).
    assert l16 < l32 + 0.01, (l32, l16)


def test_train_dlrm_sr_wiring():
    """SR threads end to end through the single-chip train loop: a fresh key
    per step reaches the optimizer, tables stay bf16, training runs. The
    sharded placements reject SR loudly (keys are not threaded through
    shard_map yet)."""
    import numpy as np
    import pytest
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad

    cfg = DLRMConfig(vocab_sizes=(30, 20), num_dense=4, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32, param_dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)

    def batches():
        while True:
            cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                            for v in cfg.vocab_sizes])
            yield dict(dense=rng.normal(size=(16, 4)).astype(np.float32),
                       cat=cat, label=(cat[0] % 2).astype(np.float32))

    opt = SparseRowWiseAdaGrad(lr=0.05, stochastic_rounding=True)
    res = train_dlrm(cfg, batches(), 5, sparse_opt=opt, dense_lr=0.05,
                     log_every=1, verbose=False)
    assert res.model.tables.data.dtype == jnp.bfloat16
    assert np.isfinite(res.losses[-1])

    # Both mesh exchanges: SR rides the exchange (replicated key data,
    # per-shard fold) — bf16 tables keep training on the mesh.
    from embeddingtables_tpu.parallel.mesh import default_mesh
    from embeddingtables_tpu.optim import SparseLazyAdam
    mesh = default_mesh(("data",))
    for exchange in ("gather", "a2a"):
        for mesh_opt in (opt,
                         SparseLazyAdam(lr=0.05, stochastic_rounding=True)):
            res_m = train_dlrm(cfg, batches(), 4, sparse_opt=mesh_opt,
                               dense_lr=0.05, log_every=1, verbose=False,
                               mesh=mesh, exchange=exchange)
            assert res_m.model.tables.data.dtype == jnp.bfloat16
            assert np.isfinite(res_m.losses[-1])


def test_sr_wiring_other_families():
    """table_dtype + SR thread through the DCN, DeepFM, and two-tower
    single-chip steps and loops (the DLRM pattern, uniformly)."""
    import numpy as np
    from embeddingtables_tpu.models import DCNConfig, DeepFMConfig
    from embeddingtables_tpu.models.two_tower import TwoTowerConfig
    from embeddingtables_tpu.models.train import (train_dcn, train_deepfm,
                                                  train_two_tower)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad

    opt = SparseRowWiseAdaGrad(lr=0.05, stochastic_rounding=True)
    rng = np.random.default_rng(4)

    def ctr_batches(vocabs):
        while True:
            cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                            for v in vocabs])
            yield dict(dense=rng.normal(size=(16, 4)).astype(np.float32),
                       cat=cat, label=(cat[0] % 2).astype(np.float32))

    cfg_dcn = DCNConfig(vocab_sizes=(30, 20), num_dense=4, dim=8,
                        num_cross=1, cross_rank=None, deep_mlp=(8,),
                        compute_dtype=jnp.float32,
                        table_dtype=jnp.bfloat16)
    res = train_dcn(cfg_dcn, ctr_batches(cfg_dcn.vocab_sizes), 3,
                    sparse_opt=opt, dense_lr=0.05, log_every=1,
                    verbose=False)
    assert res.model.tables.data.dtype == jnp.bfloat16
    assert np.isfinite(res.losses[-1])

    cfg_fm = DeepFMConfig(vocab_sizes=(30, 20), num_dense=4, dim=8,
                          deep_mlp=(8,), compute_dtype=jnp.float32,
                          table_dtype=jnp.bfloat16)
    res = train_deepfm(cfg_fm, ctr_batches(cfg_fm.vocab_sizes), 3,
                       sparse_opt=opt, dense_lr=0.05, log_every=1,
                       verbose=False)
    assert res.model.tables.data.dtype == jnp.bfloat16
    # Folded (default) layout: first-order weights ride the fused stack.
    assert res.model.fm_w is None
    assert res.model.tables.dim == cfg_fm.dim + 1
    assert np.isfinite(res.losses[-1])

    cfg_tt = TwoTowerConfig(query_vocab_sizes=(30, 20), item_vocab=40,
                            num_dense=2, dim=8, embed_dim=8,
                            query_mlp=(8,), item_mlp=(8,),
                            table_dtype=jnp.bfloat16)

    def tt_batches():
        while True:
            yield dict(dense=rng.normal(size=(8, 2)).astype(np.float32),
                       q_cat=np.stack(
                           [rng.integers(0, v, 8).astype(np.int32)
                            for v in cfg_tt.query_vocab_sizes]),
                       item_ids=rng.integers(0, 40, 8).astype(np.int32))

    res = train_two_tower(cfg_tt, tt_batches(), 3, sparse_opt=opt,
                          dense_lr=0.05, log_every=1, verbose=False)
    assert res.model.query_tables.data.dtype == jnp.bfloat16
    assert res.model.item_table.data.dtype == jnp.bfloat16
    assert np.isfinite(res.losses[-1])


def test_sharded_sr_untouched_rows_fixed():
    """On the mesh, SR must round ONLY rows that received gradient: after a
    sharded SR step touching a handful of rows, every other row is bitwise
    the original (per-shard keys must not perturb foreign/untouched rows)."""
    import numpy as np
    from embeddingtables_tpu.models import DLRMConfig, init_dlrm
    from embeddingtables_tpu.models.dlrm import make_train_step
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.dlrm import (batch_shardings,
                                                   make_sharded_train_step,
                                                   shard_dlrm, unshard_dlrm)
    from embeddingtables_tpu.parallel.mesh import default_mesh

    cfg = DLRMConfig(vocab_sizes=(64, 40), num_dense=4, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32, table_dtype=jnp.bfloat16)
    opt = SparseRowWiseAdaGrad(lr=0.1, stochastic_rounding=True)
    rng = np.random.default_rng(11)
    mesh = default_mesh(("data",))
    model0 = init_dlrm(jax.random.key(0), cfg, sparse_opt=opt)
    data0 = np.asarray(model0.tables.data.astype(jnp.float32))
    sharded = shard_dlrm(model0, mesh, "data", sparse_opt=opt)
    step = make_sharded_train_step(cfg, mesh, sparse_opt=opt, dense_lr=0.1)
    sd, sc, sl = batch_shardings(mesh)
    # 8 examples touching at most 16 global rows.
    cat = np.stack([rng.integers(0, v, 8).astype(np.int32)
                    for v in cfg.vocab_sizes])
    dense = rng.normal(size=(8, 4)).astype(np.float32)
    label = (cat[0] % 2).astype(np.float32)
    new_model, _ = step(sharded,
                        jax.device_put(jnp.asarray(dense), sd),
                        jax.device_put(jnp.asarray(cat), sc),
                        jax.device_put(jnp.asarray(label), sl),
                        key=jax.random.key(3))
    new_data = np.asarray(unshard_dlrm(new_model).tables.data
                          .astype(jnp.float32))
    touched = np.unique(np.concatenate(
        [cat[t] + model0.tables.offsets[t] for t in range(2)]))
    keep = np.setdiff1d(np.arange(data0.shape[0]), touched)
    np.testing.assert_array_equal(new_data[keep], data0[keep])
    assert not np.array_equal(new_data[touched], data0[touched])


def test_sr_wiring_sharded_families():
    """SR rides the DCN / DeepFM / two-tower SHARDED steps too (all via
    _sharded_sparse_apply's key threading)."""
    import numpy as np
    from embeddingtables_tpu.models import DCNConfig, DeepFMConfig
    from embeddingtables_tpu.models.two_tower import TwoTowerConfig
    from embeddingtables_tpu.models.train import (train_dcn, train_deepfm,
                                                  train_two_tower)
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.mesh import default_mesh

    opt = SparseRowWiseAdaGrad(lr=0.05, stochastic_rounding=True)
    rng = np.random.default_rng(6)
    mesh = default_mesh(("data",))

    def ctr_batches(vocabs):
        while True:
            cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                            for v in vocabs])
            yield dict(dense=rng.normal(size=(16, 4)).astype(np.float32),
                       cat=cat, label=(cat[0] % 2).astype(np.float32))

    cfg_dcn = DCNConfig(vocab_sizes=(32, 24), num_dense=4, dim=8,
                        num_cross=1, cross_rank=None, deep_mlp=(8,),
                        compute_dtype=jnp.float32,
                        table_dtype=jnp.bfloat16)
    res = train_dcn(cfg_dcn, ctr_batches(cfg_dcn.vocab_sizes), 3,
                    sparse_opt=opt, dense_lr=0.05, log_every=1,
                    verbose=False, mesh=mesh)
    assert res.model.tables.data.dtype == jnp.bfloat16
    assert np.isfinite(res.losses[-1])

    cfg_fm = DeepFMConfig(vocab_sizes=(32, 24), num_dense=4, dim=8,
                          deep_mlp=(8,), compute_dtype=jnp.float32,
                          table_dtype=jnp.bfloat16)
    res = train_deepfm(cfg_fm, ctr_batches(cfg_fm.vocab_sizes), 3,
                       sparse_opt=opt, dense_lr=0.05, log_every=1,
                       verbose=False, mesh=mesh)
    assert res.model.tables.data.dtype == jnp.bfloat16
    assert np.isfinite(res.losses[-1])

    cfg_tt = TwoTowerConfig(query_vocab_sizes=(32, 24), item_vocab=40,
                            num_dense=2, dim=8, embed_dim=8,
                            query_mlp=(8,), item_mlp=(8,),
                            table_dtype=jnp.bfloat16)

    def tt_batches():
        while True:
            yield dict(dense=rng.normal(size=(8, 2)).astype(np.float32),
                       q_cat=np.stack(
                           [rng.integers(0, v, 8).astype(np.int32)
                            for v in cfg_tt.query_vocab_sizes]),
                       item_ids=rng.integers(0, 40, 8).astype(np.int32))

    res = train_two_tower(cfg_tt, tt_batches(), 3, sparse_opt=opt,
                          dense_lr=0.05, log_every=1, verbose=False,
                          mesh=mesh)
    assert res.model.query_tables.data.dtype == jnp.bfloat16
    assert np.isfinite(res.losses[-1])


def test_sr_wiring_planner():
    """SR rides the planner's replicated + row-sharded groups; a plan with
    col_shard tables rejects loudly."""
    import numpy as np
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    from embeddingtables_tpu.parallel.mesh import default_mesh
    from embeddingtables_tpu.parallel.planner import plan_sharding

    opt = SparseRowWiseAdaGrad(lr=0.05, stochastic_rounding=True)
    rng = np.random.default_rng(13)
    mesh = default_mesh(("data",))
    vocabs = (24, 4000)  # small -> replicate, big -> row-shard

    def batches():
        while True:
            cat = np.stack([rng.integers(0, v, 16).astype(np.int32)
                            for v in vocabs])
            yield dict(dense=rng.normal(size=(16, 4)).astype(np.float32),
                       cat=cat, label=(cat[0] % 2).astype(np.float32))

    cfg = DLRMConfig(vocab_sizes=vocabs, num_dense=4, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32, table_dtype=jnp.bfloat16)
    plan = plan_sharding(vocabs, cfg.dim, mesh,
                         replicate_max_bytes=1024)  # force table 1 sharded
    assert plan.replicated and plan.sharded  # mixed placement premise
    res = train_dlrm(cfg, batches(), 3, sparse_opt=opt, dense_lr=0.05,
                     log_every=1, verbose=False, mesh=mesh, plan=plan)
    assert np.isfinite(res.losses[-1])

    # Column-sharded group: SR rides it too (per-device column noise).
    plan_col = plan_sharding(vocabs, cfg.dim, mesh,
                             replicate_max_bytes=1024, col_shard=[1])
    if plan_col.col_sharded:
        res_c = train_dlrm(cfg, batches(), 3, sparse_opt=opt,
                           dense_lr=0.05, log_every=1, verbose=False,
                           mesh=mesh, plan=plan_col)
        assert np.isfinite(res_c.losses[-1])
