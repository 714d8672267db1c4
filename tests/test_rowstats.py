"""Row-lifecycle management: frequency EMA, eviction, relayout round trips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embeddingtables_tpu as et
from embeddingtables_tpu.optim import SparseLazyAdam, SparseRowWiseAdaGrad
from embeddingtables_tpu.utils.rowstats import (FrequencyTracker, evict_rows,
                                                inverse_permutation,
                                                relayout, remap_batch,
                                                reset_rows_state)


def test_tracker_ema_and_rankings():
    tr = FrequencyTracker(10, decay=0.5)
    tr.observe([1, 1, 1, 2])
    tr.observe([2, 2, 3])
    # counts: row1 = 3*0.5 = 1.5; row2 = 1*0.5 + 2 = 2.5; row3 = 1.
    np.testing.assert_allclose(tr.counts[[1, 2, 3]], [1.5, 2.5, 1.0])
    np.testing.assert_array_equal(tr.top_rows(2), [2, 1])
    assert tr.top_rows(0).size == 0
    # Cold = SEEN then stale; never-seen rows are never eviction candidates.
    assert tr.cold_rows(0.0).size == 0
    assert set(tr.cold_rows(2.0)) == {1, 3}
    popped = tr.pop_cold(2.0)
    assert set(popped) == {1, 3}
    # Popped rows are not re-reported until they reappear.
    assert tr.cold_rows(2.0).size == 0
    tr.observe([1])
    assert 1 not in set(tr.cold_rows(0.0))  # count now > 0
    assert 0 < tr.coverage(1) < 1
    # After the extra observe([1]): row1 = 1.75, row2 = 1.25, row3 = 0.5.
    perm = tr.frequency_permutation()
    assert perm[0] == 1 and perm[1] == 2 and perm[2] == 3
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(perm[inv], np.arange(10))


def test_evict_and_state_reset():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((20, 8)).astype(np.float32))
    rows = jnp.asarray([3, 7, 15], jnp.int32)

    z = evict_rows(data, rows)
    np.testing.assert_array_equal(np.asarray(z)[[3, 7, 15]],
                                  np.zeros((3, 8), np.float32))
    keep = np.setdiff1d(np.arange(20), [3, 7, 15])
    np.testing.assert_array_equal(np.asarray(z)[keep], np.asarray(data)[keep])

    fresh = evict_rows(data, rows, init_fn=jax.random.normal,
                       key=jax.random.key(1))
    assert not np.allclose(np.asarray(fresh)[3], np.asarray(data)[3])
    np.testing.assert_array_equal(np.asarray(fresh)[keep],
                                  np.asarray(data)[keep])
    with pytest.raises(ValueError, match="PRNG key"):
        evict_rows(data, rows, init_fn=jax.random.normal)
    # Empty eviction set: no-op.
    np.testing.assert_array_equal(
        np.asarray(evict_rows(data, jnp.zeros((0,), jnp.int32))),
        np.asarray(data))

    ada = SparseRowWiseAdaGrad()
    st = ada.init(data)
    st = type(st)(accum=st.accum + 5.0)
    st2 = reset_rows_state(st, rows)
    assert (np.asarray(st2.accum)[[3, 7, 15]] == 0).all()
    assert (np.asarray(st2.accum)[keep] == 5.0).all()

    adam = SparseLazyAdam()
    ast = adam.init(data)
    ast = type(ast)(m=ast.m + 1.0, v=ast.v + 2.0, count=ast.count + 9)
    ast2 = reset_rows_state(ast, rows)
    assert (np.asarray(ast2.m)[[3, 7, 15]] == 0).all()
    assert (np.asarray(ast2.v)[keep] == 2.0).all()
    assert int(ast2.count) == 9          # scalar leaves untouched


def test_relayout_roundtrip_preserves_lookup():
    rng = np.random.default_rng(2)
    V, D, B = 30, 8, 50
    data = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    tr = FrequencyTracker(V, decay=1.0)
    cat = rng.integers(0, V, (2, B)).astype(np.int32)
    tr.observe(cat)
    perm = tr.frequency_permutation()
    inv = inverse_permutation(perm)

    new_data = relayout(data, perm)
    remapped = remap_batch(cat, [inv, inv])
    # lookup(relayout(data), inv[idx]) == lookup(data, idx)
    for t in range(2):
        np.testing.assert_array_equal(
            np.asarray(et.lookup(new_data, jnp.asarray(remapped[t]))),
            np.asarray(et.lookup(data, jnp.asarray(cat[t]))))
    # Hot rows moved to the front: row perm[0] is the most frequent.
    counts = np.bincount(cat.reshape(-1), minlength=V)
    assert counts[perm[0]] == counts.max()


def test_eviction_in_training_loop():
    """Evict-and-reinit inside a tiny training loop: rows that appeared
    early then went stale lose their learned values + state; live rows keep
    training; never-seen rows are not eviction candidates."""
    rng = np.random.default_rng(3)
    V, D, B = 24, 8, 16
    data = jnp.zeros((V, D), jnp.float32)
    target = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    opt = SparseRowWiseAdaGrad(lr=0.5)
    st = opt.init(data)
    tr = FrequencyTracker(V, decay=0.9)
    tr.observe(np.arange(12, 24))            # stale rows appear ONCE
    hot = np.arange(12)                      # then only rows 0..11
    for i in range(30):
        idx_np = rng.choice(hot, B)
        tr.observe(idx_np)
        idx = jnp.asarray(idx_np.astype(np.int32))
        out, pull = et.lookup_vjp(data, idx)
        data, st = opt.apply(data, pull(2 * (out - target[idx]) / B), st)
    # Stale counts decayed to 0.9^30 ~ 0.042; hot counts are >> 1.
    cold = tr.pop_cold(0.05)
    assert set(cold) == set(range(12, 24))
    data = evict_rows(data, cold, value=0.0)
    st = reset_rows_state(st, cold)
    assert (np.asarray(data)[12:] == 0).all()
    assert (np.asarray(st.accum)[12:] == 0).all()
    # Trained rows survived and actually learned.
    assert float(jnp.abs(data[:12]).sum()) > 0


def test_train_loop_eviction_integration():
    """train_dlrm(evict_every=...) reinitializes never-seen rows and reports
    the eviction count; training still learns."""
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    rng = np.random.default_rng(5)
    cfg = DLRMConfig(vocab_sizes=(20, 20), num_dense=4, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32)

    first = [True]

    def batches():
        while True:
            if first[0]:
                # Rows 10..19 appear ONCE, then go stale.
                first[0] = False
                cat = np.tile(np.arange(10, 20, dtype=np.int32),
                              4)[:32].reshape(1, -1).repeat(2, axis=0)
            else:
                cat = rng.integers(0, 10, (2, 32)).astype(np.int32)
            yield dict(dense=rng.normal(size=(32, 4)).astype(np.float32),
                       cat=cat,
                       label=(cat[0] % 2).astype(np.float32))

    opt = SparseRowWiseAdaGrad(lr=0.1)
    res = train_dlrm(cfg, batches(), 12, sparse_opt=opt, dense_lr=0.1,
                     log_every=0, evict_every=5, evict_threshold=1e-6,
                     freq_decay=0.1, verbose=False)
    # The seen-then-stale rows are evicted exactly ONCE (no re-eviction of
    # permanently-cold rows; never-seen rows are not candidates).
    assert res.evicted_rows == 20, res.evicted_rows
    data = np.asarray(res.model.tables.data)
    offs = res.model.tables.offsets
    for t in range(2):
        tbl = data[offs[t]:offs[t + 1]]
        assert (tbl[10:] == 0).all()         # stale rows evicted to zero
        assert np.abs(tbl[:10]).sum() > 0    # live rows trained


def test_sharded_eviction_matches_dense():
    """evict_rows_sharded zeroes exactly the mod-sharded global rows and
    their accumulator entries."""
    from embeddingtables_tpu.parallel.mesh import default_mesh
    from embeddingtables_tpu.parallel.sharded import ShardedStackedTables
    from embeddingtables_tpu.utils.rowstats import evict_rows_sharded
    rng = np.random.default_rng(11)
    V, D = 100, 8
    dense = rng.standard_normal((V, D)).astype(np.float32)
    mesh = default_mesh(("data",))
    st = ShardedStackedTables.shard(mesh, "data", jnp.asarray(dense))
    n, rows_local, _ = st.data.shape
    accum = jnp.asarray(
        rng.random((n, rows_local)).astype(np.float32)) + 1.0
    cold = np.asarray([0, 13, 57, 99], np.int32)
    st2, accum2 = evict_rows_sharded(st, accum, cold)
    out = np.asarray(st2.unshard())
    expect = dense.copy()
    expect[cold] = 0.0
    np.testing.assert_array_equal(out, expect)
    a2 = np.asarray(accum2)
    for r in cold:
        assert a2[r % n, r // n] == 0.0
    assert (a2 > 0).sum() == n * rows_local - len(cold)
    # Empty set and empty accum pass through.
    st3, a3 = evict_rows_sharded(st, jnp.zeros((n, 0), jnp.float32),
                                 np.asarray([5], np.int32))
    assert a3.shape == (n, 0)


def test_sharded_train_loop_eviction():
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    from embeddingtables_tpu.parallel.mesh import default_mesh
    rng = np.random.default_rng(12)
    cfg = DLRMConfig(vocab_sizes=(24, 24), num_dense=4, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32)

    first = [True]

    def batches():
        while True:
            if first[0]:
                first[0] = False
                cat = np.tile(np.arange(12, 24, dtype=np.int32),
                              3)[:32].reshape(1, -1).repeat(2, axis=0)
            else:
                cat = rng.integers(0, 12, (2, 32)).astype(np.int32)
            yield dict(dense=rng.normal(size=(32, 4)).astype(np.float32),
                       cat=cat,
                       label=(cat[0] % 2).astype(np.float32))

    res = train_dlrm(cfg, batches(), 10, dense_lr=0.1,
                     sparse_opt=SparseRowWiseAdaGrad(lr=0.1),
                     mesh=default_mesh(("data",)), log_every=0,
                     evict_every=5, evict_threshold=1e-6, freq_decay=0.1,
                     verbose=False)
    assert res.evicted_rows == 2 * 12  # seen-then-stale, evicted once each
    data = np.asarray(res.model.tables.unshard())
    offs = res.model.tables.offsets
    for t in range(2):
        tbl = data[offs[t]:offs[t + 1]]
        assert (tbl[12:24] == 0).all()
        assert np.abs(tbl[:12]).sum() > 0
