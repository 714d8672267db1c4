"""Native Criteo parser parity vs the pure-Python oracle, and prefetch."""
import numpy as np
import pytest

from embeddingtables_tpu.data import criteo_kaggle_batches
from embeddingtables_tpu.io import (CriteoFileLoader, PrefetchLoader,
                                    native_available, native_parse_batch)

VOCABS = tuple([97 + i for i in range(26)])


def make_tsv(path, rows=300, seed=0, mangle=True):
    rng = np.random.default_rng(seed)
    lines = []
    for r in range(rows):
        label = str(rng.integers(0, 2))
        dense = []
        for j in range(13):
            roll = rng.random()
            if roll < 0.15:
                dense.append("")            # missing
            elif roll < 0.2:
                dense.append(str(-rng.integers(1, 5)))  # negative -> clamp
            else:
                dense.append(str(rng.integers(0, 1000)))
        cats = []
        for j in range(26):
            if rng.random() < 0.1:
                cats.append("")             # missing -> row 0
            else:
                cats.append(f"{rng.integers(0, 1 << 32):08x}")
        lines.append("\t".join([label] + dense + cats))
        if mangle and r % 37 == 36:
            lines.append("garbage line with\ttoo few fields")
        if mangle and r % 41 == 40:
            # Extra-fields line: 41 tab-separated fields — both parsers skip.
            lines.append("\t".join(["1"] + ["2"] * 13 + ["aa"] * 26
                                   + ["extra"]))
        if mangle and r % 43 == 42:
            # Unparseable label — both parsers skip the row.
            lines.append("\t".join(["notanumber"] + ["3"] * 13 + ["bb"] * 26))
        if mangle and r % 47 == 46:
            # Decimal dense field — parsed as a fraction by both.
            lines.append("\t".join(["0"] + ["1.5"] * 13 + ["cc"] * 26))
        if mangle and r % 53 == 52:
            # Exponent forms — Python float() accepts them; native must too.
            lines.append("\t".join(["1"] + ["2e2", "1.5E1", "3e-1"]
                                    + ["4"] * 10 + ["dd"] * 26))
    path.write_text("\n".join(lines) + "\n")
    return path


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_parser_matches_python_oracle(tmp_path):
    p = make_tsv(tmp_path / "train.txt")
    py = list(criteo_kaggle_batches(str(p), VOCABS, batch_size=64))
    nat = list(CriteoFileLoader(str(p), VOCABS, batch_size=64))
    assert len(py) == len(nat) and len(py) >= 4
    for a, b in zip(py, nat):
        np.testing.assert_allclose(b["dense"], a["dense"], rtol=1e-6)
        np.testing.assert_array_equal(b["cat"], a["cat"])
        np.testing.assert_array_equal(b["label"], a["label"])


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_parse_batch_direct(tmp_path):
    p = make_tsv(tmp_path / "t.txt", rows=50, mangle=False)
    buf = p.read_bytes()
    rows, dense, cat, label, consumed, skipped = native_parse_batch(
        buf, 100, VOCABS)
    assert rows == 50 and skipped == 0 and consumed == len(buf)
    assert dense.shape == (50, 13) and cat.shape == (26, 50)
    assert (cat >= 0).all()
    for t in range(26):
        assert (cat[t] < VOCABS[t]).all()


def test_prefetch_loader_order_and_error():
    items = [dict(i=i) for i in range(20)]
    got = list(PrefetchLoader(iter(items), depth=3))
    assert got == items

    def boom():
        yield dict(i=0)
        raise ValueError("producer failed")

    it = PrefetchLoader(boom(), depth=2)
    assert next(it) == dict(i=0)
    with pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_parallel_batches_interleaves_and_propagates_errors():
    from embeddingtables_tpu.io import parallel_batches

    def make_iter(wid):
        def gen():
            for i in range(10):
                yield dict(w=wid, i=i)
        return gen()

    it = parallel_batches(make_iter, workers=3, depth=2)
    got = [next(it) for _ in range(25)]
    assert {g["w"] for g in got} == {0, 1, 2}

    def boom(wid):
        def gen():
            yield dict(w=wid)
            raise RuntimeError("producer died")
        return gen()

    it2 = parallel_batches(boom, workers=1, depth=2)
    next(it2)
    import pytest
    with pytest.raises(RuntimeError, match="producer died"):
        while True:
            next(it2)


def test_parallel_batches_finite_iterators_terminate():
    # Finite worker iterators must end the stream (StopIteration), not block
    # forever on an empty queue.
    from embeddingtables_tpu.io import parallel_batches

    def make_iter(wid):
        def gen():
            for i in range(5):
                yield dict(w=wid, i=i)
        return gen()

    got = list(parallel_batches(make_iter, workers=3, depth=2))
    assert len(got) == 15
    assert {g["w"] for g in got} == {0, 1, 2}


# ---------------------------------------------------------------------------
# Native synthetic generator (native/synth_gen.cpp)
# ---------------------------------------------------------------------------

def _native_synth():
    from embeddingtables_tpu.io.synth import (NativeSyntheticCriteo,
                                              native_synth_available)
    if not native_synth_available():
        pytest.skip("native synth generator unavailable (no g++?)")
    return NativeSyntheticCriteo


def test_native_synth_deterministic_and_streams_disjoint():
    mk = _native_synth()
    a = next(mk(vocab_sizes=(500, 100), batch_size=256, seed=3).batches(1))
    b = next(mk(vocab_sizes=(500, 100), batch_size=256, seed=3).batches(1))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    c = next(mk(vocab_sizes=(500, 100), batch_size=256, seed=3,
                stream_seed=99).batches(1))
    assert not np.array_equal(a["cat"], c["cat"])
    # Consecutive batches differ (batch_index feeds the counter RNG).
    it = mk(vocab_sizes=(500, 100), batch_size=256, seed=3).batches(2)
    b0, b1 = next(it), next(it)
    assert not np.array_equal(b0["cat"], b1["cat"])


def test_native_synth_shapes_bounds_and_bags():
    mk = _native_synth()
    vocabs = (500, 100, 33)
    b = next(mk(vocab_sizes=vocabs, num_dense=5, batch_size=128,
                seed=1).batches(1))
    assert b["dense"].shape == (128, 5) and b["dense"].dtype == np.float32
    assert b["cat"].shape == (3, 128) and b["cat"].dtype == np.int32
    assert b["label"].shape == (128,)
    assert np.isfinite(b["dense"]).all() and (b["dense"] >= 0).all()
    for t, v in enumerate(vocabs):
        assert (b["cat"][t] >= 0).all() and (b["cat"][t] < v).all()
    assert set(np.unique(b["label"])) <= {0.0, 1.0}
    bb = next(mk(vocab_sizes=vocabs, num_dense=5, batch_size=128, bag=4,
                 seed=1).batches(1))
    assert bb["cat"].shape == (3, 128, 4)


def test_native_synth_labels_follow_hidden_model_and_zipf_skew():
    """Labels must be drawn from the SAME hidden ground-truth model the
    Python generator owns (AUC of the true logit vs the returned labels is
    far above chance), and indices must carry the Zipf head."""
    mk = _native_synth()
    from embeddingtables_tpu.metrics import auc
    vocabs = (2000, 1000)
    g = mk(vocab_sizes=vocabs, num_dense=4, batch_size=8192, seed=5)
    b = next(g.batches(1))
    p = g.py
    logit = (b["dense"] @ p._w_dense) / np.sqrt(4) + sum(
        p._row_logit[t][b["cat"][t]] for t in range(2)) / np.sqrt(2) + p._bias
    assert auc(b["label"], logit) > 0.75
    # Zipf skew: the permuted rank-1 row dominates.
    _, _, perm = p._zipf_tables(2000)
    counts = np.bincount(b["cat"][0], minlength=2000)
    assert counts[perm[0]] > 50 * max(1, np.median(counts))


def test_native_synth_api_matches_python_generator():
    """Drop-in check: same constructor, same dict layout, same CTR regime
    as data.SyntheticCriteo (distribution-level parity, not bit parity)."""
    mk = _native_synth()
    from embeddingtables_tpu.data import SyntheticCriteo
    kw = dict(vocab_sizes=(300, 80), num_dense=6, batch_size=4096, seed=17)
    nb = next(mk(**kw).batches(1))
    pb = next(SyntheticCriteo(**kw).batches(1))
    assert set(nb) == set(pb)
    for k in nb:
        assert nb[k].shape == pb[k].shape and nb[k].dtype == pb[k].dtype
    assert abs(nb["label"].mean() - pb["label"].mean()) < 0.08
    assert abs(nb["dense"].mean() - pb["dense"].mean()) < 0.1


def test_file_loader_epochs(tmp_path):
    p = make_tsv(tmp_path / "train.txt", mangle=False)
    one = list(CriteoFileLoader(str(p), VOCABS, batch_size=64))
    assert len(one) >= 2
    # epochs=2 doubles the stream; the second pass replays the first.
    two = list(CriteoFileLoader(str(p), VOCABS, batch_size=64, epochs=2))
    assert len(two) == 2 * len(one)
    np.testing.assert_array_equal(two[len(one)]["cat"], one[0]["cat"])
    # max_batches bounds the TOTAL across epochs.
    capped = list(CriteoFileLoader(str(p), VOCABS, batch_size=64,
                                   epochs=None, max_batches=len(one) + 2))
    assert len(capped) == len(one) + 2
    np.testing.assert_array_equal(capped[-1]["label"], one[1]["label"])


def test_file_loader_skip_batches_every_epoch(tmp_path):
    p = make_tsv(tmp_path / "train.txt", mangle=False)
    one = list(CriteoFileLoader(str(p), VOCABS, batch_size=64))
    stream = list(CriteoFileLoader(str(p), VOCABS, batch_size=64,
                                   epochs=2, skip_batches=1))
    # Each epoch drops its first batch: the eval prefix never reappears.
    assert len(stream) == 2 * (len(one) - 1)
    np.testing.assert_array_equal(stream[0]["cat"], one[1]["cat"])
    np.testing.assert_array_equal(stream[len(one) - 1]["cat"], one[1]["cat"])


def test_device_prefetcher_order_contents_and_error():
    from embeddingtables_tpu.io import DevicePrefetcher

    def src(n):
        for i in range(n):
            yield dict(x=np.full((2,), i))

    seen = []
    pf = DevicePrefetcher(src(5), lambda b: (b["x"] * 2,), depth=2)
    for batch, (dev,) in pf:
        seen.append((batch["x"][0], dev[0]))
    assert seen == [(i, 2 * i) for i in range(5)]

    def bad():
        yield dict(x=np.zeros(2))
        raise RuntimeError("boom")

    pf = DevicePrefetcher(bad(), lambda b: (b["x"],))
    next(pf)
    import pytest
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)


def test_train_dlrm_device_prefetch_same_result():
    import jax
    import jax.numpy as jnp
    from embeddingtables_tpu.data import SyntheticCriteo
    from embeddingtables_tpu.models import DLRMConfig
    from embeddingtables_tpu.models.train import train_dlrm
    from embeddingtables_tpu.optim import SparseRowWiseAdaGrad
    vocab = (50, 50)
    cfg = DLRMConfig(vocab_sizes=vocab, num_dense=3, dim=8,
                     bottom_mlp=(8, 8), top_mlp=(8, 1),
                     compute_dtype=jnp.float32)

    def run(dp):
        gen = SyntheticCriteo(vocab_sizes=vocab, num_dense=3,
                              batch_size=64, seed=3)
        return train_dlrm(cfg, gen.batches(), 8, seed=1,
                          sparse_opt=SparseRowWiseAdaGrad(lr=0.05),
                          log_every=1, verbose=False, device_prefetch=dp)

    a, b = run(0), run(2)
    assert a.losses == b.losses          # same data order, same math


def test_file_loader_skip_exhausting_epoch_raises(tmp_path):
    p = make_tsv(tmp_path / "train.txt", mangle=False)
    total = len(list(CriteoFileLoader(str(p), VOCABS, batch_size=64)))
    with pytest.raises(RuntimeError, match="cycle forever"):
        list(CriteoFileLoader(str(p), VOCABS, batch_size=64,
                              epochs=None, skip_batches=total))
    # Finite epochs keep the old just-exhaust behavior (empty, no raise).
    assert list(CriteoFileLoader(str(p), VOCABS, batch_size=64,
                                 epochs=2, skip_batches=total)) == []
