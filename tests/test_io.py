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
