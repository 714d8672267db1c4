#!/usr/bin/env python
"""Materialize a Criteo-Kaggle-FORMAT train.txt from the synthetic
generator, so the full file pipeline (native C++ parser -> prefetch ->
device) can be driven end-to-end when the real dataset is not mountable.

Row format: label \t I1..I13 \t C1..C26 (hex tokens), fields occasionally
empty — exactly what data.criteo_kaggle_batches / native/criteo_parser.cpp
consume. Categorical tokens are chosen so that FNV-1a(token) % vocab lands
on the generator's sampled row id (token = row id in hex is NOT inverse;
instead we precompute, per table, one token per row id whose hash maps to
it — a token bank).

Usage: python scripts/make_criteo_file.py out.txt --rows 500000 --vocab 50000
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embeddingtables_tpu.data import SyntheticCriteo  # noqa: E402


def token_bank(vocab: int, seed: int) -> np.ndarray:
    """For each row id r in [0, vocab): a hex token with FNV-1a(token) %
    vocab == r. Found by scanning candidate tokens once (coupon-collector:
    ~vocab * ln(vocab) candidates)."""
    def fnv1a_vec(arr: np.ndarray) -> np.ndarray:
        # Vectorized FNV-1a over fixed-width 8-char ascii tokens.
        h = np.full(arr.shape[0], 0xCBF29CE484222325, np.uint64)
        for k in range(arr.shape[1]):
            h = (h ^ arr[:, k].astype(np.uint64)) * np.uint64(0x100000001B3)
        return h

    bank = np.zeros(vocab, dtype="S8")
    have = np.zeros(vocab, bool)
    rng = np.random.default_rng(seed)
    hexd = np.frombuffer(b"0123456789abcdef", np.uint8)
    need = vocab
    while need:
        cand = hexd[rng.integers(0, 16, (max(65536, 4 * need), 8))]
        ids = (fnv1a_vec(cand) % np.uint64(vocab)).astype(np.int64)
        # First candidate per still-missing id wins.
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        first = np.ones(len(ids_s), bool)
        first[1:] = ids_s[1:] != ids_s[:-1]
        sel = order[first]
        sel_ids = ids[sel]
        fresh = ~have[sel_ids]
        bank[sel_ids[fresh]] = [cand[s].tobytes() for s in sel[fresh]]
        have[sel_ids[fresh]] = True
        need = int((~have).sum())
    return bank


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    assert args.tables == 26, "Criteo format has 26 categorical fields"

    gen = SyntheticCriteo(vocab_sizes=tuple([args.vocab] * 26),
                          batch_size=8192, seed=args.seed)
    print("building token bank...", flush=True)
    bank = token_bank(args.vocab, args.seed ^ 0xBEEF)

    written = 0
    with open(args.out, "w") as f:
        for batch in gen.batches():
            b = batch["label"].shape[0]
            dense_int = np.expm1(batch["dense"]).astype(np.int64)
            cat = batch["cat"]
            toks = [bank[cat[t]].astype("U8") for t in range(26)]
            for i in range(b):
                if written >= args.rows:
                    break
                parts = [str(int(batch["label"][i]))]
                parts += [str(int(x)) for x in dense_int[i]]
                parts += [toks[t][i] for t in range(26)]
                f.write("\t".join(parts) + "\n")
                written += 1
            print(f"\r{written}/{args.rows}", end="", flush=True)
            if written >= args.rows:
                break
    print(f"\nwrote {written} rows to {args.out} "
          f"({os.path.getsize(args.out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
