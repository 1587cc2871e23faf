#!/usr/bin/env python3
"""Deterministic synthetic TDF corpora for reference-vs-rebuild parity.

UCI egress is blocked in this environment (parity/README.md), so golden
parity runs on synthetic corpora drawn from bench.synth_corpus — a Zipf(1)
word marginal with 64 planted topic bands, the same family the benchmark
uses.  The TDF follows the UCI docword body format the reference parses
(reference include/utils.h:158-229): one `<doc_id> <word_id> <count>`
triple per line, 1-based ids.

    python parity/synth_data.py --name kos-syn --out parity/data_syn

Named shapes mirror BASELINE.md's parity ladder (KOS- and NIPS-scale).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# tiny/kos/nips are sized so the 1-core Netlib-BLAS reference build
# finishes in minutes.  small-syn and nyt-syn use bench.py's exact shapes
# AND seed, so the reference binary runs on the very corpus the benchmark
# measures — the measured 1-core reference wall-clock on nyt-syn is the
# honest baseline anchor (BENCH_NOTES.md round-5 section).
SHAPES = {
    "tiny-syn": dict(vocab=500, docs=400, nnz=20_000, k=5, seed=11),
    "kos-syn": dict(vocab=6906, docs=3430, nnz=353_160, k=10, seed=7),
    "nips-syn": dict(vocab=5002, docs=1491, nnz=639_743, k=50, seed=13),
    "small-syn": dict(vocab=28_000, docs=40_000, nnz=3_000_000, k=20,
                      seed=0),
    "nyt-syn": dict(vocab=102_660, docs=300_000, nnz=48_000_000, k=100,
                    seed=0),
}


def write_dataset(name: str, out_dir: str) -> dict:
    from bench import synth_corpus

    shape = SHAPES[name]
    os.makedirs(out_dir, exist_ok=True)
    d, w, c = synth_corpus(shape["vocab"], shape["docs"], shape["nnz"],
                           seed=shape["seed"])
    order = np.lexsort((w, d))
    d, w, c = d[order], w[order], c[order]
    tdf = os.path.join(out_dir, f"{name}.tdf")
    vocab_f = os.path.join(out_dir, f"vocab.{name}.txt")
    # pandas to_csv formats ~5M rows/s vs np.savetxt's ~0.1M (a 47M-row
    # nyt-syn TDF would take minutes under savetxt's per-row loop).
    try:
        import pandas as pd
        pd.DataFrame({"d": d + 1, "w": w + 1, "c": c}).to_csv(
            tdf, sep=" ", header=False, index=False)
    except ImportError:
        body = np.stack([d + 1, w + 1, c], axis=1)
        np.savetxt(tdf, body, fmt="%d")
    with open(vocab_f, "w") as f:
        for i in range(shape["vocab"]):
            f.write(f"w{i}\n")
    meta = dict(name=name, tdf=tdf, vocab_file=vocab_f,
                vocab=shape["vocab"], docs=int(d.max() + 1),
                nnz=len(d), k=shape["k"])
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="kos-syn", choices=sorted(SHAPES))
    ap.add_argument("--out", default=os.path.join(REPO, "parity", "data_syn"))
    args = ap.parse_args()
    meta = write_dataset(args.name, args.out)
    print(meta)


if __name__ == "__main__":
    main()
