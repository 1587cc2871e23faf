"""Host-side census of the pallas-segsum chunk contract on the REAL
bench corpus (no TPU needed).

The micro_pallas.py kernel wins 2.6-3.2x over the XLA scatter at
rcap 32-256, where rcap = max distinct segment ids per 2048-entry
chunk. This script computes the rcap distribution for every production
scatter stream at the NYTimes bench shape — both sort orders of A and
of the post-threshold B, the hybrid tail octet streams, and the
full-vocab-Lloyd's/model-accumulation word stream — to decide where the
kernel's contract actually holds on Zipf data (a word-sorted tail chunk
can touch up to `chunk` distinct words, inflating the one-hot to
useless sizes; the measurement, not the worry, decides).
"""

import argparse

import numpy as np


def census(ids: np.ndarray, chunk: int, label: str):
    n = len(ids)
    nch = n // chunk
    ids = ids[: nch * chunk].reshape(nch, chunk)
    trans = np.concatenate(
        [np.ones((nch, 1), bool), ids[:, 1:] != ids[:, :-1]], axis=1
    )
    distinct = trans.sum(axis=1)
    rcap = 1 << int(int(distinct.max()) - 1).bit_length()
    q = np.percentile(distinct, [50, 90, 99, 100])
    # one-hot MXU cost multiplier vs the rcap=32 reference point
    print(
        f"{label:34s} n={n/1e6:6.1f}M  distinct/chunk p50={q[0]:6.0f} "
        f"p90={q[1]:6.0f} p99={q[2]:6.0f} max={q[3]:6.0f}  rcap={rcap}"
    )
    return rcap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=102_660)
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--nnz", type=int, default=48_000_000)
    ap.add_argument("--chunk", type=int, default=2048)
    args = ap.parse_args()
    C = args.chunk

    import sys
    sys.path.insert(0, "/root/repo")
    from bench import synth_corpus
    from isle_tpu.corpus import Corpus
    from isle_tpu.config import HyperParams
    from isle_tpu.thresholds import compute_thresholds_np

    d, w, c = synth_corpus(args.vocab, args.docs, args.nnz, 0)
    corpus = Corpus.from_entries(
        d, w, c, vocab_size=args.vocab, num_docs=args.docs
    )
    print(f"corpus nnz={corpus.nnz}, chunk={C}")

    rows = corpus.rows.astype(np.int64)
    docs = corpus.doc_ids().astype(np.int64)

    # A, doc-sorted (bt_x segment stream = docs)
    census(docs, C, "A doc-sorted: seg=doc")
    # A, word-sorted (b_y segment stream = words)
    worder = np.lexsort((docs, rows))
    census(rows[worder], C, "A word-sorted: seg=word")

    # B = thresholded copy (the eigen/k-means matrix)
    hp = HyperParams()
    zetas, _ = compute_thresholds_np(
        corpus.rows, corpus.vals, args.vocab, corpus.avg_doc_sz,
        corpus.nz_docs, 100, hp,
    )
    # the bmatrix keep rule: round(normalized val) >= zeta[word]
    keep = np.floor(corpus.vals + 0.5) >= zetas[corpus.rows]
    bw = rows[keep]
    bd = docs[keep]
    print(f"B nnz={keep.sum()}")
    census(bd, C, "B doc-sorted: seg=doc")
    bworder = np.lexsort((bd, bw))
    census(bw[bworder], C, "B word-sorted: seg=word")

    # hybrid tail: drop the head words (top rows by frequency, int32 cap)
    freq = np.bincount(bw, minlength=args.vocab)
    order = np.argsort(-freq, kind="stable")
    flat_cap = (1 << 31) - 1
    R = min(int(flat_cap // (args.docs + 1)), args.vocab)
    head = np.zeros(args.vocab, bool)
    head[order[:R]] = True
    tail = ~head[bw]
    tw = bw[tail]
    td = bd[tail]
    print(f"tail nnz={tail.sum()} (head covers {1-tail.mean():.0%})")
    census(td[np.lexsort((tw, td))], C, "B tail doc-sorted: seg=doc")
    tworder = np.lexsort((td, tw))
    census(tw[tworder], C, "B tail word-sorted: seg=word")

    # octet streams (the actual tail scatter inputs): seg per 8-entry octet
    octd = td[np.lexsort((tw, td))][: len(td) // 8 * 8 : 8]
    census(octd, C // 8, "tail octets doc-dir: seg=doc")
    octw = tw[tworder][: len(tw) // 8 * 8 : 8]
    census(octw, C // 8, "tail octets word-dir: seg=word")


if __name__ == "__main__":
    main()
