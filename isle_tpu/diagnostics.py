"""Topic diagnostics: coherence, document frequencies, topic diversity,
log-combinatorial statistics, distinct top-5 multisets.

Reference: src/sparseMatrix.cpp:841-1048 (`topic_coherence`,
`compute_joint_doc_frequency`, `compute_doc_frequency`,
`compute_log_combinatorial`, `count_distint_top_five_words`) and
src/trainer.cpp:750-771 (`output_topic_diversity`).

Coherence of a topic with top words w_1..w_M (by model weight):
    sum_{i<j... per reference: for l in 2..M, m < l}
        log((joint_df(w_l, w_m) + eps) / df(w_m))
computed from raw document frequencies of the corpus.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .corpus import Corpus
from .io_text import top_words_per_topic


def doc_frequency(corpus: Corpus, words: np.ndarray) -> np.ndarray:
    """#docs containing each word (src/sparseMatrix.cpp:969-1015)."""
    df = np.bincount(corpus.rows, minlength=corpus.vocab_size)
    return df[words]


def joint_doc_frequency(corpus: Corpus, w1: int, w2: int) -> int:
    """#docs containing both words (src/sparseMatrix.cpp:841-967)."""
    docs = corpus.doc_ids()
    d1 = set(docs[corpus.rows == w1].tolist())
    d2 = set(docs[corpus.rows == w2].tolist())
    return len(d1 & d2)


def topic_coherence(
    corpus: Corpus,
    model: np.ndarray,
    num_words: int = 5,
    eps: float = 1e-5,
) -> np.ndarray:
    """Per-topic UMass-style coherence over the top `num_words` words."""
    V = corpus.vocab_size
    k = model.shape[1]
    tops = top_words_per_topic(model, num_words)
    # doc sets per needed word, computed once
    needed = sorted({w for top in tops for w, _ in top})
    docs = corpus.doc_ids()
    word_docs = {}
    for w in needed:
        word_docs[w] = np.unique(docs[corpus.rows == w])
    df = np.bincount(corpus.rows, minlength=V)
    out = np.zeros(k, np.float64)
    for t in range(k):
        ws = [w for w, wt in tops[t] if wt > 0.0]
        c = 0.0
        for l in range(1, len(ws)):
            for m in range(l):
                joint = np.intersect1d(
                    word_docs[ws[l]], word_docs[ws[m]], assume_unique=True
                ).size
                denom = df[ws[m]]
                if denom > 0:
                    c += np.log((joint + eps) / denom)
        out[t] = c
    return out.astype(np.float32)


def topic_diversity(model: np.ndarray) -> float:
    """Average squared distance of topic vectors to the mean topic vector
    (src/trainer.cpp:750-771)."""
    avg = model.mean(axis=1)
    d = model - avg[:, None]
    return float(np.mean(np.sum(d * d, axis=0)))


def log_combinatorial(corpus: Corpus) -> np.ndarray:
    """Per-doc log multinomial coefficient log(n! / prod c_w!)
    (src/sparseMatrix.cpp:1017-1048)."""
    from scipy.special import gammaln

    counts = corpus.counts
    if counts is None:
        raise ValueError("raw counts unavailable")
    D = corpus.num_docs
    lengths = np.diff(corpus.offsets)
    doc_total = np.zeros(D)
    np.add.at(doc_total, corpus.doc_ids(), counts)
    term = np.zeros(D)
    np.add.at(term, corpus.doc_ids(), gammaln(counts + 1.0))
    return (gammaln(doc_total + 1.0) - term).astype(np.float32)


def count_distinct_top_five(corpus: Corpus, min_count: int) -> int:
    """#top-5-word multisets occurring in more than `min_count` docs
    (src/sparseMatrix.cpp:170-215)."""
    D = corpus.num_docs
    tops: List[tuple] = []
    for d in range(D):
        lo, hi = corpus.offsets[d], corpus.offsets[d + 1]
        if hi == lo:
            continue
        rows = corpus.rows[lo:hi]
        vals = corpus.vals[lo:hi]
        idx = np.argsort(-vals, kind="stable")[:5]
        tops.append(tuple(sorted(rows[idx].tolist())))
    from collections import Counter

    counts = Counter(tops)
    return sum(1 for v in counts.values() if v > min_count)
