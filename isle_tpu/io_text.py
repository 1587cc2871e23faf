"""Text model artifacts: sparse/dense model files, top-words reports, and
the sparse-model loader used by inference.

Formats match the reference exactly so models interoperate both ways:
  - sparse model (`M_hat_catch_sparse`): `<topic>\t<word>\t<weight>` lines,
    1-based ids, entries > 1e-8, topic-major order
    (src/denseMatrix.cpp:153-187).
  - dense model: one tab-separated row of vocab weights per topic
    (src/denseMatrix.cpp:124-151).
  - loader: parses `<topic> <word> <weight>` into a word-major
    (vocab, num_topics) array (src/infer.cpp:125-249).
  - top-words report (`TopWordsPerTopic_catch.txt`): tab-separated top
    words per topic (src/trainer.cpp:855-886).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from . import native


def write_sparse_model(path: str, model: np.ndarray, base: int = 1) -> None:
    """model: (vocab, num_topics)."""
    native.write_sparse_model(path, model, base=base)


def write_dense_model(path: str, model: np.ndarray) -> None:
    with open(path, "w") as f:
        for t in range(model.shape[1]):
            f.write("\t".join(f"{x:.8g}" for x in model[:, t]))
            f.write("\n")


def load_sparse_model(
    path: str, num_topics: int, vocab_size: int, base: int = 1
) -> np.ndarray:
    """Returns a (vocab, num_topics) float32 array (word-major rows)."""
    data = np.loadtxt(path, dtype=np.float64, ndmin=2)
    out = np.zeros((vocab_size, num_topics), np.float32)
    if data.size == 0:
        return out
    t = data[:, 0].astype(np.int64) - base
    w = data[:, 1].astype(np.int64) - base
    out[w, t] = data[:, 2].astype(np.float32)
    return out


def load_dense_model(path: str, num_topics: int, vocab_size: int) -> np.ndarray:
    data = np.loadtxt(path, dtype=np.float32, ndmin=2)
    assert data.shape == (num_topics, vocab_size), data.shape
    return data.T.copy()


def top_words_per_topic(
    model: np.ndarray, n: int
) -> List[List[Tuple[int, float]]]:
    """Top-n (word, weight) per topic, weight-descending
    (DenseMatrix::find_n_top_words, src/denseMatrix.cpp:93-107)."""
    out = []
    for t in range(model.shape[1]):
        col = model[:, t]
        idx = np.argsort(-col, kind="stable")[:n]
        out.append([(int(i), float(col[i])) for i in idx])
    return out


def write_top_words(
    path: str,
    model: np.ndarray,
    vocab_words: Sequence[str],
    n: int,
) -> None:
    tops = top_words_per_topic(model, n)
    with open(path, "w") as f:
        for t, top in enumerate(tops):
            f.write("\t".join(vocab_words[w] for w, _ in top))
            f.write("\n")


def write_top_topics(
    path: str,
    weights: np.ndarray,  # (num_docs, k)
    converged: np.ndarray,
    doc_begin: int = 1,
    top_n: int = 5,
) -> None:
    """Per-doc top topics above uniform mass, at most top_n, as
    `<doc>\t<topic>\t<weight>` with 1-based topic ids
    (drivers/ISLEInfer.cpp:100-111)."""
    D, k = weights.shape
    uniform = 1.0 / k
    with open(path, "w") as f:
        for d in range(D):
            if not converged[d]:
                continue
            w = weights[d]
            idx = np.nonzero(w > uniform)[0]
            idx = idx[np.argsort(-w[idx], kind="stable")][:top_n]
            for t in idx:
                f.write(f"{d + doc_begin}\t{t + 1}\t{w[t]:.6f}\n")


def write_edge_composition(path: str, selected_pairs: np.ndarray) -> None:
    """`<t1>\t<t2>\t<count>` lines (print_edge_topic_composition,
    src/trainer.cpp:1171-1199)."""
    with open(path, "w") as f:
        for a, b, c in selected_pairs:
            f.write(f"{a}\t{b}\t{c}\n")
