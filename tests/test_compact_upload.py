"""Compact device construction must match the host-materialized path."""

import numpy as np
import pytest

from isle_tpu.corpus import Corpus
from isle_tpu.sparse import DocSparse


@pytest.mark.parametrize("seed", [0, 1])
def test_compact_matches_full(seed):
    rng = np.random.default_rng(seed)
    V, D = 50, 40
    docs, words, counts = [], [], []
    for d in range(D):
        if d % 7 == 3:  # empty docs sprinkled in
            continue
        ws = np.sort(rng.choice(V, rng.integers(1, 9), replace=False))
        for w in ws:
            docs.append(d)
            words.append(w)
            counts.append(int(rng.integers(1, 300)))
    c = Corpus.from_entries(
        np.array(docs), np.array(words), np.array(counts),
        vocab_size=V, num_docs=D,
    )
    a = DocSparse.from_corpus(c, chunk=256, compact_upload=True)
    b = DocSparse.from_corpus(c, chunk=256, compact_upload=False)
    for attr in ("d_word", "d_doc", "w_word", "w_doc"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, attr)), np.asarray(getattr(b, attr)), attr
        )
    for attr in ("d_val", "w_val"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, attr)), np.asarray(getattr(b, attr)), attr
        )


def test_trailing_empty_docs_compact():
    c = Corpus.from_entries(
        np.array([0, 1]), np.array([2, 0]), np.array([3, 4]),
        vocab_size=3, num_docs=6,
    )
    a = DocSparse.from_corpus(c, chunk=64)
    np.testing.assert_array_equal(np.asarray(a.d_doc)[:2], [0, 1])
    assert (np.asarray(a.d_doc)[2:] == 6).all()
