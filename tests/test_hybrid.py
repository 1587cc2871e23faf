"""Hybrid dense-head/sparse-tail layout must agree with the plain COO SpMM."""

import numpy as np
import pytest

from isle_tpu.hybrid import h_b_y, h_bt_x, h_doc_l2sq, h_gram_x, to_hybrid
from isle_tpu.sparse import DocSparse, b_y, bt_x, doc_l2sq, gram_x


def make(rng, V, D, density, zipf=True, chunk=512):
    probs = 1.0 / np.arange(1, V + 1) if zipf else np.ones(V)
    probs /= probs.sum()
    mask = rng.random((V, D)) < density * probs[:, None] * V
    w, d = np.nonzero(mask)
    order = np.lexsort((w, d))
    w, d = w[order], d[order]
    v = (rng.random(len(w)) * 3 + 0.5).astype(np.float32)
    return DocSparse.build(w, d, v, V, D, chunk=chunk), w, d, v


@pytest.mark.parametrize("seed,num_head", [(0, 8), (1, 1), (2, 25), (3, 60)])
def test_hybrid_matches_coo(seed, num_head):
    rng = np.random.default_rng(seed)
    V, D, W = 60, 45, 16
    sp, w, d, v = make(rng, V, D, 0.25)
    h = to_hybrid(sp, num_head, chunk=256)
    assert h.head_nnz + int((np.asarray(h.td_val) != 0).sum()) == sp.nnz

    X = rng.standard_normal((V, W)).astype(np.float32)
    Y = rng.standard_normal((D, W)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(h_bt_x(h, X, 256)), np.asarray(bt_x(sp, X)), rtol=2e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(h_b_y(h, Y, 256)), np.asarray(b_y(sp, Y)), rtol=2e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(h_gram_x(h, X, 256)),
        np.asarray(gram_x(sp, X)),
        rtol=2e-4,
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(h_doc_l2sq(h, 256)), np.asarray(doc_l2sq(sp)), rtol=2e-5,
        atol=1e-4,
    )


def test_hybrid_all_head():
    # num_head == vocab: tail is empty padding
    rng = np.random.default_rng(5)
    V, D, W = 20, 30, 8
    sp, w, d, v = make(rng, V, D, 0.4, zipf=False)
    h = to_hybrid(sp, V, chunk=128)
    X = rng.standard_normal((V, W)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(h_bt_x(h, X, 128)), np.asarray(bt_x(sp, X)), rtol=2e-5,
        atol=1e-4,
    )
