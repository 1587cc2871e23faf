"""Type-dispatched SpMM surface: every consumer (eigensolver, k-means,
projections, topic construction) works against these, so the plain COO
layout (DocSparse) and the optimized dense-head/sparse-tail layout
(HybridSparse) are interchangeable."""

from __future__ import annotations

import jax

from .hybrid import (
    HybridSparse,
    h_b_y,
    h_bt_x,
    h_doc_l2sq,
    h_gram_x,
    h_spmm_flops,
)
from .sparse import DocSparse, b_y, bt_x, doc_l2sq, gram_x, spmm_flops


def mat_bt_x(m, X: jax.Array, chunk: int = 1 << 20) -> jax.Array:
    if isinstance(m, HybridSparse):
        return h_bt_x(m, X, chunk)
    return bt_x(m, X, chunk)


def mat_b_y(m, Y: jax.Array, chunk: int = 1 << 20) -> jax.Array:
    if isinstance(m, HybridSparse):
        return h_b_y(m, Y, chunk)
    return b_y(m, Y, chunk)


def mat_gram_x(m, X: jax.Array, chunk: int = 1 << 20) -> jax.Array:
    if isinstance(m, HybridSparse):
        return h_gram_x(m, X, chunk)
    return gram_x(m, X, chunk)


def mat_doc_l2sq(m, chunk: int = 1 << 20) -> jax.Array:
    if isinstance(m, HybridSparse):
        return h_doc_l2sq(m, chunk)
    return doc_l2sq(m, chunk)


def mat_spmm_flops(m, width: int) -> int:
    if isinstance(m, HybridSparse):
        return h_spmm_flops(m, width)
    return spmm_flops(m, width)


def mat_to_dense(m):
    """Densify (tests / dense-oracle paths on small problems only)."""
    import numpy as np

    if isinstance(m, HybridSparse):
        from .hybrid import h_to_doc_sparse_vals

        word, docs, val = h_to_doc_sparse_vals(m)
        out = np.zeros((m.vocab + 1, m.num_docs + 1), dtype=np.float32)
        np.add.at(
            out, (np.asarray(word), np.asarray(docs)), np.asarray(val)
        )
        out = out[: m.vocab, : m.num_docs]
        head = np.asarray(m.head, np.float32)
        if m.row_scale is not None:
            head = head * np.asarray(m.row_scale)[
                np.asarray(m.head_words)
            ][:, None]
        out[np.asarray(m.head_words)] += head
        return out
    from .sparse import to_dense

    return to_dense(m)
