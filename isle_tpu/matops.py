"""Type-dispatched SpMM surface: every consumer (eigensolver, k-means,
projections, topic construction) works against these, so the plain COO
layout (DocSparse) and the optimized dense-head/sparse-tail layout
(HybridSparse) are interchangeable."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hybrid import (
    HybridSparse,
    _head_dot,
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


@partial(jax.jit, static_argnames=("E", "blk", "octets"))
def _bt_x_block(words, seg, vals, Xs, start, lo, E: int, blk: int,
                octets: bool):
    """One doc block of B^T X from an entry slice [start, start+E).
    `seg` is the per-entry doc id array, or the per-OCTET doc id array
    when octets=True (the hybrid tail; start is then 8-aligned and E a
    multiple of 8). Out-of-slice gathers fill with the spill ids/zeros."""
    W = Xs.shape[1]
    idx = start + jnp.arange(E, dtype=jnp.int32)
    w = jnp.take(words, idx, mode="fill", fill_value=Xs.shape[0])
    if octets:
        oidx = start // 8 + jnp.arange(E // 8, dtype=jnp.int32)
        od = jnp.take(seg, oidx, mode="fill", fill_value=-1)
        d = jnp.repeat(od, 8)
    else:
        d = jnp.take(seg, idx, mode="fill", fill_value=-1)
    # word ids >= Xs rows (tail pads, slice overruns) fill zero rows
    g = jnp.take(Xs, w, axis=0, mode="fill", fill_value=0.0)
    if vals is not None:
        v = jnp.take(vals, idx, mode="fill", fill_value=0.0)
        g = g * v[:, None]
    valid = (d >= lo) & (d < lo + blk)
    dloc = jnp.where(valid, d - lo, blk)
    out = jnp.zeros((blk + 1, W), jnp.float32)
    out = out.at[dloc].add(jnp.where(valid[:, None], g, 0.0))
    return out[:blk]


def mat_bt_x_blockwise(m, X: jax.Array, doc_block: int = 1 << 18,
                       chunk: int = 1 << 20) -> jax.Array:
    """B^T X computed one doc block at a time — the implicit-projection
    mode (USE_EXPLICIT_PROJECTED_MATRIX=false, reference
    src/trainer.cpp:522-531, blockwise UT_times_docs
    src/sparseMatrix.cpp:1749-1791). This is a VERIFICATION path: a
    genuinely different evaluation order (per-block entry slices,
    per-block scatters) whose agreement with the one-shot mat_bt_x
    cross-checks the projection stage, as the reference's built-in A/B
    harness does. Not the perf path."""
    D = m.num_docs
    blk = int(min(doc_block, max(D, 1)))
    nblocks = (D + blk - 1) // blk
    los = np.arange(nblocks, dtype=np.int64) * blk

    hybrid = isinstance(m, HybridSparse)
    if hybrid:
        words, seg, octets = m.td_word, m.td_odoc, True
        if m.row_scale is not None:
            Xs = X[: m.vocab] * m.row_scale[:, None]
            vals = None
        else:
            Xs, vals = X[: m.vocab], m.td_val
    else:
        words, seg, vals, octets = m.d_word, m.d_doc, m.d_val, False
        Xs = X[: m.vocab]

    # Per-block entry spans from one device searchsorted (+1 readback).
    edges = jnp.searchsorted(
        seg, jnp.arange(0, (nblocks + 1) * blk, blk, dtype=seg.dtype),
        side="left",
    )
    edges_h = np.asarray(edges).astype(np.int64)
    if octets:
        edges_h = edges_h * 8
    spans = np.diff(edges_h)
    E = int(max(spans.max(initial=0), 8))
    E = ((E + 7) // 8) * 8

    head_p = None
    if hybrid:
        Dp = nblocks * blk
        head_p = (
            m.head if Dp == D
            else jnp.pad(m.head, ((0, 0), (0, Dp - D)))
        )
        Xh = Xs[m.head_words]

    outs = []
    for i, lo in enumerate(los):
        out = _bt_x_block(
            words, seg, vals, Xs,
            jnp.int32(edges_h[i]), jnp.int32(lo), E, blk, octets,
        )
        if hybrid:
            hb = jax.lax.dynamic_slice_in_dim(head_p, int(lo), blk, 1)
            out = out + _head_dot(hb, Xh, transpose=True)
        outs.append(out)
    return jnp.concatenate(outs, axis=0)[:D]


def mat_to_dense(m):
    """Densify (tests / dense-oracle paths on small problems only).

    Sharded layouts gather to host and densify in GLOBAL compact doc
    order (the order of sharding.compact_doc_rows), which is what makes
    the dense-oracle eigensolver (reference src/sparseMatrix.cpp:1155's
    full-SVD cross-check) available under mesh training: the oracle is
    a host float64 eigh, so a host gather is its natural input."""
    import numpy as np

    from .sharding import ShardedDocSparse, ShardedHybrid

    if isinstance(m, ShardedDocSparse):
        S, dps, V = m.num_shards, m.docs_per_shard, m.vocab
        valid = m.valid_per_shard()
        offs = np.concatenate([[0], np.cumsum(valid)]).astype(np.int64)
        out = np.zeros((V, m.num_docs), np.float32)
        dw = np.asarray(m.d_word)
        dd = np.asarray(m.d_doc)
        dv = np.asarray(m.d_val)
        for s in range(S):
            w, d, v = dw[s], dd[s], dv[s]
            keep = (w < V) & (d < valid[s])
            np.add.at(out, (w[keep], offs[s] + d[keep]), v[keep])
        return out
    if isinstance(m, ShardedHybrid):
        S, dps, V = m.num_shards, m.docs_per_shard, m.vocab
        valid = m.valid_per_shard()
        offs = np.concatenate([[0], np.cumsum(valid)]).astype(np.int64)
        scale = np.asarray(m.row_scale, np.float32)
        out = np.zeros((V, m.num_docs), np.float32)
        td_w = np.asarray(m.td_word)
        td_d = np.repeat(np.asarray(m.td_odoc), 8, axis=1)
        head = np.asarray(m.head, np.float32)
        hw = np.asarray(m.head_words)
        for s in range(S):
            w, d = td_w[s], td_d[s]
            keep = (w < V) & (d < valid[s])
            np.add.at(out, (w[keep], offs[s] + d[keep]), scale[w[keep]])
            cols = slice(offs[s], offs[s] + valid[s])
            out[hw, cols] += head[s][:, : valid[s]] * scale[hw][:, None]
        return out
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
