"""Hybrid dense-head / sparse-tail matrix layout — the optimized engine
behind the SpMM primitives.

Motivation (measured on TPU v5e, see benchmarks/micro_parts.py): the plain
COO gather/scatter SpMM is scatter-bound (~44 GB/s effective); XLA row
gathers run at ~100 GB/s; dense MXU matmuls are essentially free at these
shapes. Text corpora are Zipf-distributed, so a small set of head words
carries most of the nonzeros. We therefore split

    B = B_head + B_tail

  - B_head: the top-R rows (words) stored DENSE as an (R x docs) float32
    matrix. Both SpMM directions on the head are single MXU matmuls.
  - B_tail: the remaining entries in dual-sorted COO, with each segment
    (doc for the doc-sorted copy, word for the word-sorted copy) padded to
    a multiple of 8 rows. Because segments then align to 8-row groups, the
    gathered (n x width) block reduces 8-to-1 with a pure reshape-sum
    before the scatter-add, cutting scatter traffic 8x (the two-level
    sorted segment sum).

This mirrors the reference's cache-conscious splits (nnz-balanced row
blocks, include/matUtils.h:244-268) re-derived for MXU/HBM economics.
The layout is built ON DEVICE from a DocSparse (one top-k + a few
segment-sums + scatters), so no large host round-trips occur.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
from .sparse import DocSparse

HI = jax.lax.Precision.HIGHEST
DEFAULT_CHUNK = 1 << 21


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridSparse:
    """Dense head (R x D) + octet-padded dual-sorted COO tail."""

    head_words: jax.Array  # (R,) int32 word ids of dense rows
    head: jax.Array  # (R, D) float32
    # tail, doc-sorted, segments padded to x8; pads: word=vocab, val=0
    td_word: jax.Array  # (Nt,)
    td_val: jax.Array  # (Nt,)
    td_odoc: jax.Array  # (Nt/8,) per-octet doc id (num_docs for all-pad)
    # tail, word-sorted, segments padded to x8; pads: doc=num_docs, val=0
    tw_doc: jax.Array  # (Nw,)
    tw_val: jax.Array  # (Nw,)
    tw_oword: jax.Array  # (Nw/8,) per-octet word id (vocab for all-pad)
    vocab: int = dataclasses.field(metadata=dict(static=True))
    num_docs: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    head_nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_head(self) -> int:
        return self.head_words.shape[0]


def _pad8_plan(mask: jax.Array, seg: jax.Array, num_segments: int):
    """Positions for compaction of masked entries into per-segment blocks
    padded to multiples of 8. Returns (pos, padded_counts)."""
    m = mask.astype(jnp.int32)
    counts = jax.ops.segment_sum(m, seg, num_segments=num_segments + 1)[
        :num_segments
    ]
    padded = ((counts + 7) // 8) * 8
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
    )
    # global rank among masked entries, then rank within segment
    grank = jnp.cumsum(m) - 1
    seg_tail_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
    )
    segc = jnp.minimum(seg, num_segments)
    within = grank - seg_tail_start[segc]
    pos = jnp.where(mask, offsets[segc] + within, jnp.int32(0x7FFFFFF0))
    return pos, padded, offsets


@partial(jax.jit, static_argnames=("num_head",))
def _head_select(sp: DocSparse, num_head: int):
    V = sp.vocab
    counts = jax.ops.segment_sum(
        (sp.w_word < V).astype(jnp.int32), sp.w_word, num_segments=V + 1
    )[:V]
    _, head_words = jax.lax.top_k(counts, num_head)
    head_words = jnp.sort(head_words).astype(jnp.int32)
    is_head = jnp.zeros((V + 1,), bool).at[head_words].set(True)
    rank = jnp.zeros((V + 1,), jnp.int32).at[head_words].set(
        jnp.arange(num_head, dtype=jnp.int32)
    )
    return head_words, is_head, rank


@partial(jax.jit, static_argnames=("num_head", "num_docs"))
def _build_head(sp: DocSparse, rank, is_head, num_head: int, num_docs: int):
    r = rank[sp.d_word]
    hmask = is_head[sp.d_word]
    rr = jnp.where(hmask, r, num_head)
    dd = jnp.where(hmask, sp.d_doc, num_docs)
    H = jnp.zeros((num_head + 1, num_docs + 1), jnp.float32)
    H = H.at[rr, dd].add(sp.d_val)
    return H[:num_head, :num_docs], hmask.sum()


@partial(jax.jit, static_argnames=("vocab", "num_segments"))
def _tail_plan(word, seg, is_head, vocab: int, num_segments: int):
    mask = (~is_head[word]) & (word < vocab)
    return _pad8_plan(mask, seg, num_segments)


# Per-octet segment ids: pads carry the spill id, so a min over each octet
# recovers the real segment (octets never straddle segments).
@partial(jax.jit, static_argnames=("vocab", "n_pad", "seg_spill"))
def _compact_tail(word, seg, val, pos, vocab: int, n_pad: int, seg_spill: int):
    out_w = jnp.full((n_pad,), vocab, jnp.int32).at[pos].set(word, mode="drop")
    out_v = jnp.zeros((n_pad,), jnp.float32).at[pos].set(val, mode="drop")
    big = jnp.int32(seg_spill)
    out_s = jnp.full((n_pad,), big).at[pos].set(seg, mode="drop")
    oseg = jnp.min(out_s.reshape(n_pad // 8, 8), axis=1)
    return out_w, out_v, oseg


@partial(jax.jit, static_argnames=("n_pad", "fill"))
def _compact_ids(ids, pos, n_pad: int, fill: int):
    return jnp.full((n_pad,), fill, jnp.int32).at[pos].set(ids, mode="drop")


def to_hybrid(
    sp: DocSparse, num_head: int, chunk: int = DEFAULT_CHUNK
) -> HybridSparse:
    """Build the hybrid layout on device from a DocSparse."""
    V, D = sp.vocab, sp.num_docs
    num_head = int(min(num_head, V))
    head_words, is_head, rank = _head_select(sp, num_head)

    head, head_nnz = _build_head(sp, rank, is_head, num_head, D)
    head_nnz = int(head_nnz)

    # Tail plans: sizes need a host sync to fix static shapes.
    pos_d, padded_d, _ = _tail_plan(sp.d_word, sp.d_doc, is_head, V, D)
    pos_w, padded_w, _ = _tail_plan(sp.w_word, sp.w_word, is_head, V, V)
    Nt = int(jnp.sum(padded_d))
    Nw = int(jnp.sum(padded_w))
    Nt_pad = max(((Nt + chunk - 1) // chunk) * chunk, chunk)
    Nw_pad = max(((Nw + chunk - 1) // chunk) * chunk, chunk)

    td_word, td_val, td_odoc = _compact_tail(
        sp.d_word, sp.d_doc, sp.d_val, pos_d, V, Nt_pad, D
    )
    _, tw_val, tw_oword = _compact_tail(
        sp.w_word, sp.w_word, sp.w_val, pos_w, V, Nw_pad, V
    )
    tw_doc = _compact_ids(sp.w_doc, pos_w, Nw_pad, D)

    return HybridSparse(
        head_words=head_words,
        head=head,
        td_word=td_word,
        td_val=td_val,
        td_odoc=td_odoc,
        tw_doc=tw_doc,
        tw_val=tw_val,
        tw_oword=tw_oword,
        vocab=V,
        num_docs=D,
        nnz=sp.nnz,
        head_nnz=head_nnz,
    )


def _tail_gather_octsum(
    gather_idx: jax.Array,
    vals: jax.Array,
    oct_seg: jax.Array,
    X: jax.Array,
    num_segments: int,
    chunk: int,
) -> jax.Array:
    """Two-level sorted segment sum: gather rows, 8-to-1 reshape-reduce,
    then a scatter-add of octet sums."""
    n = gather_idx.shape[0]
    chunk = min(chunk, n)
    assert n % chunk == 0
    nchunks = n // chunk
    W = X.shape[1]
    gi = gather_idx.reshape(nchunks, chunk)
    vv = vals.reshape(nchunks, chunk)
    os = oct_seg.reshape(nchunks, chunk // 8)

    def body(acc, args):
        g_idx, v, seg = args
        g = jnp.take(X, g_idx, axis=0, fill_value=0.0) * v[:, None]
        octs = jnp.sum(g.reshape(chunk // 8, 8, W), axis=1)
        acc = acc.at[seg].add(octs, indices_are_sorted=True)
        return acc, None

    out, _ = jax.lax.scan(
        body, jnp.zeros((num_segments + 1, W), dtype=X.dtype), (gi, vv, os)
    )
    return out


@partial(jax.jit, static_argnames=("chunk",))
def h_bt_x(h: HybridSparse, X: jax.Array, chunk: int = DEFAULT_CHUNK) -> jax.Array:
    """B^T X: dense head matmul + tail two-level segment sum."""
    Xh = X[h.head_words]  # (R, W)
    out_head = jnp.matmul(h.head.T, Xh, precision=HI)  # (D, W)
    out = _tail_gather_octsum(
        h.td_word, h.td_val, h.td_odoc, X, h.num_docs, chunk
    )
    return out[: h.num_docs] + out_head


@partial(jax.jit, static_argnames=("chunk",))
def h_b_y(h: HybridSparse, Y: jax.Array, chunk: int = DEFAULT_CHUNK) -> jax.Array:
    """B Y: tail scatter by word + dense head matmul into head rows."""
    out = _tail_gather_octsum(
        h.tw_doc, h.tw_val, h.tw_oword, Y, h.vocab, chunk
    )[: h.vocab]
    head_out = jnp.matmul(h.head, Y[: h.num_docs], precision=HI)  # (R, W)
    return out.at[h.head_words].add(head_out)


@partial(jax.jit, static_argnames=("chunk",))
def h_gram_x(h: HybridSparse, X: jax.Array, chunk: int = DEFAULT_CHUNK) -> jax.Array:
    return h_b_y(h, h_bt_x(h, X, chunk), chunk)


@partial(jax.jit, static_argnames=("chunk",))
def h_doc_l2sq(h: HybridSparse, chunk: int = DEFAULT_CHUNK) -> jax.Array:
    head_l2 = jnp.sum(h.head * h.head, axis=0)  # (D,)
    n = h.td_val.shape[0]
    c = min(chunk, n)
    nchunks = n // c

    def body(acc, args):
        v, seg = args
        octs = jnp.sum((v * v).reshape(c // 8, 8), axis=1)
        return acc.at[seg].add(octs, indices_are_sorted=True), None

    tail, _ = jax.lax.scan(
        body,
        jnp.zeros((h.num_docs + 1,), jnp.float32),
        (h.td_val.reshape(nchunks, c), h.td_odoc.reshape(nchunks, c // 8)),
    )
    return head_l2 + tail[: h.num_docs]


def h_spmm_flops(h: HybridSparse, width: int) -> int:
    """FLOPs of one h_bt_x or h_b_y (dense head counts its real MXU work)."""
    tail_nnz = h.nnz - h.head_nnz
    return 2 * tail_nnz * width + 2 * h.num_head * h.num_docs * width
