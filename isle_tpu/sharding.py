"""Multi-chip execution: document-axis sharding over a device mesh.

The reference is a single-node shared-memory code (SURVEY.md §2: no
MPI/NCCL anywhere); its scale axes are doc-block streaming and nnz-balanced
chunking. The TPU-native translation (SURVEY.md §5.7-5.8) shards the
DOCUMENT axis of the term-document matrix across a 1-D mesh:

  - each device holds a contiguous doc range's COO entries (padded to the
    per-device max), with doc ids local to the shard;
  - B^T X keeps X replicated and yields doc-sharded rows with NO
    communication;
  - B Y reduces per-device partial (vocab, width) products with a psum
    over ICI;
  - k-means assignments stay local; center/count updates psum;
  - the per-word threshold histogram psums;
  - MWU inference is embarrassingly doc-parallel.

Everything routes through shard_map so the collectives are explicit; k- and
vocab-dimension state (U, centers, model) is replicated — it is tiny
relative to the nnz payload, exactly like the reference's shared-memory
k x k state.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sparse import DocSparse, _pad_to

AXIS = "docs"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedDocSparse:
    """Doc-sharded COO: leading axis = device shard. Entry doc ids are
    LOCAL to the shard; `doc_offset[s]` maps back to global ids. Both sort
    orders hold the same shard's entries (word-sorted within the shard)."""

    d_word: jax.Array  # (S, n_pad)
    d_doc: jax.Array  # (S, n_pad) local ids
    d_val: jax.Array
    w_word: jax.Array
    w_doc: jax.Array
    w_val: jax.Array
    doc_offset: jax.Array  # (S,)
    vocab: int = dataclasses.field(metadata=dict(static=True))
    docs_per_shard: int = dataclasses.field(metadata=dict(static=True))
    num_docs: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_shards(self) -> int:
        return self.d_word.shape[0]


def shard_doc_sparse(
    words: np.ndarray,
    docs: np.ndarray,
    vals: np.ndarray,
    vocab: int,
    num_docs: int,
    mesh: Mesh,
    pad_multiple: int = 1 << 13,
) -> ShardedDocSparse:
    """Host-side: split doc-sorted COO into contiguous doc ranges, one per
    device, each padded to the common max entry count."""
    S = mesh.devices.size
    dps = -(-num_docs // S)  # docs per shard
    words = np.asarray(words, np.int32)
    docs = np.asarray(docs, np.int32)
    vals = np.asarray(vals, np.float32)
    bounds = np.searchsorted(docs, np.arange(0, (S + 1) * dps, dps))
    max_n = int((np.diff(bounds)).max()) if len(words) else 0
    n_pad = max(pad_multiple, -(-max_n // pad_multiple) * pad_multiple)

    def shard_arrays(order_key):
        dw = np.full((S, n_pad), vocab, np.int32)
        dd = np.full((S, n_pad), dps, np.int32)
        dv = np.zeros((S, n_pad), np.float32)
        for s in range(S):
            lo, hi = bounds[s], bounds[s + 1]
            w, d, v = words[lo:hi], docs[lo:hi] - s * dps, vals[lo:hi]
            if order_key == "word":
                o = np.lexsort((d, w))
                w, d, v = w[o], d[o], v[o]
            dw[s, : hi - lo] = w
            dd[s, : hi - lo] = d
            dv[s, : hi - lo] = v
        return dw, dd, dv

    dw, dd, dv = shard_arrays("doc")
    ww, wd, wv = shard_arrays("word")
    sh = NamedSharding(mesh, P(AXIS))
    put = lambda x: jax.device_put(x, sh)
    return ShardedDocSparse(
        d_word=put(dw),
        d_doc=put(dd),
        d_val=put(dv),
        w_word=put(ww),
        w_doc=put(wd),
        w_val=put(wv),
        doc_offset=jax.device_put(
            np.arange(S, dtype=np.int32)[:, None] * dps, sh
        ),
        vocab=vocab,
        docs_per_shard=dps,
        num_docs=num_docs,
        nnz=len(words),
    )


def from_doc_sparse(sp: DocSparse, mesh: Mesh) -> ShardedDocSparse:
    n = sp.nnz
    return shard_doc_sparse(
        np.asarray(sp.d_word)[:n],
        np.asarray(sp.d_doc)[:n],
        np.asarray(sp.d_val)[:n],
        sp.vocab,
        sp.num_docs,
        mesh,
    )


def _shard_specs(ssp: ShardedDocSparse):
    return ShardedDocSparse(
        d_word=P(AXIS),
        d_doc=P(AXIS),
        d_val=P(AXIS),
        w_word=P(AXIS),
        w_doc=P(AXIS),
        w_val=P(AXIS),
        doc_offset=P(AXIS),
        vocab=ssp.vocab,
        docs_per_shard=ssp.docs_per_shard,
        num_docs=ssp.num_docs,
        nnz=ssp.nnz,
    )


def _local_bt_x(word, doc, val, X, dps):
    g = jnp.take(X, word[0], axis=0, fill_value=0.0) * val[0][:, None]
    out = jax.ops.segment_sum(g, doc[0], num_segments=dps + 1)
    return out[None, :dps]


def _local_b_y_partial(word, doc, val, Y, vocab):
    g = jnp.take(Y, doc[0], axis=0, fill_value=0.0) * val[0][:, None]
    out = jax.ops.segment_sum(g, word[0], num_segments=vocab + 1)
    return out[:vocab]


def sharded_bt_x(ssp: ShardedDocSparse, X: jax.Array, mesh: Mesh) -> jax.Array:
    """(S, docs_per_shard, width), doc-sharded; X replicated."""
    dps = ssp.docs_per_shard

    def f(word, doc, val, X):
        return _local_bt_x(word, doc, val, X, dps)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS),
    )(ssp.d_word, ssp.d_doc, ssp.d_val, X)


def sharded_b_y(ssp: ShardedDocSparse, Y: jax.Array, mesh: Mesh) -> jax.Array:
    """Y: (S, docs_per_shard, width) doc-sharded -> (vocab, width)
    replicated via psum over ICI."""
    vocab = ssp.vocab

    def f(word, doc, val, Y):
        part = _local_b_y_partial(word, doc, val, Y[0], vocab)
        return jax.lax.psum(part, AXIS)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(),
    )(ssp.w_word, ssp.w_doc, ssp.w_val, Y)


def sharded_gram_x(ssp: ShardedDocSparse, X: jax.Array, mesh: Mesh) -> jax.Array:
    """(B B^T) X with one psum per product — the multi-chip eigensolver
    operator."""
    vocab, dps = ssp.vocab, ssp.docs_per_shard

    def f(dw, dd, dv, ww, wd, wv, X):
        local = _local_bt_x(dw, dd, dv, X, dps)  # (1, dps, c)
        part = _local_b_y_partial(ww, wd, wv, local[0], vocab)
        return jax.lax.psum(part, AXIS)

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(AXIS),) * 6 + (P(),),
        out_specs=P(),
    )(ssp.d_word, ssp.d_doc, ssp.d_val, ssp.w_word, ssp.w_doc, ssp.w_val, X)


def sharded_train_step(ssp: ShardedDocSparse, mesh: Mesh, num_topics: int):
    """One composite, jittable 'training step' exercising every collective
    pattern of the pipeline on the mesh: a Krylov operator application
    (psum), per-shard k-means assignment (local), center/count update
    (psum), and a threshold histogram (psum). Returns a jitted fn and
    example args."""
    vocab, dps = ssp.vocab, ssp.docs_per_shard
    k = num_topics

    def step(ssp, X, centers):
        # (a) eigensolver operator
        Y = sharded_gram_x(ssp, X, mesh)

        # (b) k-means: assignment local to each doc shard, update psum'd
        def assign_update(dw, dd, dv, ww, wd, wv, centers):
            dots = _local_bt_x(dw, dd, dv, centers.T, dps)[0]  # (dps, k)
            l2 = jax.ops.segment_sum(
                dv[0] * dv[0], dd[0], num_segments=dps + 1
            )[:dps]
            c_l2 = jnp.sum(centers * centers, axis=1)
            dist = l2[:, None] + c_l2[None, :] - 2.0 * dots
            assign = jnp.argmin(dist, axis=1).astype(jnp.int32)
            onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
            sums = _local_b_y_partial(ww, wd, wv, onehot, vocab)
            sums = jax.lax.psum(sums, AXIS)  # (vocab, k)
            counts = jax.lax.psum(jnp.sum(onehot, axis=0), AXIS)
            new_centers = jnp.where(
                counts[None, :] > 0, sums / counts[None, :], 0.0
            ).T
            return assign[None], new_centers

        assign, new_centers = jax.shard_map(
            assign_update,
            mesh=mesh,
            in_specs=(P(AXIS),) * 6 + (P(),),
            out_specs=(P(AXIS), P()),
        )(ssp.d_word, ssp.d_doc, ssp.d_val, ssp.w_word, ssp.w_doc, ssp.w_val,
          centers)

        # (c) threshold histogram over word ids, psum'd
        def hist(dw):
            h = jax.ops.segment_sum(
                jnp.ones_like(dw[0], jnp.float32), dw[0],
                num_segments=vocab + 1,
            )
            return jax.lax.psum(h[:vocab], AXIS)

        h = jax.shard_map(hist, mesh=mesh, in_specs=(P(AXIS),), out_specs=P())(
            ssp.d_word
        )
        return Y, assign, new_centers, h

    return jax.jit(step)
