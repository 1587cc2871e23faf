"""Catchword identification: r-th highest per-(word, cluster) frequency
statistics and the dominance predicate.

Reference semantics:
  - rth_highest_element (src/sparseMatrix.cpp:491-524): for each word and
    cluster, the r-th largest normalized frequency among the cluster's
    docs, where r = floor(eps2 w0 num_docs / (2 k)) (src/trainer.cpp:580-584);
    if the word has <= r occurrences in the cluster the threshold is 0,
    except the degenerate case r >= |cluster| AND the word occurring in
    every doc of the cluster, which takes the minimum.
  - find_catchwords (src/sparseMatrix.cpp:573-594): word w is a catchword
    of topic t iff thr[t, w] > rho * thr[o, w] for every other topic o.

TPU design: a single device sort of (group_key = word * k + cluster,
-value) replaces the reference's per-(word,cluster) vector sorts; the r-th
largest of every group is then one gather at (group_start + r - 1). The
dominance predicate is a max/second-max reduction over the (k, vocab)
threshold matrix — no pairwise loop.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from .sparse import DocSparse


@partial(jax.jit, static_argnames=("num_topics", "r"))
def rth_highest(
    A: DocSparse,
    cluster_of_doc: jax.Array,  # (num_docs,) int32, -1 = not in any cluster
    cluster_sizes: jax.Array,  # (num_topics,) int32
    num_topics: int,
    r: int,
) -> jax.Array:
    """Returns thresholds (num_topics, vocab) float32."""
    assert r >= 1, "r = 0 is undefined in the reference (vector[-1] read)"
    V, k = A.vocab, num_topics

    cl = jnp.concatenate([cluster_of_doc, jnp.full((1,), -1, jnp.int32)])
    c = cl[A.d_doc]
    in_cluster = c >= 0
    # Out-of-cluster and padded entries go to the spill group block.
    key = jnp.where(
        in_cluster, A.d_word * k + jnp.maximum(c, 0), V * k
    ).astype(jnp.int32)
    # Lexicographic sort by (group asc, value desc) in one device sort;
    # values recovered by negation instead of carrying a third operand.
    skey, sneg = jax.lax.sort((key, -A.d_val), num_keys=2, is_stable=False)
    sval = -sneg

    # Group counts as chunked one-hot row scatters into a (V+1, k) matrix
    # (flat many-segment segment_sum compiles pathologically on this TPU
    # toolchain; see thresholds.py).
    n_pad = key.shape[0]
    cchunk = max(min(1 << 19, n_pad), 1)
    while n_pad % cchunk:
        cchunk //= 2

    def count_body(acc, args):
        kk, ic = args
        wrow = kk // k
        col = kk % k
        g = jax.nn.one_hot(col, k, dtype=jnp.float32)
        g = g * ic[:, None]
        return acc.at[wrow].add(g), None

    cm, _ = jax.lax.scan(
        count_body,
        jnp.zeros((V + 1, k), jnp.float32),
        (
            key.reshape(n_pad // cchunk, cchunk),
            in_cluster.astype(jnp.float32).reshape(n_pad // cchunk, cchunk),
        ),
    )
    counts = jnp.concatenate(
        [cm[:V].reshape(V * k), jnp.zeros((k,), jnp.float32)]
    ).astype(jnp.int32)
    starts = jnp.cumsum(counts) - counts  # group start offsets

    npad = skey.shape[0]
    # r-th largest: element at starts + r - 1 (valid when counts > r).
    rth_idx = jnp.clip(starts + (r - 1), 0, npad - 1)
    rth = sval[rth_idx]
    # minimum of group: element at starts + counts - 1.
    min_idx = jnp.clip(starts + counts - 1, 0, npad - 1)
    gmin = sval[min_idx]

    counts2 = counts[: V * k].reshape(V, k)
    rth = rth[: V * k].reshape(V, k)
    gmin = gmin[: V * k].reshape(V, k)
    csz = cluster_sizes[None, :]

    thr = jnp.where(counts2 > r, rth, 0.0)
    degenerate = (counts2 <= r) & (r >= csz) & (counts2 == csz) & (csz > 0)
    thr = jnp.where(degenerate, gmin, thr)
    return thr.T.astype(jnp.float32)  # (k, vocab)


@jax.jit
def find_catchwords(thresholds: jax.Array, rho: float) -> jax.Array:
    """Boolean (num_topics, vocab): t's threshold strictly dominates
    rho * every other topic's threshold."""
    k = thresholds.shape[0]
    scaled = rho * thresholds  # (k, V)
    top = jnp.max(scaled, axis=0)  # (V,)
    top_idx = jnp.argmax(scaled, axis=0)
    masked = jnp.where(
        jnp.arange(k)[:, None] == top_idx[None, :], -jnp.inf, scaled
    )
    second = jnp.max(masked, axis=0)  # (V,)
    # For topic t: the max over others is `second` if t holds the top slot
    # (note ties: argmax picks one; other equal-value topics see `top`).
    others_max = jnp.where(jnp.arange(k)[:, None] == top_idx[None, :], second, top)
    is_cw = thresholds > others_max
    if k == 1:
        is_cw = jnp.zeros_like(is_cw)  # no "other" topics -> predicate false
    return is_cw


def catchword_topic_map(is_cw: np.ndarray) -> np.ndarray:
    """(vocab,) int32: owning topic per catchword, -1 otherwise. Catchwords
    are exclusive by construction (strict dominance)."""
    k, V = is_cw.shape
    out = np.full(V, -1, np.int32)
    t, w = np.nonzero(is_cw)
    out[w] = t
    return out
