"""k-means++ seeding and Lloyd's, projected and full-space."""

import jax
import jax.numpy as jnp
import numpy as np

from isle_tpu.kmeans import (
    kmeans_init_on_projected,
    kmeanspp_on_projected,
    run_lloyds_full,
    run_lloyds_projected,
)
from isle_tpu.sparse import DocSparse, to_dense


def clustered_projected(rng, kdim, k, per):
    mus = rng.standard_normal((k, kdim)) * 10
    pts = np.concatenate(
        [mus[i] + 0.1 * rng.standard_normal((per, kdim)) for i in range(k)]
    )
    return np.asarray(pts.T, np.float32)  # (kdim, D)


def test_kmeanspp_unique_and_count():
    rng = np.random.default_rng(0)
    P = clustered_projected(rng, 6, 8, 40)
    centers, residual = kmeanspp_on_projected(jnp.asarray(P), 8, jax.random.PRNGKey(0))
    c = np.asarray(centers)
    assert len(np.unique(c)) == 8
    assert (c >= 0).all() and (c < P.shape[1]).all()
    assert residual >= 0.0


def test_kmeanspp_spreads_over_clusters():
    # With tight well-separated clusters, D^2 sampling picks one per cluster.
    rng = np.random.default_rng(1)
    k, per = 6, 50
    P = clustered_projected(rng, 4, k, per)
    centers, _ = kmeanspp_on_projected(jnp.asarray(P), k, jax.random.PRNGKey(3))
    picked_clusters = np.asarray(centers) // per
    assert len(np.unique(picked_clusters)) == k


def test_lloyds_projected_recovers_clusters():
    rng = np.random.default_rng(2)
    k, per = 5, 30
    P = clustered_projected(rng, 5, k, per)
    Pj = jnp.asarray(P)
    _, centers0, _ = kmeans_init_on_projected(Pj, k, 1, jax.random.PRNGKey(0))
    centers, assign = run_lloyds_projected(Pj, centers0, 10)
    a = np.asarray(assign)
    # each true cluster maps to exactly one label
    for i in range(k):
        assert len(np.unique(a[i * per : (i + 1) * per])) == 1
    assert len(np.unique(a)) == k


def test_lloyds_full_space():
    rng = np.random.default_rng(3)
    V, D, k = 40, 120, 3
    # three disjoint word blocks
    w_list, d_list, v_list = [], [], []
    for d in range(D):
        block = d % k
        ws = rng.choice(np.arange(block * 13, block * 13 + 13), 5, replace=False)
        for w in np.sort(ws):
            w_list.append(w)
            d_list.append(d)
            v_list.append(rng.integers(1, 4))
    sp = DocSparse.build(
        np.array(w_list), np.array(d_list), np.array(v_list, np.float32), V, D,
        chunk=1024, doc_sorted=True,
    )
    centers0 = jnp.asarray(to_dense(sp)[:, :k].T)  # seed with first docs
    centers, assign = run_lloyds_full(sp, centers0, 10)
    a = np.asarray(assign)
    for blk in range(k):
        assert len(np.unique(a[blk::k])) == 1
    assert len(np.unique(a)) == k


def test_empty_cluster_center_is_zero():
    rng = np.random.default_rng(4)
    P = jnp.asarray(rng.standard_normal((3, 20)).astype(np.float32))
    # Far-away center never wins
    centers0 = jnp.concatenate(
        [jnp.asarray(P[:, :2].T), jnp.full((1, 3), 1e6, jnp.float32)]
    )
    # one iteration: the far center gets no docs -> zero vector
    # (further reps may legitimately assign docs to the origin)
    centers, assign = run_lloyds_projected(P, centers0, 1)
    assert (np.asarray(centers)[2] == 0).all()
