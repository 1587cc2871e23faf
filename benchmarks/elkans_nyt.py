"""Elkan's vs Lloyd's at the NYTimes bench shape on the real TPU:
identical B and initial centers, wall-clock per algorithm, per-rep
flagged-doc counts (printed via the timer diag hook), and the jit-bucket
count (bounded to <= ~9 by run_elkans' bucket grid).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/elkans_nyt.py [--small]
"""

import sys
import time

import numpy as np


class DiagPrinter:
    def diag(self, msg):
        print(f"  {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from isle_tpu.config import HyperParams
    from isle_tpu.corpus import Corpus
    from isle_tpu.elkans import run_elkans
    from isle_tpu.hybrid import hybrid_from_thresholds
    from isle_tpu.kmeans import (
        kmeans_init_on_projected,
        run_lloyds_full,
        run_lloyds_projected,
    )
    from isle_tpu.linalg import block_ks_device
    from isle_tpu.matops import mat_bt_x, mat_gram_x
    from isle_tpu.sparse import DocSparse
    from isle_tpu.thresholds import compute_thresholds_jax

    from bench import synth_corpus, NYT, SMALL

    shape = SMALL if "--small" in sys.argv else NYT
    V, D, NNZ, k = shape["vocab"], shape["docs"], shape["nnz"], shape["k"]
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    print(f"shape: {V} x {D}, nnz {corpus.nnz}, k {k}", flush=True)
    hp = HyperParams()

    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    zetas, _ = compute_thresholds_jax(
        A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
    )
    B, _, _ = hybrid_from_thresholds(A, zetas, 1536 << 20, chunk=1 << 21)
    print(f"B: {B.num_docs} docs, {B.nnz} nnz", flush=True)

    # Same upstream state both algorithms start from (stages 4-7).
    res = block_ks_device(
        lambda B_, X: mat_gram_x(B_, X, 1 << 21), V, k, op_data=B,
        blk=hp.block_ks_block_size, tol=hp.block_ks_tolerance,
        max_restarts=hp.block_ks_max_iters, key=jax.random.PRNGKey(0),
    )
    U = res.evecs
    P = mat_bt_x(B, U, 1 << 21).T
    seeds, centers_lowd, _ = kmeans_init_on_projected(
        P, k, 1, jax.random.PRNGKey(1)
    )
    centers_lowd, _ = run_lloyds_projected(P, centers_lowd, 10)
    centers0 = jnp.matmul(
        centers_lowd, U.T, precision=jax.lax.Precision.HIGHEST
    )
    float(centers0.sum())
    print("upstream ready; timing k-means stage", flush=True)

    # Lloyd's (warm the jits with 1 rep first, then time full runs).
    run_lloyds_full(B, centers0, 1)
    t0 = time.perf_counter()
    c_ll, a_ll = run_lloyds_full(B, centers0, hp.max_kmeans_reps)
    a_ll_h = np.asarray(a_ll)
    t_ll = time.perf_counter() - t0
    print(f"lloyds: {t_ll:.2f}s wall ({hp.max_kmeans_reps} reps max)",
          flush=True)

    # Elkan's: includes its per-rep compile cost on first run; run twice
    # and report both (the second shows the amortized cost).
    for attempt in ("cold", "warm"):
        t0 = time.perf_counter()
        c_el, a_el = run_elkans(
            B, centers0, hp.max_kmeans_reps, timer=DiagPrinter()
        )
        a_el_h = np.asarray(a_el)
        t_el = time.perf_counter() - t0
        print(f"elkans ({attempt}): {t_el:.2f}s wall", flush=True)

    agree = float(np.mean(a_ll_h == a_el_h))
    print(f"assignment agreement lloyds vs elkans: {agree:.4f} "
          "(exact ties may differ; see elkans.py docstring)", flush=True)


if __name__ == "__main__":
    main()
