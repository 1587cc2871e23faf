"""Head-budget sensitivity of the factored-layout operators at the
NYTimes shape: coverage, h_gram_x, Lloyd's iter, and build time per
dense-head budget. Decides the default dense_head_bytes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_head_budget.py
"""

import time

import numpy as np


def t(label, fn, reps=2):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from isle_tpu.config import HyperParams
    from isle_tpu.corpus import Corpus
    from isle_tpu.hybrid import h_gram_x, hybrid_from_thresholds
    from isle_tpu.kmeans import _lloyds_iter_full
    from isle_tpu.matops import mat_doc_l2sq
    from isle_tpu.sparse import DocSparse
    from isle_tpu.thresholds import compute_thresholds_jax

    from bench import synth_corpus, NYT

    V, D, NNZ, k = NYT["vocab"], NYT["docs"], NYT["nnz"], NYT["k"]
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    print(f"shape: {V} x {D}, nnz {corpus.nnz}, k {k}", flush=True)
    hp = HyperParams()
    chunk = 1 << 21

    A = DocSparse.from_corpus(corpus, chunk=chunk)
    zetas, _ = compute_thresholds_jax(
        A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
    )
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((V, 128)).astype(np.float32))

    for gb in (0.75, 1.5, 3.0, 4.5):
        budget = int(gb * (1 << 30))
        t0 = time.perf_counter()
        B, _, _ = hybrid_from_thresholds(A, zetas, budget, chunk=chunk)
        jax.block_until_ready(B.head)
        float(B.row_scale.sum())
        build = time.perf_counter() - t0
        print(
            f"budget {gb:.2f} GB: head {B.num_head} rows, covers "
            f"{B.head_nnz / max(B.nnz, 1):.0%}; build(cold-ish) {build:.1f}s",
            flush=True,
        )
        dt = t(f"  h_gram_x w128 @ {gb:.2f} GB", lambda: float(
            h_gram_x(B, X, chunk).sum()
        ))
        docs_l2 = mat_doc_l2sq(B)
        centers = jnp.asarray(
            rng.standard_normal((k, V)).astype(np.float32)
        )
        t(f"  lloyds iter @ {gb:.2f} GB", lambda: np.asarray(
            _lloyds_iter_full(B, centers, docs_l2, k)[1]
        )[:1].sum())
        del B, docs_l2


if __name__ == "__main__":
    main()
