"""Per-stage warm timing at the small-bench shape, isolating dispatch/sync
overhead from compute."""

import time

import numpy as np


def sync(x):
    import jax

    return jax.tree_util.tree_map(
        lambda a: np.asarray(a).ravel()[:1] if hasattr(a, "ravel") else a, x
    )


def t(label, fn, reps=2):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:38s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from isle_tpu.bmatrix import threshold_and_copy
    from isle_tpu.config import HyperParams
    from isle_tpu.corpus import Corpus
    from isle_tpu.hybrid import to_hybrid, h_gram_x
    from isle_tpu.sparse import DocSparse
    from isle_tpu.thresholds import compute_thresholds_jax

    from bench import synth_corpus

    V, D, NNZ, k = 28_000, 40_000, 3_000_000, 20
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    hp = HyperParams()
    print(f"nnz {corpus.nnz}, avg_doc_sz {corpus.avg_doc_sz}", flush=True)

    t("thresholds (full fn + int sync)", lambda: int(
        compute_thresholds_jax(
            A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
        )[1]
    ))
    zetas, _ = compute_thresholds_jax(
        A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
    )
    t("threshold_and_copy", lambda: threshold_and_copy(A, zetas, chunk=1 << 21))
    B, oc = threshold_and_copy(A, zetas, chunk=1 << 21)
    print(f"B: {B.num_docs} docs, {B.nnz} nnz", flush=True)
    t("to_hybrid", lambda: to_hybrid(B, 4096, chunk=1 << 21))
    H = to_hybrid(B, 4096, chunk=1 << 21)
    print(f"head covers {H.head_nnz/H.nnz:.0%}", flush=True)
    X = jnp.asarray(
        np.random.default_rng(0).standard_normal((V, 128)).astype(np.float32)
    )
    t("h_gram_x (one op, sync)", lambda: float(h_gram_x(H, X, 1 << 21).sum()))
    t("roundtrip noop (sync latency)", lambda: float(jnp.float32(1.0) + 1.0))


if __name__ == "__main__":
    main()
