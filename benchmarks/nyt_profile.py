"""Warm per-stage timing at the NYTimes bench shape (the primary workload):
isolates each pipeline stage so SpMM-tuning work has a stable signal
(first-run remote-compile latency here is erratic; see BENCH_NOTES.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/nyt_profile.py [--small]
"""

import sys
import time

import numpy as np


def t(label, fn, reps=2):
    fn()  # warm (pays compile)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:42s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from isle_tpu.bmatrix import threshold_and_copy
    from isle_tpu.config import HyperParams
    from isle_tpu.corpus import Corpus
    from isle_tpu.hybrid import to_hybrid, h_gram_x, h_bt_x, h_b_y
    from isle_tpu.kmeans import _lloyds_iter_full
    from isle_tpu.matops import mat_doc_l2sq
    from isle_tpu.catchwords import rth_highest
    from isle_tpu.topic_model import doc_topic_mass
    from isle_tpu.sparse import DocSparse, gram_x
    from isle_tpu.thresholds import compute_thresholds_jax

    from bench import synth_corpus, NYT, SMALL

    shape = SMALL if "--small" in sys.argv else NYT
    V, D, NNZ, k = shape["vocab"], shape["docs"], shape["nnz"], shape["k"]
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    print(f"shape: {V} x {D}, nnz {corpus.nnz}, k {k}", flush=True)
    hp = HyperParams()

    t0 = time.perf_counter()
    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    float(A.d_val.sum())
    print(f"{'upload A (cold)':42s} {(time.perf_counter()-t0)*1e3:9.1f} ms",
          flush=True)

    t("thresholds", lambda: int(
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

    # Factored layout at the e2e head sizing (bf16 binary head, 2 B/cell)
    # — the operator the trainer actually runs.
    num_head = min(V, (1536 << 20) // max(2 * B.num_docs, 1))
    rs = jnp.sqrt(zetas)
    t("to_hybrid (factored)", lambda: to_hybrid(
        B, int(num_head), chunk=1 << 21, row_scale=rs
    ))
    H = to_hybrid(B, int(num_head), chunk=1 << 21, row_scale=rs)
    print(
        f"head: {H.num_head} rows cover {H.head_nnz/H.nnz:.0%} of nnz; "
        f"tail doc-pad {H.td_word.shape[0]} w-pad {H.tw_doc.shape[0]}",
        flush=True,
    )
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((V, 128)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((B.num_docs, 128)).astype(np.float32))
    dt_bt = t("h_bt_x width 128", lambda: float(h_bt_x(H, X, 1 << 21).sum()))
    dt_by = t("h_b_y width 128", lambda: float(h_b_y(H, Y, 1 << 21).sum()))
    dt = t("h_gram_x width 128", lambda: float(h_gram_x(H, X, 1 << 21).sum()))
    gf = 4 * B.nnz * 128 / dt / 1e9
    print(f"  -> gram nominal {gf:.1f} GFLOP/s "
          f"(bt {2*B.nnz*128/dt_bt/1e9:.1f}, b_y {2*B.nnz*128/dt_by/1e9:.1f})",
          flush=True)
    t("gram_x plain COO width 128",
      lambda: float(gram_x(B, X, 1 << 21).sum()))

    docs_l2 = mat_doc_l2sq(H)
    centers = jnp.asarray(
        rng.standard_normal((k, V)).astype(np.float32)
    )
    t("lloyds iter (fused, hybrid)", lambda: jax.block_until_ready(
        _lloyds_iter_full(H, centers, docs_l2, k)
    )[1].sum().item())

    Xk = jnp.asarray(rng.standard_normal((V, k)).astype(np.float32))
    t("project bt_x width k", lambda: float(h_bt_x(H, Xk, 1 << 21).sum()))

    cl = jnp.asarray(rng.integers(0, k, D).astype(np.int32))
    sizes = jnp.asarray(np.bincount(np.asarray(cl), minlength=k).astype(np.int32))
    t("rth_highest (A)", lambda: float(
        rth_highest(A, cl, sizes, k, 50).sum()
    ), reps=1)
    cwt = jnp.asarray(rng.integers(-1, k, V).astype(np.int32))
    t("doc_topic_mass (A)", lambda: float(
        doc_topic_mass(A, cwt, k).sum()
    ), reps=1)


if __name__ == "__main__":
    main()
