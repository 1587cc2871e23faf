"""Sub-step profile of hybrid_from_thresholds at the NYTimes bench shape —
locates the warm 11.3 s (the top warm stage after round 2).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_build.py
"""

import sys
import time

import numpy as np


def t(label, fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import synth_corpus, NYT
    from isle_tpu.corpus import Corpus
    from isle_tpu.sparse import DocSparse
    from isle_tpu.thresholds import compute_thresholds_jax
    from isle_tpu.config import HyperParams
    from isle_tpu import hybrid as hy
    from isle_tpu.bmatrix import _keep_mask

    V, D, NNZ, k = NYT["vocab"], NYT["docs"], NYT["nnz"], NYT["k"]
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    hp = HyperParams()

    t("thresholds (doc-ordered)", lambda: float(compute_thresholds_jax(
        A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
    )[1]))
    zetas = jnp.asarray(compute_thresholds_jax(
        A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
    )[0])

    t("full hybrid_from_thresholds", lambda: hy.hybrid_from_thresholds(
        A, zetas, 4096 << 20, chunk=1 << 21
    )[0].head.block_until_ready(), reps=2)

    # sub-steps
    sel_p = jnp.ones((D + 1,), bool)
    t("_occupancy", lambda: float(hy._occupancy(
        A.d_word, A.d_doc, A.d_val, zetas, sel_p, D
    )[3]))
    keep_d, occ, new_doc, _ = hy._occupancy(
        A.d_word, A.d_doc, A.d_val, zetas, sel_p, D
    )
    nz_docs = int(jnp.sum(occ))

    num_head = min(V, max(8, (4096 << 20) // max(2 * nz_docs, 1)),
                   hy.max_head_rows(nz_docs))
    t("_head_select_masked (incl keep_w)", lambda: float(
        hy._head_select_masked(
            A.w_word, A.w_val, A.w_doc, zetas, sel_p, V, num_head
        )[0][0]
    ))
    head_words, is_head, rank, keep_w, rankx = hy._head_select_masked(
        A.w_word, A.w_val, A.w_doc, zetas, sel_p, V, num_head
    )
    ndp = jnp.concatenate([new_doc, jnp.full((1,), nz_docs, jnp.int32)])
    t("_build_head_masked (48M flat set)", lambda: float(
        hy._build_head_masked(
            A.d_word, A.d_doc, keep_d, rankx, ndp, num_head, nz_docs
        )[1]
    ))

    t("_plans_masked (both sides, one jit)", lambda: float(
        hy._plans_masked(
            A.d_word, A.d_doc, keep_d, A.w_word, keep_w, is_head, D, V
        )[1]
    ))
    pos_d, Nt_a, off_d, pos_w, Nw_a, off_w, tail_nnz = hy._plans_masked(
        A.d_word, A.d_doc, keep_d, A.w_word, keep_w, is_head, D, V
    )
    Nt = int(Nt_a)
    Nw = int(Nw_a)
    ch = 1 << 21
    Nt_pad = max(((Nt + ch - 1) // ch) * ch, ch)
    Nw_pad = max(((Nw + ch - 1) // ch) * ch, ch)
    t("_compact_tail doc (oseg remap)", lambda: float(
        hy._compact_tail_oseg_remap(
            A.d_word, pos_d, off_d, ndp, Nt_pad, V
        )[0][0]
    ))
    t("_compact_tail word (id remap)", lambda: float(
        hy._compact_tail_remap(
            A.w_doc, ndp, pos_w, off_w, Nw_pad, nz_docs
        )[0][0]
    ))
    print(f"num_head={num_head} nz_docs={nz_docs} Nt={Nt} Nw={Nw}",
          flush=True)


if __name__ == "__main__":
    main()
