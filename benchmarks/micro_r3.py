"""Round-3 stage dissection at the NYTimes shape: upload wire time vs
device build, the fused-hybrid-build sub-programs, and the compacted
r-th-highest passes. Identifies which of the remaining warm seconds are
link, scatter-rate, or fixable.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_r3.py [--small]
"""

import sys
import time

import numpy as np


def sync(x):
    """Force host readback of ONE element per output (block_until_ready
    does not await remote execution on the axon tunnel; a full
    np.asarray download would swamp the timing on the ~30 MB/s link)."""
    import jax
    import jax.numpy as jnp

    tot = 0.0
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "ravel"):
            tot += float(jnp.ravel(l)[0].astype(jnp.float32))
    return tot


def t(label, fn, reps=2):
    fn()  # warm (pays compile)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from isle_tpu import hybrid as hy
    from isle_tpu.catchwords import _rth_classify, _rth_select, rth_highest
    from isle_tpu.config import HyperParams
    from isle_tpu.corpus import Corpus
    from isle_tpu.sparse import DocSparse, _pad_to, encode_word_deltas, \
        _pad_exceptions
    from isle_tpu.thresholds import compute_thresholds_jax

    from bench import synth_corpus, NYT, SMALL

    shape = SMALL if "--small" in sys.argv else NYT
    V, D, NNZ, k = shape["vocab"], shape["docs"], shape["nnz"], shape["k"]
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    nnz = corpus.nnz
    print(f"shape: {V} x {D}, nnz {nnz}, k {k}", flush=True)
    hp = HyperParams()
    chunk = 1 << 21

    # --- upload: wire time alone (compact arrays, forced flush) ---
    npad = max(chunk, ((nnz + chunk - 1) // chunk) * chunk)
    d16, exc_i, exc_v = encode_word_deltas(corpus.rows, corpus.offsets)
    exc_i, exc_v = _pad_exceptions(exc_i, exc_v, npad)
    cnts = _pad_to(corpus.counts.astype(np.uint8), npad, 0)
    d16p = _pad_to(d16, npad, np.uint16(0))

    def wire():
        a = jnp.asarray(d16p)
        b = jnp.asarray(cnts)
        return float(a[::1 << 20].astype(jnp.int32).sum()) + float(
            b[::1 << 20].astype(jnp.int32).sum()
        )

    mb = (d16p.nbytes + cnts.nbytes) / 1e6
    dt = t(f"upload wire ({mb:.0f} MB compact arrays)", wire, reps=1)
    print(f"  -> {mb / dt:.1f} MB/s effective", flush=True)

    # Pipelined variant: dispatch S slice transfers before any sync; if
    # the tunnel is latency-bound this overlaps round trips.
    for S in (4, 16):
        def wire_sliced(S=S):
            n = len(d16p)
            step = (n // S // (1 << 12)) * (1 << 12)
            parts = [jnp.asarray(d16p[i * step:(i + 1) * step])
                     for i in range(S)]
            parts += [jnp.asarray(cnts[i * step:(i + 1) * step])
                      for i in range(S)]
            return sum(
                float(p[:: 1 << 20].astype(jnp.int32).sum()) for p in parts
            )

        dt = t(f"upload wire, {S} pipelined slices", wire_sliced, reps=1)
        print(f"  -> {mb / dt:.1f} MB/s effective", flush=True)

    t0 = time.perf_counter()
    A = DocSparse.from_corpus(corpus, chunk=chunk)
    float(A.d_val.sum())
    print(f"{'from_corpus total COLD (upload+build+compile)':46s} "
          f"{(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)
    t0 = time.perf_counter()
    A2 = DocSparse.from_corpus(corpus, chunk=chunk)
    float(A2.d_val.sum())
    print(f"{'from_corpus total WARM (upload+build)':46s} "
          f"{(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)
    del A2

    # --- thresholds isolated ---
    t("thresholds (histogram + select, sync)", lambda: int(
        compute_thresholds_jax(
            A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
        )[1]
    ))
    zetas, _ = compute_thresholds_jax(
        A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
    )

    # --- fused hybrid build: total + each sub-program ---
    budget = 1536 << 20
    t("hybrid_from_thresholds TOTAL", lambda: sync(
        hy.hybrid_from_thresholds(A, zetas, budget, chunk=chunk)[0].head
    ))

    sel_p = jnp.ones((D + 1,), bool)
    t("  _occupancy", lambda: sync(
        hy._occupancy(A.d_word, A.d_doc, A.d_val, zetas, sel_p, D)
    ))
    keep_d, occ, new_doc, frob = hy._occupancy(
        A.d_word, A.d_doc, A.d_val, zetas, sel_p, D
    )
    nz_docs = int(jnp.sum(occ))
    num_head = int(min(V, max(8, budget // max(2 * nz_docs, 1)),
                       hy.max_head_rows(nz_docs)))
    t("  _head_select_masked", lambda: sync(
        hy._head_select_masked(A.w_word, A.w_val, A.w_doc, zetas, sel_p,
                               V, num_head)
    ))
    head_words, is_head, rank, keep_w, rankx = hy._head_select_masked(
        A.w_word, A.w_val, A.w_doc, zetas, sel_p, V, num_head
    )
    ndp = jnp.concatenate([new_doc, jnp.full((1,), nz_docs, jnp.int32)])
    t("  _build_head_masked (48M flat set)", lambda: sync(
        hy._build_head_masked(A.d_word, A.d_doc, keep_d, rankx, ndp,
                              num_head, nz_docs)
    ))
    t("  _plans_masked (both pad plans)", lambda: sync(
        hy._plans_masked(A.d_word, A.d_doc, keep_d, A.w_word, keep_w,
                         is_head, D, V)
    ))
    pos_d, Nt_a, off_d, pos_w, Nw_a, off_w, tail_nnz = hy._plans_masked(
        A.d_word, A.d_doc, keep_d, A.w_word, keep_w, is_head, D, V
    )
    Nt = int(Nt_a); Nw = int(Nw_a)
    Nt_pad = max(((Nt + chunk - 1) // chunk) * chunk, chunk)
    Nw_pad = max(((Nw + chunk - 1) // chunk) * chunk, chunk)
    t("  _compact_tail (doc side)", lambda: sync(
        hy._compact_tail_oseg_remap(A.d_word, pos_d, off_d, ndp, Nt_pad, V)
    ))
    t("  _compact_tail (word side)", lambda: sync(
        hy._compact_tail_remap(A.w_doc, ndp, pos_w, off_w, Nw_pad, nz_docs)
    ))

    # --- r-th highest: compacted two-pass ---
    rng = np.random.default_rng(0)
    cl = jnp.asarray(rng.integers(0, k, D).astype(np.int32))
    sizes = jnp.asarray(np.bincount(np.asarray(cl), minlength=k).astype(np.int32))
    r = hp.catchword_rank(D, k, None)
    print(f"r = {r}", flush=True)
    t("rth classify (counts + positions)", lambda: sync(
        _rth_classify(A, cl, sizes, k, r)
    ), reps=1)
    counts2, pos, m = _rth_classify(A, cl, sizes, k, r)
    M = int(m)
    print(f"  selected entries: {M} ({M / max(nnz,1):.1%} of nnz)", flush=True)
    Mp = max(((M + (1 << 20) - 1) // (1 << 20)) * (1 << 20), 8)
    t("rth select (compact+sort+gather)", lambda: sync(
        _rth_select(A, cl, sizes, counts2, pos, k, r, Mp)
    ), reps=1)
    t("rth_highest TOTAL", lambda: float(
        rth_highest(A, cl, sizes, k, r).sum()
    ), reps=1)


if __name__ == "__main__":
    main()
