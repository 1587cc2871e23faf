"""Hardware A/B of the pallas segment-sum stages (pallas_ops.py) vs the
XLA scatter paths at the NYTimes bench shape — the keep/flip-default
measurement for TpuConfig.pallas_segsum.

Per stage: warm isolated wall (3 reps, forced host readback) for the
XLA path and the pallas path, plus a max-rel-error check of the pallas
result against the XLA result ON HARDWARE (the mixed-precision MXU
truncation trap is invisible on the CPU backend — CLAUDE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_pallas.py
     [--small] [--chunk 2048]
"""

import argparse
import time

import numpy as np


def t(label, fn, reps=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:52s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(np.abs(b).max(), 1e-30)
    return float(np.abs(a - b).max() / denom)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="1/16-scale shape (quick tunnel smoke)")
    ap.add_argument("--chunk", type=int, default=2048,
                    help="pallas plan chunk (the rcap contract size)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, "/root/repo")
    from bench import synth_corpus, NYT
    from isle_tpu.catchwords import rth_highest
    from isle_tpu.config import HyperParams
    from isle_tpu.corpus import Corpus
    from isle_tpu.pallas_ops import b_y_plan, plan_segments
    from isle_tpu.sparse import DocSparse, b_y
    from isle_tpu.thresholds import compute_thresholds_jax
    from isle_tpu.topic_model import construct_topic_model, doc_topic_mass

    print("backend:", jax.devices()[0].platform, jax.devices()[0],
          flush=True)
    V, D, NNZ, k = NYT["vocab"], NYT["docs"], NYT["nnz"], NYT["k"]
    if args.small:
        V, D, NNZ = V // 4, D // 4, NNZ // 16
    print(f"shape: V={V} D={D} nnz={NNZ} k={k} chunk={args.chunk}",
          flush=True)
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    float(A.d_val.sum())  # drain the upload

    # ---- plan build (once per matrix; amortized over every stage)
    t0 = time.perf_counter()
    plan_d = plan_segments(A.d_doc, D, chunk=args.chunk)
    plan_w = plan_segments(A.w_word, V, chunk=args.chunk)
    dt = time.perf_counter() - t0
    print(f"plan build (both streams, cold): {dt*1e3:.1f} ms  "
          f"rcap_d={plan_d and plan_d.rcap} rcap_w={plan_w and plan_w.rcap}",
          flush=True)
    assert plan_d is not None and plan_w is not None

    hp = HyperParams()
    avg = corpus.avg_doc_sz
    nzd = corpus.nz_docs

    # ---- 1. threshold histogram
    base = compute_thresholds_jax(A.d_word, A.d_val, V, avg, nzd, k, hp)
    zx = np.asarray(base[0])
    t("thresholds XLA (banked one-hot hist)", lambda: float(
        compute_thresholds_jax(A.d_word, A.d_val, V, avg, nzd, k, hp)[0]
        .sum()))
    got = compute_thresholds_jax(
        A.w_word, A.w_val, V, avg, nzd, k, hp, plan=plan_w)
    zp = np.asarray(got[0])
    t("thresholds PALLAS (MXU one-hot hist)", lambda: float(
        compute_thresholds_jax(
            A.w_word, A.w_val, V, avg, nzd, k, hp, plan=plan_w)[0].sum()))
    exact = bool((zx == zp).all()) and int(base[1]) == int(got[1])
    print(f"  thresholds exact match: {exact}", flush=True)

    # ---- 2. doc_topic_mass
    rng = np.random.default_rng(0)
    cwt = jnp.asarray(rng.integers(-1, k, V).astype(np.int32))
    mx = doc_topic_mass(A, cwt, k)
    t("doc_topic_mass XLA (flat scalar scatter)", lambda: float(
        doc_topic_mass(A, cwt, k).sum()))
    mp = doc_topic_mass(A, cwt, k, plan=plan_d)
    t("doc_topic_mass PALLAS", lambda: float(
        doc_topic_mass(A, cwt, k, plan=plan_d).sum()))
    print(f"  doc_topic_mass maxrelerr: {relerr(mp, mx):.2e}", flush=True)

    # ---- 3. r-th highest (count pass inside)
    cl = jnp.asarray(rng.integers(0, k, D).astype(np.int32))
    sizes = jnp.asarray(np.bincount(np.asarray(cl), minlength=k)
                        .astype(np.int32))
    r = max(hp.catchword_rank(D, k, None), 1)
    tx = rth_highest(A, cl, sizes, k, r)
    t("rth_highest XLA (one-hot count scan)", lambda: float(
        rth_highest(A, cl, sizes, k, r).sum()))
    tp = rth_highest(A, cl, sizes, k, r, plan=plan_w)
    t("rth_highest PALLAS count pass", lambda: float(
        rth_highest(A, cl, sizes, k, r, plan=plan_w).sum()))
    print(f"  rth exact match: {bool((np.asarray(tx) == np.asarray(tp)).all())}",
          flush=True)

    # ---- 4. model SpMM scatter half (b_y at width k)
    Y = jnp.asarray(rng.random((D, k), np.float32))
    bx = b_y(A, Y)
    t("b_y width-k XLA (gather + row scatter)", lambda: float(
        b_y(A, Y).sum()))
    bp = b_y_plan(A, Y, plan_w)
    t("b_y width-k PALLAS scatter half", lambda: float(
        b_y_plan(A, Y, plan_w).sum()))
    print(f"  b_y maxrelerr: {relerr(bp, bx):.2e}", flush=True)

    # ---- 5. construct_topic_model end-to-end (mass + sort + SpMM)
    cluster = jnp.asarray(rng.integers(0, k, D).astype(np.int32))
    rt = hp.model_rank_threshold(D, k)
    t("construct_topic_model XLA", lambda: float(
        construct_topic_model(A, cwt, cluster, k, rt)[0].sum()))
    t("construct_topic_model PALLAS", lambda: float(
        construct_topic_model(
            A, cwt, cluster, k, rt, plan_d=plan_d, plan_w=plan_w)[0]
        .sum()))


if __name__ == "__main__":
    main()
