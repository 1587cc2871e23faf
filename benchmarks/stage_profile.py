"""Per-stage warm timing + roofline: achieved rate vs the chip ceiling
measured by the micro benchmarks (VERDICT r4 item 7 — turns "every stage
is pinned to a measured rate" into a regenerable artifact).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/stage_profile.py
      [--nyt]    # full NYTimes bench shape instead of the small one
      [--reps N] # timing repeats (default 2)

Ceilings (this chip, via the tunnel; see the cited micro files):
  gather   157 Mrows/s  width-128 row gather       (micro_fill.py)
  scatter   86 Mrows/s  width-128 row scatter-add  (micro_scatter.py)
  segsum   201 Mrows/s  pallas MXU one-hot segsum  (micro_pallas.py, low end)
  wire    36.7 MB/s     host->device tunnel        (micro_pipe.py: 33.6)
Stages are pinned to the ceiling of their dominant primitive; "% ceil"
near 100 means the stage is that primitive and further tuning must
change the primitive, not the stage.
"""

import argparse
import time

import numpy as np

CEILINGS = {  # Mrows/s (rows = width-128-ish row ops) or MB/s
    "gather": 157.0,
    "scatter": 86.0,
    "segsum": 201.0,
    "wire": 36.7,
    "mxu": None,  # dense matmul: report GFLOP/s, no % (compute-bound ceiling
    #               at these shapes is HBM, not the 197 TFLOP/s bf16 peak)
}

ROWS = []


def sync(x):
    import jax

    # Await via a device-side reduction + SCALAR readback: np.asarray(a)
    # would pull the whole array over the ~33 MB/s tunnel (a 260 MB
    # histogram = ~9 s of wire billed to the stage being timed).
    import jax.numpy as jnp

    out = []
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "sum"):
            out.append(float(jnp.asarray(a).sum()))
    return out


def t(label, fn, reps=2, work=None, kind=None):
    """Time fn (warm); `work` = row count (or bytes for kind='wire',
    FLOPs for kind='mxu') of the stage's dominant primitive."""
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    line = f"{label:38s} {dt*1e3:9.1f} ms"
    entry = dict(stage=label, ms=dt * 1e3)
    if work is not None and kind is not None:
        if kind == "wire":
            rate = work / dt / 1e6
            unit = "MB/s"
        elif kind == "mxu":
            rate = work / dt / 1e9
            unit = "GFLOP/s"
        else:
            rate = work / dt / 1e6
            unit = "Mrows/s"
        ceil = CEILINGS[kind]
        pct = 100.0 * rate / ceil if ceil else None
        line += f"  {rate:8.1f} {unit:8s} vs {kind}"
        if pct is not None:
            line += f" {ceil:.0f} = {pct:5.1f}% ceil"
        entry.update(rate=rate, unit=unit, kind=kind, pct=pct)
    print(line, flush=True)
    ROWS.append(entry)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nyt", action="store_true",
                    help="full NYTimes bench shape")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from isle_tpu.config import HyperParams, TpuConfig
    from isle_tpu.corpus import Corpus
    from isle_tpu.hybrid import h_gram_x
    from isle_tpu.pallas_ops import pallas_mode, plan_segments, segsum_onehot
    from isle_tpu.sparse import DocSparse
    from isle_tpu.thresholds import compute_thresholds_jax

    from bench import synth_corpus

    if args.nyt:
        V, D, NNZ, k = 102_660, 300_000, 48_000_000, 100
    else:
        V, D, NNZ, k = 28_000, 40_000, 3_000_000, 20
    reps = args.reps
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    hp = HyperParams()
    nnz = int(corpus.nnz)
    print(f"nnz {nnz}, avg_doc_sz {corpus.avg_doc_sz}, "
          f"backend {jax.default_backend()}", flush=True)

    # upload: compact wire bytes (u16 deltas + nibble counts + offsets)
    wire_bytes = nnz * 2 + nnz // 2 + 4 * D
    t("upload A (compact wire)",
      lambda: sync(DocSparse.from_corpus(corpus, chunk=1 << 21).w_val),
      reps=1, work=wire_bytes, kind="wire")

    mode = pallas_mode(TpuConfig())  # auto: compiled on TPU, skipped off
    F = int(corpus.avg_doc_sz)
    if mode is not None:
        # thresholds' dominant primitive: the (V+1, F+1) one-hot segsum
        ws = jax.lax.sort((A.w_word, jnp.clip(
            jnp.floor(A.w_val + 0.5).astype(jnp.int32), 0, F)), num_keys=1)
        plan = plan_segments(ws[0], V, chunk=2048)
        if plan is not None:
            run = jax.jit(lambda p, r: segsum_onehot(
                p, r, None, V, F + 1, mode), static_argnames=())
            t("thresholds hist segsum (pallas)",
              lambda: sync(run(plan, ws[1])), reps=reps,
              work=nnz, kind="segsum")
        del plan
        del ws  # two nnz-length copies — release before the B stages
    t("thresholds (full fn + int sync)", lambda: int(
        compute_thresholds_jax(
            A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
        )[1]
    ), reps=reps, work=nnz, kind="scatter")
    zetas, _ = compute_thresholds_jax(
        A.d_word, A.d_val, V, corpus.avg_doc_sz, corpus.nz_docs, k, hp
    )
    # the production build stage: threshold + hybrid layout FUSED
    # (trainer.py "creating thresholded matrix"); streams nnz entries
    # through compare+compact+gather — pin to the gather row rate.
    # (At the NYT shape, materializing B and calling to_hybrid(B) holds
    # two nnz-scale structures and OOMs the chip; production never does.)
    from isle_tpu.hybrid import hybrid_from_thresholds

    head_bytes = TpuConfig().dense_head_bytes
    t("hybrid build (fused thresh+copy)",
      lambda: sync(hybrid_from_thresholds(A, zetas, head_bytes,
                                          chunk=1 << 21)[0].td_word),
      reps=reps, work=nnz, kind="gather")
    H, oc, _frob = hybrid_from_thresholds(A, zetas, head_bytes,
                                          chunk=1 << 21)
    del A, zetas  # the pipeline's own lifetime: A is dead once H exists
    print(f"B: {H.num_docs} docs, {H.nnz} nnz; "
          f"head covers {H.head_nnz/H.nnz:.0%}", flush=True)
    X = jnp.asarray(
        np.random.default_rng(0).standard_normal((V, 128)).astype(np.float32)
    )
    # gram op: tail gather + tail scatter at width 128 + dense head
    # matmuls; the tail scatter is the binding primitive
    tail = int(H.nnz - H.head_nnz)
    t("h_gram_x (one op, sync)",
      lambda: float(h_gram_x(H, X, 1 << 21).sum()),
      reps=reps, work=2 * tail, kind="scatter")
    # dense head GEMM in isolation (MXU): 2*V*128*cols FLOPs x2 (gram)
    if H.head is not None:
        hd = H.head
        flops = 4 * hd.shape[0] * hd.shape[1] * 128

        @jax.jit
        def head_gram(hd, X):
            y = jnp.dot(hd.T.astype(jnp.float32), X[: hd.shape[0]],
                        precision=jax.lax.Precision.HIGHEST)
            return jnp.dot(hd.astype(jnp.float32), y,
                           precision=jax.lax.Precision.HIGHEST)

        t("head gram GEMMs (MXU)", lambda: float(head_gram(hd, X).sum()),
          reps=reps, work=flops, kind="mxu")
    t("roundtrip noop (sync latency)", lambda: float(jnp.float32(1.0) + 1.0),
      reps=reps)

    print("\n| stage | ms | achieved | ceiling | % ceiling |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for r in ROWS:
        if "rate" in r:
            ceil = CEILINGS[r["kind"]]
            pct = f"{r['pct']:.0f}%" if r["pct"] is not None else "—"
            cs = (f"{ceil:.0f} {r['unit']} ({r['kind']})"
                  if ceil else f"— ({r['kind']})")
            print(f"| {r['stage']} | {r['ms']:.1f} | "
                  f"{r['rate']:.1f} {r['unit']} | {cs} | {pct} |",
                  flush=True)
        else:
            print(f"| {r['stage']} | {r['ms']:.1f} | | | |", flush=True)


if __name__ == "__main__":
    main()
