"""isle-tpu benchmark: end-to-end train wall-clock on a synthetic corpus at
UCI NYTimes scale (the reference's primary workload, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

vs_baseline methodology: the reference's 28-thread MKL CPU baseline cannot
run here (no MKL, 1-core host), so the baseline proxy is THIS pipeline
executed on the jax CPU backend on a 1/`CPU_SCALE` document slice of the
same corpus, linearly extrapolated in docs/nnz (the pipeline is linear in
nnz for fixed vocab and k). The proxy underestimates a real 28-thread
Xeon by roughly the core count; see BENCH_NOTES.md for the accounting.

Usage:
  python bench.py              # NYTimes scale on the default (TPU) backend
  python bench.py --small      # Enron-ish scale, quick sanity run
  python bench.py --no-cpu-proxy   # skip the CPU baseline measurement
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import signal
import sys
import time

import numpy as np

NYT = dict(vocab=102_660, docs=300_000, nnz=48_000_000, k=100)
SMALL = dict(vocab=28_000, docs=40_000, nnz=3_000_000, k=20)
TINY = dict(vocab=2_000, docs=3_000, nnz=120_000, k=10)
CPU_SCALE = 16

# Global wall-clock budget: the bench MUST emit its JSON line inside this
# window no matter what the backend does (round-3 lesson: the axon tunnel
# was down at capture time and unbounded retries ran into the driver's
# kill, recording rc=124 with no parseable result — BENCH_r03.json).
BUDGET_S = float(os.environ.get("ISLE_BENCH_BUDGET_S", "3300"))
_START = time.monotonic()
# Pinned CPU-proxy estimate for the NYT shape, from the round-2
# driver-captured run (BENCH_r02.json: 376.1 s at 1/16 scale -> 6018 s
# extrapolated). Used only when the live proxy leg fails or the budget
# is too tight to run it.
PINNED_CPU_EST = {"nytimes": 6018.1}

# Measured 1-core reference wall-clock on the IDENTICAL corpus (round 5:
# shim-built ISLETrain, parity/data_syn/nyt-syn.tdf = this bench's shape
# and seed; user ~= wall so the capture was uncontended).
REF_1CORE_S = {"nytimes": 234.8}

# Last on-hardware measurements, attached (clearly labeled) to the error
# artifact when the backend is unreachable at capture time, so an outage
# still leaves the record pointing at the most recent real numbers
# instead of only a null. NOT used as the bench value — `value` stays
# null on failure. Provenance: BENCH_NOTES.md round-4 hardware section
# (benchmarks/ab_round4.py, v5e-1, 2026-08-18).
LAST_HW = {
    "nytimes": {
        "warm_train_s": 42.0,
        "warm_nonwire_s": 34.9,
        "cold_train_s": 858.4,
        "infer_docs_per_s": 28361,
        "vs_baseline": 196.0,
        "vs_ref_1core": 5.59,
        "measured": "2026-08-19 v5e-1 (median of 3 warm repeats, spread "
                    "[41.45, 42.99]; cold carried two pathological "
                    "remote-service waits — same-code cold was 252.6 s "
                    "the same morning)",
        "source": "BENCH_NOTES.md round-5 bench variance capture",
    }
}

_emitted = False
_partial: dict = {}


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _START)


def emit(obj: dict) -> None:
    global _emitted
    print(json.dumps(obj))
    sys.stdout.flush()
    _emitted = True


def _fail_json(label: str, shape: dict, error: str) -> dict:
    out = {
        "metric": (
            f"e2e train wall-clock, synthetic {label} "
            f"({shape['vocab']} vocab x {shape['docs']} docs, k={shape['k']})"
        ),
        "value": None,
        "unit": "s",
        "vs_baseline": None,
        "error": error,
        "partial": dict(_partial),
    }
    if label in LAST_HW:
        out["last_hw_measurement"] = LAST_HW[label]
    return out


def _install_kill_handler(label: str, shape: dict) -> None:
    """Emit a diagnosable JSON line even if an external watchdog SIGTERMs
    us (the `timeout` command's default), instead of dying silently."""

    def _h(signum, frame):
        if not _emitted:
            emit(_fail_json(
                label, shape,
                f"killed by signal {signum} after "
                f"{time.monotonic() - _START:.0f}s",
            ))
        os._exit(1)

    signal.signal(signal.SIGTERM, _h)
    signal.signal(signal.SIGINT, _h)


def _zipf_ranks(u: np.ndarray, n: int) -> np.ndarray:
    """Inverse-CDF sampling of ranks 0..n-1 with P(r) ~ 1/(r+1) — the
    Zipf(alpha=1) word-frequency law real bag-of-words corpora follow."""
    return np.minimum(
        (np.exp(u * np.log(float(n))) - 1.0).astype(np.int64), n - 1
    )


def synth_corpus(vocab: int, docs: int, nnz: int, seed: int = 0):
    """Synthetic bag-of-words with a true Zipf(1) word marginal (matching
    the UCI NYTimes distribution the reference benchmarks on — a few
    thousand head words carry most tokens) and planted topic structure:
    each doc draws half its tokens from one of 64 word bands, Zipf-skewed
    within the band."""
    rng = np.random.default_rng(seed)
    # Zipf token draws collapse heavily under (doc, word) dedup; oversample
    # so the DISTINCT pair count (the matrix nnz) hits the target.
    raw = int(nnz * 1.30)
    d = rng.integers(0, docs, raw, dtype=np.int64)
    w = _zipf_ranks(rng.random(raw), vocab)
    # Planted structure: each doc prefers one of 64 word bands.
    band = (d % 64).astype(np.int64)
    use_band = rng.random(raw) < 0.5
    bsz = max(vocab // 64, 1)
    band_w = band * bsz + _zipf_ranks(rng.random(raw), bsz)
    w = np.where(use_band, band_w, w)
    key = d * vocab + w
    key = np.unique(key)
    d = (key // vocab).astype(np.int64)
    w = (key % vocab).astype(np.int64)
    c = rng.integers(1, 8, len(key), dtype=np.int64)
    return d, w, c


def preflight(queue=None):
    """Tiny matmul + host readback on the default backend: proves the
    TPU tunnel is up and the remote compile service answers. Runs in a
    subprocess under a deadline so a hung backend can't stall the bench."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.float32)
    v = float((x @ x).sum())  # host readback forces remote execution
    ok = abs(v - 256.0 ** 3) < 1.0
    if queue is not None:
        queue.put({"ok": ok, "platform": str(jax.devices()[0].platform)})
    return ok


def _run_leg(target, args_tuple, deadline_s: float):
    """Run `target(*args_tuple, queue)` in a spawn subprocess with a hard
    deadline; returns the queued result dict or None on failure/timeout."""
    deadline_s = max(deadline_s, 10.0)
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=target, args=(*args_tuple, q))
    p.start()
    p.join(deadline_s)
    if p.is_alive():
        print(f"# leg exceeded {deadline_s:.0f}s deadline; terminating",
              file=sys.stderr)
        p.terminate()
        p.join(30)
        if p.is_alive():
            p.kill()
            p.join()
    last = None
    try:
        while True:
            last = q.get_nowait()
    except Exception:
        pass
    return last


def _summarize(cold_s: float, warm_runs: list, tr, corpus) -> dict:
    """Fold the warm repeats into medians + spread (the variance-proof
    record the parsed JSON carries: wire_s / nonwire_s / phases /
    n_repeats, per round-4 VERDICT item 2)."""
    import jax

    from isle_tpu.obs import compile_log_top

    out = dict(
        cold_s=cold_s,
        svd_gflops=tr.op_counter.gflops(),
        infer_s=-1.0,
        infer_docs_per_s=0.0,
        platform=str(jax.devices()[0].platform),
        nnz=corpus.nnz,
        n_repeats=len(warm_runs),
        top_compiles=[(n, round(s, 2)) for n, s in compile_log_top(5)],
    )
    if warm_runs:
        totals = [r["train_s"] for r in warm_runs]
        out["train_s"] = float(np.median(totals))
        out["wire_s"] = float(np.median([r["wire_s"] for r in warm_runs]))
        out["nonwire_s"] = float(
            np.median([r["train_s"] - r["wire_s"] for r in warm_runs]))
        out["warm_spread"] = [round(min(totals), 2), round(max(totals), 2)]
        keys = sorted(set().union(*[r["phases"] for r in warm_runs]))
        out["phases"] = {
            k: round(float(np.median(
                [r["phases"].get(k, 0.0) for r in warm_runs])), 3)
            for k in keys
        }
    else:
        out["train_s"] = cold_s
        out["wire_s"] = None
        out["nonwire_s"] = None
        out["warm_spread"] = None
        out["phases"] = {label: round(wall, 3)
                         for label, wall, cpu in tr.timer.phases}
    return out


def run_pipeline(platform: str, shape: dict, seed: int, warmup: bool = True,
                 queue=None):
    if platform == "cpu":
        os.environ.setdefault("XLA_FLAGS", "")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # Persistent compilation cache: first round pays jit compiles, later
    # rounds reuse them (same shapes).
    jax.config.update("jax_compilation_cache_dir", "/tmp/isle_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from isle_tpu.config import TrainConfig
    from isle_tpu.corpus import Corpus
    from isle_tpu.obs import compile_log_top, enable_compile_log
    from isle_tpu.trainer import Trainer

    enable_compile_log()
    d, w, c = synth_corpus(shape["vocab"], shape["docs"], shape["nnz"], seed)
    corpus = Corpus.from_entries(
        d, w, c, vocab_size=shape["vocab"], num_docs=shape["docs"],
        sort_dedup=True,
    )
    # Edge topics on, as the BASELINE primary config specifies
    # (NYTimes k=100 + edge topics max 2000).
    cfg = TrainConfig(
        num_topics=shape["k"], seed=seed,
        compute_edge_topics=True, max_edge_topics=2000,
    )
    out_dir = os.path.join("/tmp", f"isle_bench_{platform}")
    tr = Trainer(cfg, output_dir=out_dir, quiet=True)
    tr.corpus = corpus
    tr._post_ingest()

    t0 = time.perf_counter()
    tr.train()
    tr.train_edge_topics()
    cold_s = time.perf_counter() - t0
    for label, wall, cpu in tr.timer.phases:
        print(f"#   cold phase {label}: {wall:.2f}s", file=sys.stderr)
    # Cold-tail attribution (round-4 VERDICT item 6): on the tunnel
    # these are REMOTE compiles with erratic latency; name the programs
    # so a pathological cold run points at its compile, not at compute.
    top_compiles = [(n, round(s, 2)) for n, s in compile_log_top(8)]
    for name, secs in top_compiles:
        print(f"#   cold compile {name}: {secs:.2f}s", file=sys.stderr)

    # Warm repeats in-process reuse every compiled program (identical
    # static shapes), measuring execution the way an amortized production
    # service would see it; the cold number includes this environment's
    # erratic remote-compile latency (see BENCH_NOTES.md). N>=3 repeats +
    # median/spread make the headline variance-proof (round-4 VERDICT
    # item 2: single-run captures could not distinguish regression from
    # weather). The CPU proxy skips the warm reruns (its local compiles
    # disk-cache across runs).
    WIRE_PHASE = "upload A to device"
    warm_runs: list = []   # per-repeat {train_s, wire_s, phases}
    n_repeats = int(os.environ.get("ISLE_BENCH_REPEATS", "3")) if warmup else 0
    tr2 = tr
    for rep in range(n_repeats):
        if warmup and _remaining() < 240.0 and warm_runs:
            print(f"# budget low ({_remaining():.0f}s); stopping at "
                  f"{len(warm_runs)} warm repeats", file=sys.stderr)
            break
        tr2 = Trainer(cfg, output_dir=out_dir, quiet=True)
        tr2.corpus = corpus
        tr2._post_ingest()
        t0 = time.perf_counter()
        tr2.train()
        tr2.train_edge_topics()
        rep_s = time.perf_counter() - t0
        phases = {label: round(wall, 3)
                  for label, wall, cpu in tr2.timer.phases}
        wire = phases.get(WIRE_PHASE, 0.0)
        warm_runs.append(dict(train_s=rep_s, wire_s=wire, phases=phases))
        print(f"# warm repeat {rep}: {rep_s:.1f}s total, {wire:.1f}s wire, "
              f"{rep_s - wire:.1f}s non-wire", file=sys.stderr)
        # Partial after each repeat so a later hang still leaves data.
        if queue is not None:
            queue.put(_summarize(cold_s, warm_runs, tr2, corpus))
    if warm_runs:
        for label, v in warm_runs[-1]["phases"].items():
            print(f"#   warm phase {label}: {v:.2f}s", file=sys.stderr)
        train_s = float(np.median([r["train_s"] for r in warm_runs]))
    else:
        train_s = cold_s
    print(f"# cold train_s: {cold_s:.1f}s, warm train_s (median of "
          f"{max(len(warm_runs), 1)}): {train_s:.1f}s", file=sys.stderr)

    # Post a train-only partial before the inference stage: if the infer
    # leg hangs into the deadline, the parent still gets the train number
    # (the queue is drained last-item-wins).
    summary = _summarize(cold_s, warm_runs, tr2, corpus)
    if queue is not None:
        queue.put(dict(summary))

    # MWU inference throughput over the full corpus (ISLEInfer's workload:
    # drivers/ISLEInfer.cpp; docs re-normalized to unit mass).
    import dataclasses as _dc

    from isle_tpu.mwu import build_infer_batch, infer_all

    # unit-mass normalization: vals = counts / doc_sum (computed directly,
    # matching the device rebuild bit-for-bit)
    infer_corpus = _dc.replace(
        corpus,
        vals=(
            corpus.counts.astype(np.float32)
            / np.repeat(corpus.doc_sums(), np.diff(corpus.offsets))
        ).astype(np.float32),
    )
    model = tr2.get_model()
    batch = build_infer_batch(infer_corpus, model.sum(axis=1))
    # top_n=5: the reference's inference CLI reports only the top-5
    # topics per doc (drivers/ISLEInfer.cpp:100-111), so the benchmark
    # measures that workload (skips the full (D, k) weight download).
    t0 = time.perf_counter()
    w, conv, llh, _ = infer_all(model, batch, iters=15, Lf=10.0, top_n=5)
    infer_cold = time.perf_counter() - t0
    # Median of 3 warm repeats, like the train leg: the single-run MWU
    # number swung 23-43k docs/s across rounds on tunnel weather alone.
    infer_warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        w, conv, llh, _ = infer_all(model, batch, iters=15, Lf=10.0,
                                    top_n=5)
        infer_warms.append(time.perf_counter() - t0)
    infer_s = sorted(infer_warms)[len(infer_warms) // 2]
    print(
        f"# infer: {corpus.num_docs} docs, cold {infer_cold:.1f}s, warm "
        f"median {infer_s:.1f}s of {[round(x, 1) for x in infer_warms]} "
        f"({corpus.num_docs / max(infer_s, 1e-9):.0f} docs/s), "
        f"converged {int(conv.sum())}",
        file=sys.stderr,
    )

    result = dict(summary)
    result["infer_s"] = infer_s
    result["infer_warms"] = [round(x, 2) for x in infer_warms]
    result["infer_docs_per_s"] = corpus.num_docs / max(infer_s, 1e-9)
    if queue is not None:
        queue.put(result)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--no-cpu-proxy", action="store_true")
    ap.add_argument("--budget", type=float, default=None,
                    help="override the global wall-clock budget (s)")
    args = ap.parse_args()
    if args.budget is not None:
        global BUDGET_S
        BUDGET_S = args.budget
    shape = TINY if args.tiny else (SMALL if args.small else NYT)
    label = "tiny" if args.tiny else ("small" if args.small else "nytimes")
    _install_kill_handler(label, shape)

    # --- Preflight: is the TPU backend reachable at all? (round-3 lesson)
    # Deadlines sized for the measured remote-compile tail (a TINY matmul
    # took 122 s on 2026-08-19; the same-program tail runs 5-350 s —
    # CLAUDE.md), so a pathological-compile day reads "slow", not "down".
    pf = _run_leg(preflight, (), deadline_s=min(420.0, _remaining() - 60))
    if pf is None or not pf.get("ok"):
        print("# preflight failed; one retry", file=sys.stderr)
        pf = _run_leg(preflight, (), deadline_s=min(300.0, _remaining() - 30))
    if pf is None or not pf.get("ok"):
        emit(_fail_json(label, shape, "backend-unavailable: preflight "
                        "matmul failed twice (tunnel/compile service down)"))
        return
    _partial["preflight"] = pf
    print(f"# preflight ok on {pf['platform']} "
          f"({time.monotonic() - _START:.0f}s in)", file=sys.stderr)

    # --- TPU leg: bounded retries inside the budget. Reserve time for the
    # CPU proxy (pinned fallback exists, so the reserve is modest). ---
    res = None
    for attempt in range(2):
        reserve = 120.0
        deadline = _remaining() - reserve
        if deadline < 300.0:
            break
        # Let the child pace its warm repeats against the real remaining
        # budget (the spawned process re-reads the env at import).
        os.environ["ISLE_BENCH_BUDGET_S"] = str(max(deadline - 30.0, 60.0))
        res = _run_leg(run_pipeline, ("default", shape, 0, True), deadline)
        if res is not None:
            break
        print(f"# TPU run attempt {attempt} failed; "
              f"{_remaining():.0f}s left", file=sys.stderr)
    if res is None:
        emit(_fail_json(label, shape,
                        "tpu-leg-failed: pipeline subprocess produced no "
                        "result within budget (preflight was OK)"))
        return
    _partial["tpu"] = {k: res.get(k) for k in
                       ("train_s", "cold_s", "wire_s", "nonwire_s",
                        "infer_s", "platform")}

    # --- CPU proxy leg (live if budget allows, else pinned estimate). ---
    vs_baseline = 0.0
    proxy_note = ""
    if not args.no_cpu_proxy:
        cpu_shape = dict(
            vocab=shape["vocab"],
            docs=shape["docs"] // CPU_SCALE,
            nnz=shape["nnz"] // CPU_SCALE,
            k=shape["k"],
        )
        cpu_res = None
        if _remaining() > 180.0:
            cpu_res = _run_leg(run_pipeline, ("cpu", cpu_shape, 0, False),
                               _remaining() - 60.0)
        if cpu_res is not None:
            cpu_est = cpu_res["train_s"] * CPU_SCALE
            print(
                f"# cpu proxy: {cpu_res['train_s']:.1f}s at 1/{CPU_SCALE} "
                f"scale -> est {cpu_est:.1f}s full; tpu {res['train_s']:.1f}s",
                file=sys.stderr,
            )
        elif label in PINNED_CPU_EST:
            cpu_est = PINNED_CPU_EST[label]
            proxy_note = " (pinned r2 proxy)"
            print(f"# cpu proxy leg unavailable; using pinned estimate "
                  f"{cpu_est:.1f}s (BENCH_r02.json)", file=sys.stderr)
        else:
            cpu_est = None
        if cpu_est is not None:
            vs_baseline = cpu_est / res["train_s"]

    emit(
        {
            "metric": (
                f"e2e train wall-clock (compile-amortized, median of "
                f"{res.get('n_repeats', 1)} warm repeats), synthetic "
                f"{label} ({shape['vocab']} vocab x {shape['docs']} "
                f"docs, {res['nnz']} nnz, k={shape['k']}); SVD SpMM "
                f"{res['svd_gflops']:.1f} GFLOP/s; MWU infer "
                f"{res['infer_docs_per_s']:.0f} docs/s on "
                f"{res['platform']}{proxy_note}"
            ),
            "value": round(res["train_s"], 2),
            "unit": "s",
            "vs_baseline": round(vs_baseline, 2),
            # Measured 1-core reference anchor (round 5): the shim-built
            # ISLETrain ran THIS corpus on THIS host in 234.8 s wall
            # (parity/reports/timerLog_ref_nyt-syn.txt; see BENCH_NOTES
            # "reference at scale" for the 28-thread/MKL factors).
            "vs_ref_1core": (round(REF_1CORE_S[label] / res["train_s"], 2)
                             if label in REF_1CORE_S else None),
            "n_repeats": res.get("n_repeats"),
            "warm_spread": res.get("warm_spread"),
            "wire_s": (round(res["wire_s"], 2)
                       if res.get("wire_s") is not None else None),
            "nonwire_s": (round(res["nonwire_s"], 2)
                          if res.get("nonwire_s") is not None else None),
            "cold_s": round(res["cold_s"], 2),
            "top_compiles": res.get("top_compiles"),
            "phases": res.get("phases"),
            "infer_docs_per_s": round(res.get("infer_docs_per_s", 0.0), 1),
            "infer_warms": res.get("infer_warms"),
        }
    )


if __name__ == "__main__":
    main()
