"""Round-4 hardware A/B harness: run the moment the axon backend is up.

Three bounded legs at the NYTimes bench shape (or --small), each reusing
the persistent compile cache:

  base      — default config, cold + warm e2e (the BENCH_r04 headline
              cross-check) and the per-phase warm profile.
  capbreak  — TpuConfig(break_head_cap=True, dense_head_bytes=8 GB):
              measures whether unlocking the int32 head cap (rows
              7,158 -> ~14,316 at D=300k) pays at this corpus' Zipf
              coverage curve. Prints head rows/coverage and the build /
              eigen / k-means phase deltas vs base (the round-3 go/no-go
              arithmetic predicted a wash: +1.5 s build vs ~1.5-2 s op
              savings — TODO.md).
  warmstart — second run in the same run dir with eigen_warm_start=True:
              the checkpointed U seeds the Krylov block; measures the
              eigensolver phase and operator-call reduction (target:
              < 13 op calls, VERDICT round-3 item 3).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_round4.py
        [--small] [--skip base,capbreak,warmstart]

Every leg is wall-clock-bounded by the global ISLE_AB_BUDGET_S (default
2700 s); results append to stderr lines prefixed '#' plus one JSON line
per leg, so a dropped tunnel still leaves a parseable record.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_S = float(os.environ.get("ISLE_AB_BUDGET_S", "2700"))
T0 = time.monotonic()


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def emit(obj):
    print(json.dumps(obj), flush=True)


def run_leg(name: str, shape: dict, corpus, tpu_kwargs: dict,
            out_dir: str, warm: bool = True, seed: int = 0):
    """One A/B leg; failures emit an error record instead of killing the
    remaining legs (a capbreak compile-OOM must not eat the warmstart
    measurement — learned the hard way)."""
    try:
        return _run_leg(name, shape, corpus, tpu_kwargs, out_dir,
                        warm=warm, seed=seed)
    except Exception as e:  # noqa: BLE001 — record and continue
        import traceback

        traceback.print_exc()
        emit(dict(leg=name, shape=shape, error=f"{type(e).__name__}: "
                                               f"{str(e)[:400]}"))
        return None


def _run_leg(name: str, shape: dict, corpus, tpu_kwargs: dict,
             out_dir: str, warm: bool = True, seed: int = 0):
    import jax

    from isle_tpu.config import TpuConfig, TrainConfig
    from isle_tpu.trainer import Trainer

    cfg = TrainConfig(
        num_topics=shape["k"], seed=seed,
        compute_edge_topics=True, max_edge_topics=2000,
        tpu=TpuConfig(**tpu_kwargs),
    )
    walls = {}
    runs = ("cold", "warm") if warm else ("cold",)
    tr = None
    for tag in runs:
        if remaining() < 60:
            print(f"# {name}/{tag}: skipped, budget exhausted",
                  file=sys.stderr, flush=True)
            break
        tr = Trainer(cfg, output_dir=out_dir, quiet=True)
        tr.corpus = corpus
        tr._post_ingest()
        t0 = time.perf_counter()
        tr.train()
        tr.train_edge_topics()
        walls[tag] = time.perf_counter() - t0
        print(f"# {name}/{tag}: {walls[tag]:.1f}s", file=sys.stderr,
              flush=True)
        for label, wall, cpu in tr.timer.phases:
            print(f"#   {name}/{tag} phase {label}: {wall:.2f}s",
                  file=sys.stderr, flush=True)
    rec = dict(leg=name, shape=shape, **{f"{k}_s": round(v, 2)
                                         for k, v in walls.items()})
    if tr is not None:
        rec["gflops"] = round(tr.op_counter.gflops(), 1)
        rec["op_calls"] = int(tr.op_counter.calls)
        rec["phases"] = {label: round(wall, 2)
                         for label, wall, cpu in tr.timer.phases}
    emit(rec)
    return tr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--skip", default="")
    ap.add_argument("--capbreak-mb", type=int, default=8192,
                    help="dense_head_bytes for the capbreak leg, in MB")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/isle_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t0 = time.monotonic()
    dev = jax.devices()[0]
    x = jax.numpy.ones((256, 256), jax.numpy.bfloat16)
    s = float((x @ x).astype(jax.numpy.float32).sum())  # forces readback
    print(f"# backend {dev.platform} up in {time.monotonic()-t0:.1f}s "
          f"(probe sum {s})", file=sys.stderr, flush=True)

    from bench import synth_corpus
    from isle_tpu.corpus import Corpus

    if args.small:
        shape = dict(vocab=28_000, docs=40_000, nnz=3_000_000, k=20)
    else:
        shape = dict(vocab=102_660, docs=300_000, nnz=48_000_000, k=100)
    d, w, c = synth_corpus(shape["vocab"], shape["docs"], shape["nnz"], 0)
    corpus = Corpus.from_entries(
        d, w, c, vocab_size=shape["vocab"], num_docs=shape["docs"],
        sort_dedup=True,
    )

    base_dir = "/tmp/isle_ab_base"
    if "base" not in skip:
        run_leg("base", shape, corpus, {}, base_dir)

    if "capbreak" not in skip and remaining() > 120:
        run_leg(
            "capbreak", shape, corpus,
            dict(break_head_cap=True,
                 dense_head_bytes=args.capbreak_mb << 20),
            "/tmp/isle_ab_capbreak",
        )

    if "warmstart" not in skip and remaining() > 120:
        # base leg left ckpt_svd.npz in base_dir's run dir; rerun there
        run_leg(
            "warmstart", shape, corpus, dict(eigen_warm_start=True),
            base_dir, warm=False,
        )


if __name__ == "__main__":
    main()
