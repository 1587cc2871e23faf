"""Run-time configuration for isle-tpu.

Mirrors the reference's compile-time constants (reference:
include/hyperparams.h:8-82, include/types.h:23-86, include/parallel.h:11)
as a dataclass so runs are reproducible without recompilation, plus
TPU-specific knobs (mesh shape, kernel block sizes) that have no CPU
counterpart.

Defaults match the reference exactly unless marked [tpu].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class HyperParams:
    """Algorithm constants of the TSVD topic-model pipeline.

    Names and defaults follow reference include/hyperparams.h:8-82.
    """

    # Provable-algorithm constants (hyperparams.h:8-12).
    w0: float = 1.0
    eps1: float = 1.0 / 60.0
    eps2: float = 1.0 / 3.0
    rho: float = 1.1
    eps3: float = 5.0

    # USE_INT_NORMALIZED_COUNTS (hyperparams.h:14; include/types.h:82-86).
    # True selects the reference's count_t pipeline: normalized values are
    # ceil(avg_doc_sz * count / doc_sum) stored as integers (the FPTYPE
    # path computes the product in fp and rounds later, in the threshold
    # walk). Default false, matching the reference build.
    use_int_normalized_counts: bool = False

    # FEW_SAMPLES_THRESHOLD_DROP (hyperparams.h:16-21): when a word occurs
    # in fewer docs than count_gr, drop the word entirely (zeta = +inf;
    # the reference writes FP_MAX / 1<<31) instead of "throw everything
    # in" (zeta = 1). Default false, matching the reference build.
    few_samples_threshold_drop: bool = False

    # BAD_THRESHOLD_DROP (hyperparams.h:23-25): when the downward zeta
    # walk exhausts (reaches the last distinct value, or value 1, without
    # satisfying the tie cap), drop the word (zeta = +inf) instead of
    # zeta = 1. Default false, matching the reference build.
    bad_threshold_drop: bool = False

    # Eigensolver (hyperparams.h:31-40). "block_ks" is the default in the
    # reference; "dense" runs the full dense eigendecomposition oracle
    # (the reference's compare_LAPACK_Spectra pattern,
    # src/denseMatrix.cpp:413-461) and is only sensible for small problems.
    eigensolver: str = "block_ks"
    block_ks_max_iters: int = 100
    # [tpu] The reference uses 10 (hyperparams.h:39). On TPU a Krylov block
    # narrower than one 128-lane register wastes nearly the whole MXU/VPU
    # and makes the gather-SpMM latency bound, so we default to 128. The
    # convergence criterion (per-eigenpair relative residual < tol) is
    # unchanged, so results agree to tolerance.
    block_ks_block_size: int = 128
    block_ks_tolerance: float = 1e-4
    # Strict convergence: raise if the eigensolver converges fewer than
    # nev pairs within the restart cap, as the reference's assert does
    # (src/sparseMatrix.cpp:1207). False logs a warning with the residual
    # diagnostics and proceeds with the best available subspace.
    block_ks_strict: bool = False

    # Streaming block size over documents (hyperparams.h:42).
    doc_block_size: int = 1 << 18

    # Materialize the projected matrix P = U^T B (hyperparams.h:44
    # USE_EXPLICIT_PROJECTED_MATRIX). True is the TPU-first choice (P is
    # k x docs — tiny next to B). False recomputes the projections one
    # doc block at a time (matops.mat_bt_x_blockwise), restoring the
    # reference's built-in A/B cross-check of the projection + projected
    # k-means stages (src/trainer.cpp:522-531).
    use_explicit_projected_matrix: bool = True

    # k-means configuration (hyperparams.h:46-68).
    kmeans_init_method: str = "kmeanspp"  # kmeanspp | kmeansbb | kmeansmcmc
    kmeans_init_reps: int = 1
    # AFK-MC^2 Markov-chain batch size (hyperparams.h:54
    # KMEANSMCMC_SAMPLE_SIZE, consumed at src/denseMatrix.cpp:790).
    kmeansmcmc_sample_size: int = 10000
    enable_kmeans_on_lowd: bool = True
    max_kmeans_lowd_reps: int = 10
    kmeans_algo_for_sparse: str = "lloyds"  # lloyds | elkans
    max_kmeans_reps: int = 10

    # Topic construction (hyperparams.h:72-79).
    avg_cluster_for_catchless_topic: bool = True
    edge_topic_min_docs: int = 1
    edge_topic_primary_ratio: float = 0.7

    # Coherence reporting (hyperparams.h:74-75).
    coherence_eps: float = 1e-5
    coherence_num_words: int = 5

    # Inference defaults (hyperparams.h:81-82; include/infer.h:52).
    infer_iters_default: int = 15
    infer_Lf_default: float = 10.0
    infer_max_guesses: int = 10  # Lf-doubling retries (src/infer.cpp:416)

    def count_gr(self, nz_docs: int, num_topics: int) -> int:
        """#(freqs > zeta) requirement (src/sparseMatrix.cpp:370)."""
        c = int(self.w0 * float(nz_docs) / (2.0 * float(num_topics)))
        return max(c, 1)

    def count_eq(self, nz_docs: int, num_topics: int) -> int:
        """#(freqs == zeta) cap (src/sparseMatrix.cpp:371)."""
        c = int(
            math.ceil(3.0 * self.eps1 * self.w0 * float(nz_docs) / float(num_topics))
        )
        return max(c, 1)

    def catchword_rank(
        self, num_docs: int, num_topics: int, sample_rate: Optional[float] = None
    ) -> int:
        """r for the r-th-highest catchword statistic (src/trainer.cpp:580-584)."""
        n = float(num_docs) if sample_rate is None else float(num_docs) * sample_rate
        return int(math.floor(self.eps2 * self.w0 * n / (2.0 * float(num_topics))))

    def model_rank_threshold(self, num_docs: int, num_topics: int) -> int:
        """Per-topic doc-sum rank threshold (src/sparseMatrix.cpp:722)."""
        return int(self.eps3 * self.w0 * float(num_docs) / (float(num_topics) * 2.0))


@dataclasses.dataclass(frozen=True)
class TpuConfig:
    """[tpu] Hardware-mapping knobs; no reference counterpart."""

    # Mesh axis over the document dimension of the term-document matrix.
    # () means single-device execution.
    mesh_shape: Tuple[int, ...] = ()
    mesh_axis_names: Tuple[str, ...] = ("docs",)

    def mesh_devices(self) -> int:
        """Total devices requested by mesh_shape (1 = single-device)."""
        n = 1
        for s in self.mesh_shape:
            n *= int(s)
        return n
    # Pad widths for MXU efficiency.
    lane: int = 128
    sublane: int = 8
    # Chunk length for nnz-streamed SpMM fallback (entries per scan step).
    spmm_chunk: int = 1 << 21
    # HBM budget for the dense Zipf-head rows of the hybrid SpMM layout
    # (see hybrid.py); 0 disables the hybrid layout. Dense-head matmuls
    # are ~20x cheaper per nnz than the ~157 Mrows/s gather ceiling
    # (benchmarks/micro_head2.py), so the head should be as large as HBM
    # allows; the factored layout stores it at 2 bytes/cell (bf16 binary).
    dense_head_bytes: int = 4096 << 20
    # Lift the int32 flat-scatter row cap on the dense head (at NYTimes
    # docs=300k the cap is 7,158 rows, which coincides with the 4 GB
    # budget's optimum — see TODO.md). When set, head builds whose
    # (rows+1)*(docs+1) index range exceeds int32 switch to doc-blocked
    # scatters (hybrid._scatter_head): per column block one extra
    # nnz-length masked scatter at build time, ops over the head
    # unchanged. Pays only when the Zipf coverage curve is steep enough
    # that the extra rows buy real tail shrinkage (measure coverage on
    # the target corpus first; round-3 arithmetic said a wash at the
    # synthetic NYT shape). Raise dense_head_bytes together with this.
    break_head_cap: bool = False
    # Pallas MXU segment-sum kernels for the full-entry accumulation
    # scatters (threshold histogram, doc-topic mass, r-th group counts,
    # the model SpMM's scatter half): per 2048-entry chunk the segment
    # one-hot is built IN VMEM and contracted on the MXU, emitting only
    # (rcap, width) partials — measured 2.6-3.2x over the XLA scatter
    # at the census'd rcap 16-64 (benchmarks/micro_pallas.py,
    # rcap_census.py). "auto" = compiled kernels on TPU backends, XLA
    # scatters elsewhere; "on" = force (pallas interpret mode off-TPU —
    # the CPU test path); "off" = XLA scatters everywhere. Streams
    # whose measured rcap exceeds the kernel contract fall back to XLA
    # per matrix. Measured at the NYTimes bench shape on v5e-1
    # (benchmarks/ab_pallas.py, warm isolated): thresholds hist
    # 814 -> 145 ms, doc_topic_mass 868 -> 545 ms, rth 2924 -> 2219 ms,
    # model b_y 783 -> 653 ms — exact-match/1e-7..3e-5 vs the XLA
    # results ON HARDWARE. "auto" applies to the single-device in-core
    # path and its reporting stages only; the streamed accumulators
    # (streaming.py per-chunk word-sort + plan route) engage solely
    # under forced "on" — the round-5 PubMed A/B on v5e-1 measured no
    # win for them (thresholds 602 s XLA vs 1567 s pallas wall at
    # near-identical user time, outputs bit-identical; BENCH_NOTES
    # "Round-5 streamed pallas A/B"): their floors are wire/decode-
    # bound and the per-chunk sort+plan sits on the critical path.
    # NOT applied to the hybrid tail ops: their octet
    # layout already cut the scatter 8x and they are gather-bound
    # (~157 Mrows/s XLA row gather; the pallas per-row DMA gather
    # measured 4-6x SLOWER — micro_pallas_gather.py — so the gather
    # half stays on XLA everywhere).
    pallas_segsum: str = "auto"
    # Entries per pallas segment-sum chunk (the rcap contract is
    # measured against this; larger chunks cut grid overhead but grow
    # rcap roughly linearly).
    pallas_chunk: int = 2048
    # Run the eigensolver's restart loop on-device in one lax.while_loop
    # (no per-restart host syncs); False uses the host-driven loop with
    # per-restart diagnostics.
    device_loop_solver: bool = True
    # When set, Trainer.train() wraps the pipeline in a jax profiler
    # trace written to this directory (SURVEY.md §5.1's tracing story:
    # phase Timers + OpCounter FLOP rates + on-demand XLA traces).
    profile_dir: str = ""
    # Matmul precision for parity-critical products (Gram matrices, QR).
    precise_matmul: str = "highest"
    # Restart-warm eigensolver: when a prior 'svd' stage checkpoint exists
    # in the run directory, seed the Krylov start block with its U
    # (linalg._init_block) instead of random — retraining on the same or
    # drifted data then converges in fewer operator applications. Honored
    # by the in-core, sharded, and streamed trainers and by both Krylov
    # solvers (lanczos seeds its start vector from U[:, 0]). Off by
    # default: the benchmark headline and parity runs use cold starts.
    eigen_warm_start: bool = False
    # Streamed (out-of-core) mode: HBM budget for keeping a compact
    # device-RESIDENT copy of the corpus (word ids int32 + counts in the
    # smallest dtype, ~5 B/entry — 3.9 GB at the PubMed shape) so the
    # host->device wire is paid ONCE instead of once per pass (each
    # PubMed pass costs 130-290 s over this environment's ~15-37 MB/s
    # tunnel). 0 disables; oversized corpora fall back to per-pass
    # streaming automatically.
    resident_corpus_bytes: int = 6 << 30
    # Usable HBM for layout planning (v5e: 16 GB minus the runtime's
    # ~258 MB reserve and headroom). The streamed trainer uses it to
    # decide whether the resident corpus slabs can stay held across the
    # hybrid/eigen/k-means middle — skipping the second fill (encode +
    # full corpus wire, ~150 s at PubMed) — with a correspondingly
    # smaller dense head (streaming.plan_middle_budget).
    hbm_bytes: int = 14 << 30


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Everything `ISLETrain` takes on the CLI (drivers/ISLETrain.cpp:9-32)
    plus seeding (the reference uses unseeded rand(); we make determinism a
    feature) and hyperparameter/TPU overrides."""

    num_topics: int
    vocab_size: int = 0  # 0 = infer from data (src/trainer.cpp:249-261)
    num_docs: int = 0  # 0 = infer from data
    tf_idf: bool = False
    sample_docs: bool = False
    sample_rate: float = 0.0
    compute_edge_topics: bool = False
    max_edge_topics: int = 0
    seed: int = 0
    hyper: HyperParams = dataclasses.field(default_factory=HyperParams)
    tpu: TpuConfig = dataclasses.field(default_factory=TpuConfig)

    def log_dir_name(self) -> str:
        """Config-encoded run-directory name (src/utils.cpp:28-48)."""
        h = self.hyper
        return (
            f"log_t_{self.num_topics}_eps1_{h.eps1:.6f}_eps2_{h.eps2:.6f}"
            f"_eps3_{h.eps3:.6f}_rho_{h.rho:.2f}"
            f"_sample_{int(self.sample_docs)}_rate_{self.sample_rate:.3f}"
            f"_tfidf_{int(self.tf_idf)}_seed_{self.seed}"
        )


@dataclasses.dataclass(frozen=True)
class InferConfig:
    """Everything `ISLEInfer` takes on the CLI (drivers/ISLEInfer.cpp:10-36)."""

    num_topics: int
    vocab_size: int
    iters: int = 0  # 0 = INFER_ITERS_DEFAULT
    Lf: float = 0.0  # 0 = INFER_LF_DEAFULT
    hyper: HyperParams = dataclasses.field(default_factory=HyperParams)
    tpu: TpuConfig = dataclasses.field(default_factory=TpuConfig)

    def resolved_iters(self) -> int:
        return self.iters if self.iters > 0 else self.hyper.infer_iters_default

    def resolved_Lf(self) -> float:
        return self.Lf if self.Lf > 0.0 else self.hyper.infer_Lf_default
