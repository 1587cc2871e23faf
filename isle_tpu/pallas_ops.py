"""Pallas MXU segment-sum kernels: the scatter half of sorted
accumulations off the XLA scatter path.

Every full-entry accumulation in the pipeline ends in
`acc.at[seg].add(rows)` over a SORTED segment stream, measured at
~86 Mrows/s (row streams) / ~45 M/s (scalar 2D scatters) since round 1
(benchmarks/micro_scatter.py, micro_mass.py). XLA one-hot
reformulations lose because the one-hot lives in HBM. A Mosaic kernel
changes the arithmetic: per CHUNK (default 2048 entries) build the
(rcap, chunk) segment one-hot IN VMEM, contract it onto the chunk's
value rows on the MXU, and emit only (rcap, width) partial sums; one
final scatter adds nchunks*rcap rows (8-64x fewer). Measured 2.6-3.2x
over the XLA scatter at rcap 32-256 (benchmarks/micro_pallas.py,
BENCH_NOTES round-4), and every production stream sits at rcap 16-64
on the bench corpus (benchmarks/rcap_census.py).

rcap is the kernel's CONTRACT: the max distinct segment ids any chunk
touches. `plan_segments` measures it per stream (one scalar readback)
and returns None when it exceeds the cap, so callers fall back to the
XLA scatter — the kernel never runs outside its contract.

The plan itself is O(runs), not O(nnz): because the stream is GLOBALLY
sorted, per-entry ranks come from one cumsum and the (chunk, rank) ->
segment-id table from a searchsorted over run indices plus small
gathers — no nnz-length scatter (a 48M `.set` would cost ~0.5 s and
eat the win). Unused rank slots must map to the chunk's LAST segment
id (never an arbitrary fill): the final scatter-add promises
indices_are_sorted, and an out-of-order id makes that promise false
and the results silently wrong at scale (micro_pallas.py's equality
check caught exactly this).

Precision (the CLAUDE.md mixed-dot trap): a DEFAULT-precision f32 MXU
pass truncates operands to bf16. Pure 0/1 one-hots are exact in bf16,
so COUNT kernels run at DEFAULT; value-carrying kernels use HIGHEST
(exact, free at rcap <= 64 where the op is traffic-bound) or the
split2 trick (val = bf16(hi) + bf16(lo), two DEFAULT passes, ~1e-6
rel err) at larger rcap.

Reference counterpart: none — this optimizes the TPU translation of
the reference's pfor accumulation loops (e.g. src/sparseMatrix.cpp
:661-672 doc-topic mass, :370-371 threshold counting); semantics are
pinned by the literal-oracle tests, not by this module.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .sparse import DocSparse

DEFAULT_CHUNK = 2048
RCAP_CAP = 512
_MACRO = 1 << 20  # entries per scan step (bounds the HBM temporaries)


def pallas_mode(tpu_cfg) -> Optional[bool]:
    """Resolve TpuConfig.pallas_segsum to an execution mode:
    None = disabled (XLA scatters), False = compiled Mosaic kernels,
    True = pallas interpret mode (runs the same kernels as pure XLA —
    the CPU-backend test path). "auto" enables compiled kernels on TPU
    backends only."""
    s = getattr(tpu_cfg, "pallas_segsum", "off")
    if s == "off":
        return None
    on_tpu = jax.default_backend() == "tpu"
    if s == "on":
        return False if on_tpu else True
    if s == "auto":
        return False if on_tpu else None
    raise ValueError(f"pallas_segsum must be auto/on/off, got {s!r}")


def pallas_mode_streamed(tpu_cfg) -> Optional[bool]:
    """Resolve the mode for the STREAMED accumulators: engaged only when
    pallas_segsum is forced "on". The round-5 PubMed A/B (BENCH_NOTES
    "Round-5 streamed pallas A/B") measured no win for the streamed
    route at the 787M-nnz shape — its floors are wire/decode-bound and
    the per-chunk word-sort + plan adds device work on the critical
    path — so "auto" keeps the streamed paths on XLA scatters and the
    in-core wins (1.2-5.6x per stage) unaffected."""
    s = getattr(tpu_cfg, "pallas_segsum", "off")
    if s != "on":
        return None
    return pallas_mode(tpu_cfg)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SegPlan:
    """Per-stream rank plan: `rank1d[e]` is entry e's segment-run rank
    within its chunk; `ids[c * rcap + r]` the segment id receiving the
    (c, r) partial row. Valid only for the exact sorted stream it was
    planned from."""

    rank1d: jax.Array  # (n,) int32
    ids: jax.Array  # (nchunks * rcap,) int32, globally non-decreasing
    chunk: int = dataclasses.field(metadata=dict(static=True))
    rcap: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nchunks(self) -> int:
        return self.rank1d.shape[0] // self.chunk


@partial(jax.jit, static_argnames=("chunk", "qcap"))
def _plan_pass(seg, chunk: int, qcap: int):
    n = seg.shape[0]
    nc = n // chunk
    b = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (seg[1:] != seg[:-1]).astype(jnp.int32)]
    )
    R = jnp.cumsum(b) - 1  # global run index per entry
    R2 = R.reshape(nc, chunk)
    first, last = R2[:, 0], R2[:, -1]
    rank1d = (R2 - first[:, None]).reshape(-1)
    rmax = jnp.max(last - first) + 1
    # First position of each global run (queries past the run count
    # return n; such slots are never dereferenced — ids clips to last).
    fpos = jnp.searchsorted(R, jnp.arange(qcap, dtype=R.dtype), side="left")
    run_value = seg[jnp.clip(fpos, 0, n - 1)]
    return rank1d, first, last, run_value, rmax


@partial(jax.jit, static_argnames=("rcap",))
def _plan_ids(first, last, run_value, rcap: int):
    idx = jnp.minimum(
        first[:, None] + jnp.arange(rcap, dtype=jnp.int32)[None, :],
        last[:, None],
    )
    return run_value[idx].reshape(-1).astype(jnp.int32)


def plan_segments(
    seg: jax.Array,
    num_segments: int,
    chunk: int = DEFAULT_CHUNK,
    rcap_cap: int = RCAP_CAP,
) -> Optional[SegPlan]:
    """Build a SegPlan for a sorted segment stream (padded entries carry
    the spill id `num_segments` and sort last). Returns None — caller
    falls back to the XLA scatter — when the stream length is not
    chunk-divisible or any chunk's run fan-out exceeds `rcap_cap`.
    Costs one cumsum + one searchsorted of num_segments queries + one
    scalar readback (rcap)."""
    n = int(seg.shape[0])
    if n == 0 or n % chunk:
        return None
    rank1d, first, last, run_value, rmax = _plan_pass(
        seg, chunk, num_segments + 2
    )
    rcap = max(8, int(rmax))
    rcap = 1 << (rcap - 1).bit_length()
    if rcap > rcap_cap:
        return None
    return SegPlan(
        rank1d=rank1d,
        ids=_plan_ids(first, last, run_value, rcap),
        chunk=chunk,
        rcap=rcap,
    )


def _auto_mode(rcap: int, has_vals: bool) -> str:
    """Matmul precision per the micro_pallas measurements: counts are
    exact 0/1 at DEFAULT; value kernels take HIGHEST while it is free
    (traffic-bound at small rcap) and split2 where HIGHEST's 6 passes
    start to bind."""
    if not has_vals:
        return "default"
    return "highest" if rcap <= 64 else "split2"


def _dot(a, b, mode: str):
    dims = (((1,), (0,)), ((), ()))
    if mode == "highest":
        return jax.lax.dot_general(
            a.astype(jnp.float32), b,
            dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    if mode == "split2":
        ab = a.astype(jnp.bfloat16)
        hi = b.astype(jnp.bfloat16)
        lo = (b - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            ab, hi, dims, preferred_element_type=jnp.float32
        )
        return acc + jax.lax.dot_general(
            ab, lo, dims, preferred_element_type=jnp.float32
        )
    # default: both sides exact in bf16 (0/1 one-hots)
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dims, preferred_element_type=jnp.float32,
    )


def _segsum_rows_call(rank1d, g, chunk: int, rcap: int, mode: str,
                      interpret: bool):
    """(nchunks, rcap, W) partial sums of g rows by within-chunk rank."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, W = g.shape
    nchunks = n // chunk

    def kernel(rank_ref, g_ref, o_ref):
        r = rank_ref[:]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (rcap, chunk), 0)
            == r[None, :]
        )
        o_ref[0] = _dot(onehot, g_ref[:], mode)

    return pl.pallas_call(
        kernel,
        grid=(nchunks,),
        out_shape=jax.ShapeDtypeStruct((nchunks, rcap, W), jnp.float32),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rcap, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rank1d, g)


def _segsum_onehot_call(rank1d, col, val, chunk: int, rcap: int,
                        ncols: int, mode: str, interpret: bool):
    """(nchunks, rcap, ncols) partials of out[s, c] += val * [col == c].
    `col` values outside [0, ncols) contribute nothing (the one-hot row
    is all-zero) — callers encode masked/absent entries as -1."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rank1d.shape[0]
    nchunks = n // chunk

    def kernel(*refs):
        if val is None:
            rank_ref, col_ref, o_ref = refs
        else:
            rank_ref, col_ref, val_ref, o_ref = refs
        r = rank_ref[:]
        oh_seg = (
            jax.lax.broadcasted_iota(jnp.int32, (rcap, chunk), 0)
            == r[None, :]
        )
        c = col_ref[:]
        oh_col = (
            jax.lax.broadcasted_iota(jnp.int32, (chunk, ncols), 1)
            == c[:, None]
        )
        if val is None:
            o_ref[0] = _dot(oh_seg, oh_col.astype(jnp.bfloat16), "default")
        else:
            g = oh_col.astype(jnp.float32) * val_ref[:][:, None]
            o_ref[0] = _dot(oh_seg, g, mode)

    spec1 = pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM)
    in_specs = [spec1, spec1] + ([] if val is None else [spec1])
    args = (rank1d, col) + (() if val is None else (val,))
    return pl.pallas_call(
        kernel,
        grid=(nchunks,),
        out_shape=jax.ShapeDtypeStruct((nchunks, rcap, ncols), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rcap, ncols), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def _macro(n: int) -> int:
    m = min(_MACRO, n)
    while n % m:
        m //= 2
    return m


def segsum_rows(
    plan: SegPlan,
    g: jax.Array,
    num_segments: int,
    interpret: bool = False,
    init: Optional[jax.Array] = None,
) -> jax.Array:
    """out[s, :] = sum of g rows whose planned segment is s; returns
    (num_segments + 1, W) with the spill row last (callers slice).
    Streams g in macro-chunks so the partial buffer stays bounded.
    Call inside jit (plan static fields specialize the kernel).
    `init` (same shape/dtype as the output) seeds the accumulator —
    streamed callers thread their stage carry through so chunk passes
    accumulate in place (donate it in the enclosing jit)."""
    n, W = g.shape
    macro = _macro(n)
    nmac = n // macro
    sub = macro // plan.chunk
    mode = _auto_mode(plan.rcap, has_vals=True)

    def body(acc, args):
        r1, gg, ii = args
        part = _segsum_rows_call(
            r1, gg, plan.chunk, plan.rcap, mode, interpret
        )
        return acc.at[ii].add(
            part.reshape(-1, W), indices_are_sorted=True
        ), None

    acc = init if init is not None else jnp.zeros(
        (num_segments + 1, W), jnp.float32)
    acc, _ = jax.lax.scan(
        body,
        acc,
        (
            plan.rank1d.reshape(nmac, macro),
            g.reshape(nmac, macro, W),
            plan.ids.reshape(nmac, sub * plan.rcap),
        ),
    )
    return acc


def segsum_onehot(
    plan: SegPlan,
    col: jax.Array,
    val: Optional[jax.Array],
    num_segments: int,
    ncols: int,
    interpret: bool = False,
    init: Optional[jax.Array] = None,
) -> jax.Array:
    """out[s, c] += (val or 1) over entries with planned segment s and
    col == c; col outside [0, ncols) is dropped. Returns
    (num_segments + 1, ncols) — float32 with vals, exact int32
    counts without (per-chunk partials stay < 2^24 so the f32 MXU
    counts are exact integers). The kernel pads columns to a 128-lane
    multiple internally; partials are sliced back before the carry add,
    so the accumulator (and an optional `init` carry threaded by
    streamed callers — donate it in the enclosing jit) stays at the
    true `ncols` width: at PubMed's (D+1, k) mass that avoids holding a
    28%-padded 4.2 GB carry alongside the stage working set."""
    n = col.shape[0]
    ncols_pad = max(128, ((ncols + 127) // 128) * 128)
    macro = _macro(n)
    nmac = n // macro
    sub = macro // plan.chunk
    mode = _auto_mode(plan.rcap, has_vals=val is not None)
    out_dtype = jnp.float32 if val is not None else jnp.int32

    def body(acc, args):
        if val is None:
            r1, cc, ii = args
            vv = None
        else:
            r1, cc, vv, ii = args
        part = _segsum_onehot_call(
            r1, cc, vv, plan.chunk, plan.rcap, ncols_pad, mode, interpret
        ).reshape(-1, ncols_pad)[:, :ncols]
        if val is None:
            part = part.astype(jnp.int32)
        return acc.at[ii].add(part, indices_are_sorted=True), None

    xs = [plan.rank1d.reshape(nmac, macro), col.reshape(nmac, macro)]
    if val is not None:
        xs.append(val.reshape(nmac, macro))
    xs.append(plan.ids.reshape(nmac, sub * plan.rcap))
    acc = init if init is not None else jnp.zeros(
        (num_segments + 1, ncols), out_dtype)
    acc, _ = jax.lax.scan(body, acc, tuple(xs))
    return acc


def segsum_gather_rows(
    plan: SegPlan,
    idx: jax.Array,
    val: jax.Array,
    table: jax.Array,
    num_segments: int,
    interpret: bool = False,
    init: Optional[jax.Array] = None,
) -> jax.Array:
    """out[s, :] += val[e] * table[idx[e], :] over entries with planned
    segment s — the gather half stays on XLA's native row gather (the
    measured-fastest gather on this chip), the scatter half becomes MXU
    partial sums by within-chunk segment rank. The gather is fused into
    the macro-chunk scan so the scaled-row intermediate never exceeds
    (macro, W) — a whole-stream gather at a 2^25-entry streamed chunk
    with k=100 would materialize 13 GB. Returns (num_segments + 1, Wp)
    with Wp the 128-lane padded width of `table` (callers slice); an
    `init` carry must already be at Wp. Width padding happens on the
    per-macro gathered rows, never on `table` itself — a padded copy of
    PubMed's (D+1, 100) contribution-weight table would be 4.2 GB. idx
    outside [0, len(table)) contributes zero rows."""
    n = idx.shape[0]
    W = table.shape[1]
    Wp = max(128, ((W + 127) // 128) * 128)
    macro = _macro(n)
    nmac = n // macro
    sub = macro // plan.chunk
    mode = _auto_mode(plan.rcap, has_vals=True)

    def body(acc, args):
        r1, dd, vv, ii = args
        g = jnp.take(table, dd, axis=0, mode="fill", fill_value=0.0)
        g = g * vv[:, None]
        if Wp != W:
            g = jnp.pad(g, ((0, 0), (0, Wp - W)))
        part = _segsum_rows_call(
            r1, g, plan.chunk, plan.rcap, mode, interpret
        )
        return acc.at[ii].add(
            part.reshape(-1, Wp), indices_are_sorted=True
        ), None

    acc = init if init is not None else jnp.zeros(
        (num_segments + 1, Wp), jnp.float32)
    acc, _ = jax.lax.scan(
        body,
        acc,
        (
            plan.rank1d.reshape(nmac, macro),
            idx.reshape(nmac, macro),
            val.reshape(nmac, macro),
            plan.ids.reshape(nmac, sub * plan.rcap),
        ),
    )
    return acc


@partial(jax.jit, static_argnames=("interpret",))
def b_y_plan(
    sp: DocSparse, Y: jax.Array, plan: SegPlan, interpret: bool = False
) -> jax.Array:
    """B Y via the planned word-stream segment sum (the pallas analog of
    sparse.b_y): gather Y rows by doc id, then MXU partial sums by
    word rank instead of the 86 Mrows/s scatter. `plan` must be
    plan_segments(sp.w_word, sp.vocab)."""
    W = Y.shape[1]
    acc = segsum_gather_rows(
        plan, sp.w_doc, sp.w_val, Y, sp.vocab, interpret
    )
    return acc[: sp.vocab, :W]
