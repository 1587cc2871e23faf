"""Pallas vs XLA on the SpMM scatter half (run on the real chip).

Every SpMM direction in sparse.py/hybrid.py ends in
`acc.at[seg].add(g, indices_are_sorted=True)` — measured at ~86 Mrows/s
(benchmarks/micro_scatter.py), the slower half of each gram/bt_x/b_y
call. XLA one-hot reformulations lost because the one-hot hits HBM
(BENCH_NOTES round-3: "one-hot rows write 100x the bytes per entry").

A pallas kernel changes that arithmetic: with entries CHUNKED and a
per-entry within-chunk segment RANK precomputed (cheap XLA pass over
the sorted ids, reusable across every op on the same matrix), each grid
step builds the (RCAP, C) one-hot IN VMEM, multiplies it onto the
(C, 128) gathered rows on the MXU, and emits only (RCAP, 128) partial
sums per chunk. The one-hot never exists in HBM; per-op HBM traffic is
the sequential read of g plus nchunks*RCAP partial rows, and the final
scatter shrinks by C/avg_distinct.

Rank overflow (a chunk with more than RCAP distinct segments) is the
caller's contract — production planning repacks chunk cuts so the
bound holds (see sparse_pallas.py); this benchmark asserts it.

Matmul precision: one-hot entries are exactly 0/1, but a DEFAULT f32
MXU pass truncates g to bf16 (CLAUDE.md). Variants measured here:
  HIGHEST  — exact, 6 passes;
  split2   — g = hi + lo with hi = bf16(g), lo = bf16(g - hi): two
             DEFAULT bf16 passes with f32 accumulation, error ~1e-6.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST


def readback(x):
    return float(jnp.asarray(x).sum())  # forces remote completion


def bench(fn, *args, reps=5):
    readback(fn(*args))  # compile + warm
    t = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(fn(*args))
        t.append(time.perf_counter() - t0)
    return min(t)


# ---------------------------------------------------------------- data
def make_sorted_segments(n, avg_run, num_segments, seed=0):
    """Sorted segment ids with ~avg_run entries per present segment."""
    rng = np.random.default_rng(seed)
    n_distinct = max(1, n // avg_run)
    ids = np.sort(rng.choice(num_segments, size=n_distinct, replace=False))
    runs = rng.poisson(avg_run - 1, size=n_distinct) + 1
    seg = np.repeat(ids, runs)
    seg = seg[:n]
    if len(seg) < n:
        seg = np.concatenate([seg, np.full(n - len(seg), ids[-1], np.int32)])
    return np.sort(seg).astype(np.int32)


# ------------------------------------------------------- XLA baseline
def xla_scatter(seg2d, g3d, num_segments):
    """The production pattern (sparse._chunked_gather_segsum's scatter
    half): scan over 2^20-entry chunks, sorted scatter-add per step."""

    def body(acc, args):
        s, rows = args
        return acc.at[s].add(rows, indices_are_sorted=True), None

    acc = jnp.zeros((num_segments, g3d.shape[2]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (seg2d, g3d))
    return acc


# -------------------------------------------------------- pallas path
from functools import partial


@partial(jax.jit, static_argnums=1)
def _ranks(seg, chunk):
    n = seg.shape[0]
    nchunks = n // chunk
    b = jnp.concatenate([jnp.ones((1,), jnp.int32),
                         (seg[1:] != seg[:-1]).astype(jnp.int32)])
    R = jnp.cumsum(b) - 1  # global distinct index per entry
    starts = R.reshape(nchunks, chunk)[:, :1]
    rank2d = R.reshape(nchunks, chunk) - starts
    return rank2d, rank2d.max()


@partial(jax.jit, static_argnums=2)
def _rank_ids(seg, rank2d, rcap):
    """ids[chunk*rcap + rank] = segment id at that rank (scatter once).

    UNUSED rank slots are filled with the chunk's LAST segment id, not 0:
    the final scatter-add claims indices_are_sorted, and a 0 in the middle
    of the flattened (chunk-major, rank-minor) id sequence breaks global
    sortedness — silently wrong results at scale (the hint is a promise,
    not an optimization request). The partial rows at unused ranks are
    exactly zero, so adding them to a real segment is a no-op."""
    n = seg.shape[0]
    nchunks, chunk = rank2d.shape
    fill = jnp.broadcast_to(
        seg.reshape(nchunks, chunk)[:, -1:], (nchunks, rcap)
    ).reshape(-1)
    flat = (jnp.arange(n, dtype=jnp.int32) // chunk) * rcap + rank2d.reshape(-1)
    return fill.at[flat].set(seg, indices_are_sorted=True)


def plan_ranks(seg, chunk):
    """(rank2d int32 (nchunks, chunk), ids (nchunks*rcap,) int32, rcap).
    One XLA pass over the sorted ids; reused across every op on the
    matrix. rcap is a HOST value (one scalar readback per matrix)."""
    rank2d, rmax = _ranks(seg, chunk)
    rcap = int(rmax) + 1
    rcap = max(8, 1 << (rcap - 1).bit_length())
    ids = _rank_ids(seg, rank2d, rcap)
    return rank2d, ids, rcap


def make_pallas_segsum(chunk, rcap, mode):
    def kernel(rank_ref, g_ref, o_ref):
        r = rank_ref[:]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (rcap, chunk), 0)
            == r[None, :]
        )
        if mode == "highest":
            o_ref[0] = jax.lax.dot_general(
                onehot.astype(jnp.float32), g_ref[:],
                (((1,), (0,)), ((), ())), precision=HI,
                preferred_element_type=jnp.float32,
            )
        elif mode == "split2":
            oh = onehot.astype(jnp.bfloat16)
            hi = g_ref[:].astype(jnp.bfloat16)
            lo = (g_ref[:] - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                oh, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += jax.lax.dot_general(
                oh, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = acc
        else:  # default precision: measures the truncation floor
            o_ref[0] = jax.lax.dot_general(
                onehot.astype(jnp.float32), g_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    def segsum(rank1d, g, nchunks, width):
        return pl.pallas_call(
            kernel,
            grid=(nchunks,),
            out_shape=jax.ShapeDtypeStruct((nchunks, rcap, width), jnp.float32),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, width), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rcap, width), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(rank1d, g)

    return segsum


def pallas_scatter(segsum, rank1d, g, ids, num_segments, nchunks, width):
    part = segsum(rank1d, g, nchunks, width)
    acc = jnp.zeros((num_segments, width), jnp.float32)
    return acc.at[ids].add(part.reshape(-1, width), indices_are_sorted=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 24)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=2048)
    args = ap.parse_args()
    n, W, C = args.n, args.width, args.chunk
    print("backend:", jax.devices()[0].platform, jax.devices()[0])

    for name, avg_run, nseg_in in [
        ("doc-dir (avg 110/seg)", 110, max(n // 100, 1 << 18)),
        ("word-tail (avg 16/seg)", 16, None),
    ]:
        nseg = nseg_in or max(1 << 17, 2 * (n // avg_run))
        seg_h = make_sorted_segments(n, avg_run, nseg)
        seg = jnp.asarray(seg_h)
        key = jax.random.PRNGKey(0)
        g = jax.random.normal(key, (n, W), jnp.float32)
        scan_chunk = min(1 << 20, n)  # the production scan step size
        seg2d = seg.reshape(n // scan_chunk, scan_chunk)
        g3d = g.reshape(n // scan_chunk, scan_chunk, W)
        nchunks = n // C

        t = bench(jax.jit(xla_scatter, static_argnums=2), seg2d, g3d, nseg)
        base = jax.jit(xla_scatter, static_argnums=2)(seg2d, g3d, nseg)
        print(f"[{name}] XLA scatter-add: {t*1e3:8.1f} ms "
              f"({n/t/1e6:7.1f} Mrows/s)")

        tp = bench(lambda s: plan_ranks(s, C)[0], seg)
        rank2d, ids, rcap = plan_ranks(seg, C)
        rank1d = rank2d.reshape(-1)
        print(f"[{name}] plan (once per matrix): {tp*1e3:8.1f} ms, "
              f"rcap={rcap}")

        for mode in ("highest", "split2", "default"):
            segsum = make_pallas_segsum(C, rcap, mode)
            fn = jax.jit(
                lambda r2, gg, ii: pallas_scatter(
                    segsum, r2, gg, ii, nseg, nchunks, W
                )
            )
            t2 = bench(fn, rank1d, g, ids)
            out = fn(rank1d, g, ids)
            err = float(
                jnp.max(jnp.abs(out - base))
                / jnp.maximum(jnp.max(jnp.abs(base)), 1e-30)
            )
            print(f"[{name}] pallas segsum ({mode:7s}): {t2*1e3:8.1f} ms "
                  f"({n/t2/1e6:7.1f} Mrows/s)  maxrelerr={err:.2e}")


if __name__ == "__main__":
    main()
