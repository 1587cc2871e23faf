"""Micro-benchmark: the resident-chunk decode at PubMed shape.

The suspect is the per-entry doc_sums gather ds[d] from the full
(D+1,)-entry table (D=8.2M). Candidate: slice the chunk's doc window
out of the table first (dynamic_slice of ~mdoc entries) and gather from
the small window with local ids — the same values, bitwise.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_decode.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

V = 141_043
D = 8_200_000
CHUNK = 1 << 25
MDOC = 360_000  # docs per chunk at avg ~96 entries/doc


def readback(x):
    return float(jnp.reshape(x, (-1,))[0])


def timeit(fn, *args, reps=3):
    fn(*args)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    readback(out[1] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps


@partial(jax.jit, static_argnames=())
def decode_big_gather(w_res, cv_res, offsets_pad, doc_sums, avg, a, lo, cnt):
    w = jax.lax.dynamic_slice(w_res, (a,), (CHUNK,))
    cv = jax.lax.dynamic_slice(cv_res, (a,), (CHUNK,))
    loff = jax.lax.dynamic_slice(offsets_pad, (lo,), (MDOC,)) - a
    marks = jnp.zeros((CHUNK,), jnp.int32).at[loff[1:]].add(1, mode="drop")
    dl = jnp.cumsum(marks)
    in_range = jnp.arange(CHUNK, dtype=jnp.int32) < cnt
    d = jnp.where(in_range, jnp.minimum(lo + dl, D), D)
    w = jnp.where(in_range, w, V)
    ds = jnp.concatenate([doc_sums, jnp.ones((1,), jnp.float32)])
    v = jnp.where(w < V, avg * (cv.astype(jnp.float32) / ds[d]), 0.0)
    return w, v, d


@partial(jax.jit, static_argnames=())
def decode_window_gather(w_res, cv_res, offsets_pad, doc_sums_pad, avg, a,
                         lo, cnt):
    w = jax.lax.dynamic_slice(w_res, (a,), (CHUNK,))
    cv = jax.lax.dynamic_slice(cv_res, (a,), (CHUNK,))
    loff = jax.lax.dynamic_slice(offsets_pad, (lo,), (MDOC,)) - a
    marks = jnp.zeros((CHUNK,), jnp.int32).at[loff[1:]].add(1, mode="drop")
    dl = jnp.cumsum(marks)
    in_range = jnp.arange(CHUNK, dtype=jnp.int32) < cnt
    d = jnp.where(in_range, jnp.minimum(lo + dl, D), D)
    w = jnp.where(in_range, w, V)
    # gather doc sums from the chunk's SMALL window instead of the full
    # (D+1,) table; ds_pad[D..] = 1.0 so out-of-range docs match
    ds_win = jax.lax.dynamic_slice(doc_sums_pad, (lo,), (MDOC,))
    dse = ds_win[jnp.minimum(dl, MDOC - 1)]
    v = jnp.where(w < V, avg * (cv.astype(jnp.float32) / dse), 0.0)
    return w, v, d


def main():
    print(f"# device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    total = CHUNK * 2
    w_res = jnp.asarray(rng.integers(0, V, total, dtype=np.int32))
    cv_res = jnp.asarray(rng.integers(1, 15, total, dtype=np.uint8))
    # ~96 entries/doc synthetic offsets
    lens = rng.integers(48, 144, D).astype(np.int64)
    offsets = np.zeros(D + MDOC + 1, np.int64)
    np.cumsum(lens, out=offsets[1 : D + 1])
    offsets[D + 1 :] = offsets[D]
    offsets_pad = jnp.asarray(np.minimum(offsets, 2**31 - 1).astype(np.int32))
    doc_sums = jnp.asarray(rng.random(D).astype(np.float32) * 300 + 1)
    doc_sums_pad = jnp.concatenate(
        [doc_sums, jnp.ones((MDOC + 1,), jnp.float32)]
    )
    readback(w_res)

    a, lo, cnt = jnp.int32(0), jnp.int32(0), jnp.int32(CHUNK - 7)
    avg = np.float32(383.0)
    t = timeit(decode_big_gather, w_res, cv_res, offsets_pad, doc_sums,
               avg, a, lo, cnt)
    print(f"decode big-gather: {t*1e3:.0f} ms ({CHUNK/t/1e6:.1f} M entries/s)")
    t = timeit(decode_window_gather, w_res, cv_res, offsets_pad,
               doc_sums_pad, avg, a, lo, cnt)
    print(f"decode window-gather: {t*1e3:.0f} ms "
          f"({CHUNK/t/1e6:.1f} M entries/s)")

    # equality check (same values bitwise)
    w1, v1, d1 = decode_big_gather(w_res, cv_res, offsets_pad, doc_sums,
                                   avg, a, lo, cnt)
    w2, v2, d2 = decode_window_gather(w_res, cv_res, offsets_pad,
                                      doc_sums_pad, avg, a, lo, cnt)
    same = (
        bool(jnp.array_equal(w1, w2)) and bool(jnp.array_equal(d1, d2))
        and bool(jnp.array_equal(v1, v2))
    )
    print(f"bitwise equal: {same}")


if __name__ == "__main__":
    main()
