"""Micro-benchmark: the streamed banked histogram at the PubMed chunk
shape (the dominant device cost of the streamed thresholds pass after
the resident fill). Times _hist_accum warm at several scan sub-chunk
sizes, plus a flat scalar scatter-add alternative, on one 2^25-entry
chunk with PubMed's V/F.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_hist.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

V = 141_043
F = 384  # freq_bound(avg_doc_sz=383)
N = 1 << 25
NBANKS = (F + 1 + 127) // 128


def readback(x):
    return float(jnp.reshape(x, (-1,))[0])


def timeit(fn, *args, reps=3):
    fn(*args)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    readback(out)
    return (time.perf_counter() - t0) / reps


@partial(jax.jit, static_argnames=("chunk",))
def hist_banked(words, r, chunk: int):
    n = words.shape[0]

    def body(acc, args):
        wi, ri = args
        row = wi * NBANKS + ri // 128
        return acc.at[row].add(
            jax.nn.one_hot(ri % 128, 128, dtype=jnp.float32)
        ), None

    out, _ = jax.lax.scan(
        body,
        jnp.zeros(((V + 1) * NBANKS, 128), jnp.float32),
        (words.reshape(-1, chunk), r.reshape(-1, chunk)),
    )
    return out


@jax.jit
def hist_banked_noscan(words, r):
    row = words * NBANKS + r // 128
    g = jax.nn.one_hot(r % 128, 128, dtype=jnp.float32)
    return jnp.zeros(((V + 1) * NBANKS, 128), jnp.float32).at[row].add(g)


@jax.jit
def hist_flat(words, r):
    # flat scalar scatter-add into word*(F+1)+r bins (int32-safe:
    # 141k * 385 = 54M bins)
    idx = words * (F + 1) + r
    return jnp.zeros(((V + 1) * (F + 1),), jnp.float32).at[idx].add(1.0)


@partial(jax.jit, static_argnames=("chunk",))
def hist_flat_scan(words, r, chunk: int):
    def body(acc, args):
        wi, ri = args
        return acc.at[wi * (F + 1) + ri].add(1.0), None

    out, _ = jax.lax.scan(
        body,
        jnp.zeros(((V + 1) * (F + 1),), jnp.float32),
        (words.reshape(-1, chunk), r.reshape(-1, chunk)),
    )
    return out


def main():
    print(f"# device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    u = rng.random(N)
    words = np.minimum(
        (np.exp(u * np.log(float(V))) - 1.0).astype(np.int64), V - 1
    ).astype(np.int32)
    r = rng.integers(0, F + 1, N).astype(np.int32)
    dw = jax.device_put(jnp.asarray(words))
    dr = jax.device_put(jnp.asarray(r))
    readback(dw)

    for chunk in (1 << 18, 1 << 20, 1 << 22):
        t = timeit(hist_banked, dw, dr, chunk)
        print(f"banked scan chunk=2^{chunk.bit_length()-1}: {t*1e3:.0f} ms "
              f"({N/t/1e6:.1f} M entries/s)")
    t = timeit(hist_banked_noscan, dw, dr)
    print(f"banked no-scan: {t*1e3:.0f} ms ({N/t/1e6:.1f} M entries/s)")
    t = timeit(hist_flat, dw, dr)
    print(f"flat scalar no-scan: {t*1e3:.0f} ms ({N/t/1e6:.1f} M entries/s)")
    for chunk in (1 << 22,):
        t = timeit(hist_flat_scan, dw, dr, chunk)
        print(f"flat scalar scan chunk=2^{chunk.bit_length()-1}: "
              f"{t*1e3:.0f} ms ({N/t/1e6:.1f} M entries/s)")


if __name__ == "__main__":
    main()
