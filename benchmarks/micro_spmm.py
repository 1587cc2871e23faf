"""Microbenchmark: SpMM primitive variants on the real chip.

Measures achieved effective bandwidth of B^T X and B Y at NYTimes-B shape
(vocab ~102k, docs ~265k, nnz ~20M post-threshold) for width 128, across
chunk sizes. The floor is nnz * width * 4 bytes of gather traffic per
direction; the scatter side doubles it."""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, default=20_000_000)
    ap.add_argument("--vocab", type=int, default=102_660)
    ap.add_argument("--docs", type=int, default=265_000)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[1 << 19, 1 << 20, 1 << 21, 1 << 22])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from isle_tpu.sparse import DocSparse, b_y, bt_x

    rng = np.random.default_rng(0)
    docs = np.sort(rng.integers(0, args.docs, args.nnz).astype(np.int32))
    words = (args.vocab * rng.random(args.nnz) ** 2).astype(np.int32)
    vals = np.ones(args.nnz, np.float32)
    X = jnp.asarray(rng.standard_normal((args.vocab, args.width)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((args.docs, args.width)).astype(np.float32))

    print(f"platform: {jax.devices()[0]}")
    for chunk in args.chunks:
        sp = DocSparse.build(words, docs, vals, args.vocab, args.docs, chunk=chunk)
        for name, fn, arg in (("bt_x", bt_x, X), ("b_y", b_y, Y)):
            # Force a host readback each rep: on the axon tunnel,
            # block_until_ready alone does not await remote execution.
            s = float(fn(sp, arg, chunk).sum())  # compile + warm
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                s += float(fn(sp, arg, chunk).sum())
            dt = (time.perf_counter() - t0) / reps
            traffic = args.nnz * args.width * 4 * 2  # gather + scatter
            print(
                f"chunk {chunk:>8}: {name} {dt*1e3:8.2f} ms  "
                f"{traffic/dt/1e9:7.1f} GB/s eff  "
                f"{2*args.nnz*args.width/dt/1e9:7.1f} GFLOP/s"
            )


if __name__ == "__main__":
    main()
