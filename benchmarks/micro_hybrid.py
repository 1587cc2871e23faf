"""Hybrid layout SpMM vs plain COO on the real chip, across head sizes."""

import time

import numpy as np


def timeit(fn, *args, reps=3):
    s = float(fn(*args).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        s += float(fn(*args).sum())
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from isle_tpu.hybrid import h_b_y, h_bt_x, h_gram_x, to_hybrid
    from isle_tpu.sparse import DocSparse, b_y, bt_x, gram_x

    NNZ, V, D, W = 1 << 24, 102_660, 265_000, 128
    rng = np.random.default_rng(0)
    docs = np.sort(rng.integers(0, D, NNZ).astype(np.int32))
    words = (V * rng.random(NNZ) ** 2).astype(np.int32)  # quadratic head skew
    vals = np.ones(NNZ, np.float32)
    X = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((D, W)).astype(np.float32))

    sp = DocSparse.build(words, docs, vals, V, D, chunk=1 << 21)
    print(f"platform {jax.devices()[0]}, nnz {NNZ}", flush=True)
    print(
        f"coo   : bt_x {timeit(bt_x, sp, X)*1e3:7.1f} ms  "
        f"b_y {timeit(b_y, sp, Y)*1e3:7.1f} ms  "
        f"gram {timeit(gram_x, sp, X)*1e3:7.1f} ms",
        flush=True,
    )
    for R in (256, 1024, 4096):
        h = to_hybrid(sp, R, chunk=1 << 21)
        frac = h.head_nnz / h.nnz
        print(
            f"R={R:5d} (head {frac:4.0%}): "
            f"bt_x {timeit(h_bt_x, h, X)*1e3:7.1f} ms  "
            f"b_y {timeit(h_b_y, h, Y)*1e3:7.1f} ms  "
            f"gram {timeit(h_gram_x, h, X)*1e3:7.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
