"""Scalar scatter-add vs 128-wide one-hot row scatter for dense-head build."""

import time

import numpy as np


def t(label, fn, reps=2):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    print(f"{label:30s} {(time.perf_counter()-t0)/reps*1e3:9.1f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    N, R, D = 3_000_000, 4096, 40_000
    Dp = ((D + 127) // 128) * 128
    rng = np.random.default_rng(0)
    rr = jnp.asarray(np.sort(rng.integers(0, R, N)).astype(np.int32))
    dd = jnp.asarray(rng.integers(0, D, N).astype(np.int32))
    v = jnp.asarray(rng.random(N).astype(np.float32))

    @jax.jit
    def scalar_add(rr, dd, v):
        H = jnp.zeros((R + 1, D + 1), jnp.float32)
        return H.at[rr, dd].add(v)

    @jax.jit
    def scalar_set(rr, dd, v):
        H = jnp.zeros((R + 1, D + 1), jnp.float32)
        return H.at[rr, dd].set(v)

    @jax.jit
    def onehot_rows(rr, dd, v):
        L = rr * Dp + dd
        row = L // 128
        col = L % 128
        CH = 1 << 20
        n = N // CH

        def body(acc, args):
            r, c, vv = args
            g = jax.nn.one_hot(c, 128, dtype=jnp.float32) * vv[:, None]
            return acc.at[r].add(g, indices_are_sorted=True), None

        acc, _ = jax.lax.scan(
            body,
            jnp.zeros((R * Dp // 128 + 1, 128), jnp.float32),
            (row.reshape(n, CH), col.reshape(n, CH), v.reshape(n, CH)),
        )
        return acc[: R * Dp // 128].reshape(R, Dp)[:, :D]

    t("scalar .at.add", lambda: float(scalar_add(rr, dd, v).sum()))
    t("scalar .at.set", lambda: float(scalar_set(rr, dd, v).sum()))
    t("one-hot row .at.add", lambda: float(onehot_rows(rr, dd, v).sum()))
    # correctness
    a = np.asarray(scalar_add(rr, dd, v))[:R, :D]
    b = np.asarray(onehot_rows(rr, dd, v))
    np.testing.assert_allclose(a, b, atol=1e-4)
    print("onehot matches scalar_add", flush=True)


if __name__ == "__main__":
    main()
