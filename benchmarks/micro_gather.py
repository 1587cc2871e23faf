"""Is the XLA TPU row-gather rate bound by rows/s or bytes/s? Measures
take() throughput across row widths."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 1 << 23
    V = 102_660
    rng = np.random.default_rng(0)
    idx = jnp.asarray((V * rng.random(N) ** 2).astype(np.int32))
    CH = 1 << 20
    n = N // CH

    for W in (64, 128, 256, 512):
        X = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))

        @jax.jit
        def gather_sum(idx, X):
            def body(acc, i):
                g = jnp.take(X, i, axis=0, fill_value=0.0)
                return acc + jnp.sum(g, axis=0), None

            out, _ = jax.lax.scan(
                body, jnp.zeros((X.shape[1],), jnp.float32), idx.reshape(n, CH)
            )
            return out

        s = float(gather_sum(idx, X).sum())
        t0 = time.perf_counter()
        for _ in range(3):
            s += float(gather_sum(idx, X).sum())
        dt = (time.perf_counter() - t0) / 3
        print(
            f"W={W:4d}: {dt*1e3:7.1f} ms  {N/dt/1e6:7.1f} Mrows/s  "
            f"{N*W*4/dt/1e9:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
