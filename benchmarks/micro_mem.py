"""Gather/scatter rate vs table size: random row gathers at width 128 from
tables of 13..416 MB, and octet scatters into targets of those sizes.
Locates the fast-table threshold that decides SpMM blocking."""

import time

import numpy as np

REPS = 4
N = 16 << 20  # rows gathered per op


def t(label, fn):
    fn()
    t0 = time.perf_counter()
    fn()
    dt = (time.perf_counter() - t0 - 0.030) / REPS
    print(f"{label:44s} {dt*1e3:8.1f} ms  {N/dt/1e6:6.0f} Mrows/s",
          flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    CH = 1 << 21
    nch = N // CH

    for rows in (25_000, 50_000, 100_000, 200_000, 400_000, 800_000):
        table = jnp.asarray(
            rng.standard_normal((rows, 128)).astype(np.float32)
        )
        idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))

        @jax.jit
        def run(table, idx):
            def rep(acc, _):
                def body(a, i):
                    g = jnp.take(table, i, axis=0)
                    return a + jnp.sum(g), None

                out, _ = jax.lax.scan(
                    body, jnp.float32(0), idx.reshape(nch, CH)
                )
                return acc + out * 1e-9, None

            acc, _ = jax.lax.scan(rep, jnp.float32(0), None, length=REPS)
            return acc

        t(f"gather from {rows*512//(1<<20):4d} MB table",
          lambda: float(run(table, idx)))
        del table, idx


if __name__ == "__main__":
    main()
