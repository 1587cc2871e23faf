"""Decompose the SpMM cost: gather-only vs scatter-only vs full, plus a
BCOO comparison point."""

import time

import numpy as np


def timeit(fn, *args, reps=3):
    s = float(fn(*args).sum())  # warm + compile
    t0 = time.perf_counter()
    for _ in range(reps):
        s += float(fn(*args).sum())
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    NNZ, V, D, W = 1 << 24, 102_660, 265_000, 128
    CH = 1 << 21
    rng = np.random.default_rng(0)
    docs = np.sort(rng.integers(0, D, NNZ).astype(np.int32))
    words = (V * rng.random(NNZ) ** 2).astype(np.int32)
    vals = np.ones(NNZ, np.float32)
    Xh = rng.standard_normal((V, W)).astype(np.float32)

    w_j = jnp.asarray(words)
    d_j = jnp.asarray(docs)
    v_j = jnp.asarray(vals)
    X = jnp.asarray(Xh)
    n = NNZ // CH

    @jax.jit
    def gather_only(w, v, X):
        def body(acc, args):
            wi, vi = args
            g = jnp.take(X, wi, axis=0, fill_value=0.0) * vi[:, None]
            return acc + jnp.sum(g, axis=0), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((W,), jnp.float32), (w.reshape(n, CH), v.reshape(n, CH))
        )
        return out

    @jax.jit
    def scatter_only(d, v):
        # per-entry W-wide constant rows scattered by doc
        def body(acc, args):
            di, vi = args
            g = jnp.broadcast_to(vi[:, None], (CH, W))
            return acc.at[di].add(g, indices_are_sorted=True), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((D + 1, W), jnp.float32),
            (d.reshape(n, CH), v.reshape(n, CH)),
        )
        return out

    @jax.jit
    def full(w, d, v, X):
        def body(acc, args):
            wi, di, vi = args
            g = jnp.take(X, wi, axis=0, fill_value=0.0) * vi[:, None]
            return acc.at[di].add(g, indices_are_sorted=True), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((D + 1, W), jnp.float32),
            (w.reshape(n, CH), d.reshape(n, CH), v.reshape(n, CH)),
        )
        return out

    @jax.jit
    def segsum(w, d, v, X):
        def body(acc, args):
            wi, di, vi = args
            g = jnp.take(X, wi, axis=0, fill_value=0.0) * vi[:, None]
            return acc + jax.ops.segment_sum(
                g, di, num_segments=D + 1, indices_are_sorted=True
            ), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((D + 1, W), jnp.float32),
            (w.reshape(n, CH), d.reshape(n, CH), v.reshape(n, CH)),
        )
        return out

    floor = NNZ * W * 4
    for name, dt in (
        ("gather_only", timeit(gather_only, w_j, v_j, X)),
        ("scatter_only", timeit(scatter_only, d_j, v_j)),
        ("full(at.add)", timeit(full, w_j, d_j, v_j, X)),
        ("full(segsum)", timeit(segsum, w_j, d_j, v_j, X)),
    ):
        print(f"{name:14s} {dt*1e3:8.1f} ms  {floor/dt/1e9:7.1f} GB/s(min)",
              flush=True)

    try:
        from jax.experimental import sparse as jsparse

        M = jsparse.BCOO(
            (v_j, jnp.stack([d_j, w_j], axis=1)), shape=(D, V),
            indices_sorted=True, unique_indices=True,
        )

        @jax.jit
        def bcoo_mm(M, X):
            return M @ X

        dt = timeit(bcoo_mm, M, X)
        print(f"{'bcoo@X':14s} {dt*1e3:8.1f} ms  {floor/dt/1e9:7.1f} GB/s(min)",
              flush=True)
    except Exception as e:
        print("bcoo failed:", e)


if __name__ == "__main__":
    main()
