"""Decompose h_b_y's cost at the NYT bench shape: pure row gather vs
gather+octet-sum vs the full fused gather+octsum+scatter, plus the pure
octet scatter from a materialized gathered buffer. Decides whether a
Pallas VMEM-scatter stage is worth building."""

import time

import numpy as np


def t(label, fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:52s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    rng = np.random.default_rng(0)
    V, D = 102_660, 300_000
    N = 40 << 20  # ~42M tail entries, octet-padded
    CH = 1 << 21

    # word-sorted synthetic tail: octet word ids ascending, doc ids random
    ow = np.sort(rng.integers(0, V, N // 8).astype(np.int32))
    doc = rng.integers(0, D, N).astype(np.int32)
    val = rng.random(N).astype(np.float32)
    Y = jnp.asarray(rng.standard_normal((D, 128)).astype(np.float32))
    docs_j = jnp.asarray(doc)
    vals_j = jnp.asarray(val)
    ow_j = jnp.asarray(ow)

    nch = N // CH

    @jax.jit
    def pure_gather(Y, docs, vals):
        def body(acc, args):
            d, v = args
            g = jnp.take(Y, d, axis=0, fill_value=0.0) * v[:, None]
            return acc + jnp.sum(g, axis=0), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((128,), jnp.float32),
            (docs.reshape(nch, CH), vals.reshape(nch, CH)),
        )
        return out

    @jax.jit
    def gather_octsum(Y, docs, vals):
        def body(acc, args):
            d, v = args
            g = jnp.take(Y, d, axis=0, fill_value=0.0) * v[:, None]
            octs = jnp.sum(g.reshape(CH // 8, 8, 128), axis=1)
            return acc + jnp.sum(octs, axis=0), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((128,), jnp.float32),
            (docs.reshape(nch, CH), vals.reshape(nch, CH)),
        )
        return out

    @jax.jit
    def full_by(Y, docs, vals, ow):
        def body(acc, args):
            d, v, seg = args
            g = jnp.take(Y, d, axis=0, fill_value=0.0) * v[:, None]
            octs = jnp.sum(g.reshape(CH // 8, 8, 128), axis=1)
            return acc.at[seg].add(octs, indices_are_sorted=True), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((V + 1, 128), jnp.float32),
            (
                docs.reshape(nch, CH),
                vals.reshape(nch, CH),
                ow.reshape(nch, CH // 8),
            ),
        )
        return out

    @jax.jit
    def octsum_scatter_only(G, ow):
        # G: (N/8, 128) pre-summed octets
        def body(acc, args):
            o, seg = args
            return acc.at[seg].add(o, indices_are_sorted=True), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((V + 1, 128), jnp.float32),
            (G.reshape(nch, CH // 8, 128), ow.reshape(nch, CH // 8)),
        )
        return out

    @jax.jit
    def gather_seq(Y, docs, vals):
        # sequential 'gather' (iota indices) = pure streaming upper bound
        def body(acc, args):
            d, v = args
            idx = jnp.arange(CH, dtype=jnp.int32) % D
            g = jnp.take(Y, idx, axis=0) * v[:, None]
            return acc + jnp.sum(g, axis=0), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((128,), jnp.float32),
            (docs.reshape(nch, CH), vals.reshape(nch, CH)),
        )
        return out

    print(f"N={N} entries ({N//8} octets), V={V}, D={D}", flush=True)
    dt = t("pure random gather+mul+reduce", lambda: float(pure_gather(Y, docs_j, vals_j).sum()))
    print(f"   {N/dt/1e6:.0f} Mrows/s", flush=True)
    dt = t("gather+octet reshape-sum", lambda: float(gather_octsum(Y, docs_j, vals_j).sum()))
    print(f"   {N/dt/1e6:.0f} Mrows/s", flush=True)
    dt = t("full b_y (gather+octsum+scatter)", lambda: float(full_by(Y, docs_j, vals_j, ow_j).sum()))
    print(f"   {N/dt/1e6:.0f} Mrows/s", flush=True)
    G = jnp.asarray(rng.standard_normal((N // 8, 128)).astype(np.float32))
    dt = t("octet scatter only (pre-gathered)", lambda: float(octsum_scatter_only(G, ow_j).sum()))
    print(f"   {(N//8)/dt/1e6:.0f} Moctets/s", flush=True)
    dt = t("sequential gather (streaming bound)", lambda: float(gather_seq(Y, docs_j, vals_j).sum()))
    print(f"   {N/dt/1e6:.0f} Mrows/s", flush=True)


if __name__ == "__main__":
    main()
