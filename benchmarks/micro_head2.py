"""Sync-amortized head/tail economics: every measured fn applies its op
REPS times inside one jitted scan (carry-dependent so nothing folds away),
then pays ONE ~30 ms host sync — isolating true per-op cost."""

import time

import numpy as np

REPS = 8


def t(label, fn, per_label="op"):
    fn()
    t0 = time.perf_counter()
    fn()
    dt = (time.perf_counter() - t0 - 0.030) / REPS  # subtract one sync
    print(f"{label:48s} {dt*1e3:8.1f} ms/{per_label}", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    rng = np.random.default_rng(0)
    V, D = 102_660, 300_000
    HI = jax.lax.Precision.HIGHEST

    X = jnp.asarray(rng.standard_normal((D, 128)).astype(np.float32))

    def rep_matmul(mm):
        @jax.jit
        def run(H, X):
            def body(x, _):
                out = mm(H, x)  # (R, 128)
                # feed a cheap perturbation back so iterations serialize
                x = x * (1.0 + 1e-9 * jnp.sum(out))
                return x, None

            x, _ = jax.lax.scan(body, X, None, length=REPS)
            return x

        return run

    mm_hi = lambda H, x: jnp.matmul(H, x, precision=HI)
    mm_bf = lambda H, x: jax.lax.dot_general(
        H, x.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def mm_hilo(H, x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda a: jax.lax.dot_general(
            H, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dot(hi) + dot(lo)

    for R in (4096, 8192):
        Hf = jnp.asarray((rng.random((R, D)) < 0.01).astype(np.float32))
        r_hi = rep_matmul(mm_hi)
        dt = t(f"R={R} f32 HIGHEST", lambda: float(r_hi(Hf, X).sum()))
        print(f"   {2*R*D*128/dt/1e12:.1f} TFLOP/s", flush=True)
        Hb = Hf.astype(jnp.bfloat16)
        r_hl = rep_matmul(mm_hilo)
        dt = t(f"R={R} bf16 hd hi/lo", lambda: float(r_hl(Hb, X).sum()))
        print(f"   {2*R*D*128/dt/1e12:.1f} TFLOP/s", flush=True)
        r_bf = rep_matmul(mm_bf)
        dt = t(f"R={R} bf16 hd bf16 X", lambda: float(r_bf(Hb, X).sum()))
        print(f"   {2*R*D*128/dt/1e12:.1f} TFLOP/s", flush=True)
        del Hf, Hb

    # ---- b_y decomposition at tail shape ----
    N = 24 << 20  # ~25M tail entries
    CH = 1 << 21
    nch = N // CH
    ow = np.sort(rng.integers(0, V, N // 8).astype(np.int32))
    doc = rng.integers(0, D, N).astype(np.int32)
    docs_j = jnp.asarray(doc)
    vals_j = jnp.asarray(rng.random(N).astype(np.float32))
    ow_j = jnp.asarray(ow)

    def rep_tail(inner):
        @jax.jit
        def run(Y, docs, vals, ow):
            def body(y, _):
                out = inner(y, docs, vals, ow)
                y = y * (1.0 + 1e-9 * out)
                return y, None

            y, _ = jax.lax.scan(body, Y, None, length=REPS)
            return y

        return run

    def pure_gather(Y, docs, vals, ow):
        def body(acc, args):
            d, v = args
            g = jnp.take(Y, d, axis=0, fill_value=0.0) * v[:, None]
            return acc + jnp.sum(g), None

        out, _ = jax.lax.scan(
            body, jnp.float32(0),
            (docs.reshape(nch, CH), vals.reshape(nch, CH)),
        )
        return out

    def full_by(Y, docs, vals, ow):
        def body(acc, args):
            d, v, seg = args
            g = jnp.take(Y, d, axis=0, fill_value=0.0) * v[:, None]
            octs = jnp.sum(g.reshape(CH // 8, 8, 128), axis=1)
            return acc.at[seg].add(octs, indices_are_sorted=True), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((V + 1, 128), jnp.float32),
            (docs.reshape(nch, CH), vals.reshape(nch, CH),
             ow.reshape(nch, CH // 8)),
        )
        return jnp.sum(out)

    def by_novals(Y, docs, vals, ow):
        # factored-value variant: no per-entry multiply
        def body(acc, args):
            d, seg = args
            g = jnp.take(Y, d, axis=0, fill_value=0.0)
            octs = jnp.sum(g.reshape(CH // 8, 8, 128), axis=1)
            return acc.at[seg].add(octs, indices_are_sorted=True), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((V + 1, 128), jnp.float32),
            (docs.reshape(nch, CH), ow.reshape(nch, CH // 8)),
        )
        return jnp.sum(out)

    print(f"tail N={N}", flush=True)
    for label, fn in (
        ("tail pure gather", pure_gather),
        ("tail full b_y", full_by),
        ("tail b_y no-vals (factored)", by_novals),
    ):
        r = rep_tail(fn)
        dt = t(label, lambda: float(r(X, docs_j, vals_j, ow_j).sum()))
        print(f"   {N/dt/1e6:.0f} Mrows/s", flush=True)


if __name__ == "__main__":
    main()
