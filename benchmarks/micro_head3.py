"""Part 2: mixed-precision head dot + b_y tail decomposition (see
micro_head2.py for the measurement protocol)."""
import time
import numpy as np

REPS = 8


def t(label, fn):
    fn()
    t0 = time.perf_counter()
    fn()
    dt = (time.perf_counter() - t0 - 0.030) / REPS
    print(f"{label:48s} {dt*1e3:8.1f} ms/op", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    V, D = 102_660, 300_000
    R = 4096
    X = jnp.asarray(rng.standard_normal((D, 128)).astype(np.float32))
    Hb = jnp.asarray((rng.random((R, D)) < 0.01).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run_mixed(H, X):
        def body(x, _):
            out = jax.lax.dot_general(
                H, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return x * (1.0 + 1e-9 * jnp.sum(out)), None
        x, _ = jax.lax.scan(body, X, None, length=REPS)
        return x

    dt = t(f"R={R} bf16 head x f32 X (mixed dot)", lambda: float(run_mixed(Hb, X).sum()))
    print(f"   {2*R*D*128/dt/1e12:.1f} TFLOP/s", flush=True)
    del Hb

    # ---- b_y tail decomposition ----
    N = 24 << 20
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
                return y * (1.0 + 1e-9 * out), None
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
            (docs.reshape(nch, CH), vals.reshape(nch, CH)))
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
             ow.reshape(nch, CH // 8)))
        return jnp.sum(out)

    def by_novals(Y, docs, vals, ow):
        def body(acc, args):
            d, seg = args
            g = jnp.take(Y, d, axis=0, fill_value=0.0)
            octs = jnp.sum(g.reshape(CH // 8, 8, 128), axis=1)
            return acc.at[seg].add(octs, indices_are_sorted=True), None
        out, _ = jax.lax.scan(
            body, jnp.zeros((V + 1, 128), jnp.float32),
            (docs.reshape(nch, CH), ow.reshape(nch, CH // 8)))
        return jnp.sum(out)

    print(f"tail N={N}", flush=True)
    for label, fn in (("tail pure gather", pure_gather),
                      ("tail full b_y", full_by),
                      ("tail b_y no-vals (factored)", by_novals)):
        r = rep_tail(fn)
        dt = t(label, lambda: float(r(X, docs_j, vals_j, ow_j).sum()))
        print(f"   {N/dt/1e6:.0f} Mrows/s", flush=True)


if __name__ == "__main__":
    main()
