"""fill-mode vs clip-mode gather cost, plus width-128 vs split-64 gathers."""
import time
import numpy as np

REPS = 4
N = 16 << 20


def t(label, fn):
    fn()
    t0 = time.perf_counter()
    fn()
    dt = (time.perf_counter() - t0 - 0.030) / REPS
    print(f"{label:46s} {dt*1e3:8.1f} ms  {N/dt/1e6:6.0f} Mrows/s", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    CH = 1 << 21
    nch = N // CH
    D = 300_000
    Y = jnp.asarray(rng.standard_normal((D, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, D, N).astype(np.int32))
    vals = jnp.asarray(rng.random(N).astype(np.float32))

    def mk(gather):
        @jax.jit
        def run(Y, idx, vals):
            def rep(acc, _):
                def body(a, args):
                    i, v = args
                    g = gather(Y, i) * v[:, None]
                    return a + jnp.sum(g), None
                out, _ = jax.lax.scan(
                    body, jnp.float32(0),
                    (idx.reshape(nch, CH), vals.reshape(nch, CH)))
                return acc + out * 1e-9, None
            acc, _ = jax.lax.scan(rep, jnp.float32(0), None, length=REPS)
            return acc
        return run

    r = mk(lambda Y, i: jnp.take(Y, i, axis=0, fill_value=0.0))
    t("153MB fill_value=0", lambda: float(r(Y, idx, vals)))
    r = mk(lambda Y, i: jnp.take(Y, i, axis=0, mode="clip"))
    t("153MB mode=clip", lambda: float(r(Y, idx, vals)))
    Yp = jnp.concatenate([Y, jnp.zeros((1, 128), jnp.float32)])
    r = mk(lambda Y, i: jnp.take(Y, i, axis=0, mode="clip"))
    t("153MB+spill row, clip", lambda: float(r(Yp, idx, vals)))
    r = mk(lambda Y, i: Y[i])
    t("153MB plain Y[i]", lambda: float(r(Y, idx, vals)))
    # split-64 double gather (two tables under the fast threshold)
    Ya, Yb = Y[:, :64], Y[:, 64:]

    @jax.jit
    def run_split(Ya, Yb, idx, vals):
        def rep(acc, _):
            def body(a, args):
                i, v = args
                g = jnp.take(Ya, i, axis=0, mode="clip") * v[:, None]
                h = jnp.take(Yb, i, axis=0, mode="clip") * v[:, None]
                return a + jnp.sum(g) + jnp.sum(h), None
            out, _ = jax.lax.scan(
                body, jnp.float32(0),
                (idx.reshape(nch, CH), vals.reshape(nch, CH)))
            return acc + out * 1e-9, None
        acc, _ = jax.lax.scan(rep, jnp.float32(0), None, length=REPS)
        return acc

    t("2x76MB split-width clip", lambda: float(run_split(Ya, Yb, idx, vals)))


if __name__ == "__main__":
    main()
