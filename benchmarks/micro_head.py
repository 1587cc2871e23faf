"""Dense-head economics on the real chip: matmul rates at head shapes
(R x D) x (D x 128) for f32 HIGHEST / f32 DEFAULT / bf16 2-pass hi-lo,
plus HBM headroom — decides the hybrid head's dtype and auto-size rule."""

import time

import numpy as np


def t(label, fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    try:
        ms = dev.memory_stats()
        print(
            "HBM:",
            {k: f"{v/2**30:.2f}GiB" for k, v in ms.items() if "bytes_limit" in k or "bytes_in_use" in k},
            flush=True,
        )
    except Exception as e:
        print("memory_stats unavailable:", e, flush=True)

    D = 300_000
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((D, 128)).astype(np.float32))
    HI = jax.lax.Precision.HIGHEST

    import functools

    @functools.partial(jax.jit, static_argnames=("prec",))
    def mm_f32(H, X, prec):
        return jnp.matmul(H, X, precision=prec)

    @jax.jit
    def mm_bf16_hilo(Hb, X):
        hi = X.astype(jnp.bfloat16)
        lo = (X - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f = jax.lax.dot_general(
            Hb, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = jax.lax.dot_general(
            Hb, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return f + g

    @jax.jit
    def mm_bf16_single(Hb, X):
        return jax.lax.dot_general(
            Hb, X.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for R in (2048, 4096, 8192):
        Hf = jnp.asarray((rng.random((R, D)) < 0.01).astype(np.float32))
        flops = 2 * R * D * 128
        dt = t(f"R={R} f32 HIGHEST", lambda: float(mm_f32(Hf, X, HI).sum()))
        print(f"   {flops/dt/1e12:.1f} TFLOP/s", flush=True)
        dt = t(f"R={R} f32 DEFAULT", lambda: float(
            mm_f32(Hf, X, jax.lax.Precision.DEFAULT).sum()
        ))
        print(f"   {flops/dt/1e12:.1f} TFLOP/s", flush=True)
        Hb = Hf.astype(jnp.bfloat16)
        dt = t(f"R={R} bf16 head, hi/lo X (2 pass)", lambda: float(
            mm_bf16_hilo(Hb, X).sum()
        ))
        print(f"   {flops/dt/1e12:.1f} TFLOP/s (x2 passes)", flush=True)
        dt = t(f"R={R} bf16 head, bf16 X (1 pass)", lambda: float(
            mm_bf16_single(Hb, X).sum()
        ))
        print(f"   {flops/dt/1e12:.1f} TFLOP/s", flush=True)
        del Hf, Hb

    # transposed direction (b_y): (R, D) @ (D, k) is the same; bt_x needs
    # (D, R) x (R, 128) == H^T X — measure dot with transposed lhs
    Hf = jnp.asarray((rng.random((4096, D)) < 0.01).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((4096, 128)).astype(np.float32))

    @jax.jit
    def mm_t(H, Y):
        return jax.lax.dot_general(
            H, Y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=HI,
        )

    dt = t("R=4096 H^T Y f32 HIGHEST (bt_x dir)", lambda: float(mm_t(Hf, Y).sum()))
    print(f"   {2*4096*D*128/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
