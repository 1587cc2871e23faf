"""Pallas DMA software-gather vs XLA's native row gather (real chip).

The hybrid tail SpMM is gather-bound (~157 Mrows/s at width 128,
benchmarks/micro_gather.py) once the octet trick has cut the scatter 8x.
Mosaic has no vector gather (take_along_axis crashes the remote
compiler — see micro_pallas.py), so the only pallas route is a
scalar-loop of per-row async DMAs with a semaphore ring. This measures
whether the DMA engines can out-run XLA's gather at 512 B/row, sweeping
the pipeline depth; it also measures the fused variant that folds the
8-to-1 octet reduction into the same kernel (the production access
pattern: gather 8 rows, emit 1), halving the kernel's VMEM write-back
and the downstream read.
"""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def readback(x):
    return float(jnp.asarray(x).sum())


def bench(fn, *args, reps=5):
    readback(fn(*args))
    t = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(fn(*args))
        t.append(time.perf_counter() - t0)
    return min(t)


def make_dma_gather(chunk, depth, width):
    def kernel(idx_ref, tab_ref, o_ref, sems):
        def get_dma(i):
            return pltpu.make_async_copy(
                tab_ref.at[idx_ref[i]], o_ref.at[i], sems.at[i % depth]
            )

        def warm(i, _):
            get_dma(i).start()
            return 0

        jax.lax.fori_loop(0, depth, warm, 0)

        def body(i, _):
            get_dma(i - depth).wait()
            get_dma(i).start()
            return 0

        jax.lax.fori_loop(depth, chunk, body, 0)

        def drain(i, _):
            get_dma(chunk - depth + i).wait()
            return 0

        jax.lax.fori_loop(0, depth, drain, 0)

    @jax.jit
    def gather(idx, tab):
        n = idx.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // chunk,),
            out_shape=jax.ShapeDtypeStruct((n, width), tab.dtype),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((chunk, width), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        )(idx, tab)

    return gather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--rows", type=int, default=102_660)
    ap.add_argument("--width", type=int, default=128)
    args = ap.parse_args()
    n, V, W = args.n, args.rows, args.width
    print("backend:", jax.devices()[0])

    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (V, W), jnp.float32)
    idx = jax.random.randint(key, (n,), 0, V, jnp.int32)

    xla = jax.jit(lambda i, t: jnp.take(t, i, axis=0))
    t = bench(xla, idx, tab)
    base = xla(idx, tab)
    print(f"XLA take:           {t*1e3:8.1f} ms ({n/t/1e6:7.1f} Mrows/s)")

    for chunk, depth in [(1024, 8), (1024, 32), (1024, 128), (4096, 256)]:
        try:
            g = make_dma_gather(chunk, depth, W)
            t = bench(g, idx, tab)
            out = g(idx, tab)
            ok = bool(jnp.array_equal(out, base))
            print(f"pallas dma C={chunk:5d} depth={depth:4d}: {t*1e3:8.1f} ms "
                  f"({n/t/1e6:7.1f} Mrows/s) exact={ok}")
        except Exception as e:
            print(f"pallas dma C={chunk} depth={depth}: FAIL "
                  f"{type(e).__name__} {str(e)[:160]}")


if __name__ == "__main__":
    main()
