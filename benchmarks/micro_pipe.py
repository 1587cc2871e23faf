"""Is host->device transfer over the axon tunnel BLOCKING in the
calling thread, and does threading the encode beside the wire pay?

Three questions for the pipelined resident fill (VERDICT r4 item 4):
  1. Does jnp.asarray(np_buf) return before the bytes land on device
     (dispatch time vs time-to-consumable)?
  2. Do N back-to-back transfers pipeline (total < N * single), or does
     each serialize behind the previous?
  3. Does running host work (numpy encode stand-in) in parallel with an
     in-flight transfer actually overlap on this 1-core host?
"""
import threading
import time

import numpy as np

MB = 1 << 20
SZ = 32 * MB  # bytes per buffer


def main():
    import jax
    import jax.numpy as jnp

    print(f"# backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    bufs = [rng.integers(0, 255, SZ, np.uint8) for _ in range(8)]

    @jax.jit
    def consume(x):
        return jnp.sum(x, dtype=jnp.int32)

    # warm the consume program + one transfer
    int(consume(jnp.asarray(bufs[0])))

    # 1) dispatch vs land
    for i in (1, 2):
        t0 = time.perf_counter()
        d = jnp.asarray(bufs[i])
        t1 = time.perf_counter()
        s = int(consume(d))
        t2 = time.perf_counter()
        print(f"single {SZ/MB:.0f}MB: asarray {t1-t0:.3f}s  "
              f"consume+readback {t2-t1:.3f}s  (sum={s & 0xffff})",
              flush=True)

    # 2) back-to-back: dispatch all, then force all
    t0 = time.perf_counter()
    ds = [jnp.asarray(b) for b in bufs]
    t1 = time.perf_counter()
    tot = int(sum(int(consume(d)) for d in ds) & 0xffff)
    t2 = time.perf_counter()
    print(f"batch 8x{SZ/MB:.0f}MB: dispatch {t1-t0:.3f}s  "
          f"drain {t2-t1:.3f}s  total {t2-t0:.3f}s  "
          f"({8*SZ/MB/(t2-t0):.1f} MB/s)  sum={tot}", flush=True)

    # 3) host work beside an in-flight transfer
    def host_work(seconds=3.0):
        t0 = time.perf_counter()
        n = 0
        a = rng.standard_normal(1 << 20)
        while time.perf_counter() - t0 < seconds:
            a = np.sort(a)
            rng.shuffle(a)
            n += 1
        return n

    base = host_work(3.0)
    t0 = time.perf_counter()
    ds = []

    def sender():
        for b in bufs:
            ds.append(jnp.asarray(b))

    th = threading.Thread(target=sender)
    th.start()
    done = host_work(3.0)
    th.join()
    t_send = time.perf_counter() - t0
    tot = int(sum(int(consume(d)) for d in ds) & 0xffff)
    t_all = time.perf_counter() - t0
    print(f"threaded: host iters beside wire {done} vs idle {base} "
          f"({done/base:.2f}x)  sender-thread {t_send:.3f}s  "
          f"total-with-drain {t_all:.3f}s  sum={tot}", flush=True)


if __name__ == "__main__":
    main()
