"""Device-sort variants for the word-sorted copy (the ~9 s inside
_device_build at the NYTimes shape). The entries are already doc-sorted,
so a STABLE sort by word alone yields (word, doc) order — the question
is which operand layout the TPU sorts fastest, and whether gathering the
payloads afterwards beats carrying them through the sort.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_sort.py
"""

import time

import numpy as np


def t(label, fn, reps=2):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:52s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    n = 1 << 25  # 33.5M — close to the 48M padded shape, fits quick runs
    rng = np.random.default_rng(0)
    V, D = 102_660, 300_000
    word = jnp.asarray(
        np.sort(rng.integers(0, D, n)).astype(np.int32) % V  # pseudo
    )
    word = jnp.asarray(rng.integers(0, V, n).astype(np.int32))
    doc = jnp.asarray(np.sort(rng.integers(0, D, n)).astype(np.int32))
    val = jnp.asarray(rng.random(n).astype(np.float32))
    idx = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def sort3_2key(w, d, v):
        return jax.lax.sort((w, d, v), num_keys=2)

    @jax.jit
    def sort3_1key_stable(w, d, v):
        return jax.lax.sort((w, d, v), num_keys=1, is_stable=True)

    @jax.jit
    def sort2_1key_stable_gather(w, d, v):
        sw, si = jax.lax.sort((w, idx), num_keys=1, is_stable=True)
        return sw, d[si], v[si]

    @jax.jit
    def sort2_1key_stable_gatherfused(w, d, v):
        sw, si = jax.lax.sort((w, idx), num_keys=1, is_stable=True)
        return sw, si  # defer payload gathers to consumers

    @jax.jit
    def sort1_u32_key_pack(w, d, v):
        # keyless payload: pack (word, idx-in-2^? ) impossible at n=33M
        # with V=102k in 32 bits; measure the raw 1-array sort as the
        # lower bound of any sort-based approach.
        return jax.lax.sort((w,), num_keys=1)

    def run(label, f):
        # block_until_ready does NOT await remote execution on the axon
        # tunnel; force a host readback of one element per output.
        def go():
            outs = f(word, doc, val)
            if not isinstance(outs, tuple):
                outs = (outs,)
            return sum(float(o.ravel()[0]) for o in outs)
        return t(label, go)

    run("sort (w,d,v) 2-key (current _device_build)", sort3_2key)
    run("sort (w,d,v) 1-key stable", sort3_1key_stable)
    run("sort (w,idx) 1-key stable + 2 gathers", sort2_1key_stable_gather)
    run("sort (w,idx) 1-key stable only", sort2_1key_stable_gatherfused)
    run("sort (w) alone (lower bound)", sort1_u32_key_pack)

    # The gathers alone
    si = jnp.asarray(rng.permutation(n).astype(np.int32))

    @jax.jit
    def gathers(d, v, si):
        return d[si], v[si]

    t("2 random 33M-scalar gathers alone", lambda: sum(
        float(o.ravel()[0]) for o in gathers(doc, val, si)
    ))


if __name__ == "__main__":
    main()
