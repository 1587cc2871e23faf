"""A/B the r-th-highest classify pass's group-count kernel: chunked
one-hot row scatter (current) vs flat scalar scatter-add at the NYTimes
shape, plus the end-to-end rth_highest wall. (micro_mass.py showed the
same switch wins for doc_topic_mass; the count here targets a (V+1, k)
= 10.3M-cell accumulator.)"""

import time
import numpy as np


def t(label, fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from isle_tpu.corpus import Corpus
    from isle_tpu.sparse import DocSparse
    from isle_tpu import catchwords as cw
    from bench import synth_corpus, NYT

    V, D, NNZ, k = NYT["vocab"], NYT["docs"], NYT["nnz"], NYT["k"]
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    rng = np.random.default_rng(0)
    cl = jnp.asarray(rng.integers(0, k, D).astype(np.int32))
    sizes = jnp.asarray(np.bincount(np.asarray(cl), minlength=k).astype(np.int32))
    r = max(int(1.0 / 3.0 * 1.0 * D / (2 * k)), 1)

    key, in_cluster = cw._entry_groups(A, cl, k)
    key = jax.block_until_ready(key)

    @jax.jit
    def count_onehot(key, in_cluster):
        return cw._count_scan(key, in_cluster, V, k)

    @jax.jit
    def count_flat(key, in_cluster):
        n_pad = key.shape[0]
        cchunk = 1 << 20
        def body(acc, args):
            kk, ic = args
            return acc.at[kk].add(ic), None
        out, _ = jax.lax.scan(
            body,
            jnp.zeros(((V + 1) * k,), jnp.float32),
            (key.reshape(n_pad // cchunk, cchunk),
             in_cluster.astype(jnp.float32).reshape(n_pad // cchunk, cchunk)),
        )
        return out.reshape(V + 1, k)

    t0 = time.perf_counter()
    a = count_onehot(key, in_cluster)
    print(f"one-hot compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    b = count_flat(key, in_cluster)
    print(f"flat compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    t("count one-hot (current)", lambda: float(count_onehot(key, in_cluster).ravel()[0]))
    t("count flat scalar", lambda: float(count_flat(key, in_cluster).ravel()[0]))

    t("rth_highest end-to-end", lambda: float(
        cw.rth_highest(A, cl, sizes, k, r).ravel()[0]), reps=2)


if __name__ == "__main__":
    main()
