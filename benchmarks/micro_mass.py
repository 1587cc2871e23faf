"""A/B: doc_topic_mass one-hot row scatter vs flat scalar scatter at the
NYTimes shape (the round-3 change made the 'topics' phase look slower in
one bench sample; adjudicate with a warm isolated measurement)."""

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
    from isle_tpu.topic_model import doc_topic_mass
    from bench import synth_corpus, NYT

    V, D, NNZ, k = NYT["vocab"], NYT["docs"], NYT["nnz"], NYT["k"]
    d, w, c = synth_corpus(V, D, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V, num_docs=D)
    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    rng = np.random.default_rng(0)
    cwt = jnp.asarray(rng.integers(-1, k, V).astype(np.int32))

    @partial(jax.jit, static_argnames=("num_topics", "chunk"))
    def mass_flat(A, cw_topic, num_topics: int, chunk: int = 1 << 20):
        kk = num_topics
        Dd = A.num_docs
        cwtp = jnp.concatenate([cw_topic, jnp.full((1,), -1, jnp.int32)])
        chunk = min(chunk, A.padded_nnz)
        n = A.padded_nnz // chunk

        def body(acc, args):
            ww, dd_, vv = args
            tt = cwtp[ww]
            is_cw = tt >= 0
            di = jnp.where(is_cw, dd_, Dd)
            acc = acc.at[di * jnp.int32(kk) + jnp.maximum(tt, 0)].add(
                jnp.where(is_cw, vv, 0.0))
            return acc, None

        out, _ = jax.lax.scan(
            body, jnp.zeros(((Dd + 1) * kk,), jnp.float32),
            (A.d_word.reshape(n, chunk), A.d_doc.reshape(n, chunk),
             A.d_val.reshape(n, chunk)),
        )
        return out.reshape(Dd + 1, kk)[:Dd]

    t("doc_topic_mass one-hot (current)", lambda: float(
        doc_topic_mass(A, cwt, k).ravel()[0]
    ))
    t("doc_topic_mass flat scalar (old)", lambda: float(
        mass_flat(A, cwt, k).ravel()[0]
    ))


if __name__ == "__main__":
    main()
