"""Eigensolver internals at the NYT shape: where do the ~6.7 s warm go?

Times, at dim=102,660 / blk=128 / ncv=384 / K=256:
  - the gram operator (hybrid-layout B, synthetic with realistic head/tail
    split) at width 128
  - jnp.linalg.qr of a (dim, blk) panel (blocked Householder)
  - CholeskyQR2 of the same panel (two MXU syrk+trsm rounds)
  - jnp.linalg.eigh of the (K, K) projected matrix
  - the DGKS einsum pair
  - one full expand_block step

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_eig.py
"""

import time

import numpy as np


def t(label, fn, reps=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:40s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def cholesky_qr2(F):
    """Shifted CholeskyQR2: Q with Q^T Q ~ I for tall-skinny F. MXU-only
    (two syrk + trsm + gemm rounds) — no sequential Householder panel."""
    import jax
    import jax.numpy as jnp

    HI = jax.lax.Precision.HIGHEST

    def one(F):
        G = jnp.matmul(F.T, F, precision=HI)
        # small shift for rank-deficiency robustness
        shift = jnp.finfo(jnp.float32).eps * jnp.trace(G)
        R = jnp.linalg.cholesky(
            G + shift * jnp.eye(G.shape[0], dtype=G.dtype), upper=True
        )
        Q = jax.scipy.linalg.solve_triangular(
            R.T, F.T, lower=True
        ).T
        return Q, R

    Q1, R1 = one(F)
    Q2, R2 = one(Q1)
    return Q2, jnp.matmul(R2, R1, precision=HI)


def main():
    import jax
    import jax.numpy as jnp

    HI = jax.lax.Precision.HIGHEST
    dim, blk, K = 102_660, 128, 256
    ncv = K + blk
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.standard_normal((dim, blk)).astype(np.float32))
    V = jnp.asarray(rng.standard_normal((dim, ncv)).astype(np.float32))
    Hs = rng.standard_normal((K, K)).astype(np.float32)
    Hs = jnp.asarray((Hs + Hs.T) / 2)

    qr = jax.jit(jnp.linalg.qr)
    cq2 = jax.jit(cholesky_qr2)
    eigh = jax.jit(jnp.linalg.eigh)

    @jax.jit
    def dgks(V, F):
        C = jnp.einsum("dm,db->mb", V, F, precision=HI)
        return F - jnp.einsum("dm,mb->db", V, C, precision=HI)

    t("householder qr (dim,128)", lambda: float(qr(F)[0][0, 0]))
    t("choleskyqr2 (dim,128)", lambda: float(cq2(F)[0][0, 0]))
    t("eigh (256,256) on device", lambda: float(eigh(Hs)[0][0]))
    t("dgks einsum pair", lambda: float(dgks(V, F)[0, 0]))

    # accuracy of choleskyqr2
    Q, R = cq2(F)
    orth = float(jnp.linalg.norm(Q.T @ Q - jnp.eye(blk)))
    recon = float(jnp.linalg.norm(Q @ R - F) / jnp.linalg.norm(F))
    print(f"cq2 orthogonality |Q^TQ-I|_F = {orth:.2e}, recon rel = {recon:.2e}",
          flush=True)

    # eigh on HOST for the small projected problem (one (K,K) download +
    # (K,keep) upload per restart vs a device eigh)
    def host_eigh():
        h = np.asarray(Hs)
        w, W = np.linalg.eigh(h)
        return jnp.asarray(W)[0, 0].item()

    t("eigh (256,256) host roundtrip", host_eigh)

    # gram op on a realistic hybrid B (Zipf synthetic at NYT shape)
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import synth_corpus, NYT
    from isle_tpu.corpus import Corpus
    from isle_tpu.sparse import DocSparse
    from isle_tpu.thresholds import compute_thresholds_jax
    from isle_tpu.hybrid import hybrid_from_thresholds, h_gram_x
    from isle_tpu.config import HyperParams

    V_, D_, NNZ = NYT["vocab"], NYT["docs"], NYT["nnz"]
    d, w, c = synth_corpus(V_, D_, NNZ, 0)
    corpus = Corpus.from_entries(d, w, c, vocab_size=V_, num_docs=D_)
    A = DocSparse.from_corpus(corpus, chunk=1 << 21)
    hp = HyperParams()
    zetas, _ = compute_thresholds_jax(
        A.d_word, A.d_val, V_, corpus.avg_doc_sz, corpus.nz_docs, 100, hp
    )
    B, _, _ = hybrid_from_thresholds(A, zetas, 4096 << 20, chunk=1 << 21)
    print(f"B: head {B.num_head} rows = {B.head_nnz/B.nnz:.0%} of "
          f"{B.nnz} nnz", flush=True)
    X = jnp.asarray(rng.standard_normal((V_, 128)).astype(np.float32))
    t("h_gram_x width 128", lambda: float(h_gram_x(B, X, 1 << 21).sum()),
      reps=3)


if __name__ == "__main__":
    main()
