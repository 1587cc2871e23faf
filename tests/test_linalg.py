"""Block-KS eigensolver vs the dense LAPACK oracle (the reference's own
validation pattern, src/denseMatrix.cpp:413-461)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isle_tpu.linalg import align_signs, block_ks, dense_topk_eigh
from isle_tpu.sparse import DocSparse, gram_x, to_dense


def spd_op(S):
    Sj = jnp.asarray(S)

    def op(X):
        return jnp.matmul(Sj, X, precision=jax.lax.Precision.HIGHEST)

    return op


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("nev,blk", [(5, 4), (10, 8), (7, 16)])
def test_dense_operator(seed, nev, blk):
    rng = np.random.default_rng(seed)
    dim = 120
    A = rng.standard_normal((dim, dim // 2)).astype(np.float32)
    S = (A @ A.T).astype(np.float32)
    res = block_ks(
        spd_op(S), dim, nev, blk=blk, tol=1e-5, key=jax.random.PRNGKey(seed)
    )
    w_ref, v_ref = dense_topk_eigh(S, nev)
    assert res.nconv == nev
    np.testing.assert_allclose(res.evals, w_ref, rtol=1e-4)
    U = align_signs(np.asarray(res.evecs), v_ref.astype(np.float32))
    # eigenvector agreement up to sign, looser where eigvalues cluster
    gaps = np.abs(np.diff(w_ref))
    ok_cols = np.ones(nev, bool)
    ok_cols[1:] &= gaps > 1e-3 * w_ref[0]
    ok_cols[:-1] &= gaps > 1e-3 * w_ref[0]
    np.testing.assert_allclose(
        U[:, ok_cols], v_ref[:, ok_cols], atol=5e-3
    )


def test_sparse_gram_operator():
    rng = np.random.default_rng(7)
    V, D = 150, 400
    mask = rng.random((V, D)) < 0.08
    w, d = np.nonzero(mask)
    order = np.lexsort((w, d))
    v = (rng.integers(1, 4, len(w))).astype(np.float32)
    sp = DocSparse.build(w[order], d[order], v[order], V, D, chunk=2048)
    nev = 8
    res = block_ks(
        lambda X: gram_x(sp, X), V, nev, blk=8, tol=1e-5, key=jax.random.PRNGKey(0)
    )
    Bd = to_dense(sp).astype(np.float64)
    w_ref, v_ref = dense_topk_eigh(Bd @ Bd.T, nev)
    np.testing.assert_allclose(res.evals, w_ref, rtol=1e-3)
    # residual check: ||S u - lambda u|| / lambda small
    U = np.asarray(res.evecs).astype(np.float64)
    S = Bd @ Bd.T
    resid = np.linalg.norm(S @ U - U * res.evals[None, :], axis=0) / res.evals
    # fp32 Arnoldi: the residual estimate is accurate to ~eps*lambda_max, so
    # the smallest kept eigenpair sees a few-e-3 true relative residual.
    assert resid.max() < 5e-3


def test_restart_path():
    # Force restarts with slowly decaying spectrum and tiny Krylov space.
    rng = np.random.default_rng(2)
    dim = 200
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    evals = 1.0 / np.arange(1, dim + 1) ** 0.25
    S = (Q * evals) @ Q.T
    res = block_ks(
        spd_op(S.astype(np.float32)),
        dim,
        nev=6,
        blk=2,
        steps_per_restart=2,
        tol=1e-4,
        key=jax.random.PRNGKey(1),
    )
    assert res.restarts > 0
    w_ref, _ = dense_topk_eigh(S, 6)
    np.testing.assert_allclose(res.evals, w_ref, rtol=1e-3)


def test_device_loop_matches_host_loop():
    from isle_tpu.linalg import block_ks_device

    rng = np.random.default_rng(3)
    dim = 150
    A = rng.standard_normal((dim, 70)).astype(np.float32)
    S = (A @ A.T).astype(np.float32)
    nev = 6
    r1 = block_ks(spd_op(S), dim, nev, blk=4, tol=1e-5, key=jax.random.PRNGKey(2))
    r2 = block_ks_device(
        spd_op(S), dim, nev, blk=4, tol=1e-5, key=jax.random.PRNGKey(2)
    )
    assert r2.nconv == nev
    np.testing.assert_allclose(r2.evals, r1.evals, rtol=1e-4)
    w_ref, _ = dense_topk_eigh(S, nev)
    np.testing.assert_allclose(r2.evals, w_ref, rtol=1e-4)


def test_lanczos_matches_dense_oracle():
    """The second iterative solver (thick-restart Lanczos, the Spectra
    analog src/sparseMatrix.cpp:1161-1192) vs the LAPACK oracle."""
    from isle_tpu.linalg import lanczos_device

    rng = np.random.default_rng(2)
    dim = 120
    A = rng.standard_normal((dim, dim // 2)).astype(np.float32)
    S = (A @ A.T).astype(np.float32)
    nev = 6
    res = lanczos_device(
        spd_op(S), dim, nev, tol=1e-5, key=jax.random.PRNGKey(1)
    )
    w_ref, v_ref = dense_topk_eigh(S, nev)
    assert res.nconv == nev
    np.testing.assert_allclose(res.evals, w_ref, rtol=1e-4)
    U = align_signs(np.asarray(res.evecs), v_ref.astype(np.float32))
    gaps = np.abs(np.diff(w_ref))
    ok = np.ones(nev, bool)
    ok[1:] &= gaps > 1e-3 * w_ref[0]
    ok[:-1] &= gaps > 1e-3 * w_ref[0]
    np.testing.assert_allclose(U[:, ok], v_ref[:, ok], atol=5e-3)


def test_lanczos_cross_checks_block_ks_on_gram():
    """Mutual cross-check on the pipeline's B B^T operator: the two
    independent solvers must agree to the configured tolerance (the
    reference's BlockKs-vs-Spectra discipline)."""
    from isle_tpu.linalg import block_ks_device, lanczos_device

    rng = np.random.default_rng(8)
    V, D = 150, 500
    mask = rng.random((V, D)) < 0.08
    w, d = np.nonzero(mask)
    order = np.lexsort((w, d))
    v = (rng.integers(1, 4, len(w))).astype(np.float32)
    sp = DocSparse.build(w[order], d[order], v[order], V, D, chunk=2048)
    nev = 8
    op = lambda data, X: gram_x(data, X)
    a = block_ks_device(
        op, V, nev, op_data=sp, blk=8, tol=1e-5, key=jax.random.PRNGKey(0)
    )
    b = lanczos_device(
        op, V, nev, op_data=sp, tol=1e-5, key=jax.random.PRNGKey(3)
    )
    np.testing.assert_allclose(a.evals, b.evals, rtol=1e-4)


def test_trainer_lanczos_eigensolver_option():
    """eigensolver="lanczos" is selectable end-to-end and reproduces the
    block_ks model."""
    import dataclasses

    from isle_tpu.config import HyperParams, TrainConfig
    from isle_tpu.corpus import Corpus
    from isle_tpu.trainer import Trainer
    import tempfile

    rng = np.random.default_rng(6)
    V, D, k = 80, 240, 4
    block = V // k
    docs, words, counts = [], [], []
    for d in range(D):
        t = rng.integers(0, k)
        ws = np.concatenate(
            [rng.integers(t * block, (t + 1) * block, 16),
             rng.integers(0, V, 3)]
        )
        ws, cs = np.unique(ws, return_counts=True)
        docs.append(np.full(len(ws), d))
        words.append(ws)
        counts.append(cs)
    corpus = Corpus.from_entries(
        np.concatenate(docs), np.concatenate(words), np.concatenate(counts),
        vocab_size=V, num_docs=D, sort_dedup=True,
    )

    def run(eig):
        cfg = TrainConfig(
            num_topics=k, seed=0,
            hyper=HyperParams(block_ks_block_size=8, eigensolver=eig),
        )
        with tempfile.TemporaryDirectory() as tmp:
            tr = Trainer(cfg, output_dir=tmp, quiet=True)
            tr.corpus = corpus
            tr._post_ingest()
            tr.train()
        return tr

    a = run("block_ks")
    b = run("lanczos")
    np.testing.assert_allclose(a.evalues, b.evalues, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(a.model, b.model, rtol=1e-3, atol=1e-5)
