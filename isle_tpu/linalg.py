"""Truncated symmetric eigensolver (the SVD engine).

Rebuilds the reference's restarted block Krylov-Schur solver
(block-ks/restarted_block_ks.h:18-321) as a thick-restart block Lanczos /
Krylov-Schur in JAX:

  - same matrix-free operator S X = B (B^T X) (include/matUtils.h:336-365),
  - same convergence criterion: per-eigenpair relative residual
    ||H_tail[:, j]|| / lambda_j < tol, converged count = longest prefix
    (restarted_block_ks.h:276-296),
  - same restart cap semantics (BLOCK_KS_MAX_ITERS).

TPU redesign: the reference uses Krylov block width 10 and therefore ~11
narrow SpMMs per restart; a width-10 product wastes >90% of the 128-wide
vector lanes and makes the gather-SpMM latency bound. We round the block
width AND the kept Ritz count up to multiples of `blk` (default 128), so
each restart is s = ceil(nev/blk) full-width products. The subspace grown
per restart matches the reference's (~2 nev + blk), so convergence behaves
the same while every product runs at full lane utilization. Orthogonality
is maintained with the same 2x DGKS correction the reference uses
(restarted_block_ks.h:83-91), plus one extra post-QR DGKS pass that also
repairs near rank deficiency (the reference's random-refill path,
:106-132, is replaced by absorbing the correction into R).

All dense products use fp32 with HIGHEST matmul precision (true fp32 MXU
accumulation), matching the reference's sgemm.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST

# Ritz values below RANK_TOL * lambda_max are numerically zero modes of the
# PSD Gram operator (fp32 eps is 1.2e-7; the Gram accumulation noise floor
# sits below 1e-6 relative). For these the per-eigenpair RELATIVE residual
# ||resid_j|| / |w_j| is noise-over-noise and can never meet tol, so
# convergence switches to the absolute test ||resid_j|| <= tol * lambda_max
# and the reported eigenvalue clamps to exactly 0. This is how nev > rank(S)
# terminates cleanly (duplicate-doc corpora; the reference instead detects
# Krylov rank collapse and refills, block-ks/restarted_block_ks.h:106-132 —
# the refilled directions here are the absorbed-DGKS QR's null-space
# columns, which ARE eigenvectors with eigenvalue 0).
RANK_TOL = 1e-6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _init_block(dim: int, blk: int, key, start: Optional[jax.Array]):
    """Orthonormal (dim, blk) start block: random, or — restart-warm —
    the caller's previous eigenbasis in the leading columns topped up
    with random directions (QR of [U_prev | random] keeps span(U_prev)
    in the leading columns, so the first restart's Krylov space already
    contains the old invariant subspace)."""
    R = jax.random.normal(key, (dim, blk), jnp.float32)
    if start is not None:
        m = min(start.shape[1], blk)
        R = jnp.concatenate(
            [jnp.asarray(start[:, :m], jnp.float32), R[:, m:]], axis=1
        )
    Q0, _ = jnp.linalg.qr(R)
    return Q0


def _converged_mask(w_nev, resid_norms, tol, xp=jnp):
    """Per-eigenpair convergence with zero-mode handling (see RANK_TOL).
    Returns (conv bool[nev], is_zero bool[nev])."""
    w_max = xp.maximum(xp.abs(w_nev[0]), xp.float32(1e-30))
    is_zero = xp.abs(w_nev) <= RANK_TOL * w_max
    rel = resid_norms / xp.maximum(xp.abs(w_nev), xp.float32(1e-30))
    conv = xp.where(is_zero, resid_norms <= tol * w_max, rel < tol)
    return conv, is_zero


@dataclasses.dataclass
class EigResult:
    evals: np.ndarray  # (nev,) descending
    evecs: jax.Array  # (dim, nev)
    nconv: int
    restarts: int
    op_calls: int
    op_seconds: float


def _dgks_project(V: jax.Array, F: jax.Array, rounds: int = 2):
    """F <- (I - V V^T) F applied `rounds`+1 times; returns (F, coeffs)
    with coeffs = accumulated V^T F (the Hk column block). Inactive columns
    of V must be zero."""
    C = jnp.einsum("dm,db->mb", V, F, precision=HI)
    F = F - jnp.einsum("dm,mb->db", V, C, precision=HI)
    for _ in range(rounds):
        C2 = jnp.einsum("dm,db->mb", V, F, precision=HI)
        F = F - jnp.einsum("dm,mb->db", V, C2, precision=HI)
        C = C + C2
    return F, C


def _qr_ortho(V: jax.Array, F: jax.Array):
    """QR of F with one extra DGKS pass against V absorbed into R, so the
    result stays orthonormal to V even under near rank deficiency."""
    Q1, R1 = jnp.linalg.qr(F)
    C2 = jnp.einsum("dm,db->mb", V, Q1, precision=HI)
    Q1 = Q1 - jnp.einsum("dm,mb->db", V, C2, precision=HI)
    Q2, R2 = jnp.linalg.qr(Q1)
    return Q2, jnp.matmul(R2, R1, precision=HI), C2 @ R1


def block_ks(
    op: Callable[..., jax.Array],
    dim: int,
    nev: int,
    blk: int = 128,
    tol: float = 1e-4,
    max_restarts: int = 100,
    steps_per_restart: Optional[int] = None,
    key: Optional[jax.Array] = None,
    timer=None,
    op_data=None,
    start_block: Optional[jax.Array] = None,
) -> EigResult:
    """Top-`nev` eigenpairs of the symmetric PSD operator `op` on R^dim.

    start_block, when given, restart-warms the solver: its columns seed
    the initial Krylov block (see _init_block) — e.g. the previous run's
    checkpointed U when retraining on the same or similar data.

    op maps (dim, blk) -> (dim, blk); when `op_data` (any pytree) is given,
    op is called as op(op_data, X) and the data flows through jit as an
    ARGUMENT — closures capturing large arrays would bake them into the
    HLO as constants, which this environment's remote-compile service
    rejects outright (HTTP 413) and which bloats compile time everywhere.

    Shapes: keep = round_up(nev, blk) Ritz pairs at restart; square Krylov
    dimension K = keep + s*blk with s = steps_per_restart (default
    ceil(keep/blk)); ncv = K + blk basis columns, mirroring the reference's
    ncv = 2 nev + blk.
    """
    import time

    if key is None:
        key = jax.random.PRNGKey(0)
    # Auto-shrink the block so the Krylov space fits the operator dimension
    # (small vocabularies); callers with nev too close to dim should use
    # the dense oracle instead.
    blk = min(blk, max(dim // 2, 1))
    while True:
        keep = _round_up(nev, blk)
        s = steps_per_restart or max(1, keep // blk)
        K = keep + s * blk
        ncv = K + blk
        if ncv <= dim or blk == 1:
            break
        blk = max(blk // 2, 1)
    if ncv > dim:
        raise ValueError(
            f"ncv={ncv} exceeds dim={dim} even at blk=1; use the dense "
            f"eigensolver (nev={nev})"
        )

    expand_step = _make_expand_step(op, with_data=op_data is not None)
    op_calls = 0
    op_seconds = 0.0

    # --- init: random orthonormal start block at columns [0, blk). ---
    V = jnp.zeros((dim, ncv), jnp.float32)
    H = jnp.zeros((ncv, K), jnp.float32)
    V = V.at[:, :blk].set(_init_block(dim, blk, key, start_block))

    def _await(x):
        # jax.block_until_ready does NOT await remote execution on the
        # axon tunnel (CLAUDE.md); a 1-element host readback does.
        np.asarray(jnp.reshape(x, (-1,))[:1])

    # Warm-up call so the op timer measures execution, not compilation
    # (the expand step is shape-stable across m; one compile serves all).
    _await(expand_step(op_data, V, H, 0)[0])

    m = 0  # active square columns of H
    restarts = 0
    nconv = 0
    evals = None
    while True:
        # --- expand to K: ops dispatch back-to-back, ONE forced readback
        # times the batch (a per-op readback would add a ~30 ms round
        # trip per operator application to the production path). ---
        t0 = time.perf_counter()
        batch_calls = 0
        while m < K:
            V, H = expand_step(op_data, V, H, m)
            batch_calls += 1
            m += blk
        if batch_calls:
            _await(V)
            op_seconds += time.perf_counter() - t0
            op_calls += batch_calls
        # --- truncate (thick restart, no locking) ---
        Hs = H[:K, :K]
        Hs = (Hs + Hs.T) * 0.5
        w, W = jnp.linalg.eigh(Hs)
        order = jnp.argsort(-w)
        w = w[order]
        W = W[:, order]
        resid = jnp.matmul(H[K:ncv, :K], W, precision=HI)  # (blk, K)

        rnorm = jnp.linalg.norm(resid[:, :nev], axis=0)
        conv, is_zero = _converged_mask(w[:nev], rnorm, tol)
        conv_h = np.asarray(conv)
        is_zero_h = np.asarray(is_zero)
        norms_h = np.asarray(rnorm / jnp.maximum(jnp.abs(w[:nev]), 1e-30))
        bad = np.flatnonzero(~conv_h)
        nconv = int(bad[0]) if len(bad) else nev
        evals = np.where(is_zero_h, 0.0, np.asarray(w[:nev])).astype(
            np.float32
        )

        if timer is not None:
            timer.diag(
                f"block_ks restart {restarts}: nconv={nconv}/{nev} "
                f"max_resid={norms_h.max():.2e}"
            )
        done = nconv >= nev or restarts >= max_restarts
        # Rotate kept Ritz vectors to the front; new start block follows.
        Vk = jnp.matmul(V[:, :K], W[:, :keep], precision=HI)
        Vnew = jnp.zeros_like(V)
        Vnew = Vnew.at[:, :keep].set(Vk)
        Vnew = Vnew.at[:, keep : keep + blk].set(V[:, K:ncv])
        Hnew = jnp.zeros_like(H)
        Hnew = Hnew.at[jnp.arange(keep), jnp.arange(keep)].set(w[:keep])
        Hnew = Hnew.at[keep : keep + blk, :keep].set(resid[:, :keep])
        V, H = Vnew, Hnew
        m = keep
        if done:
            break
        restarts += 1

    return EigResult(
        evals=evals,
        evecs=V[:, :nev],
        nconv=nconv,
        restarts=restarts,
        op_calls=op_calls,
        op_seconds=op_seconds,
    )


def _make_expand_step(op, with_data: bool):
    @jax.jit
    def expand_step(
        data, V: jax.Array, H: jax.Array, m
    ) -> Tuple[jax.Array, jax.Array]:
        dim, ncv = V.shape
        blk = ncv - H.shape[1]
        Vk = jax.lax.dynamic_slice_in_dim(V, m, blk, axis=1)
        F = op(data, Vk) if with_data else op(Vk)
        # Orthogonalize against all active columns (inactive are zero).
        F, Hk = _dgks_project(V, F, rounds=2)
        Q, R, Cfix = _qr_ortho(V, F)
        Hk = Hk + Cfix
        # Column block m..m+blk of H: coefficients Hk with R at rows m+blk.
        col = jax.lax.dynamic_update_slice(Hk, R, (m + blk, 0))
        H = jax.lax.dynamic_update_slice(H, col, (0, m))
        V = jax.lax.dynamic_update_slice(V, Q, (0, m + blk))
        return V, H

    return expand_step


def block_ks_device(
    op: Callable[..., jax.Array],
    dim: int,
    nev: int,
    blk: int = 128,
    tol: float = 1e-4,
    max_restarts: int = 100,
    steps_per_restart: Optional[int] = None,
    key: Optional[jax.Array] = None,
    timer=None,
    op_data=None,
    start_block: Optional[jax.Array] = None,
) -> EigResult:
    """block_ks with the whole restart loop inside one jitted
    lax.while_loop: no host syncs per restart (each costs ~30 ms on the
    tunnel) and no per-restart dispatch overhead. Semantics identical to
    block_ks (same shapes, DGKS, residual criterion)."""
    import time

    if key is None:
        key = jax.random.PRNGKey(0)
    blk = min(blk, max(dim // 2, 1))
    while True:
        keep = _round_up(nev, blk)
        s = steps_per_restart or max(1, keep // blk)
        K = keep + s * blk
        ncv = K + blk
        if ncv <= dim or blk == 1:
            break
        blk = max(blk // 2, 1)
    if ncv > dim:
        raise ValueError(f"ncv={ncv} exceeds dim={dim}; use dense solver")

    init_steps = K // blk

    def expand_block(data, V, H, m):
        Vk = jax.lax.dynamic_slice_in_dim(V, m, blk, axis=1)
        F = op(data, Vk) if op_data is not None else op(Vk)
        F, Hk = _dgks_project(V, F, rounds=2)
        Q, R, Cfix = _qr_ortho(V, F)
        Hk = Hk + Cfix
        col = jax.lax.dynamic_update_slice(Hk, R, (m + blk, 0))
        H = jax.lax.dynamic_update_slice(H, col, (0, m))
        V = jax.lax.dynamic_update_slice(V, Q, (0, m + blk))
        return V, H

    def truncate(V, H):
        Hs = H[:K, :K]
        Hs = (Hs + Hs.T) * 0.5
        w, W = jnp.linalg.eigh(Hs)
        order = jnp.argsort(-w)
        w = w[order]
        W = W[:, order]
        resid = jnp.matmul(H[K:ncv, :K], W, precision=HI)
        rnorm = jnp.linalg.norm(resid[:, :nev], axis=0)
        conv, is_zero = _converged_mask(w[:nev], rnorm, tol)
        bad = ~conv
        nconv = jnp.where(
            jnp.any(bad), jnp.argmax(bad), jnp.int32(nev)
        ).astype(jnp.int32)
        Vk_rot = jnp.matmul(V[:, :K], W[:, :keep], precision=HI)
        Vn = jnp.zeros_like(V)
        Vn = Vn.at[:, :keep].set(Vk_rot)
        Vn = Vn.at[:, keep : keep + blk].set(V[:, K:ncv])
        Hn = jnp.zeros_like(H)
        Hn = Hn.at[jnp.arange(keep), jnp.arange(keep)].set(w[:keep])
        Hn = Hn.at[keep : keep + blk, :keep].set(resid[:, :keep])
        return Vn, Hn, jnp.where(is_zero, 0.0, w[:nev]), nconv

    @jax.jit
    def solve(data, Q0):
        V = jnp.zeros((dim, ncv), jnp.float32)
        H = jnp.zeros((ncv, K), jnp.float32)
        V = V.at[:, :blk].set(Q0)

        def init_body(i, carry):
            V, H = carry
            return expand_block(data, V, H, i * blk)

        V, H = jax.lax.fori_loop(0, init_steps, init_body, (V, H))
        V, H, w, nconv = truncate(V, H)

        def cond(st):
            V, H, w, nconv, restarts = st
            return (nconv < nev) & (restarts < max_restarts)

        def body(st):
            V, H, w, nconv, restarts = st

            def rexp_body(i, carry):
                V, H = carry
                return expand_block(data, V, H, keep + i * blk)

            V, H = jax.lax.fori_loop(0, s, rexp_body, (V, H))
            V, H, w, nconv = truncate(V, H)
            return V, H, w, nconv, restarts + 1

        V, H, w, nconv, restarts = jax.lax.while_loop(
            cond, body, (V, H, w, nconv, jnp.int32(0))
        )
        return V[:, :nev], w, nconv, restarts

    t0 = time.perf_counter()
    evecs, w, nconv, restarts = solve(
        op_data, _init_block(dim, blk, key, start_block)
    )
    nconv = int(nconv)
    restarts = int(restarts)
    seconds = time.perf_counter() - t0
    if timer is not None:
        timer.diag(
            f"block_ks_device: {restarts} restarts, nconv={nconv}/{nev}, "
            f"{seconds:.2f}s incl. compile"
        )
    return EigResult(
        evals=np.asarray(w),
        evecs=evecs,
        nconv=nconv,
        restarts=restarts,
        op_calls=init_steps + s * restarts,
        op_seconds=seconds,
    )


def lanczos_device(
    op: Callable[..., jax.Array],
    dim: int,
    nev: int,
    tol: float = 1e-4,
    max_restarts: int = 100,
    steps_per_restart: Optional[int] = None,
    key: Optional[jax.Array] = None,
    timer=None,
    op_data=None,
    start_vector: Optional[jax.Array] = None,
) -> EigResult:
    """Single-vector thick-restart Lanczos — the second, independent
    iterative eigensolver (the reference ships Spectra's ARPACK-style
    `SymEigsSolver` beside BlockKs as a mutual numerical cross-check,
    src/sparseMatrix.cpp:1161-1192; selected here via
    HyperParams.eigensolver == "lanczos").

    Deliberately a different algorithm and code path from block_ks: a
    three-term recurrence stabilized with one full reorthogonalization
    pass per step (Spectra/TRLan practice), width-1 operator applications,
    a small dense projected matrix, and Wu-Simon thick restart keeping the
    top-nev Ritz pairs plus the border residual row. Same convergence rule
    as block_ks (per-eigenpair |border residual| / lambda < tol, longest
    converged prefix) so the two solvers are comparable at the same tol.

    HOST-DRIVEN stepping: each Lanczos step is its own jitted program and
    the host syncs once per restart. At full vocab a restart cycle is
    ~100 width-1 operator applications; packing the whole loop into one
    device program (as block_ks_device does with its ~12 cheap restarts)
    produced a single multi-minute XLA execution that the remote TPU
    worker reproducibly killed ("TPU worker process crashed") — the
    round-3 on-hardware check caught this. Width-1 SpMMs waste most of
    the 128-wide lanes, so this is a validation tool, not the production
    solver — use it to cross-check block_ks spectra at full vocab.
    """
    import time

    if key is None:
        key = jax.random.PRNGKey(0)
    s = steps_per_restart or (nev + 8)
    K = nev + s
    ncv = K + 1
    if ncv > dim:
        raise ValueError(f"ncv={ncv} exceeds dim={dim}; use dense solver")
    with_data = op_data is not None

    def matvec(data, v):
        out = op(data, v[:, None]) if with_data else op(v[:, None])
        return out[:, 0]

    def step(data, V, T, j, key):
        v = jax.lax.dynamic_slice_in_dim(V, j, 1, axis=1)[:, 0]
        w = matvec(data, v)
        # three-term recurrence + one full-reorth correction pass
        c1 = jnp.einsum("dm,d->m", V, w, precision=HI)
        w = w - jnp.einsum("dm,m->d", V, c1, precision=HI)
        c2 = jnp.einsum("dm,d->m", V, w, precision=HI)
        w = w - jnp.einsum("dm,m->d", V, c2, precision=HI)
        coeffs = c1 + c2  # projected column (alpha at j, fill-ins above)
        b = jnp.linalg.norm(w)
        # Breakdown repair (the reference's random refill on Krylov rank
        # collapse, block-ks/restarted_block_ks.h:106-132): when the
        # residual norm falls to the fp32 noise floor of the projected
        # column, w/b would normalize ROUNDING NOISE into a basis vector
        # that is neither unit-norm nor orthogonal — measured on a rank-6
        # operator this exploded the Ritz values by ~200x. Continue with a
        # fresh random direction orthogonalized against the basis and a
        # beta of exactly 0 (the spectrum is untouched; the new direction
        # simply reseeds the recurrence in the unexplored subspace).
        scale = jnp.maximum(jnp.max(jnp.abs(coeffs)), 1.0)
        breakdown = b <= 1e-6 * scale
        rnd = jax.random.normal(jax.random.fold_in(key, j), (dim,),
                                jnp.float32)
        for _ in range(2):
            rnd = rnd - jnp.einsum(
                "dm,m->d", V, jnp.einsum("dm,d->m", V, rnd, precision=HI),
                precision=HI,
            )
        rnd = rnd / jnp.maximum(jnp.linalg.norm(rnd), 1e-30)
        vnext = jnp.where(
            breakdown, rnd, w / jnp.maximum(b, jnp.finfo(jnp.float32).tiny)
        )
        beta = jnp.where(breakdown, 0.0, b)
        V = jax.lax.dynamic_update_slice(V, vnext[:, None], (0, j + 1))
        col = coeffs.at[j + 1].set(beta)
        T = jax.lax.dynamic_update_slice(T, col[:, None], (0, j))
        return V, T

    def truncate(V, T):
        Ts = T[:K, :K]
        Ts = (Ts + Ts.T) * 0.5
        w, W = jnp.linalg.eigh(Ts)
        order = jnp.argsort(-w)
        w = w[order]
        W = W[:, order]
        resid = jnp.matmul(T[K:ncv, :K], W, precision=HI)  # (1, K) border
        conv, is_zero = _converged_mask(w[:nev], jnp.abs(resid[0, :nev]), tol)
        bad = ~conv
        nconv = jnp.where(
            jnp.any(bad), jnp.argmax(bad), jnp.int32(nev)
        ).astype(jnp.int32)
        Vk = jnp.matmul(V[:, :K], W[:, :nev], precision=HI)
        Vn = jnp.zeros_like(V)
        Vn = Vn.at[:, :nev].set(Vk)
        Vn = Vn.at[:, nev].set(V[:, K])  # the residual Lanczos vector
        Tn = jnp.zeros_like(T)
        Tn = Tn.at[jnp.arange(nev), jnp.arange(nev)].set(w[:nev])
        Tn = Tn.at[nev, :nev].set(resid[0, :nev])
        return Vn, Tn, jnp.where(is_zero, 0.0, w[:nev]), nconv

    step_jit = jax.jit(step)
    truncate_jit = jax.jit(truncate)

    @jax.jit
    def init_basis(key, v0):
        # restart-warm seed (tpu.eigen_warm_start): v0 from a prior
        # run's dominant eigenvector; random when not provided.
        v0 = jnp.where(
            jnp.linalg.norm(v0) > 0.0,
            v0,
            jax.random.normal(key, (dim,), jnp.float32),
        )
        v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-30)
        V = jnp.zeros((dim, ncv), jnp.float32).at[:, 0].set(v0)
        T = jnp.zeros((ncv, K), jnp.float32)
        return V, T

    t0 = time.perf_counter()
    v0_in = (
        jnp.zeros((dim,), jnp.float32)
        if start_vector is None
        else jnp.asarray(start_vector, jnp.float32)
    )
    V, T = init_basis(key, v0_in)
    for j in range(K):
        V, T = step_jit(op_data, V, T, jnp.int32(j), key)
    V, T, w, nconv = truncate_jit(V, T)
    restarts = 0
    while int(nconv) < nev and restarts < max_restarts:
        for j in range(s):
            V, T = step_jit(op_data, V, T, jnp.int32(nev + j), key)
        V, T, w, nconv = truncate_jit(V, T)
        restarts += 1
    evecs = V[:, :nev]
    nconv = int(nconv)
    seconds = time.perf_counter() - t0
    if timer is not None:
        timer.diag(
            f"lanczos: {restarts} restarts, nconv={nconv}/{nev}, "
            f"{seconds:.2f}s incl. compile"
        )
    return EigResult(
        evals=np.asarray(w),
        evecs=evecs,
        nconv=nconv,
        restarts=restarts,
        op_calls=K + s * restarts,
        op_seconds=seconds,
    )


def dense_topk_eigh(S: np.ndarray, nev: int) -> Tuple[np.ndarray, np.ndarray]:
    """Dense oracle (the reference's LAPACK cross-check pattern,
    src/denseMatrix.cpp:413-461)."""
    w, v = np.linalg.eigh(S.astype(np.float64))
    order = np.argsort(-w)
    return w[order][:nev], v[:, order][:, :nev]


def align_signs(U: np.ndarray, U_ref: np.ndarray) -> np.ndarray:
    """Flip eigenvector signs to match a reference (sign-insensitive
    comparison, as in compare_LAPACK_Spectra src/denseMatrix.cpp:436-449)."""
    s = np.sign(np.sum(U * U_ref, axis=0))
    s[s == 0] = 1.0
    return U * s
