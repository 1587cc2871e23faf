"""Elkan's triangle-inequality k-means (the reference's alternative sparse
k-means, src/sparseMatrix.cpp:2242-2492, selected via
KMEANS_ALGO_FOR_SPARSE).

Elkan's algorithm maintains an upper bound on each doc's distance to its
assigned center and lower bounds to the others; docs whose bounds prove the
assignment cannot change skip the exact distance computation. It converges
to the same fixpoint as Lloyd's.

TPU note: on CPU the payoff is skipping per-doc distance work; on TPU the
distance computation is a dense batched matmul whose cost does not depend
on a per-row mask, so the bounds bookkeeping here preserves the algorithm
(and its exact update pattern / iteration count) rather than wall-clock.
The default remains Lloyd's; this exists for configuration parity and for
hosts (CPU backend) where masking does help.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from .matops import mat_bt_x, mat_doc_l2sq
from .kmeans import _update_centers_full

HI = jax.lax.Precision.HIGHEST


@jax.jit
def _exact_dists(sp, centers: jax.Array, docs_l2: jax.Array):
    dots = mat_bt_x(sp, centers.T)
    c_l2 = jnp.sum(centers * centers, axis=1)
    d2 = docs_l2[:, None] + c_l2[None, :] - 2.0 * dots
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def run_elkans(
    sp, centers: jax.Array, max_reps: int, timer=None
) -> Tuple[jax.Array, jax.Array]:
    """Returns (centers (k, vocab), assignment). Same fixpoint as Lloyd's."""
    k = centers.shape[0]
    docs_l2 = mat_doc_l2sq(sp)

    dist = _exact_dists(sp, centers, docs_l2)  # (D, k)
    assign = jnp.argmin(dist, axis=1).astype(jnp.int32)
    ub = jnp.min(dist, axis=1)  # upper bound to own center
    lb = dist  # lower bounds to all centers
    prev = None
    for rep in range(max_reps):
        centers_new, _ = _update_centers_full(sp, assign, k)
        # center movement shifts the bounds (Elkan lemma 2)
        move = jnp.linalg.norm(centers_new - centers, axis=1)  # (k,)
        centers = centers_new
        ub = ub + move[assign]
        lb = jnp.maximum(lb - move[None, :], 0.0)

        # inter-center half-distances s[c] = 0.5 min_{c'!=c} ||c - c'||
        cc = jnp.sqrt(
            jnp.maximum(
                jnp.sum(centers * centers, axis=1)[:, None]
                + jnp.sum(centers * centers, axis=1)[None, :]
                - 2.0 * jnp.matmul(centers, centers.T, precision=HI),
                0.0,
            )
        )
        cc = cc + jnp.diag(jnp.full((k,), jnp.inf))
        s = 0.5 * jnp.min(cc, axis=1)

        needs_update = ub > s[assign]
        # exact recomputation for flagged docs (computed densely, masked)
        dist = _exact_dists(sp, centers, docs_l2)
        new_assign = jnp.argmin(dist, axis=1).astype(jnp.int32)
        assign_next = jnp.where(needs_update, new_assign, assign)
        ub = jnp.where(needs_update, jnp.min(dist, axis=1), ub)
        lb = jnp.where(needs_update[:, None], dist, lb)

        if prev is not None and bool(jnp.array_equal(assign_next, prev)):
            assign = assign_next
            if timer is not None:
                timer.diag(f"elkans converged at rep {rep}")
            break
        prev = assign_next
        assign = assign_next
    centers, _ = _update_centers_full(sp, assign, k)
    return centers, assign
