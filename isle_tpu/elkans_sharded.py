"""Elkan's triangle-inequality k-means on the device mesh.

The single-device redesign (elkans.py) compacts the per-rep "moving docs"
into a dense-packed mini-COO with power-of-two-bucketed static shapes.
Cross-shard, the same idea composes with the doc-sharded layout
(sharding.py) because every ingredient is already local or replicated:

  - per-doc state (assignment, upper bound, k lower bounds) lives
    doc-sharded (S, dps, ...) — no communication;
  - the bounds filter and the mini exact-distance pass are shard-local
    (a doc's entries never leave its shard; centers are replicated);
  - only the center update communicates: the same one-hot psum as the
    sharded Lloyd's step (make_sharded_lloyds_step);
  - SPMD needs one program on every device, so the mini-COO bucket is
    the CROSS-SHARD max of (flagged docs, flagged entries) — the cost
    of a rep is the worst shard's moving set, which is the honest
    distributed analog of the reference's single-address-space
    moving-doc mini-CSC (src/sparseMatrix.cpp:2390-2460).

Same fixpoint as Lloyd's up to exact-tie ordering (elkans.py docstring);
equality vs the single-device Elkan's is pinned in
tests/test_sharded_trainer.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .elkans import _half_center_dists, make_bucket_picker
from .sharding import (
    AXIS,
    Mesh,
    ShardedDocSparse,
    ShardedHybrid,
    _doc_flat_index,
    _cached_step,
    _local_b_y_partial,
    _local_bt_x,
    _local_h_b_y_partial,
    _local_h_bt_x,
    _pvary,
    sharded_doc_l2sq,
)

HI = jax.lax.Precision.HIGHEST


def _local_entry_view(sp, shard_arrays):
    """Per-entry (word, doc, val) arrays of one shard's doc-sorted TAIL
    entries (pad: word == vocab, doc == dps). For the hybrid layout the
    dense head is handled separately by a gather + matmul, exactly like
    the single-device elkans._flagged_dists."""
    if isinstance(sp, ShardedHybrid):
        td_w, td_o = shard_arrays
        word = td_w
        doc = jnp.repeat(td_o, 8)
        rs_p = jnp.concatenate([sp.row_scale, jnp.zeros((1,), jnp.float32)])
        val = rs_p[jnp.minimum(word, sp.vocab)]
        return word, doc, val
    dw, dd, dv = shard_arrays
    return dw, dd, dv


def _entry_operands(sp):
    """The doc-sorted per-shard entry operands to thread through
    shard_map (layout-dependent)."""
    if isinstance(sp, ShardedHybrid):
        return (sp.td_word, sp.td_odoc)
    return (sp.d_word, sp.d_doc, sp.d_val)


def _by_operands(sp):
    """The word-sorted per-shard operands of the B·Y partial product."""
    if isinstance(sp, ShardedHybrid):
        return (sp.head, sp.tw_doc, sp.tw_oword)
    return (sp.w_word, sp.w_doc, sp.w_val)


def _local_center_update(sp, by_arrays, onehot, k):
    """Per-shard partial of the center numerators (vocab, k); the caller
    psums. Mirrors make_sharded_lloyds_step's update."""
    if isinstance(sp, ShardedHybrid):
        head, tw_d, tw_o = by_arrays
        return _local_h_b_y_partial(head[0], tw_d[0], tw_o[0], onehot,
                                    sp.row_scale, sp.head_words, sp.vocab)
    ww, wd, wv = by_arrays
    return _local_b_y_partial(ww, wd, wv, onehot, sp.vocab)


def make_elkans_init(sp, mesh: Mesh, k: int):
    """Jitted init: full exact distances per shard -> (assign, ub, lb),
    doc-sharded. Invalid (padding) doc slots get ub=0, lb=+inf so the
    filter can never flag them."""
    dps = sp.docs_per_shard

    def init(sp, centers, docs_l2, nzd):
        def f(*args):
            bt = args[:-3]
            dl2, nzd_s, centers = args[-3:]
            if isinstance(sp, ShardedHybrid):
                head, td_w, td_o = bt
                dots = _local_h_bt_x(head[0], td_w[0], td_o[0], centers.T,
                                     sp.row_scale, sp.head_words,
                                     sp.vocab, dps)
            else:
                dw, dd, dv = bt
                dots = _local_bt_x(dw, dd, dv, centers.T, dps)[0]
            c_l2 = jnp.sum(centers * centers, axis=1)
            d2 = dl2[0][:, None] + c_l2[None, :] - 2.0 * dots
            dist = jnp.sqrt(jnp.maximum(d2, 0.0))
            valid = (
                jax.lax.broadcasted_iota(jnp.int32, (dps, 1), 0)[:, 0]
                < nzd_s[0, 0]
            )
            assign = jnp.argmin(dist, axis=1).astype(jnp.int32)
            ub = jnp.where(valid, jnp.min(dist, axis=1), 0.0)
            lb = jnp.where(valid[:, None], dist, jnp.inf)
            return assign[None], ub[None], lb[None]

        if isinstance(sp, ShardedHybrid):
            bt_ops = (sp.head, sp.td_word, sp.td_odoc)
        else:
            bt_ops = (sp.d_word, sp.d_doc, sp.d_val)
        return jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(P(AXIS),) * (len(bt_ops) + 2) + (P(),),
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
        )(*bt_ops, docs_l2, nzd, centers)

    return _cached_step(
        ("elkans_init", type(sp).__name__, sp.vocab, dps, k, mesh),
        lambda: jax.jit(init))


def make_elkans_step(sp, mesh: Mesh, k: int):
    """Jitted per-rep head: psum'd center update from the current
    assignment, center movement, bounds shift, doc-level Elkan filter,
    and per-shard flag stats. Returns
    (centers_new (k, vocab) replicated, ub, lb, flagged doc-sharded,
    stats (S, 2) int32 = per-shard [n flagged docs, n flagged entries])."""
    dps = sp.docs_per_shard

    def step(sp, centers_old, assign, ub, lb, nzd):
        def f(*args):
            ent = args[: len(ent_ops)]
            by = args[len(ent_ops):-5]
            assign_s, ub_s, lb_s, nzd_s, centers_old = args[-5:]
            a = assign_s[0]
            valid = (
                jax.lax.broadcasted_iota(jnp.int32, (dps, 1), 0)[:, 0]
                < nzd_s[0, 0]
            )
            onehot = jax.nn.one_hot(a, k, dtype=jnp.float32)
            onehot = onehot * valid[:, None].astype(jnp.float32)
            sums = jax.lax.psum(
                _local_center_update(sp, by, onehot, k), AXIS
            )
            counts = jax.lax.psum(jnp.sum(onehot, axis=0), AXIS)
            centers = jnp.where(
                counts[None, :] > 0, sums / counts[None, :], 0.0
            ).T  # (k, vocab) replicated
            move = jnp.linalg.norm(centers - centers_old, axis=1)  # (k,)
            s = _half_center_dists(centers)

            ub_n = ub_s[0] + move[a]
            lb_n = jnp.maximum(lb_s[0] - move[None, :], 0.0)
            own = jax.nn.one_hot(a, k, dtype=bool)
            others_lb = jnp.min(jnp.where(own, jnp.inf, lb_n), axis=1)
            flagged = (ub_n > s[a]) & (ub_n > others_lb) & valid

            word, doc, _ = _local_entry_view(sp, [e[0] for e in ent])
            fl = jnp.concatenate([flagged, jnp.zeros((1,), bool)])
            n_docs = jnp.sum(flagged.astype(jnp.int32))
            n_entries = jnp.sum(fl[jnp.minimum(doc, dps)].astype(jnp.int32))
            stats = jnp.stack([n_docs, n_entries])
            return (
                centers,
                ub_n[None],
                lb_n[None],
                flagged[None],
                stats[None],
            )

        ent_ops = _entry_operands(sp)
        by_ops = _by_operands(sp)
        return jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(P(AXIS),) * (len(ent_ops) + len(by_ops) + 4) + (P(),),
            out_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        )(*ent_ops, *by_ops, assign, ub, lb, nzd, centers_old)

    return _cached_step(
        ("elkans_step", type(sp).__name__, sp.vocab, dps, k, mesh),
        lambda: jax.jit(step))


def make_elkans_mini(sp, mesh: Mesh, k: int, m_docs: int, m_entries: int):
    """Jitted mini pass at one (m_docs, m_entries) bucket: per shard,
    compact the flagged docs' tail entries into a packed mini-COO, run
    the exact distances over it (plus the dense-head gather/matmul for
    the hybrid layout), and scatter assignment/bounds back by local doc
    id. The compaction math is the per-shard form of
    elkans._flagged_dists."""
    dps, V = sp.docs_per_shard, sp.vocab

    def mini(sp, flagged, centers, docs_l2, assign, ub, lb):
        def f(*args):
            ent = args[: len(view_ops)]
            head_s = args[len(view_ops)] if is_hybrid else None
            fl_s, centers, dl2, assign_s, ub_s, lb_s = args[n_ops:]
            flagged = fl_s[0]
            word, doc, val = _local_entry_view(sp, [e[0] for e in ent])

            rank = jnp.where(
                flagged, jnp.cumsum(flagged.astype(jnp.int32)) - 1, m_docs
            )
            ids = (
                _pvary(jnp.full((m_docs + 1,), dps, jnp.int32))
                .at[rank]
                .set(jnp.arange(dps, dtype=jnp.int32), mode="drop")[:m_docs]
            )
            rankp = jnp.concatenate(
                [rank, jnp.full((1,), m_docs, jnp.int32)]
            )
            seg = rankp[jnp.minimum(doc, dps)]
            ent_keep = seg < m_docs
            pos = jnp.where(
                ent_keep, jnp.cumsum(ent_keep.astype(jnp.int32)) - 1,
                m_entries,
            )
            gw = (
                _pvary(jnp.full((m_entries,), V, jnp.int32))
                .at[pos].set(word, mode="drop")
            )
            gs = (
                _pvary(jnp.full((m_entries,), m_docs, jnp.int32))
                .at[pos].set(seg, mode="drop")
            )
            gv = (
                _pvary(jnp.zeros((m_entries,), jnp.float32))
                .at[pos].set(val, mode="drop")
            )

            X = centers.T  # (vocab, k)
            g = jnp.take(X, gw, axis=0, fill_value=0.0) * gv[:, None]
            # gs is non-decreasing: seg follows the shard's doc-sorted
            # entry order and the compaction preserves it.
            dots = jax.ops.segment_sum(
                g, gs, num_segments=m_docs + 1, indices_are_sorted=True
            )[:m_docs]
            if is_hybrid:
                head = head_s[0]  # (R, dps) local slab
                Hf = jnp.take(
                    head, jnp.minimum(ids, dps - 1), axis=1
                )  # (R, m_docs)
                Xh = X[sp.head_words] * sp.row_scale[sp.head_words][:, None]
                dots = dots + jnp.matmul(
                    Hf.T.astype(jnp.float32), Xh, precision=HI
                )
            l2 = jnp.concatenate(
                [dl2[0], jnp.zeros((1,), jnp.float32)]
            )[ids]
            c_l2 = jnp.sum(centers * centers, axis=1)
            d2 = l2[:, None] + c_l2[None, :] - 2.0 * dots
            dmini = jnp.sqrt(jnp.maximum(d2, 0.0))

            new_a = jnp.argmin(dmini, axis=1).astype(jnp.int32)
            new_ub = jnp.min(dmini, axis=1)
            # pad slots carry ids == dps -> OOB for (dps,) state -> drop
            assign_n = assign_s[0].at[ids].set(new_a, mode="drop")
            ub_n = ub_s[0].at[ids].set(new_ub, mode="drop")
            lb_n = lb_s[0].at[ids].set(dmini, mode="drop")
            return assign_n[None], ub_n[None], lb_n[None]

        is_hybrid = isinstance(sp, ShardedHybrid)
        view_ops = _entry_operands(sp)
        all_ops = view_ops + ((sp.head,) if is_hybrid else ())
        n_ops = len(all_ops)
        return jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(P(AXIS),) * n_ops
            + (P(AXIS), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
        )(*all_ops, flagged, centers, docs_l2, assign, ub, lb)

    return _cached_step(
        ("elkans_mini", type(sp).__name__, V, dps, k, m_docs, m_entries,
         mesh),
        lambda: jax.jit(mini))


def sharded_run_elkans(
    sp, centers: jax.Array, max_reps: int, mesh: Mesh, timer=None
) -> Tuple[jax.Array, np.ndarray]:
    """Elkan's k-means on the mesh. Accepts the COO or factored-hybrid
    sharded layout; same return contract as sharded_run_lloyds_full:
    (centers (k, vocab) replicated, assign GLOBAL (num_valid_docs,) host
    array in B-doc order)."""
    k = centers.shape[0]
    dps = sp.docs_per_shard
    docs_l2 = sharded_doc_l2sq(sp, mesh)
    nzd = jax.device_put(
        np.asarray(sp.valid_per_shard(), np.int32)[:, None],
        NamedSharding(mesh, P(AXIS)),
    )

    init = make_elkans_init(sp, mesh, k)
    step = make_elkans_step(sp, mesh, k)
    assign, ub, lb = init(sp, centers, docs_l2, nzd)
    prev = None

    # Shared bucket policy (elkans.make_bucket_picker); buckets are
    # GLOBAL (cross-shard max) because SPMD runs one program everywhere.
    if isinstance(sp, ShardedHybrid):
        pad = sp.td_word.shape[1]
    else:
        pad = sp.d_word.shape[1]
    pick_bucket = make_bucket_picker(dps, pad)
    minis = {}

    for rep in range(max_reps):
        centers, ub, lb, flagged, stats = step(
            sp, centers, assign, ub, lb, nzd
        )
        st = np.asarray(stats)  # (S, 2) — ONE sync fixes static shapes
        n_docs, n_entries = int(st[:, 0].max()), int(st[:, 1].max())
        if timer is not None:
            timer.diag(
                f"sharded elkans rep {rep}: worst shard "
                f"{n_docs}/{dps} docs flagged ({n_entries} entries); "
                f"total {int(st[:, 0].sum())} docs"
            )
        if n_docs > 0:
            key = pick_bucket(n_docs, n_entries)
            if key not in minis:
                minis[key] = make_elkans_mini(sp, mesh, k, *key)
            assign, ub, lb = minis[key](
                sp, flagged, centers, docs_l2, assign, ub, lb
            )
        a = np.asarray(assign)
        if prev is not None and np.array_equal(a, prev):
            if timer is not None:
                timer.diag(f"sharded elkans converged at rep {rep}")
            break
        prev = a

    # final centers from the final assignment (matches run_elkans)
    centers, _, _, _, _ = step(sp, centers, assign, ub, lb, nzd)
    flat = _doc_flat_index(sp)
    return centers, np.asarray(assign).reshape(-1)[flat]
