"""Pallas MXU segment-sum kernels (pallas_ops.py) vs the XLA scatter
paths they replace — run in pallas interpret mode on the CPU backend
(the kernels execute as plain XLA; Mosaic compilation is exercised on
hardware by benchmarks/ab_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isle_tpu.config import HyperParams, TpuConfig
from isle_tpu.pallas_ops import (
    b_y_plan,
    pallas_mode,
    plan_segments,
    segsum_onehot,
    segsum_rows,
)
from isle_tpu.sparse import DocSparse, b_y

pytestmark = pytest.mark.quick  # <60s smoke tier

CHUNK = 256


def sorted_stream(rng, n, num_segments, avg_run):
    """Sorted segment ids with ~avg_run entries per present segment and
    a padded spill tail (id == num_segments), like production streams."""
    ids = np.sort(
        rng.choice(num_segments, size=max(1, n // avg_run), replace=False)
    )
    runs = rng.poisson(avg_run - 1, size=len(ids)) + 1
    seg = np.repeat(ids, runs)[:n]
    if len(seg) < n:  # pad tail = spill segment
        seg = np.concatenate(
            [seg, np.full(n - len(seg), num_segments, np.int64)]
        )
    return np.sort(seg).astype(np.int32)


@pytest.mark.parametrize("seed", [0, 1])
def test_plan_and_segsum_rows_match_scatter(seed):
    rng = np.random.default_rng(seed)
    n, S, W = 4 * CHUNK, 300, 128
    seg = sorted_stream(rng, n, S, avg_run=12)
    g = rng.normal(size=(n, W)).astype(np.float32)
    plan = plan_segments(jnp.asarray(seg), S, chunk=CHUNK)
    assert plan is not None
    got = np.asarray(
        jax.jit(segsum_rows, static_argnames=("num_segments", "interpret"))(
            plan, jnp.asarray(g), S, interpret=True
        )
    )
    ref = np.zeros((S + 1, W), np.float32)
    np.add.at(ref, seg, g)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-4)


def test_plan_single_run_and_chunk_straddle():
    # one giant run straddling every chunk boundary
    n, S = 4 * CHUNK, 10
    seg = np.full(n, 3, np.int32)
    g = np.ones((n, 128), np.float32)
    plan = plan_segments(jnp.asarray(seg), S, chunk=CHUNK)
    assert plan is not None and plan.rcap == 8  # floor
    got = np.asarray(segsum_rows(plan, jnp.asarray(g), S, interpret=True))
    assert got[3, 0] == n
    assert np.all(got[np.arange(S + 1) != 3] == 0)


def test_plan_rcap_overflow_returns_none():
    # every entry its own segment: a chunk fans out to CHUNK distinct
    # ids, past an explicit contract cap
    n = 2 * CHUNK
    seg = np.arange(n, dtype=np.int32)
    assert (
        plan_segments(jnp.asarray(seg), n, chunk=CHUNK, rcap_cap=64)
        is None
    )
    # non-chunk-divisible stream
    assert plan_segments(jnp.asarray(seg[:CHUNK + 3]), n, chunk=CHUNK) is None


@pytest.mark.parametrize("with_val", [False, True])
def test_segsum_onehot_matches_np(with_val):
    rng = np.random.default_rng(2)
    n, S, k = 8 * CHUNK, 500, 7
    seg = sorted_stream(rng, n, S, avg_run=20)
    col = rng.integers(-1, k, n).astype(np.int32)  # -1 = masked out
    val = (rng.random(n).astype(np.float32) + 0.5) if with_val else None
    plan = plan_segments(jnp.asarray(seg), S, chunk=CHUNK)
    got = np.asarray(
        segsum_onehot(
            plan, jnp.asarray(col),
            None if val is None else jnp.asarray(val),
            S, k, interpret=True,
        )
    )[: S + 1, :k]
    ref = np.zeros((S + 1, k), np.float64)
    m = col >= 0
    np.add.at(ref, (seg[m], col[m]), 1.0 if val is None else val[m])
    if with_val:
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
    else:
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, ref.astype(np.int32))


def _corpus(rng, V, D, density=0.25):
    mask = rng.random((V, D)) < density
    w, d = np.nonzero(mask)
    order = np.lexsort((w, d))
    w, d = w[order], d[order]
    v = np.round(rng.random(len(w)) * 6 + 0.5).astype(np.float32)
    return DocSparse.build(w, d, v, V, D, chunk=2048), w, d, v


def test_thresholds_with_plan_exact():
    from isle_tpu.thresholds import compute_thresholds_jax

    rng = np.random.default_rng(3)
    V, D = 40, 120
    sp, w, d, v = _corpus(rng, V, D)
    hp = HyperParams()
    base = compute_thresholds_jax(
        sp.d_word, sp.d_val, V, 4.0, D, 3, hp
    )
    plan = plan_segments(sp.w_word, V, chunk=CHUNK)
    got = compute_thresholds_jax(
        sp.w_word, sp.w_val, V, 4.0, D, 3, hp,
        plan=plan, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(got[0]))
    assert int(base[1]) == int(got[1])


def test_rth_highest_with_plan_exact():
    from isle_tpu.catchwords import rth_highest

    rng = np.random.default_rng(4)
    V, D, k = 30, 90, 4
    sp, w, d, v = _corpus(rng, V, D)
    cluster = rng.integers(-1, k, D).astype(np.int32)
    sizes = np.bincount(cluster[cluster >= 0], minlength=k).astype(np.int32)
    base = np.asarray(
        rth_highest(sp, jnp.asarray(cluster), jnp.asarray(sizes), k, r=2)
    )
    plan = plan_segments(sp.w_word, V, chunk=CHUNK)
    got = np.asarray(
        rth_highest(
            sp, jnp.asarray(cluster), jnp.asarray(sizes), k, r=2,
            plan=plan, interpret=True,
        )
    )
    np.testing.assert_array_equal(base, got)


def test_doc_topic_mass_and_model_with_plans():
    from isle_tpu.topic_model import construct_topic_model, doc_topic_mass

    rng = np.random.default_rng(5)
    V, D, k = 35, 100, 4
    sp, w, d, v = _corpus(rng, V, D)
    cwt = np.full(V, -1, np.int32)
    cwt[rng.permutation(V)[: 3 * k]] = np.arange(3 * k) % k
    cluster = rng.integers(0, k, D).astype(np.int32)
    plan_d = plan_segments(sp.d_doc, D, chunk=CHUNK)
    plan_w = plan_segments(sp.w_word, V, chunk=CHUNK)
    assert plan_d is not None and plan_w is not None

    base = np.asarray(doc_topic_mass(sp, jnp.asarray(cwt), k))
    got = np.asarray(
        doc_topic_mass(
            sp, jnp.asarray(cwt), k, plan=plan_d, interpret=True
        )
    )
    np.testing.assert_allclose(got, base, rtol=2e-5, atol=1e-5)

    hp = HyperParams()
    m_base, p_base = construct_topic_model(
        sp, jnp.asarray(cwt), jnp.asarray(cluster), k,
        hp.model_rank_threshold(D, k), want_top_pairs=True,
    )
    m_got, p_got = construct_topic_model(
        sp, jnp.asarray(cwt), jnp.asarray(cluster), k,
        hp.model_rank_threshold(D, k), want_top_pairs=True,
        plan_d=plan_d, plan_w=plan_w, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(m_got), np.asarray(m_base), rtol=2e-5, atol=1e-6
    )
    for a, b in zip(p_got, p_base):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_b_y_plan_matches_b_y():
    rng = np.random.default_rng(6)
    V, D, W = 45, 130, 5  # W deliberately not a lane multiple
    sp, w, d, v = _corpus(rng, V, D)
    Y = rng.normal(size=(D, W)).astype(np.float32)
    plan = plan_segments(sp.w_word, V, chunk=CHUNK)
    base = np.asarray(b_y(sp, jnp.asarray(Y)))
    got = np.asarray(b_y_plan(sp, jnp.asarray(Y), plan, interpret=True))
    np.testing.assert_allclose(got, base, rtol=2e-5, atol=1e-5)


def test_pallas_mode_gate():
    assert pallas_mode(TpuConfig(pallas_segsum="off")) is None
    # CPU backend: auto stays off, on -> interpret
    assert pallas_mode(TpuConfig(pallas_segsum="auto")) is None
    assert pallas_mode(TpuConfig(pallas_segsum="on")) is True
    with pytest.raises(ValueError):
        pallas_mode(TpuConfig(pallas_segsum="bogus"))


def test_trainer_e2e_pallas_on_matches_off(tmp_path):
    """Full in-core train with pallas_segsum='on' (interpret on CPU) vs
    'off': same thresholds -> same B -> the affected stages (zeta,
    catchword stats, topic matrix) must agree to float tolerance."""
    from test_end_to_end import planted_corpus

    from isle_tpu.config import TrainConfig
    from isle_tpu.trainer import Trainer

    rng = np.random.default_rng(7)
    V, D, k = 48, 160, 4
    text, _ = planted_corpus(rng, V, D, k)
    tdf = tmp_path / "c.tdf"
    tdf.write_text(text)

    models = {}
    for mode in ("off", "on"):
        cfg = TrainConfig(
            num_topics=k,
            seed=3,
            hyper=HyperParams(block_ks_block_size=8),
            tpu=TpuConfig(
                pallas_segsum=mode, pallas_chunk=CHUNK, spmm_chunk=2048
            ),
        )
        tr = Trainer(cfg, output_dir=str(tmp_path / mode), quiet=True)
        tr.load_data_from_file(str(tdf))
        tr.train()
        models[mode] = (
            tr.get_model(),
            np.asarray(tr.catchword_thresholds),
            tr.cluster_of_doc,
        )
    np.testing.assert_array_equal(models["on"][2], models["off"][2])
    np.testing.assert_array_equal(models["on"][1], models["off"][1])
    np.testing.assert_allclose(
        models["on"][0], models["off"][0], rtol=2e-5, atol=1e-6
    )
