"""Compaction-scatter variants for the hybrid tail build.

The fused builder's warm cost (~11 s at the NYTimes shape) is dominated
by full-48M scalar scatters: `.at[pos].set(x, mode=drop)` with a large
sentinel for dropped entries (pos NOT sorted because sentinels interleave).
Candidates:

  A. baseline       — unsorted scalar .set with drop sentinels
  B. sorted add     — monotone positions for ALL entries (dropped entries
                      reuse the next kept slot and contribute 0 via the
                      +1 trick), indices_are_sorted=True
  C. banked rows    — positions split (row=pos//128, lane=pos%128), one-hot
                      lane rows scatter-added sorted (the thresholds-
                      histogram trick applied to compaction)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_compact.py
"""

import time

import numpy as np


def t(label, fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    N = 48 << 20  # ~50M raw entries
    OUT = N  # padded output size
    rng = np.random.default_rng(0)
    keep_h = rng.random(N) < 0.3
    ids_h = rng.integers(0, 102_660, N).astype(np.int32)
    # monotone kept positions with per-segment x8 padding gaps (synthetic:
    # every kept entry advances by 1, occasional +7 jumps for pad gaps)
    jumps = (rng.random(N) < 0.01) * 7
    pos_kept = np.cumsum(keep_h + jumps * keep_h) - 1
    pos_kept = np.maximum(pos_kept, 0).astype(np.int32)

    keep = jnp.asarray(keep_h)
    ids = jnp.asarray(ids_h)
    # baseline-style positions: kept -> slot, dropped -> big sentinel
    pos_sentinel = jnp.asarray(
        np.where(keep_h, pos_kept, 0x7FFFFFF0).astype(np.int32)
    )
    # sorted-add positions: dropped entries share the next kept slot
    pos_sorted = jnp.asarray(pos_kept)

    V = 102_660

    @jax.jit
    def a_set_drop(pos, ids):
        return jnp.full((OUT,), V, jnp.int32).at[pos].set(ids, mode="drop")

    @jax.jit
    def b_sorted_add(pos, ids, keep):
        out = jnp.zeros((OUT,), jnp.int32).at[pos].add(
            jnp.where(keep, ids + 1, 0),
            indices_are_sorted=True,
            mode="drop",
        )
        return jnp.where(out > 0, out - 1, V)

    @jax.jit
    def c_banked(pos, ids, keep):
        row = pos // 128
        lane = pos % 128
        CH = 1 << 21
        n = N // CH
        vals = jnp.where(keep, ids + 1, 0)

        def body(acc, args):
            r, c, v = args
            g = jax.nn.one_hot(c, 128, dtype=jnp.int32) * v[:, None]
            return acc.at[r].add(g, indices_are_sorted=True), None

        acc, _ = jax.lax.scan(
            body,
            jnp.zeros((OUT // 128 + 1, 128), jnp.int32),
            (row.reshape(n, CH), lane.reshape(n, CH), vals.reshape(n, CH)),
        )
        out = acc[: OUT // 128].reshape(OUT)
        return jnp.where(out > 0, out - 1, V)

    ra = a_set_drop(pos_sentinel, ids)
    rb = b_sorted_add(pos_sorted, ids, keep)
    rc = c_banked(pos_sorted, ids, keep)
    assert np.array_equal(np.asarray(ra), np.asarray(rb)), "B mismatch"
    assert np.array_equal(np.asarray(ra), np.asarray(rc)), "C mismatch"
    print("variants agree", flush=True)

    t("A set+drop sentinel (baseline)", lambda: float(
        a_set_drop(pos_sentinel, ids)[0]
    ))
    t("B sorted scatter-add", lambda: float(
        b_sorted_add(pos_sorted, ids, keep)[0]
    ))
    t("C banked one-hot rows", lambda: float(
        c_banked(pos_sorted, ids, keep)[0]
    ))


if __name__ == "__main__":
    main()
