"""2D (scan x cycle) peak utilities for the ion-mobility path."""

import numpy as np

from alphadia_tpu.ops.peaks import find_peaks_profile_2d, symmetric_limits_2d


def ref_find_peaks_2d(a, top_n):
    """Reference stencil (search/selection/utils.py:78) with our scan-edge
    ramp padding: the jax kernel pads the scan axis by two strictly
    decreasing rows so apexes in the outermost scan bins stay detectable
    (with few mobility bins the interior-only stencil blinds half the
    range)."""
    pad = np.concatenate(
        [a[:1] - 2e-3, a[:1] - 1e-3, a, a[-1:] - 1e-3, a[-1:] - 2e-3], axis=0
    )
    out = []
    for s in range(2, pad.shape[0] - 2):
        for p in range(2, pad.shape[1] - 2):
            ok = (
                pad[s - 2, p] < pad[s - 1, p] < pad[s, p] > pad[s + 1, p] > pad[s + 2, p]
            )
            ok &= pad[s, p - 2] < pad[s, p - 1] < pad[s, p] > pad[s, p + 1] > pad[s, p + 2]
            if ok:
                out.append((pad[s, p], s - 2, p))
    out.sort(reverse=True)
    return [(s, p) for _, s, p in out[:top_n]]


def test_find_peaks_2d_matches_reference(rng):
    B, S, W = 6, 24, 48
    score = rng.normal(0, 0.5, (B, S, W)).astype(np.float32)
    for b in range(B):
        for _ in range(3):
            s0, p0 = rng.integers(4, S - 4), rng.integers(4, W - 4)
            amp = rng.uniform(3, 8)
            for ds in range(-2, 3):
                for dp in range(-2, 3):
                    score[b, s0 + ds, p0 + dp] += amp * np.exp(-(ds**2 + dp**2) / 2)
    scan, cyc, val, ok = find_peaks_profile_2d(score, top_n=4)
    scan, cyc, ok = np.asarray(scan), np.asarray(cyc), np.asarray(ok)
    for b in range(B):
        want = ref_find_peaks_2d(score[b], 4)
        got = [(int(s), int(p)) for s, p, v in zip(scan[b], cyc[b], ok[b]) if v]
        assert got == want


def test_symmetric_limits_2d_shapes_and_bounds(rng):
    B, S, W, C = 4, 20, 40, 3
    score = np.abs(rng.normal(0, 1, (B, S, W))).astype(np.float32)
    sc = rng.integers(5, S - 5, (B, C)).astype(np.int32)
    cc = rng.integers(5, W - 5, (B, C)).astype(np.int32)
    s0, s1, c0, c1 = symmetric_limits_2d(
        score, sc, cc,
        f_mobility=1.0, f_rt=0.99, center_fraction=0.5,
        min_size_mobility=3, max_size_mobility=8,
        min_size_rt=2, max_size_rt=10,
    )
    s0, s1, c0, c1 = map(np.asarray, (s0, s1, c0, c1))
    assert (s0 <= sc).all() and (s1 > sc).all()
    assert (c0 <= cc).all() and (c1 > cc).all()
    assert (s1 - s0 >= 2 * 3).all() and (s1 - s0 <= 2 * 8 + 1).all()
    assert (c1 - c0 >= 2 * 2).all() and (c1 - c0 <= 2 * 10 + 1).all()


def test_suppress_close_peaks_2d_requires_both_dims():
    """Mobility-separated co-eluting peaks survive; only peaks close in
    BOTH scan and cycle are suppressed (reference _join_close_peaks)."""
    import jax.numpy as jnp

    from alphadia_tpu.ops.peaks import suppress_close_peaks_2d

    scan = jnp.asarray([[10, 25, 11]], jnp.int32)
    cyc = jnp.asarray([[20, 21, 22]], jnp.int32)
    score = jnp.asarray([[9.0, 8.0, 7.0]], jnp.float32)
    valid = jnp.asarray([[True, True, True]])
    keep = np.asarray(
        suppress_close_peaks_2d(scan, cyc, valid, 3, 3)
    )[0]
    # peak 1: same cycles but 15 scan bins away -> kept
    # peak 2: within 3 cycles AND 1 scan bin of peak 0 -> suppressed
    assert keep.tolist() == [True, True, False]


def test_join_overlapping_2d_merges_union_extents():
    import jax.numpy as jnp

    from alphadia_tpu.ops.peaks import join_overlapping_2d

    ss = jnp.asarray([[4, 6, 0]], jnp.int32)
    se = jnp.asarray([[12, 14, 2]], jnp.int32)
    cs = jnp.asarray([[10, 12, 30]], jnp.int32)
    ce = jnp.asarray([[20, 21, 40]], jnp.int32)
    keep = jnp.asarray([[True, True, True]])
    ss2, se2, cs2, ce2, keep2 = join_overlapping_2d(
        ss, se, cs, ce, keep, p_scan_overlap=0.01, p_cycle_overlap=0.6
    )
    keep2 = np.asarray(keep2)[0]
    # candidate 1 overlaps candidate 0 (cycle overlap 8/10, scan 6/8) ->
    # merged into 0 with union limits; candidate 2 is disjoint -> kept
    assert keep2.tolist() == [True, False, True]
    assert (int(np.asarray(ss2)[0, 0]), int(np.asarray(se2)[0, 0])) == (4, 14)
    assert (int(np.asarray(cs2)[0, 0]), int(np.asarray(ce2)[0, 0])) == (10, 21)
