"""Peak finding and extent estimation on score profiles — batched, static.

Behavioral contracts (reference: alphadia/search/selection/utils.py):

- `find_peaks_profile` — a peak at p requires the strict 5-point stencil
  a[p-2] < a[p-1] < a[p] > a[p+1] > a[p+2] (find_peaks_1d:46-108); top-n
  peaks by height are returned;
- `suppress_close_peaks` — among peaks within `cycle_tolerance`, only the
  highest survives (_join_close_peaks, selection.py:229);
- `symmetric_limits_profile` — extents grow symmetrically from the apex
  while the mean of the two flanks keeps dropping below `f` x trailing and
  stays above center*center_fraction, clamped to [min_size, max_size]
  (_symetric_limits_1d:230-312);
- `join_overlapping_1d` — lower-ranked candidates whose cycle interval
  overlaps a surviving candidate by more than `p_overlap` of its length are
  merged into it (_join_overlapping_candidates, selection.py:287).

All functions operate on [B, W] score profiles and [B, C] candidate slots
with static C, fully vectorized (no data-dependent shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


@partial(jax.jit, static_argnames=("top_n",))
def find_peaks_profile(score: jax.Array, *, top_n: int):
    """[B, W] -> (peak_idx i32[B, top_n], peak_score f32[B, top_n], valid bool).

    Peaks are returned in descending score order; invalid slots have idx -1.
    """
    B, W = score.shape
    s = score
    stencil = jnp.zeros((B, W), dtype=bool)
    if W >= 5:
        core = (
            (s[:, 2:-2] > s[:, 1:-3])
            & (s[:, 1:-3] > s[:, :-4])
            & (s[:, 2:-2] > s[:, 3:-1])
            & (s[:, 3:-1] > s[:, 4:])
        )
        stencil = stencil.at[:, 2:-2].set(core)
    masked = jnp.where(stencil, s, NEG_INF)
    peak_score, peak_idx = jax.lax.top_k(masked, top_n)
    valid = jnp.isfinite(peak_score)
    peak_idx = jnp.where(valid, peak_idx, -1)
    return peak_idx.astype(jnp.int32), peak_score, valid


def suppress_close_peaks(peak_idx, valid, cycle_tolerance: int):
    """Keep only the best peak within +-cycle_tolerance.

    CONTRACT: columns must be score-descending (find_peaks_profile emits
    them that way) — earlier columns win ties/neighborhoods.
    """
    C = peak_idx.shape[1]
    keep = valid
    for i in range(1, C):
        close_to_better = jnp.zeros(peak_idx.shape[0], dtype=bool)
        for j in range(i):
            close = (
                keep[:, j]
                & (jnp.abs(peak_idx[:, i] - peak_idx[:, j]) <= cycle_tolerance)
            )
            close_to_better |= close
        keep = keep.at[:, i].set(keep[:, i] & ~close_to_better)
    return keep


@partial(
    jax.jit,
    static_argnames=("min_size", "max_size"),
)
def symmetric_limits_profile(
    score: jax.Array,  # [B, W]
    center: jax.Array,  # i32[B, C]
    *,
    f: float,
    center_fraction: float,
    min_size: int,
    max_size: int,
):
    """Vectorized reference `_symetric_limits_1d` over [B, C] candidates.

    Returns (start i32[B, C] inclusive, stop i32[B, C] exclusive), clipped
    to the profile bounds.
    """
    B, W = score.shape
    c = jnp.clip(center, 0, W - 1)
    center_int = jnp.take_along_axis(score, c, axis=1)  # [B, C]

    def flank(s):
        lo = jnp.clip(c - s, 0, W - 1)
        hi = jnp.clip(c + s, 0, W - 1)
        return (
            jnp.take_along_axis(score, lo, axis=1)
            + jnp.take_along_axis(score, hi, axis=1)
        ) * 0.5

    limit = jnp.full_like(c, min_size)
    trailing = center_int
    done = jnp.zeros_like(c, dtype=bool)
    for s in range(min_size + 1, max_size):
        inten = flank(s)
        dropping = inten < f * trailing
        above_floor = inten > center_int * center_fraction
        advance = ~done & dropping & above_floor
        limit = jnp.where(advance, s, limit)
        trailing = jnp.where(advance, inten, trailing)
        done = done | ~(dropping & above_floor)
    start = jnp.clip(c - limit, 0, W)
    stop = jnp.clip(c + limit + 1, 0, W)
    return start.astype(jnp.int32), stop.astype(jnp.int32)


@partial(jax.jit, static_argnames=("top_n",))
def find_peaks_profile_2d(score: jax.Array, *, top_n: int):
    """2D peak finding for data with an ion-mobility dimension.

    score: [B, S, W] (scan x cycle). A peak needs the strict 5-point
    stencil along BOTH axes (reference find_peaks_2d,
    search/selection/utils.py:78-108). Returns (scan_idx, cycle_idx,
    peak_score, valid) each [B, top_n], descending score.
    """
    B, S, W = score.shape
    # pad the scan axis with a strictly decreasing ramp so apexes in the
    # outermost scan bins still satisfy the stencil — with few mobility
    # bins (S~8) the interior-only stencil would blind half the scan range
    # (the reference runs over hundreds of scans where the 2-bin margin is
    # negligible; search/selection/utils.py:78-108)
    ramp1 = score[:, :1] - 1e-3
    ramp2 = score[:, :1] - 2e-3
    rampN1 = score[:, -1:] - 1e-3
    rampN2 = score[:, -1:] - 2e-3
    padded = jnp.concatenate([ramp2, ramp1, score, rampN1, rampN2], axis=1)
    Sp = S + 4
    stencil = jnp.zeros((B, S, W), dtype=bool)
    if W >= 5:
        c = padded[:, 2:-2, 2:-2]
        along_scan = (
            (c > padded[:, 1:-3, 2:-2])
            & (padded[:, 1:-3, 2:-2] > padded[:, :-4, 2:-2])
            & (c > padded[:, 3:-1, 2:-2])
            & (padded[:, 3:-1, 2:-2] > padded[:, 4:, 2:-2])
        )
        along_cycle = (
            (c > padded[:, 2:-2, 1:-3])
            & (padded[:, 2:-2, 1:-3] > padded[:, 2:-2, :-4])
            & (c > padded[:, 2:-2, 3:-1])
            & (padded[:, 2:-2, 3:-1] > padded[:, 2:-2, 4:])
        )
        stencil = stencil.at[:, :, 2:-2].set(along_scan & along_cycle)
    masked = jnp.where(stencil, score, NEG_INF).reshape(B, S * W)
    peak_score, flat_idx = jax.lax.top_k(masked, top_n)
    valid = jnp.isfinite(peak_score)
    scan_idx = jnp.where(valid, flat_idx // W, -1).astype(jnp.int32)
    cycle_idx = jnp.where(valid, flat_idx % W, -1).astype(jnp.int32)
    return scan_idx, cycle_idx, peak_score, valid


def symmetric_limits_2d(
    score: jax.Array,  # [B, S, W]
    scan_center: jax.Array,  # i32[B, C]
    cycle_center: jax.Array,  # i32[B, C]
    *,
    f_mobility: float,
    f_rt: float,
    center_fraction: float,
    min_size_mobility: int,
    max_size_mobility: int,
    min_size_rt: int,
    max_size_rt: int,
):
    """2D candidate extents (reference symetric_limits_2d,
    search/selection/utils.py:277-330): scan limits from the profile summed
    over +-min_size_rt cycles around the apex; cycle limits from the
    profile summed over +-min_size_mobility scans.

    Returns (scan_start, scan_stop, cycle_start, cycle_stop), each [B, C].
    """
    B, S, W = score.shape
    C = scan_center.shape[1]

    def _window_sum(axis_profile_axis, center, half):
        # sum score over a +-half window along the OTHER axis
        if axis_profile_axis == "cycle":
            # profile along scan: sum cycles in [cc-half, cc+half)
            w_ids = jnp.arange(W)[None, None, :]
            m = (w_ids >= (center - half)[:, :, None]) & (
                w_ids < (center + half)[:, :, None]
            )  # [B, C, W]
            return jnp.einsum("bsw,bcw->bcs", score, m.astype(score.dtype))
        w_ids = jnp.arange(S)[None, None, :]
        m = (w_ids >= (center - half)[:, :, None]) & (
            w_ids < (center + half)[:, :, None]
        )  # [B, C, S]
        return jnp.einsum("bsw,bcs->bcw", score, m.astype(score.dtype))

    scan_profiles = _window_sum("cycle", cycle_center, min_size_rt)  # [B, C, S]
    cycle_profiles = _window_sum("scan", scan_center, min_size_mobility)  # [B, C, W]

    scan_start, scan_stop = _limits_on_profiles(
        scan_profiles, scan_center, f_mobility, center_fraction,
        min_size_mobility, max_size_mobility,
    )
    cyc_start, cyc_stop = _limits_on_profiles(
        cycle_profiles, cycle_center, f_rt, center_fraction,
        min_size_rt, max_size_rt,
    )
    return scan_start, scan_stop, cyc_start, cyc_stop


def _limits_on_profiles(profiles, center, f, center_fraction, min_size, max_size):
    """symmetric_limits_profile generalized to per-candidate profiles
    [B, C, L] with centers [B, C]."""
    B, C, L = profiles.shape
    c = jnp.clip(center, 0, L - 1)
    center_int = jnp.take_along_axis(profiles, c[:, :, None], axis=2)[:, :, 0]

    def flank(s):
        lo = jnp.clip(c - s, 0, L - 1)
        hi = jnp.clip(c + s, 0, L - 1)
        return (
            jnp.take_along_axis(profiles, lo[:, :, None], axis=2)[:, :, 0]
            + jnp.take_along_axis(profiles, hi[:, :, None], axis=2)[:, :, 0]
        ) * 0.5

    limit = jnp.full_like(c, min_size)
    trailing = center_int
    done = jnp.zeros_like(c, dtype=bool)
    for s in range(min_size + 1, max_size):
        inten = flank(s)
        dropping = inten < f * trailing
        above = inten > center_int * center_fraction
        advance = ~done & dropping & above
        limit = jnp.where(advance, s, limit)
        trailing = jnp.where(advance, inten, trailing)
        done = done | ~(dropping & above)
    start = jnp.clip(c - limit, 0, L)
    stop = jnp.clip(c + limit + 1, 0, L)
    return start.astype(jnp.int32), stop.astype(jnp.int32)


def suppress_close_peaks_2d(
    scan_idx, cycle_idx, valid, scan_tolerance: int, cycle_tolerance: int
):
    """Keep only the best peak within a (scan, cycle) neighborhood.

    Reference ``_join_close_peaks`` (selection.py:230-284, called with
    scan_tolerance=3, cycle_tolerance=3): a peak is suppressed only when
    BOTH |Δscan| <= scan_tolerance AND |Δcycle| <= cycle_tolerance to a
    better peak — mobility-separated features co-eluting in RT survive.
    CONTRACT: columns must be score-descending along axis 1
    (find_peaks_profile_2d emits them that way).
    """
    C = cycle_idx.shape[1]
    keep = valid
    for i in range(1, C):
        close_to_better = jnp.zeros(cycle_idx.shape[0], dtype=bool)
        for j in range(i):
            close = (
                keep[:, j]
                & (jnp.abs(scan_idx[:, i] - scan_idx[:, j]) <= scan_tolerance)
                & (jnp.abs(cycle_idx[:, i] - cycle_idx[:, j]) <= cycle_tolerance)
            )
            close_to_better |= close
        keep = keep.at[:, i].set(keep[:, i] & ~close_to_better)
    return keep


def join_overlapping_2d(
    scan_start, scan_stop, cyc_start, cyc_stop, keep,
    p_scan_overlap: float, p_cycle_overlap: float,
):
    """Merge lower-ranked candidates whose 2D extent overlaps a
    higher-ranked one (reference ``_join_overlapping_candidates``,
    selection.py:288-370, defaults p_scan_overlap=0.01,
    p_cycle_overlap=0.6; overlap fractions measured against the
    higher-ranked candidate, union limits on join)."""
    C = scan_start.shape[1]
    for i in range(C):
        for j in range(i + 1, C):
            cyc_len = (cyc_stop[:, i] - cyc_start[:, i]).astype(jnp.float32)
            cyc_ov = (
                jnp.minimum(cyc_stop[:, i], cyc_stop[:, j])
                - jnp.maximum(cyc_start[:, i], cyc_start[:, j])
            ).astype(jnp.float32) / jnp.maximum(cyc_len, 1.0)
            scan_len = (scan_stop[:, i] - scan_start[:, i]).astype(jnp.float32)
            scan_ov = (
                jnp.minimum(scan_stop[:, i], scan_stop[:, j])
                - jnp.maximum(scan_start[:, i], scan_start[:, j])
            ).astype(jnp.float32) / jnp.maximum(scan_len, 1.0)
            do_join = (
                keep[:, i] & keep[:, j]
                & (scan_ov >= 0) & (cyc_ov >= 0)
                & (scan_ov > p_scan_overlap) & (cyc_ov > p_cycle_overlap)
            )
            scan_start = scan_start.at[:, i].set(
                jnp.where(do_join, jnp.minimum(scan_start[:, i], scan_start[:, j]), scan_start[:, i])
            )
            scan_stop = scan_stop.at[:, i].set(
                jnp.where(do_join, jnp.maximum(scan_stop[:, i], scan_stop[:, j]), scan_stop[:, i])
            )
            cyc_start = cyc_start.at[:, i].set(
                jnp.where(do_join, jnp.minimum(cyc_start[:, i], cyc_start[:, j]), cyc_start[:, i])
            )
            cyc_stop = cyc_stop.at[:, i].set(
                jnp.where(do_join, jnp.maximum(cyc_stop[:, i], cyc_stop[:, j]), cyc_stop[:, i])
            )
            keep = keep.at[:, j].set(keep[:, j] & ~do_join)
    return scan_start, scan_stop, cyc_start, cyc_stop, keep


def join_overlapping_1d(start, stop, keep, p_overlap: float):
    """Merge lower-ranked overlapping candidates into higher-ranked ones.

    start/stop: i32[B, C] (rank order along C); keep: bool[B, C].
    Returns updated (start, stop, keep). Overlap fraction is measured
    against the higher-ranked candidate's length (reference semantics).
    """
    C = start.shape[1]
    for i in range(C):
        for j in range(i + 1, C):
            length_i = (stop[:, i] - start[:, i]).astype(jnp.float32)
            ov = (
                jnp.minimum(stop[:, i], stop[:, j])
                - jnp.maximum(start[:, i], start[:, j])
            ).astype(jnp.float32) / jnp.maximum(length_i, 1.0)
            do_join = keep[:, i] & keep[:, j] & (ov > p_overlap) & (ov >= 0)
            start = start.at[:, i].set(
                jnp.where(do_join, jnp.minimum(start[:, i], start[:, j]), start[:, i])
            )
            stop = stop.at[:, i].set(
                jnp.where(do_join, jnp.maximum(stop[:, i], stop[:, j]), stop[:, i])
            )
            keep = keep.at[:, j].set(keep[:, j] & ~do_join)
    return start, stop, keep
