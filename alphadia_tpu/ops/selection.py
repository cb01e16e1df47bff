"""Batched candidate peak-group selection — the first hot kernel.

One fused jitted function processes a static batch of B precursors
end-to-end on device (replacing the per-precursor thread loop of the
reference, alphadia/search/selection/selection.py:78-544
`_select_candidates_pjit`):

    XIC gather (fragments + MS1 isotopes)
    -> Gaussian smoothing along cycles
    -> score = sum log1p(fragment XICs) + sum log1p(isotope XICs),
       standardized per precursor          (reference `_build_features`)
    -> 5-point-stencil peak finding, top-k (reference find_peaks_1d)
    -> close-peak suppression (+-3 cycles) (reference _join_close_peaks)
    -> symmetric extent growth             (reference symetric_limits_2d)
    -> overlapping-candidate merge         (reference _join_overlapping_candidates)

Outputs a fixed-size candidate SoA [B, C] in absolute cycle coordinates
(the engine's native frame unit — cycle index, not raw frame index).
Scan dims are emitted as 0/1 dummies for data without ion mobility,
matching the NG backend contract (reference ng_mapper.py:138-140).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from alphadia_tpu.ops.peaks import (
    find_peaks_profile,
    find_peaks_profile_2d,
    join_overlapping_1d,
    join_overlapping_2d,
    suppress_close_peaks,
    suppress_close_peaks_2d,
    symmetric_limits_2d,
    symmetric_limits_profile,
)
from alphadia_tpu.ops.smooth import convolve_profiles
from alphadia_tpu.ops.xic import extract_xic, extract_xic_4d
from alphadia_tpu.ops.xic_pallas import extract_xic_pallas


@partial(
    jax.jit,
    static_argnames=(
        "n_cycles",
        "n_bins",
        "slab",
        "window_len",
        "kernel_size",
        "candidate_count",
        "min_size_rt",
        "max_size_rt",
        "f_rt",
        "center_fraction",
        "join_close_candidates",
        "join_cycle_threshold",
        "peak_cycle_tolerance",
        "use_pallas",
        "cycle_stride",
    ),
)
def select_candidates_batch(
    # device data (DiaData.device_arrays())
    peak_mz,
    peak_intensity,
    peak_packed,
    cell_start,
    # batch inputs
    frag_slot,  # i32[B, QF]   cycle-slot per fragment observation (-1 pad)
    frag_mz,  # f32[B, QF]
    iso_slot,  # i32[B, QI]
    iso_mz,  # f32[B, QI]
    cycle_start,  # i32[B]     first cycle of each precursor's RT window
    kernel,  # f32[kernel_size]
    fragment_tol_ppm,  # f32 scalar
    precursor_tol_ppm,  # f32 scalar
    n_valid_fragments,  # i32[B]  (selection requires > 3)
    *,
    n_cycles: int,
    n_bins: int,
    bin_mz_min: float,
    bin_width: float,
    slab: int,
    window_len: int,
    kernel_size: int,
    candidate_count: int,
    min_size_rt: int = 3,
    max_size_rt: int = 15,
    f_rt: float = 0.99,
    center_fraction: float = 0.5,
    join_close_candidates: bool = True,
    join_cycle_threshold: float = 0.6,
    peak_cycle_tolerance: int = 3,
    use_pallas: bool = False,
    cycle_stride: int = 1,
):
    # wire decode: the driver may upload i16 slot/index arrays to halve
    # tunnel bytes; cast back (free under jit)
    frag_slot = frag_slot.astype(jnp.int32)
    iso_slot = iso_slot.astype(jnp.int32)
    cycle_start = cycle_start.astype(jnp.int32)
    n_valid_fragments = n_valid_fragments.astype(jnp.int32)

    B = frag_slot.shape[0]
    W = window_len
    xic_kw = dict(
        n_cycles=n_cycles,
        n_bins=n_bins,
        bin_mz_min=bin_mz_min,
        bin_width=bin_width,
        slab=slab,
        window_len=W,
        with_mz=False,
    )

    if use_pallas:
        # the packed store carries FINE per-peak cycles; a coarse view
        # (cycle_stride > 1) divides them onto merged cells in-kernel
        dense_frag = extract_xic_pallas(
            peak_packed, cell_start, frag_slot, frag_mz,
            fragment_tol_ppm, cycle_start, cycle_stride=cycle_stride,
            **xic_kw,
        )  # [B, QF, W]
        dense_iso = extract_xic_pallas(
            peak_packed, cell_start, iso_slot, iso_mz,
            precursor_tol_ppm, cycle_start, cycle_stride=cycle_stride,
            **xic_kw,
        )  # [B, QI, W]
    else:
        dense_frag = extract_xic(
            peak_mz, peak_intensity, cell_start, frag_slot, frag_mz,
            fragment_tol_ppm, cycle_start, **xic_kw,
        )
        dense_iso = extract_xic(
            peak_mz, peak_intensity, cell_start, iso_slot, iso_mz,
            precursor_tol_ppm, cycle_start, **xic_kw,
        )

    smooth_frag = convolve_profiles(dense_frag, kernel, kernel_size=kernel_size)
    smooth_iso = convolve_profiles(dense_iso, kernel, kernel_size=kernel_size)

    feature = jnp.log1p(jnp.maximum(smooth_frag, 0.0)).sum(axis=1) + jnp.log1p(
        jnp.maximum(smooth_iso, 0.0)
    ).sum(axis=1)  # [B, W]

    mean = feature.mean(axis=1, keepdims=True)
    std = feature.std(axis=1, keepdims=True)
    score = (feature - mean) / (std + 1e-6)

    peak_idx, peak_score, valid = find_peaks_profile(score, top_n=candidate_count)
    keep = suppress_close_peaks(peak_idx, valid, peak_cycle_tolerance)

    start_rel, stop_rel = symmetric_limits_profile(
        score,
        jnp.maximum(peak_idx, 0),
        f=f_rt,
        center_fraction=center_fraction,
        min_size=min_size_rt,
        max_size=max_size_rt,
    )
    if join_close_candidates:
        start_rel, stop_rel, keep = join_overlapping_1d(
            start_rel, stop_rel, keep, join_cycle_threshold
        )

    enough_fragments = (n_valid_fragments > 3)[:, None]
    keep = keep & enough_fragments

    cyc0 = cycle_start[:, None]
    cycle_center = jnp.clip(cyc0 + peak_idx, 0, n_cycles - 1)
    cycle_lo = jnp.clip(cyc0 + start_rel, 0, n_cycles)
    cycle_hi = jnp.clip(cyc0 + stop_rel, 0, n_cycles)

    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1

    return {
        "valid": keep,
        "rank": jnp.where(keep, rank, 0).astype(jnp.int32),
        "score": jnp.where(keep, peak_score, 0.0).astype(jnp.float32),
        "cycle_center": cycle_center.astype(jnp.int32),
        "cycle_start": cycle_lo.astype(jnp.int32),
        "cycle_stop": cycle_hi.astype(jnp.int32),
    }


@partial(
    jax.jit,
    static_argnames=(
        "bsz",
        "pack_output",
        "pack_mode",
        "n_cycles",
        "n_bins",
        "slab",
        "window_len",
        "kernel_size",
        "candidate_count",
        "min_size_rt",
        "max_size_rt",
        "f_rt",
        "center_fraction",
        "join_close_candidates",
        "join_cycle_threshold",
        "peak_cycle_tolerance",
        "use_pallas",
        "cycle_stride",
    ),
)
def select_candidates_batch_sliced(
    peak_mz, peak_intensity, peak_packed, cell_start,
    frag_slot_full, frag_mz_full, iso_slot_full, iso_mz_full,
    cycle_start_full, n_valid_fragments_full,
    b0,  # i32 scalar batch offset
    kernel, fragment_tol_ppm, precursor_tol_ppm,
    *, bsz: int, pack_output: bool = False, pack_mode: str = "u32",
    **static_kw,
):
    """One dispatch per batch: slice the uploaded full arrays on device and
    run the selection kernel (a host-side eager slice per input array would
    cost one dispatch round-trip each on the remote-TPU tunnel).  With
    ``pack_output`` the result dict comes back as one uint32 buffer, or a
    half-size uint16 buffer when ``pack_mode='u16'`` (driver guarantees
    16-bit ranges)."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b0, bsz)  # noqa: E731
    result = select_candidates_batch(
        peak_mz, peak_intensity, peak_packed,
        cell_start,
        sl(frag_slot_full), sl(frag_mz_full), sl(iso_slot_full),
        sl(iso_mz_full), sl(cycle_start_full),
        kernel, fragment_tol_ppm, precursor_tol_ppm,
        sl(n_valid_fragments_full),
        **static_kw,
    )
    if pack_output:
        from alphadia_tpu.ops.packing import pack_sel_u16, pack_u32, wire_encode_jnp

        return wire_encode_jnp(
            pack_sel_u16(result) if pack_mode == "u16" else pack_u32(result)
        )
    return result


_SCAN_SMOOTH = (0.25, 0.5, 0.25)  # fixed 3-tap kernel along the scan axis


@partial(
    jax.jit,
    static_argnames=(
        "n_cycles",
        "n_bins",
        "n_scan_bins",
        "slab",
        "window_len",
        "kernel_size",
        "candidate_count",
        "min_size_rt",
        "max_size_rt",
        "min_size_mobility",
        "max_size_mobility",
        "f_rt",
        "f_mobility",
        "center_fraction",
        "peak_cycle_tolerance",
        "peak_scan_tolerance",
        "join_close_candidates",
        "join_cycle_threshold",
    ),
)
def select_candidates_batch_4d(
    peak_mz,
    peak_intensity,
    peak_scanbin,
    cell_start,
    frag_slot,  # i32[B, QF]
    frag_mz,  # f32[B, QF]
    iso_slot,  # i32[B, QI]
    iso_mz,  # f32[B, QI]
    cycle_start,  # i32[B]
    kernel,  # f32[kernel_size]
    fragment_tol_ppm,
    precursor_tol_ppm,
    n_valid_fragments,  # i32[B]
    *,
    n_cycles: int,
    n_bins: int,
    bin_mz_min: float,
    bin_width: float,
    n_scan_bins: int,
    slab: int,
    window_len: int,
    kernel_size: int,
    candidate_count: int,
    min_size_rt: int = 3,
    max_size_rt: int = 15,
    min_size_mobility: int = 2,
    max_size_mobility: int = 6,
    f_rt: float = 0.99,
    f_mobility: float = 0.99,
    center_fraction: float = 0.5,
    peak_cycle_tolerance: int = 3,
    peak_scan_tolerance: int = 3,
    join_close_candidates: bool = True,
    join_cycle_threshold: float = 0.6,
):
    """4D candidate selection for ion-mobility data (reference
    select_candidates 2D path, selection/selection.py:78-544 +
    find_peaks_2d/symetric_limits_2d in selection/utils.py): the score map
    keeps the scan axis, peaks and extents are found in (scan, cycle).

    Output adds scan_center/scan_start/scan_stop in scan-bin coordinates
    (convert to mobility via DiaData.mobility_values).
    """
    # wire decode (see select_candidates_batch)
    frag_slot = frag_slot.astype(jnp.int32)
    iso_slot = iso_slot.astype(jnp.int32)
    cycle_start = cycle_start.astype(jnp.int32)
    n_valid_fragments = n_valid_fragments.astype(jnp.int32)

    B = frag_slot.shape[0]
    W, S = window_len, n_scan_bins
    xic_kw = dict(
        n_cycles=n_cycles,
        n_bins=n_bins,
        bin_mz_min=bin_mz_min,
        bin_width=bin_width,
        n_scan_bins=S,
        slab=slab,
        window_len=W,
    )
    dense_frag = extract_xic_4d(
        peak_mz, peak_intensity, peak_scanbin, cell_start,
        frag_slot, frag_mz, fragment_tol_ppm, cycle_start, **xic_kw,
    )  # [B, QF, S, W]
    dense_iso = extract_xic_4d(
        peak_mz, peak_intensity, peak_scanbin, cell_start,
        iso_slot, iso_mz, precursor_tol_ppm, cycle_start, **xic_kw,
    )  # [B, QI, S, W]

    def _smooth(x):
        b, q = x.shape[0], x.shape[1]
        y = convolve_profiles(
            x.reshape(b * q * S, W), kernel, kernel_size=kernel_size
        ).reshape(b, q, S, W)
        # light smoothing along the scan axis
        up = jnp.concatenate([y[:, :, :1], y[:, :, :-1]], axis=2)
        dn = jnp.concatenate([y[:, :, 1:], y[:, :, -1:]], axis=2)
        return _SCAN_SMOOTH[1] * y + _SCAN_SMOOTH[0] * up + _SCAN_SMOOTH[2] * dn

    smooth_frag = _smooth(dense_frag)
    smooth_iso = _smooth(dense_iso)

    feature = jnp.log1p(jnp.maximum(smooth_frag, 0.0)).sum(axis=1) + jnp.log1p(
        jnp.maximum(smooth_iso, 0.0)
    ).sum(axis=1)  # [B, S, W]

    mean = feature.mean(axis=(1, 2), keepdims=True)
    std = feature.std(axis=(1, 2), keepdims=True)
    score = (feature - mean) / (std + 1e-6)

    scan_idx, cycle_idx, peak_score, valid = find_peaks_profile_2d(
        score, top_n=candidate_count
    )
    # suppression needs closeness in BOTH dims: mobility-separated
    # features co-eluting in RT stay distinct candidates (reference
    # _join_close_peaks(scan_tol=3, cycle_tol=3))
    keep = suppress_close_peaks_2d(
        scan_idx, cycle_idx, valid, peak_scan_tolerance, peak_cycle_tolerance,
    )

    scan_start, scan_stop, start_rel, stop_rel = symmetric_limits_2d(
        score,
        jnp.maximum(scan_idx, 0),
        jnp.maximum(cycle_idx, 0),
        f_mobility=f_mobility,
        f_rt=f_rt,
        center_fraction=center_fraction,
        min_size_mobility=min_size_mobility,
        max_size_mobility=max_size_mobility,
        min_size_rt=min_size_rt,
        max_size_rt=max_size_rt,
    )

    if join_close_candidates:
        # merge lower-ranked candidates whose (scan, cycle) extent
        # overlaps a better one (reference _join_overlapping_candidates;
        # p_scan_overlap 0.01 is the reference's fixed default)
        scan_start, scan_stop, start_rel, stop_rel, keep = join_overlapping_2d(
            scan_start, scan_stop, start_rel, stop_rel, keep,
            p_scan_overlap=0.01, p_cycle_overlap=join_cycle_threshold,
        )

    enough_fragments = (n_valid_fragments > 3)[:, None]
    keep = keep & enough_fragments

    cyc0 = cycle_start[:, None]
    cycle_center = jnp.clip(cyc0 + cycle_idx, 0, n_cycles - 1)
    cycle_lo = jnp.clip(cyc0 + start_rel, 0, n_cycles)
    cycle_hi = jnp.clip(cyc0 + stop_rel, 0, n_cycles)

    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1

    return {
        "valid": keep,
        "rank": jnp.where(keep, rank, 0).astype(jnp.int32),
        "score": jnp.where(keep, peak_score, 0.0).astype(jnp.float32),
        "cycle_center": cycle_center.astype(jnp.int32),
        "cycle_start": cycle_lo.astype(jnp.int32),
        "cycle_stop": cycle_hi.astype(jnp.int32),
        "scan_center": jnp.clip(scan_idx, 0, S - 1).astype(jnp.int32),
        "scan_start": jnp.clip(scan_start, 0, S).astype(jnp.int32),
        "scan_stop": jnp.clip(scan_stop, 0, S).astype(jnp.int32),
    }


@partial(
    jax.jit,
    static_argnames=(
        "bsz",
        "pack_output",
        "pack_mode",
        "n_cycles",
        "n_bins",
        "n_scan_bins",
        "slab",
        "window_len",
        "kernel_size",
        "candidate_count",
        "min_size_rt",
        "max_size_rt",
        "min_size_mobility",
        "max_size_mobility",
        "f_rt",
        "f_mobility",
        "center_fraction",
        "peak_cycle_tolerance",
        "peak_scan_tolerance",
        "join_close_candidates",
        "join_cycle_threshold",
    ),
)
def select_candidates_batch_4d_sliced(
    peak_mz, peak_intensity, peak_scanbin, cell_start,
    frag_slot_full, frag_mz_full, iso_slot_full, iso_mz_full,
    cycle_start_full, n_valid_fragments_full,
    b0,
    kernel, fragment_tol_ppm, precursor_tol_ppm,
    *, bsz: int, pack_output: bool = False, pack_mode: str = "u32",
    **static_kw,
):
    """4D analog of select_candidates_batch_sliced."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b0, bsz)  # noqa: E731
    result = select_candidates_batch_4d(
        peak_mz, peak_intensity, peak_scanbin, cell_start,
        sl(frag_slot_full), sl(frag_mz_full), sl(iso_slot_full),
        sl(iso_mz_full), sl(cycle_start_full),
        kernel, fragment_tol_ppm, precursor_tol_ppm,
        sl(n_valid_fragments_full),
        **static_kw,
    )
    if pack_output:
        from alphadia_tpu.ops.packing import pack_sel_u16, pack_u32, wire_encode_jnp

        return wire_encode_jnp(
            pack_sel_u16(result) if pack_mode == "u16" else pack_u32(result)
        )
    return result
