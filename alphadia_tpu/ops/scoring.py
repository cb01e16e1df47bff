"""Batched candidate scoring — the hot kernel of the engine.

One fused jitted function scores a static batch of B candidates, producing
the 46-feature array and per-fragment quantification outputs
(reference: alphadia/search/scoring/containers/candidate.py:40-504
``Candidate.process`` + features/*.py + quadrupole.py — one numba thread per
score group there; one vectorized device batch here).

Feature index map (order of reference DEFAULT_FEATURE_COLUMNS,
scoring.py:34-81): 0 base_width_mobility, 1 base_width_rt, 2 rt_observed,
3 mobility_observed, 4 mono_ms1_intensity, 5 top_ms1_intensity,
6 sum_ms1_intensity, 7 weighted_ms1_intensity, 8 weighted_mass_deviation,
9 weighted_mass_error, 10 mz_observed, 11 mono_ms1_height, 12 top_ms1_height,
13 sum_ms1_height, 14 weighted_ms1_height, 15 isotope_intensity_correlation,
16 isotope_height_correlation, 17 n_observations, 18 intensity_correlation,
19 height_correlation, 20 intensity_fraction, 21 height_fraction,
22 intensity_fraction_weighted, 23 height_fraction_weighted,
24 mean_observation_score, 25 sum_b_ion_intensity, 26 sum_y_ion_intensity,
27 diff_b_y_ion_intensity, 28 f_masked, 29 fragment_scan_correlation,
30 template_scan_correlation, 31 fragment_frame_correlation,
32 top3_frame_correlation, 33 template_frame_correlation,
34 top3_b_ion_correlation, 35 n_b_ions, 36 top3_y_ion_correlation,
37 n_y_ions, 38 cycle_fwhm, 39 mobility_fwhm, 40 delta_frame_peak,
41 top_3_ms2_mass_error, 42 mean_ms2_mass_error, 43 n_overlapping,
44 mean_overlapping_intensity, 45 mean_overlapping_mass_error.

Frame-axis profiles are extracted with the scan dim collapsed; for
mobility data (static ``n_scan_bins > 1``) a dedicated scan-profile
extraction fills the scan features in-kernel — 29/30 (fragment/template
scan correlations), 39 (mobility_fwhm) and the observed-mobility center
of mass (``fragment_out["scan_com"]``, mapped to mobility values by the
driver).  For 3D data those features stay 0.  Profiles are extracted
re-centered: the XIC window starts at ``frame_center - W//2`` so the apex
sits at the static index W//2 — removing every data-dependent center the
reference handles dynamically.

Deliberate deviation from the reference: the expected center for the
precursor weighted-center-mean is the window center (the reference feeds
array *shapes* as centers there — see features/precursor_features.py:52-57);
the downstream NN is retrained on our features, so exact replication of
that artifact is not useful.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from alphadia_tpu.constants.settings import NUM_FEATURES
from alphadia_tpu.ops.features import (
    center_envelope_odd,
    cosine_rows,
    logistic_rectangle,
    masked_corrcoef,
    masked_mean,
    masked_median,
    or_envelope,
    pearson_rows,
    pearson_rows_masked,
    ref_top3_ion_correlation,
    topk_mean_by,
    weighted_center_mean,
    weighted_center_of_mass,
)
from alphadia_tpu.ops.xic import extract_scan_profile, extract_xic
from alphadia_tpu.ops.xic_pallas import extract_xic_pallas


@partial(
    jax.jit,
    static_argnames=(
        "n_cycles",
        "n_bins",
        "n_scan_bins",
        "slab",
        "window_len",
        "quant_window",
        "quant_all",
        "experimental_xic",
        "use_pallas",
        "compute_dtype",
    ),
)
def score_candidates_batch(
    # device data
    peak_mz,
    peak_intensity,
    peak_packed,
    peak_scanbin,  # i32[N+pad] (zeros for 3D data)
    cell_start,
    cycle_rt,  # f32[n_cycles]
    # candidate batch
    frag_mz,  # f32[B, KF] library (calibrated) fragment m/z; 0 = pad
    frag_valid,  # bool[B, KF]
    frag_intensity,  # f32[B, KF] library intensity
    frag_type,  # i32[B, KF] (98=b, 121=y)
    frag_position,  # i32[B, KF]
    iso_mz,  # f32[B, KI]
    iso_intensity,  # f32[B, KI]
    ms2_slot,  # i32[B, O2] (-1 pad)
    ms1_slot,  # i32[B, O1] (-1 pad)
    win_lo,  # f32[B, O2] quad window bounds per ms2 obs (dummy for pad)
    win_hi,  # f32[B, O2]
    quad_sigma,  # f32[2] logistic edge sigmas
    quad_delta_mu,  # f32[2]
    frame_center,  # i32[B] absolute cycle of apex
    frame_start,  # i32[B]
    frame_stop,  # i32[B] exclusive
    scan_lo,  # i32[B] candidate scan-bin window start (0 for 3D)
    scan_hi,  # i32[B] exclusive (1 for 3D)
    mobility_width,  # f32[B] |mobility extent| of the scan window (0 for 3D)
    fragment_tol_ppm,
    precursor_tol_ppm,
    *,
    n_cycles: int,
    n_bins: int,
    bin_mz_min: float,
    bin_width: float,
    n_scan_bins: int = 1,
    slab: int,
    window_len: int,
    quant_window: int = 3,
    quant_all: bool = True,
    experimental_xic: bool = True,
    use_pallas: bool = False,
    compute_dtype: str = "float32",
):
    B, KF = frag_mz.shape

    # wire-format decode: the driver may upload compact dtypes to halve
    # tunnel bytes (f16 intensities, u8 type/position, i16 slots/frames,
    # bit-packed fragment validity) — cast back to canonical dtypes here;
    # under jit the casts fuse into the first consumers for free.
    if frag_valid.dtype != jnp.bool_:
        from alphadia_tpu.ops.packing import unpack_bits_jnp

        frag_valid = unpack_bits_jnp(frag_valid, KF)
    frag_intensity = frag_intensity.astype(jnp.float32)
    iso_intensity = iso_intensity.astype(jnp.float32)
    mobility_width = mobility_width.astype(jnp.float32)
    frag_type = frag_type.astype(jnp.int32)
    frag_position = frag_position.astype(jnp.int32)
    ms2_slot = ms2_slot.astype(jnp.int32)
    ms1_slot = ms1_slot.astype(jnp.int32)
    frame_center = frame_center.astype(jnp.int32)
    frame_start = frame_start.astype(jnp.int32)
    frame_stop = frame_stop.astype(jnp.int32)
    scan_lo = scan_lo.astype(jnp.int32)
    scan_hi = scan_hi.astype(jnp.int32)

    KI = iso_mz.shape[1]
    O2 = ms2_slot.shape[1]
    O1 = ms1_slot.shape[1]
    W = window_len
    C = W // 2  # static apex index

    f32 = jnp.float32
    cycle_start = frame_center - C

    # ---- window masks -------------------------------------------------
    cyc = cycle_start[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]  # [B, W]
    in_candidate = (cyc >= frame_start[:, None]) & (cyc < frame_stop[:, None])
    in_data = (cyc >= 0) & (cyc < n_cycles)
    wmask = in_candidate & in_data  # [B, W]

    xic_kw = dict(
        n_cycles=n_cycles,
        n_bins=n_bins,
        bin_mz_min=bin_mz_min,
        bin_width=bin_width,
        slab=slab,
        window_len=W,
        with_mz=True,
        mz_as_delta=True,
    )
    if n_scan_bins > 1:
        # 4D: crop the frame dense to the candidate's scan window, like the
        # reference's _assemble_push honouring scan_limits (bruker_jit.py)
        xic_kw["scan_lo"] = scan_lo
        xic_kw["scan_hi"] = scan_hi

    # ---- dense fragments [B, KF, O2, W] -------------------------------
    fslot = jnp.where(frag_valid[:, :, None], ms2_slot[:, None, :], -1)  # [B,KF,O2]
    fmzq = jnp.broadcast_to(frag_mz[:, :, None], (B, KF, O2))
    _xic = (
        (lambda *a, **k: extract_xic_pallas(peak_packed, *a, **k))
        if use_pallas
        else (
            lambda *a, **k: extract_xic(
                peak_mz,
                peak_intensity,
                *a,
                # scanbin filter rides the packed store on the pallas path;
                # the XLA path needs the explicit per-peak bin array
                **({"peak_scanbin": peak_scanbin} if "scan_lo" in k else {}),
                **k,
            )
        )
    )
    d_frag_int, d_frag_dmz = _xic(
        cell_start,
        fslot.reshape(B, KF * O2), fmzq.reshape(B, KF * O2),
        fragment_tol_ppm, cycle_start, **xic_kw,
    )
    d_frag_int = d_frag_int.reshape(B, KF, O2, W) * wmask[:, None, None, :]
    d_frag_dmz = d_frag_dmz.reshape(B, KF, O2, W) * wmask[:, None, None, :]
    # presence of the m/z plane is defined PRE-transmission-mask (the
    # reference multiplies only dense[0] by qtf_mask)
    frag_present = d_frag_int > 0  # [B, KF, O2, W]

    # bf16 compute path (tpu.compute_dtype): the dense intensity chains —
    # profiles, correlations, areas — run at half the HBM traffic; all m/z
    # delta / mass-error math stays f32 (d_frag_dmz / d_prec_dmz below).
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else f32
    d_frag_int = d_frag_int.astype(cdt)

    # ---- dense precursors, observations collapsed [B, KI, W] ----------
    islot = jnp.broadcast_to(ms1_slot[:, None, :], (B, KI, O1))
    imzq = jnp.broadcast_to(iso_mz[:, :, None], (B, KI, O1))
    d_prec_int_o, d_prec_dmz_o = _xic(
        cell_start,
        islot.reshape(B, KI * O1), imzq.reshape(B, KI * O1),
        precursor_tol_ppm, cycle_start, **xic_kw,
    )
    d_prec_int_o = d_prec_int_o.reshape(B, KI, O1, W) * wmask[:, None, None, :]
    d_prec_dmz_o = d_prec_dmz_o.reshape(B, KI, O1, W) * wmask[:, None, None, :]
    d_prec_int = d_prec_int_o.sum(axis=2).astype(cdt)  # [B, KI, W]
    nz = (d_prec_int_o > 0).sum(axis=2).astype(f32)
    prec_present = nz > 0  # [B, KI, W]
    # reference obs-merge is sum/(count + 1e-6) on ABSOLUTE m/z
    # (candidate.py:262-269): the eps shifts the merged m/z by
    # -1e-6*mz/(count+1e-6) — about -1 ppm at count=1 — and the shift
    # varies with which isotopes/frames have signal, so it must be
    # replicated, not dropped, for weighted_mass_* parity. In delta space:
    # merged = (sum(d_j) - 1e-6*qc) / (count + 1e-6), qc = iso_mz.
    d_prec_dmz = jnp.where(
        prec_present,
        (d_prec_dmz_o.sum(axis=2) - 1e-6 * iso_mz[:, :, None]) / (nz + 1e-6),
        0.0,
    )

    # ---- quadrupole transfer + template -------------------------------
    # qtf[B, KI, O2] (scan dim singleton for 3D data)
    qtf = logistic_rectangle(
        win_lo[:, None, :] + quad_delta_mu[0],
        win_hi[:, None, :] + quad_delta_mu[1],
        quad_sigma[0],
        quad_sigma[1],
        iso_mz[:, :, None],
    )
    obs_valid = ms2_slot >= 0  # [B, O2]
    qtf = qtf * obs_valid[:, None, :]

    # raw (pre-transmission-mask) per-window fragment sums: the training
    # signal for per-run quadrupole fitting (search/quadrupole.py)
    obs_raw_sum = d_frag_int.sum(axis=(1, 3))  # [B, O2]

    # mask fragments by mean transmission of the isotope envelope
    # (cdt casts keep the [B,KF,O2,W] chains in the compute dtype — a f32
    # operand would silently promote everything back)
    qtf_mask = qtf.mean(axis=1)  # [B, O2]
    d_frag_int = d_frag_int * qtf_mask[:, None, :, None].astype(cdt)

    # template[B, O2, W] = sum_iso iso_int * qtf * precursor trace
    template = (
        (iso_intensity[:, :, None, None] * qtf[:, :, :, None]).astype(cdt)
        * d_prec_int[:, :, None, :]
    ).sum(axis=1)

    t_sum = template.sum(axis=-1)  # [B, O2]
    total = t_sum.sum(axis=-1, keepdims=True)
    obs_imp = jnp.where(
        total > 0,
        t_sum / jnp.maximum(total, 1e-12),
        obs_valid.astype(f32) / jnp.maximum(obs_valid.sum(-1, keepdims=True), 1),
    )  # [B, O2]

    # ---- fragment validity -------------------------------------------
    frag_signal = d_frag_int.sum(axis=(2, 3)) > 0  # [B, KF]
    fmask = frag_valid & frag_signal
    n_valid = fmask.sum(axis=1)  # [B]
    n_input = jnp.maximum(frag_valid.sum(axis=1), 1)

    # features accumulate in a dict of [B] columns stacked ONCE at the end:
    # 45 sequential `features.at[:, i].set(...)` updates created a serial
    # dynamic-update-slice chain that splintered the feature section into
    # ~235 small XLA loop fusions per batch (profiled 2026-08); the stack
    # form lets XLA fuse feature math freely. Unset indices stay zero.
    feat: dict[int, jnp.ndarray] = {}
    feat[28] = (n_valid / n_input)  # f_masked

    # ---- location features -------------------------------------------
    # rt extent spans the full candidate window [frame_start, frame_stop);
    # the reference measures rt_values[frame_stop-1] - rt_values[frame_start]
    # at SPECTRUM granularity (location_features.py:26), which is the full
    # cycle span minus 1/n_slots of a cycle — using the exclusive stop at
    # cycle granularity is the closest match (residual: cycle_time/n_slots)
    rt_start = cycle_rt[jnp.clip(frame_start, 0, n_cycles - 1)]
    rt_stop = cycle_rt[jnp.clip(frame_stop, 0, n_cycles - 1)]
    rt_obs = cycle_rt[jnp.clip(frame_center, 0, n_cycles - 1)]
    feat[1] = (rt_stop - rt_start)
    feat[2] = (rt_obs)
    feat[3] = (1e-6)

    # ---- precursor features ------------------------------------------
    sum_prec = d_prec_int.sum(axis=-1)  # [B, KI] (obs importance sums to 1)
    feat[4] = (sum_prec[:, 0])
    top_iso = jnp.argmax(iso_intensity, axis=1)  # [B]
    feat[5] = (
        jnp.take_along_axis(sum_prec, top_iso[:, None], axis=1)[:, 0]
    )
    feat[6] = (sum_prec.sum(axis=1))
    feat[7] = ((sum_prec * iso_intensity).sum(axis=1))

    # the reference weights precursor planes from frame index 1 relative to
    # the candidate window START with scan center 2 (a tile(shape) artifact,
    # precursor_features.py:52-67) — NOT from the apex; buffer index of
    # window-frame 1 is frame_start - cycle_start + 1
    prec_ctr = (frame_start - cycle_start + 1).astype(f32)  # [B]
    center_arr = jnp.broadcast_to(prec_ctr[:, None], (B, KI))
    prec_kw = dict(scan_dist_sq=(4.0, 1.0))
    if n_scan_bins > 1:
        # 4D: the reference weights over the TRUE (scan, frame) cells of
        # the candidate-cropped dense — weight exp(-0.1*sqrt(ds^2+df^2))
        # per nonzero cell, centers = the tile(shape) artifact
        # (scan_center = n_window_scans, frame_center = n_observations;
        # precursor_features.py:52-67 + features_utils.py:10-37). Exact
        # per-cell replication here on the [B, KI, S, W] dense; the
        # collapsed-scan form below stays for 3D (where it is exact).
        from alphadia_tpu.ops.xic import extract_xic_4d

        i4_int_o, i4_dmz_o = extract_xic_4d(
            peak_mz, peak_intensity, peak_scanbin, cell_start,
            islot.reshape(B, KI * O1), imzq.reshape(B, KI * O1),
            precursor_tol_ppm, cycle_start,
            n_cycles=n_cycles, n_bins=n_bins, bin_mz_min=bin_mz_min,
            bin_width=bin_width, n_scan_bins=n_scan_bins, slab=slab,
            window_len=W, with_mz=True,
        )
        S4 = n_scan_bins
        i4_int_o = i4_int_o.reshape(B, KI, O1, S4, W)
        i4_dmz_o = i4_dmz_o.reshape(B, KI, O1, S4, W)
        # cell-wise obs merge, same eps semantics as the collapsed path
        nz4 = (i4_int_o > 0).sum(axis=2).astype(f32)  # [B, KI, S, W]
        i4_int = i4_int_o.sum(axis=2)
        i4_dmz = jnp.where(
            nz4 > 0,
            (i4_dmz_o.sum(axis=2) - 1e-6 * iso_mz[:, :, None, None])
            / (nz4 + 1e-6),
            0.0,
        )
        s_idx4 = jnp.arange(S4, dtype=f32)
        smask4 = (s_idx4[None, :] >= scan_lo[:, None]) & (
            s_idx4[None, :] < scan_hi[:, None]
        )  # [B, S]
        # reference scan coord ASCENDS raw scan index = DESCENDING
        # mobility, ours ascends mobility: s_ref = (window) scan_stop_ref
        # - 1 - (s - scan_lo) ... the ref center (= window length, one
        # row past its last scan) therefore sits one bin BELOW our
        # window start: ds = s - (scan_lo - 1)
        ds4 = s_idx4[None, :] - (scan_lo.astype(f32)[:, None] - 1.0)  # [B, S]
        df4 = jnp.arange(W, dtype=f32)[None, :] - prec_ctr[:, None]  # [B, W]
        w4 = jnp.exp(
            -0.1
            * jnp.sqrt(
                jnp.square(ds4)[:, None, :, None]
                + jnp.square(df4)[:, None, None, :]
            )
        )  # [B, 1, S, W]
        present4 = (
            (i4_int > 0)
            & smask4[:, None, :, None]
            & wmask[:, None, None, :]
        )
        w4m = jnp.where(present4, w4, 0.0)
        w4sum = w4m.sum(axis=(-2, -1))  # [B, KI]
        prec_height = jnp.where(
            w4sum > 0,
            (i4_int * w4m).sum(axis=(-2, -1)) / jnp.maximum(w4sum, 1e-12),
            0.0,
        )
        prec_dmz_obs = jnp.where(
            w4sum > 0,
            (i4_dmz * w4m).sum(axis=(-2, -1)) / jnp.maximum(w4sum, 1e-12),
            0.0,
        )
    else:
        prec_height = weighted_center_mean(
            d_prec_int, center_arr, wmask[:, None, :], **prec_kw
        )
        prec_dmz_obs = weighted_center_mean(
            d_prec_dmz, center_arr, wmask[:, None, :],
            nonzero=prec_present, **prec_kw,
        )
    mz_nz = (prec_present & wmask[:, None, :]).any(axis=-1)  # [B, KI]
    mass_err_iso = prec_dmz_obs / iso_mz * 1e6
    weighted_mass_error = (jnp.where(mz_nz, mass_err_iso, 0.0) * iso_intensity).sum(axis=1)
    feat[8] = (weighted_mass_error)
    feat[9] = (jnp.abs(weighted_mass_error))
    feat[10] = (
        iso_mz[:, 0] + weighted_mass_error * 1e-6 * iso_mz[:, 0]
    )
    feat[11] = (prec_height[:, 0])
    feat[12] = (
        jnp.take_along_axis(prec_height, top_iso[:, None], axis=1)[:, 0]
    )
    feat[13] = (prec_height.sum(axis=1))
    feat[14] = ((prec_height * iso_intensity).sum(axis=1))
    ones = jnp.ones((B, KI), dtype=bool)
    feat[15] = (
        masked_corrcoef(iso_intensity, sum_prec, ones)
    )
    feat[16] = (
        masked_corrcoef(iso_intensity, prec_height, ones)
    )
    feat[17] = (obs_valid.sum(axis=1).astype(f32))

    # ---- fragment profiles -------------------------------------------
    # frame profile per (fragment, obs): scan dim already collapsed
    frame_profile = d_frag_int  # [B, KF, O2, W]
    intensity_norm = jnp.where(fmask, frag_intensity, 0.0)
    intensity_norm = intensity_norm / jnp.maximum(
        intensity_norm.sum(axis=1, keepdims=True), 1e-12
    )

    # template center of mass per obs
    com, _t = weighted_center_of_mass(template, wmask[:, None, :])  # [B, O2]

    # quantification profile
    if quant_all:
        best_profile = frame_profile.sum(axis=2)  # [B, KF, W]
    else:
        bo = jnp.argmax(obs_imp, axis=1)  # [B]
        best_profile = jnp.take_along_axis(
            frame_profile, bo[:, None, None, None], axis=2
        )[:, :, 0, :]
    best_profile = center_envelope_odd(best_profile, C)

    qw = min(max(W // 2 - 1, 1), quant_window)
    prof_q = jax.lax.dynamic_slice_in_dim(best_profile, C - qw, 2 * qw + 1, axis=2)
    rt_win = cycle_rt[jnp.clip(cyc, 0, n_cycles - 1)]  # [B, W]
    rt_q = jax.lax.dynamic_slice_in_dim(rt_win, C - qw, 2 * qw + 1, axis=1)
    delta_rt_q = rt_q[:, 1:] - rt_q[:, :-1]  # [B, 2qw]
    fragment_area = (
        (prof_q[:, :, 1:] + prof_q[:, :, :-1]) * delta_rt_q[:, None, :] * 0.5
    ).sum(axis=-1)
    fragment_area_norm = fragment_area * qw  # [B, KF] -> 'intensity'
    observed_intensity = prof_q.sum(axis=-1)  # [B, KF]

    sum_frag_int = frame_profile.sum(axis=-1)  # [B, KF, O2]

    # observed mz-delta / height at template center of mass
    com_f = jnp.broadcast_to(com[:, None, :], (B, KF, O2))
    o_dmz = weighted_center_mean(
        d_frag_dmz, com_f,
        wmask[:, None, None, :] & jnp.ones((1, KF, O2, 1), bool),
        nonzero=frag_present,
    )  # [B, KF, O2]
    o_height = weighted_center_mean(
        d_frag_int, com_f, wmask[:, None, None, :] & jnp.ones((1, KF, O2, 1), bool)
    )
    h_mask = o_height > 0  # [B, KF, O2]
    h_w = h_mask * obs_imp[:, None, :]
    h_w = h_w / (h_w.sum(axis=-1, keepdims=True) + 1e-20)
    observed_dmz = (o_dmz * h_w).sum(axis=-1)  # [B, KF]
    has_obs = h_mask.any(axis=-1)  # [B, KF]
    observed_height = (o_height * h_w).sum(axis=-1)

    feat[18] = (
        masked_corrcoef(fragment_area_norm, intensity_norm, fmask)
    )
    feat[19] = (
        masked_corrcoef(observed_height, intensity_norm, fmask)
    )
    int_nz = (observed_intensity > 0) & fmask
    h_nz = (observed_height > 0) & fmask
    nf = jnp.maximum(n_valid.astype(f32), 1.0)
    feat[20] = (int_nz.sum(axis=1) / nf)
    feat[21] = (h_nz.sum(axis=1) / nf)
    feat[22] = ((intensity_norm * int_nz).sum(axis=1))
    feat[23] = ((intensity_norm * h_nz).sum(axis=1))

    # mean_observation_score: cosine(template per-obs intensity, fragment per-obs)
    cos = cosine_rows(sum_frag_int, t_sum[:, None, :])  # [B, KF]
    feat[24] = (masked_mean(cos, int_nz))

    is_b = frag_type == 98
    is_y = frag_type == 121
    b_int = (observed_intensity * (is_b & fmask)).sum(axis=1)
    y_int = (observed_intensity * (is_y & fmask)).sum(axis=1)
    feat[25] = (jnp.log1p(b_int))
    feat[26] = (jnp.log1p(y_int))
    feat[27] = (feat[25] - feat[26])

    # ---- frame correlation features ----------------------------------
    profile_all = frame_profile.sum(axis=2)  # [B, KF, W]
    if experimental_xic:
        # reference normalize_profiles (scoring_utils.py:79-118): each
        # fragment profile is scaled by the MEAN over center±1 — profiles
        # with zero center intensity are zeroed, so noise-only fragments
        # don't distort the median reference profile
        center_int = profile_all[:, :, C - 1 : C + 2].mean(
            axis=-1, keepdims=True
        )
        norm_prof = jnp.where(
            center_int > 0, profile_all / jnp.maximum(center_int, 1e-12), 0.0
        )
        med_prof = masked_median(
            norm_prof, fmask[:, :, None] & wmask[:, None, :], axis=1
        )  # [B, W]
        frame_corr = pearson_rows_masked(
            jnp.broadcast_to(
                med_prof[:, None, :] * wmask[:, None, :], profile_all.shape
            ),
            profile_all,
            wmask[:, None, :],
        )  # [B, KF]
        top3_corr = topk_mean_by(frame_corr, frag_intensity, fmask, 3)
    else:
        wcnt = jnp.maximum(wmask.sum(axis=-1).astype(f32), 1.0)[:, None, None]
        pmean = profile_all.sum(axis=-1, keepdims=True) / wcnt
        pm = (profile_all - pmean) * wmask[:, None, :]
        cov = jnp.einsum("bfw,bgw->bfg", pm, pm) / wcnt
        sd = jnp.sqrt(
            jnp.maximum(jnp.einsum("bfw,bfw->bf", pm, pm) / wcnt[..., 0], 0.0)
        )
        corr_mat = cov / (sd[:, :, None] * sd[:, None, :] + 1e-12)
        frame_corr = jnp.einsum(
            "bfg,bg->bf", corr_mat * fmask[:, None, :], frag_intensity
        )
        top3_corr = topk_mean_by(frame_corr, frag_intensity, fmask, 3)

    feat[31] = (masked_mean(frame_corr, fmask))
    feat[32] = (top3_corr)

    # template-fragment frame correlation per obs, importance-reduced
    tf_corr = pearson_rows_masked(
        frame_profile,
        jnp.broadcast_to(template[:, None, :, :], frame_profile.shape),
        jnp.broadcast_to(wmask[:, None, None, :], frame_profile.shape),
    )  # [B, KF, O2]
    tf_red = (tf_corr * obs_imp[:, None, :]).sum(axis=-1)  # [B, KF]
    # weights are the NORMALIZED library intensities (reference
    # profile_features.py:84 dots with fragment_intensity_norm) — raw
    # intensities would scale the feature with the library's intensity sum
    feat[33] = ((tf_red * intensity_norm).sum(axis=1))

    # reference-exact pick order incl. its sorted-index/mask-order quirk
    # (ops/features.ref_top3_ion_correlation; profile_features.py:97-112)
    feat[34] = (
        ref_top3_ion_correlation(frame_corr, frag_mz, frag_intensity, fmask, is_b)
    )
    feat[35] = ((fmask & is_b).sum(axis=1).astype(f32))
    feat[36] = (
        ref_top3_ion_correlation(frame_corr, frag_mz, frag_intensity, fmask, is_y)
    )
    feat[37] = ((fmask & is_y).sum(axis=1).astype(f32))

    # ---- mobility scan features (4D path) -----------------------------
    # (reference: fragment_features.py:430-480 fragment_mobility_correlation,
    # profile_features.py:148-188 mobility FWHM; computed in-kernel from
    # dedicated scan profiles — n_scan_bins == 1 keeps them at 0 for 3D.)
    scan_com = jnp.zeros((B,), dtype=f32)
    if n_scan_bins > 1:
        S = n_scan_bins
        s_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
        smask = (s_idx >= scan_lo[:, None]) & (s_idx < scan_hi[:, None])  # [B, S]
        sp_kw = dict(
            n_cycles=n_cycles, n_bins=n_bins, bin_mz_min=bin_mz_min,
            bin_width=bin_width, n_scan_bins=S, slab=slab,
        )
        c_lo = jnp.maximum(frame_start, cycle_start)
        c_hi = jnp.minimum(frame_stop, cycle_start + W)
        frag_scan = extract_scan_profile(
            peak_mz, peak_intensity, peak_scanbin, cell_start,
            fslot.reshape(B, KF * O2), fmzq.reshape(B, KF * O2),
            fragment_tol_ppm, c_lo, c_hi, **sp_kw,
        ).reshape(B, KF, O2, S) * smask[:, None, None, :]
        # the reference or-envelopes scan profiles before ALL downstream
        # mobility features (candidate.py:344-347: or_envelope_2d for
        # fragments, or_envelope_1d for the template) — raw timsTOF scan
        # profiles are spiky and the envelope is what gets correlated
        frag_scan = or_envelope(frag_scan) * smask[:, None, None, :]
        prec_scan = extract_scan_profile(
            peak_mz, peak_intensity, peak_scanbin, cell_start,
            islot.reshape(B, KI * O1), imzq.reshape(B, KI * O1),
            precursor_tol_ppm, c_lo, c_hi, **sp_kw,
        ).reshape(B, KI, O1, S).sum(axis=2) * smask[:, None, :]
        template_scan = (
            iso_intensity[:, :, None, None]
            * qtf[:, :, :, None]
            * prec_scan[:, :, None, :]
        ).sum(axis=1)  # [B, O2, S]
        template_scan = or_envelope(template_scan) * smask[:, None, :]

        # 29: pairwise fragment scan correlations, obs-importance reduced,
        # intensity-weighted (masked moments over the candidate scan window)
        cnt = jnp.maximum(smask.sum(-1), 1).astype(f32)  # [B]
        mu = frag_scan.sum(-1) / cnt[:, None, None]  # [B, KF, O2]
        pm_s = (frag_scan - mu[..., None]) * smask[:, None, None, :]
        cov_s = jnp.einsum("bfos,bgos->bfgo", pm_s, pm_s)
        var_s = jnp.einsum("bfos,bfos->bfo", pm_s, pm_s)
        sd_s = jnp.sqrt(jnp.maximum(var_s, 0.0))
        corr_s = cov_s / (sd_s[:, :, None, :] * sd_s[:, None, :, :] + 1e-12)
        corr_s_red = (corr_s * obs_imp[:, None, None, :]).sum(-1)  # [B, KF, KF]
        has_scan = frag_scan.sum(axis=(2, 3)) > 0  # [B, KF]
        sc_mask = fmask & has_scan
        w_scan = jnp.where(sc_mask, frag_intensity, 0.0)
        w_scan = w_scan / jnp.maximum(w_scan.sum(-1, keepdims=True), 1e-12)
        scan_corr_list = jnp.einsum(
            "bfg,bg->bf", corr_s_red * sc_mask[:, None, :], w_scan
        )
        # reference zeroes BOTH scan correlations below 3 valid fragments
        # (fragment_features.py:440-441)
        scan_ok = sc_mask.sum(axis=1) >= 3  # [B]
        feat[29] = (
            jnp.where(scan_ok, masked_mean(scan_corr_list, sc_mask), 0.0)
        )

        # 30: fragment-template scan correlation
        t_corr_s = masked_corrcoef(
            frag_scan,
            jnp.broadcast_to(template_scan[:, None, :, :], frag_scan.shape),
            jnp.broadcast_to(smask[:, None, None, :], frag_scan.shape),
        )  # [B, KF, O2]
        t_red_s = (t_corr_s * obs_imp[:, None, :]).sum(-1)
        feat[30] = (
            jnp.where(scan_ok, (t_red_s * w_scan).sum(-1), 0.0)
        )

        # 39: mobility FWHM (fraction above half max x mobility extent)
        smax = frag_scan.max(axis=-1, keepdims=True)
        frac_s = (
            ((frag_scan > 0.5 * smax) & smask[:, None, None, :]).sum(-1).astype(f32)
            / cnt[:, None, None]
        )
        mf_red = (frac_s * mobility_width[:, None, None] * obs_imp[:, None, :]).sum(-1)
        # normalized-intensity weighting (reference profile_features.py:186)
        feat[39] = ((mf_red * intensity_norm).sum(-1))

        # observed mobility: scan center of mass of the summed fragment
        # profile (bin units; the driver maps bins -> mobility values)
        total_scan = (frag_scan * fmask[:, :, None, None]).sum(axis=(1, 2))  # [B, S]
        bins_c = jnp.arange(S, dtype=f32)[None, :] + 0.5
        tmass = total_scan.sum(-1)
        scan_com = jnp.where(
            tmass > 0, (total_scan * bins_c).sum(-1) / jnp.maximum(tmass, 1e-9), 0.0
        )

    # ---- cycle FWHM ---------------------------------------------------
    # fraction-above-half-max is over the CANDIDATE's own profile length
    # (reference profile_features.py:133-139 divides by len(profile) where
    # the dense profile spans frame_start..frame_stop) — never the padded
    # batch window W, which would make the feature depend on batch geometry
    half_max = frame_profile.max(axis=-1, keepdims=True) * 0.5
    cand_len = jnp.maximum(wmask.sum(axis=-1).astype(f32), 1.0)  # [B]
    frac_above = (
        (frame_profile > half_max).sum(axis=-1).astype(f32)
        / cand_len[:, None, None]
    )
    rt_width = (rt_stop - rt_start)[:, None, None]
    cycle_fwhm = frac_above * rt_width  # [B, KF, O2]
    fwhm_red = (cycle_fwhm * obs_imp[:, None, :]).sum(axis=-1)
    # normalized-intensity weighting (reference profile_features.py:144)
    feat[38] = ((fwhm_red * intensity_norm).sum(axis=1))

    # ---- delta frame peak --------------------------------------------
    # reference (profile_features.py:193-204): argmax over the candidate's
    # OWN dense profile [frame_start, frame_stop), minus floor(len/2) — the
    # midpoint of the candidate extent, NOT the window apex. Mask the
    # padded window so cycles outside the extent can never win the argmax.
    peak_pos = jnp.argmax(
        jnp.where(wmask[:, None, None, :], frame_profile, -1.0), axis=-1
    ).astype(f32)  # [B, KF, O2]
    med_peak = masked_median(
        peak_pos, fmask[:, :, None] & obs_valid[:, None, :], axis=1
    )  # [B, O2]
    ext_center = (
        (frame_start - cycle_start).astype(f32)
        + jnp.floor((frame_stop - frame_start).astype(f32) / 2.0)
    )  # [B] candidate midpoint in window coordinates
    feat[40] = (
        ((med_peak - ext_center[:, None]) * obs_imp).sum(axis=-1)
    )

    # ---- MS2 mass errors ---------------------------------------------
    # delta-space ppm (full f32 precision); a never-observed fragment keeps
    # the reference's (0 - mz)/mz = -1e6 ppm sentinel
    mass_error = jnp.where(
        has_obs,
        observed_dmz / jnp.maximum(frag_mz, 1e-6) * 1e6,
        -1e6,
    )
    feat[41] = (
        topk_mean_by(mass_error, frag_intensity, fmask, 3)
    )
    feat[42] = (masked_mean(mass_error, fmask))

    # ---- overlapping b/y series --------------------------------------
    big = jnp.int32(10_000)
    pos = frag_position
    has_b = (fmask & is_b).any(axis=1)
    has_y = (fmask & is_y).any(axis=1)
    min_y = jnp.where(fmask & is_y, pos, big).min(axis=1)  # [B]
    max_b = jnp.where(fmask & is_b, pos, -big).max(axis=1)
    overlapping = fmask & (
        (is_y & (pos < max_b[:, None])) | (is_b & (pos > min_y[:, None]))
    )
    overlapping = overlapping & has_b[:, None] & has_y[:, None]
    n_over = overlapping.sum(axis=1).astype(f32)
    feat[43] = (n_over)
    feat[44] = (
        jnp.where(n_over > 0, masked_mean(fragment_area_norm, overlapping), 0.0)
    )
    feat[45] = (
        jnp.where(
            n_over > 0,
            masked_mean(mass_error, overlapping),
            jnp.where(has_b & has_y, 15.0, 0.0),
        )
    )

    valid = n_valid >= 2

    fragment_out = {
        "mz_observed": jnp.where(has_obs, frag_mz + observed_dmz, 0.0),
        "mass_error": mass_error,
        "height": observed_height,
        "intensity": fragment_area_norm,
        "correlation": frame_corr,
        "valid": fmask,
        "obs_intensity": obs_raw_sum,
        "scan_com": scan_com,
    }
    features = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(feat.get(i, 0.0), f32), (B,))
            for i in range(NUM_FEATURES)
        ],
        axis=1,
    )
    return features, valid, fragment_out


# transport precision classes (indices into FEATURE_COLUMNS order):
# f32 = calibration-grade observables (rt_observed, mobility_observed,
# mz_observed); bf16 = raw MS1 intensity sums (need range, not precision)
_F32_FEATURES = (2, 3, 10)
_BF16_FEATURES = (4, 5, 6, 7, 11, 12, 13, 14, 44)


def _feature_precision_classes(n_features: int):
    f32_idx = [i for i in _F32_FEATURES if i < n_features]
    bf16_idx = [i for i in _BF16_FEATURES if i < n_features]
    other = set(f32_idx) | set(bf16_idx)
    f16_idx = [i for i in range(n_features) if i not in other]
    return f32_idx, bf16_idx, f16_idx


def pack_scoring_output(features, valid, frag_out, with_quant: bool = True):
    """Pack the whole per-batch scoring output into ONE uint16 [B, C] buffer.

    ``with_quant=False`` is the optimization-iteration transport: the quant
    arrays (per-fragment height/intensity) are not consumed by the
    calibration/optimization loop (it needs mass_error + correlation for
    the fragment calibration filter, obs_intensity for quadrupole fitting,
    scan_com for mobility), so they are dropped from the download and the
    "observed" gate (height > 0) is folded into the valid bitmask — ~23%
    fewer bytes per iteration through the tunnel.

    On the remote-TPU tunnel every device->host materialization costs a
    ~50 ms round trip; downloading features + 8 fragment arrays separately
    made transfers dominate the scoring phase (profiled: 1.45 s of 1.62 s).
    One packed buffer per batch = one download.  16-bit-safe quantities are
    downcast (mass_error/correlation -> f16, height/intensity/obs sums ->
    bf16 for range); precision-critical ones (the 46 features, scan_com)
    stay f32 via bitcast.  ``mz_observed`` is NOT shipped — the host
    reconstructs it exactly from mass_error and the library m/z.

    Features travel in three precision classes (transport only — the
    kernel computes in f32 either way): calibration-grade observables
    (rt/mobility/mz observed) stay f32; raw MS1 intensity sums go bf16
    (range over precision); everything else (correlations, fractions,
    ppm errors, counts, log-intensities) goes f16 (~5e-4 relative, far
    below classifier sensitivity). Cuts the per-batch download ~27%.

    Layout (uint16 columns): [features f32x2/bf16/f16 by class | valid
    u16 | frag-valid bitmask u16 x ceil(KF/16) | mass_error f16 |
    correlation f16 | height bf16 | intensity bf16 | obs_intensity bf16
    | scan_com f32 x2].
    """
    B, KF = frag_out["mass_error"].shape
    u16 = jnp.uint16

    def bc(a):  # bitcast keeping B rows
        return jax.lax.bitcast_convert_type(a, u16).reshape(B, -1)

    # KF valid bits packed 16 per u16 word (transfer-requant scores the
    # full fragment space, so KF can be well above 16)
    from alphadia_tpu.ops.packing import pack_bits_jnp

    fvalid = frag_out["valid"]
    if not with_quant:
        # no height downloaded: pre-apply the observed gate to the bits
        fvalid = fvalid & (frag_out["height"] > 0)
    fvbits = pack_bits_jnp(fvalid)
    me = jnp.clip(frag_out["mass_error"], -2000.0, 2000.0)
    f32_idx, bf16_idx, f16_idx = _feature_precision_classes(features.shape[1])
    cols = [
        bc(features[:, f32_idx].astype(jnp.float32)),
        bc(features[:, bf16_idx].astype(jnp.bfloat16)),
        bc(jnp.clip(features[:, f16_idx], -65504.0, 65504.0).astype(jnp.float16)),
        valid.astype(u16)[:, None],
        fvbits,
        bc(me.astype(jnp.float16)),
        bc(frag_out["correlation"].astype(jnp.float16)),
    ]
    if with_quant:
        cols += [
            bc(frag_out["height"].astype(jnp.bfloat16)),
            bc(frag_out["intensity"].astype(jnp.bfloat16)),
        ]
    cols += [
        bc(frag_out["obs_intensity"].astype(jnp.bfloat16)),
        bc(frag_out["scan_com"][:, None].astype(jnp.float32)),
    ]
    return jnp.concatenate(cols, axis=1)


def unpack_scoring_output(
    packed,
    KF: int,
    O2: int,
    n_features: int | None = None,
    with_quant: bool = True,
):
    """Host-side inverse of :func:`pack_scoring_output` (numpy).

    Returns ``(features f32[B,F], valid bool[B], frag_out dict)`` with the
    same keys the unpacked kernel path produces except ``mz_observed``
    (reconstructed by the driver from mass_error x library m/z). With
    ``with_quant=False`` the valid bits already carry the observed gate;
    height is synthesized as 0/1 so ``height > 0`` gating keeps working
    and intensity is zero.
    """
    import ml_dtypes
    import numpy as np

    F = n_features if n_features is not None else NUM_FEATURES
    p = np.ascontiguousarray(packed)
    o = 0

    def take(n, dtype=None):
        nonlocal o
        sl = np.ascontiguousarray(p[:, o : o + n])
        o += n
        return sl if dtype is None else sl.view(dtype)

    f32_idx, bf16_idx, f16_idx = _feature_precision_classes(F)
    features = np.empty((len(p), F), dtype=np.float32)
    features[:, f32_idx] = take(2 * len(f32_idx), np.float32)
    features[:, bf16_idx] = take(len(bf16_idx), ml_dtypes.bfloat16).astype(
        np.float32
    )
    features[:, f16_idx] = take(len(f16_idx), np.float16).astype(np.float32)
    from alphadia_tpu.ops.packing import unpack_bits_np

    valid = take(1)[:, 0].astype(bool)
    n_words = (KF + 15) // 16
    fmask = unpack_bits_np(take(n_words), KF)
    frag_out = {
        "valid": fmask,
        "mass_error": take(KF, np.float16).astype(np.float32),
        "correlation": take(KF, np.float16).astype(np.float32),
    }
    if with_quant:
        frag_out["height"] = take(KF, ml_dtypes.bfloat16).astype(np.float32)
        frag_out["intensity"] = take(KF, ml_dtypes.bfloat16).astype(np.float32)
    else:
        frag_out["height"] = fmask.astype(np.float32)
        frag_out["intensity"] = np.zeros_like(frag_out["height"])
    frag_out["obs_intensity"] = take(O2, ml_dtypes.bfloat16).astype(np.float32)
    frag_out["scan_com"] = take(2, np.float32)[:, 0]
    if o != p.shape[1]:  # KF/O2/with_quant skew between packer and unpacker
        raise ValueError(
            f"packed scoring buffer has {p.shape[1]} u16 columns, unpack "
            f"layout consumed {o} (KF={KF}, O2={O2}, with_quant={with_quant})"
        )
    return features, valid, frag_out


@partial(
    jax.jit,
    static_argnames=(
        "n_cycles",
        "n_bins",
        "n_scan_bins",
        "slab",
        "window_len",
        "quant_window",
        "quant_all",
        "experimental_xic",
        "use_pallas",
        "compute_dtype",
        "transport_quant",
    ),
)
def score_candidates_batch_packed(*args, transport_quant: bool = True, **static_kw):
    """Mesh-path variant: run the scoring kernel and return the single
    packed buffer as byte planes (one compressible device->host download
    per batch; see :func:`alphadia_tpu.ops.packing.wire_encode_jnp`)."""
    from alphadia_tpu.ops.packing import wire_encode_jnp

    features, valid, frag_out = score_candidates_batch(*args, **static_kw)
    return wire_encode_jnp(
        pack_scoring_output(features, valid, frag_out, with_quant=transport_quant)
    )


@partial(
    jax.jit,
    static_argnames=(
        "bsz",
        "pack_output",
        "transport_quant",
        "n_cycles",
        "n_bins",
        "n_scan_bins",
        "slab",
        "window_len",
        "quant_window",
        "quant_all",
        "experimental_xic",
        "use_pallas",
        "compute_dtype",
    ),
)
def score_candidates_batch_sliced(
    peak_mz, peak_intensity, peak_packed, peak_scanbin,
    cell_start, cycle_rt,
    frag_mz_full, frag_valid_full, frag_intensity_full, frag_type_full,
    frag_position_full, iso_mz_full, iso_intensity_full,
    ms2_slot_full, ms1_slot_full, win_lo_full, win_hi_full,
    quad_sigma, quad_delta_mu,
    frame_center_full, frame_start_full, frame_stop_full,
    scan_lo_full, scan_hi_full, mobility_width_full,
    b0,  # i32 scalar batch offset
    fragment_tol_ppm, precursor_tol_ppm,
    *, bsz: int, pack_output: bool = False, transport_quant: bool = True,
    **static_kw,
):
    """One dispatch per batch: slice the uploaded full candidate arrays on
    device and run the scoring kernel (a host-side eager slice per input
    array costs a dispatch round-trip each on the remote-TPU tunnel).
    With ``pack_output`` the whole result comes back as one buffer of
    uint8 byte planes [itemsize, cols, batch] (one download per batch —
    see :func:`pack_scoring_output` + ``wire_encode_jnp``; the host side
    decodes with ``wire_decode_np``)."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b0, bsz)  # noqa: E731
    out = score_candidates_batch(
        peak_mz, peak_intensity, peak_packed, peak_scanbin,
        cell_start, cycle_rt,
        sl(frag_mz_full), sl(frag_valid_full), sl(frag_intensity_full),
        sl(frag_type_full), sl(frag_position_full), sl(iso_mz_full),
        sl(iso_intensity_full), sl(ms2_slot_full), sl(ms1_slot_full),
        sl(win_lo_full), sl(win_hi_full),
        quad_sigma, quad_delta_mu,
        sl(frame_center_full), sl(frame_start_full), sl(frame_stop_full),
        sl(scan_lo_full), sl(scan_hi_full), sl(mobility_width_full),
        fragment_tol_ppm, precursor_tol_ppm,
        **static_kw,
    )
    if pack_output:
        from alphadia_tpu.ops.packing import wire_encode_jnp

        return wire_encode_jnp(
            pack_scoring_output(*out, with_quant=transport_quant)
        )
    return out


@partial(
    jax.jit,
    static_argnames=(
        "bsz",
        "pack_output",
        "transport_quant",
        "n_cycles",
        "n_bins",
        "n_scan_bins",
        "slab",
        "window_len",
        "quant_window",
        "quant_all",
        "experimental_xic",
        "use_pallas",
        "compute_dtype",
    ),
)
def score_candidates_batch_lib(
    peak_mz, peak_intensity, peak_packed, peak_scanbin,
    cell_start, cycle_rt,
    # per-PRECURSOR library SoA [n_prec, ...] (wire-compact dtypes ok)
    lib_frag_mz, lib_frag_valid, lib_frag_intensity, lib_frag_type,
    lib_frag_position, lib_iso_mz, lib_iso_intensity,
    lib_ms2_slot, lib_ms1_slot, lib_win_lo, lib_win_hi,
    quad_sigma, quad_delta_mu,
    # per-CANDIDATE geometry [n_cand_padded] (sliced by b0 on device)
    rows_full, frame_center_full, frame_start_full, frame_stop_full,
    scan_lo_full, scan_hi_full, mobility_width_full,
    b0,  # i32 scalar batch offset
    fragment_tol_ppm, precursor_tol_ppm,
    *, bsz: int, pack_output: bool = True, transport_quant: bool = True,
    **static_kw,
):
    """Library-indexed batch: the per-candidate upload is just (precursor
    row, elution window geometry); the fragment/isotope/slot SoA lives on
    device per PRECURSOR and is gathered here by row index. Candidates
    duplicate precursors ~2-3x, so this cuts host->device bytes ~3x vs
    shipping per-candidate copies, and moves the expansion gather onto
    the device (reference keeps per-candidate containers host-side:
    alphadia/search/scoring/scoring.py:171-234)."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b0, bsz)  # noqa: E731
    rows = sl(rows_full).astype(jnp.int32)
    g = lambda a: jnp.take(a, rows, axis=0)  # noqa: E731
    out = score_candidates_batch(
        peak_mz, peak_intensity, peak_packed, peak_scanbin,
        cell_start, cycle_rt,
        g(lib_frag_mz), g(lib_frag_valid), g(lib_frag_intensity),
        g(lib_frag_type), g(lib_frag_position), g(lib_iso_mz),
        g(lib_iso_intensity), g(lib_ms2_slot), g(lib_ms1_slot),
        g(lib_win_lo), g(lib_win_hi),
        quad_sigma, quad_delta_mu,
        sl(frame_center_full), sl(frame_start_full), sl(frame_stop_full),
        sl(scan_lo_full), sl(scan_hi_full), sl(mobility_width_full),
        fragment_tol_ppm, precursor_tol_ppm,
        **static_kw,
    )
    if pack_output:
        from alphadia_tpu.ops.packing import wire_encode_jnp

        return wire_encode_jnp(
            pack_scoring_output(*out, with_quant=transport_quant)
        )
    return out
