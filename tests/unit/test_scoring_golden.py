"""Golden-value tests: every scoring feature checked against expectations
derived independently in plain numpy from the reference formulas
(reference: alphadia/search/scoring/features/fragment_features.py:199-428,
precursor_features.py:14-102, location_features.py, profile_features.py;
feature order = DEFAULT_FEATURE_COLUMNS in scoring.py:34-81).

The fixture is a fully hand-constructed run: one precursor (m/z 450.2,
charge 2, 3 isotopes at +3 ppm) and four fragments (two observed b/y at
+5 ppm, one off-center bump, one absent), placed on known cycle profiles.
Every expectation below is computed from those hand-placed numbers with
straight numpy loops — never by calling the kernel helpers.
"""

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.constants.settings import MASS_NEUTRON_AVG
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.rawdata.source import SpectrumData
from alphadia_tpu.search.scoring import (
    FEATURE_COLUMNS,
    CandidateScoring,
    ScoringConfig,
)

# ---------------------------------------------------------------------------
# hand-constructed scenario
# ---------------------------------------------------------------------------
N_CYCLES = 16
W = 16  # bucket_window(2*6+1) -> 16
C = W // 2  # static apex index (8)
FRAME_CENTER, FRAME_START, FRAME_STOP = 8, 2, 14

MONO_MZ = 450.2
CHARGE = 2
ISO_LIB = np.array([1.0, 0.6, 0.3], np.float32)  # library isotope envelope
ISO_OBS = np.array([1.0, 0.55, 0.25], np.float32)  # observed scaling
MS1_PPM = 3.0
MS2_PPM = 5.0
WIN_LO, WIN_HI = 400.0, 500.0

# fragments: (mz, library intensity, type 98=b / 121=y, position)
FRAGS = [
    (420.10, 1.0, 98, 4),  # f0: observed, unimodal
    (460.20, 0.8, 121, 3),  # f1: observed, unimodal
    (480.30, 0.5, 121, 6),  # f2: only off-center bumps (envelope kills quant)
    (430.40, 0.3, 98, 2),  # f3: never observed
]

# per-cycle profiles over absolute cycles 0..15 (zero elsewhere)
PROF = np.zeros((4, N_CYCLES), np.float32)
PROF[0, 4:13] = np.array([1, 2, 4, 8, 17, 8, 4, 2, 1], np.float32) * 100
PROF[1, 4:13] = np.array([1, 3, 5, 9, 15, 9, 5, 3, 1], np.float32) * 80
PROF[2, 4] = 540.0
PROF[2, 12] = 540.0
MS1_PROF = np.zeros(N_CYCLES, np.float32)
MS1_PROF[4:13] = np.array([2, 4, 7, 12, 18, 12, 7, 4, 2], np.float32) * 50

ISO_MZ = MONO_MZ + np.arange(3) * MASS_NEUTRON_AVG / CHARGE


def _build_spectra() -> SpectrumData:
    rt, ms, lo, hi, starts, stops, mzs, ints = [], [], [], [], [], [], [], []
    for c in range(N_CYCLES):
        # MS1 spectrum
        rt.append(c * 1.0)
        ms.append(1)
        lo.append(-1.0)
        hi.append(-1.0)
        starts.append(sum(len(m) for m in mzs))
        pk = [
            (float(m * (1 + MS1_PPM * 1e-6)), float(MS1_PROF[c] * a))
            for m, a in zip(ISO_MZ, ISO_OBS)
            if MS1_PROF[c] > 0
        ]
        pk.sort()
        mzs.append([p[0] for p in pk])
        ints.append([p[1] for p in pk])
        stops.append(starts[-1] + len(pk))
        # MS2 spectrum
        rt.append(c * 1.0 + 0.5)
        ms.append(2)
        lo.append(WIN_LO)
        hi.append(WIN_HI)
        starts.append(sum(len(m) for m in mzs))
        pk = [
            (float(fmz * (1 + MS2_PPM * 1e-6)), float(PROF[f, c]))
            for f, (fmz, _, _, _) in enumerate(FRAGS)
            if PROF[f, c] > 0
        ]
        pk.sort()
        mzs.append([p[0] for p in pk])
        ints.append([p[1] for p in pk])
        stops.append(starts[-1] + len(pk))
    flat_mz = np.array([m for s in mzs for m in s], np.float32)
    flat_int = np.array([i for s in ints for i in s], np.float32)
    return SpectrumData(
        rt=np.array(rt, np.float32),
        ms_level=np.array(ms, np.uint8),
        isolation_lower_mz=np.array(lo, np.float32),
        isolation_upper_mz=np.array(hi, np.float32),
        peak_start_idx=np.array(starts, np.int64),
        peak_stop_idx=np.array(stops, np.int64),
        mz=flat_mz,
        intensity=flat_int,
    )


def _library_frames():
    """The golden precursor/fragment/candidate frames (shared with the
    bf16-path gates in test_scoring_bf16.py)."""
    prec = pd.DataFrame(
        {
            "precursor_idx": [7],
            "charge": [CHARGE],
            "mz_library": [MONO_MZ],
            "rt_library": [8.0],
            "flat_frag_start_idx": [0],
            "flat_frag_stop_idx": [len(FRAGS)],
            "i_0": [ISO_LIB[0]],
            "i_1": [ISO_LIB[1]],
            "i_2": [ISO_LIB[2]],
        }
    )
    frag = pd.DataFrame(
        {
            "mz_library": [f[0] for f in FRAGS],
            "intensity": [f[1] for f in FRAGS],
            "type": [f[2] for f in FRAGS],
            "position": [f[3] for f in FRAGS],
            "number": [1, 2, 3, 4],
            "charge": [1, 1, 1, 1],
            "loss_type": [0, 0, 0, 0],
            "cardinality": [1, 1, 1, 1],
        }
    )
    cand = pd.DataFrame(
        {
            "precursor_idx": [7],
            "rank": [0],
            "score": [1.0],
            "frame_center": [FRAME_CENTER],
            "frame_start": [FRAME_START],
            "frame_stop": [FRAME_STOP],
        }
    )
    return prec, frag, cand


def golden_config(**kw) -> ScoringConfig:
    return ScoringConfig(
        top_k_fragments=4,
        top_k_isotopes=3,
        quant_window=3,
        quant_all=True,
        collect_fragments=True,
        **kw,
    )


@pytest.fixture(scope="module")
def scored():
    dia = DiaData.from_spectra(_build_spectra())
    prec, frag, cand = _library_frames()
    psm, frag_df = CandidateScoring(dia, prec, frag, golden_config())(cand)
    assert len(psm) == 1
    return psm.iloc[0], frag_df


# ---------------------------------------------------------------------------
# independent numpy derivation
# ---------------------------------------------------------------------------
def _pearson(x, y):
    xc = x - x.mean()
    yc = y - y.mean()
    den = np.sqrt((xc**2).sum() * (yc**2).sum())
    return float((xc * yc).sum() / den) if den > 0 else 0.0


def _center_envelope(x, center):
    """Walk outward from the apex, capping each value by the running mean of
    the two inner neighbours (interference suppression)."""
    out = x.astype(np.float64).copy()
    w = len(out)
    left = (out[center - 1] + out[center]) / 2
    right = (out[center + 1] + out[center]) / 2
    for i in range(1, center + 1):
        li, ri = center - i, center + i
        if li < 0 or ri >= w:
            break
        out[li] = min(left, out[li])
        left = (out[li] + out[li + 1]) / 2
        out[ri] = min(right, out[ri])
        right = (out[ri] + out[ri - 1]) / 2
    return out


def _expected():
    """Full expected feature map, computed from the hand-placed numbers."""
    e = {}
    lib_int = np.array([f[1] for f in FRAGS], np.float64)
    wmask = np.zeros(W, bool)
    wmask[FRAME_START:FRAME_STOP] = True
    prof = PROF.astype(np.float64) * wmask  # [4, W] (window == cycles 0..15)
    ms1 = MS1_PROF.astype(np.float64) * wmask

    # quad transmission is exactly 1 for every isotope (450 vs [400, 500]
    # edges with sigma 0.2); single valid MS2 observation -> importance 1
    fmask = np.array([True, True, True, False])
    n_valid = 3

    e["f_masked"] = n_valid / 4.0
    cycle_rt = np.arange(N_CYCLES, dtype=np.float64)
    # exclusive stop: full candidate span (kernel matches the reference's
    # spectrum-granularity rt_values[stop-1]-rt_values[start] to within
    # cycle_time/n_slots)
    e["base_width_rt"] = cycle_rt[FRAME_STOP] - cycle_rt[FRAME_START]
    e["rt_observed"] = cycle_rt[FRAME_CENTER]
    e["mobility_observed"] = 1e-6
    e["base_width_mobility"] = 0.0

    # --- precursor features ---
    iso_obs_sum = np.array([ms1.sum() * a for a in ISO_OBS])  # per isotope
    e["mono_ms1_intensity"] = iso_obs_sum[0]
    e["top_ms1_intensity"] = iso_obs_sum[0]  # argmax(ISO_LIB) == 0
    e["sum_ms1_intensity"] = iso_obs_sum.sum()
    e["weighted_ms1_intensity"] = (iso_obs_sum * ISO_LIB.astype(np.float64)).sum()
    # reference obs-merge divides the m/z plane by (count + 1e-6): at one
    # MS1 observation per cycle that is a -1 ppm shift on every isotope
    e["weighted_mass_deviation"] = (
        (MS1_PPM - 1.0) / (1.0 + 1e-6) * ISO_LIB.astype(np.float64).sum()
    )
    e["weighted_mass_error"] = abs(e["weighted_mass_deviation"])
    e["mz_observed"] = ISO_MZ[0] + e["weighted_mass_deviation"] * 1e-6 * ISO_MZ[0]

    # reference weighted_center_mean: the dummy 2-row scan dim and the
    # tile(shape) centers put the weight at sqrt((s-2)^2 + (f-f*)^2) for
    # s in {0,1} with f* = window-frame 1 = buffer FRAME_START + 1
    frames = np.arange(W, dtype=np.float64)
    d = frames - (FRAME_START + 1)
    wref = np.exp(-0.1 * np.sqrt(4.0 + d**2)) + np.exp(-0.1 * np.sqrt(1.0 + d**2))
    wts = wref * (ms1 > 0)
    ms1_h = (ms1 * wts).sum() / wts.sum()
    iso_h = np.array([ms1_h * a for a in ISO_OBS])
    e["mono_ms1_height"] = iso_h[0]
    e["top_ms1_height"] = iso_h[0]
    e["sum_ms1_height"] = iso_h.sum()
    e["weighted_ms1_height"] = (iso_h * ISO_LIB.astype(np.float64)).sum()
    e["isotope_intensity_correlation"] = _pearson(
        ISO_LIB.astype(np.float64), iso_obs_sum
    )
    e["isotope_height_correlation"] = _pearson(ISO_LIB.astype(np.float64), iso_h)
    e["n_observations"] = 1.0

    # --- quant (trapezoid over the envelope-corrected +-3-cycle window) ---
    env = np.stack([_center_envelope(prof[f], C) for f in range(4)])
    qlo, qhi = C - 3, C + 4
    prof_q = env[:, qlo:qhi]
    frag_area = np.array(
        [np.trapz(prof_q[f], dx=1.0) * 3 for f in range(4)]
    )  # 'intensity' = trapezoid * quant half-window
    obs_int = prof_q.sum(axis=1)

    int_norm = np.where(fmask, lib_int, 0.0)
    int_norm = int_norm / int_norm.sum()
    int_nz = (obs_int > 0) & fmask  # f2's bumps die in the envelope
    e["intensity_correlation"] = _pearson(frag_area[fmask], int_norm[fmask])

    # observed height: exp-weighted mean at the template center of mass (C);
    # the dummy scan rows contribute sqrt(0.25 + d^2) twice (constant 2x
    # cancels in the mean)
    wfrag = np.exp(-0.1 * np.sqrt(0.25 + (frames - C) ** 2))
    o_height = np.array(
        [
            (prof[f] * wfrag * (prof[f] > 0)).sum()
            / max((wfrag * (prof[f] > 0)).sum(), 1e-12)
            for f in range(4)
        ]
    )
    h_nz = (o_height > 0) & fmask
    e["height_correlation"] = _pearson(o_height[fmask], int_norm[fmask])
    e["intensity_fraction"] = int_nz.sum() / n_valid
    e["height_fraction"] = h_nz.sum() / n_valid
    e["intensity_fraction_weighted"] = (int_norm * int_nz).sum()
    e["height_fraction_weighted"] = (int_norm * h_nz).sum()

    # cosine(per-obs fragment sum, per-obs template sum): single obs -> 1
    # for every fragment with signal, averaged over int_nz fragments
    e["mean_observation_score"] = 1.0

    is_b = np.array([f[2] == 98 for f in FRAGS])
    is_y = ~is_b
    e["sum_b_ion_intensity"] = np.log1p((obs_int * (is_b & fmask)).sum())
    e["sum_y_ion_intensity"] = np.log1p((obs_int * (is_y & fmask)).sum())
    e["diff_b_y_ion_intensity"] = (
        e["sum_b_ion_intensity"] - e["sum_y_ion_intensity"]
    )

    # --- frame correlations (experimental XIC: median reference profile) ---
    # reference convention: profiles are center±1-mean normalized
    # (scoring_utils.py normalize_profiles) and correlations run over the
    # candidate window only (dense profiles span frame_start..frame_stop)
    cand = slice(FRAME_START, FRAME_STOP)
    center_int = prof[:, FRAME_CENTER - 1 : FRAME_CENTER + 2].mean(
        axis=1, keepdims=True
    )
    norm_prof = np.where(center_int > 0, prof / np.maximum(center_int, 1e-12), 0.0)
    med = np.zeros(W)
    for w in range(W):
        if wmask[w]:
            med[w] = np.median(norm_prof[fmask, w])
    frame_corr = np.array([_pearson(med[cand], prof[f][cand]) for f in range(4)])
    e["fragment_frame_correlation"] = frame_corr[fmask].mean()
    top3 = np.argsort(-np.where(fmask, lib_int, -np.inf))[:3]
    e["top3_frame_correlation"] = frame_corr[top3].mean()

    # template profile = ms1 * sum(iso_lib * iso_obs); correlated per fragment
    template = ms1 * (ISO_LIB.astype(np.float64) * ISO_OBS).sum()
    tf_corr = np.array([_pearson(prof[f][cand], template[cand]) for f in range(4)])
    # weighted by NORMALIZED library intensity (reference
    # profile_features.py:84; verified against the reference function in
    # tests/parity)
    int_norm_all = np.where(fmask, lib_int, 0.0) / lib_int[fmask].sum()
    e["template_frame_correlation"] = (tf_corr * int_norm_all).sum()

    e["top3_b_ion_correlation"] = frame_corr[0]  # only f0 is a valid b ion
    e["n_b_ions"] = 1.0
    e["top3_y_ion_correlation"] = frame_corr[[1, 2]].mean()
    e["n_y_ions"] = 2.0

    # scan features: identically zero on 3D data
    e["fragment_scan_correlation"] = 0.0
    e["template_scan_correlation"] = 0.0
    e["mobility_fwhm"] = 0.0

    # --- FWHM / peak-position features ---
    rt_width = e["base_width_rt"]
    # fraction over the candidate's own window length (not the padded W)
    cand_len = FRAME_STOP - FRAME_START
    frac = (prof > 0.5 * prof.max(axis=1, keepdims=True)).sum(axis=1) / cand_len
    e["cycle_fwhm"] = (frac * rt_width * int_norm_all).sum()
    # all observed apexes sit at cycle 8 == C -> median displacement 0
    e["delta_frame_peak"] = 0.0

    # --- mass errors ---
    e["top_3_ms2_mass_error"] = MS2_PPM  # top-3 by library intensity, all +5
    e["mean_ms2_mass_error"] = MS2_PPM
    # y3 (pos 3 < max_b 4) and b4 (pos 4 > min_y 3) overlap
    e["n_overlapping"] = 2.0
    e["mean_overlapping_intensity"] = frag_area[[0, 1]].mean()
    e["mean_overlapping_mass_error"] = MS2_PPM
    return e


EXPECTED = _expected()

# tolerance per feature: correlations/means of f32 accumulations get looser
_TOL = {name: 2e-3 for name in FEATURE_COLUMNS}
for k in (
    "weighted_mass_deviation",
    "weighted_mass_error",
    "top_3_ms2_mass_error",
    "mean_ms2_mass_error",
    "mean_overlapping_mass_error",
):
    _TOL[k] = 0.2  # ppm: f32 m/z quantization wobble ~0.07 ppm at 450 Th
_TOL["mz_observed"] = 1e-3
# raw MS1 intensity sums travel bf16 in the packed transport (8-bit
# mantissa -> 1/256 rounding; ops/scoring.py _BF16_FEATURES)
from alphadia_tpu.ops.scoring import _BF16_FEATURES  # noqa: E402

for i in _BF16_FEATURES:
    _TOL[FEATURE_COLUMNS[i]] = max(_TOL[FEATURE_COLUMNS[i]], 1 / 128)


@pytest.mark.parametrize("name", FEATURE_COLUMNS)
def test_feature_golden(scored, name):
    psm, _ = scored
    got = float(psm[name])
    want = float(EXPECTED[name])
    scale = max(abs(want), 1.0)
    assert abs(got - want) <= _TOL[name] * scale, (
        f"{name}: got {got}, want {want}"
    )


def test_fragment_frame_golden(scored):
    _, frag_df = scored
    # f3 never observed; f0-f2 present
    assert len(frag_df) == 3
    f = frag_df.sort_values("mz").reset_index(drop=True)
    np.testing.assert_allclose(f["mz"], [420.10, 460.20, 480.30], rtol=1e-6)
    # +5 ppm observed mass shift survives the f16-packed transfer
    ppm = (f["mz_observed"] - f["mz"]) / f["mz"] * 1e6
    np.testing.assert_allclose(ppm, MS2_PPM, atol=0.2)
    # envelope-corrected trapezoid areas (bf16 transfer: ~0.5% tolerance)
    env = np.stack([_center_envelope(PROF[i].astype(np.float64), C) for i in range(3)])
    areas = [np.trapz(env[i, C - 3 : C + 4], dx=1.0) * 3 for i in range(3)]
    np.testing.assert_allclose(f["intensity"], areas, rtol=0.01, atol=1e-3)
