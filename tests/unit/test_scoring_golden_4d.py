"""Golden-value tests for the 4D (ion mobility) scan features.

Hand-constructed mobility run: every fragment/isotope peak is split over
scan bins 1 and 2 with a fixed 0.6/0.4 ratio, so the in-kernel scan
features have exact expectations (reference:
profile_features.py:19-204 mobility FWHM + scan correlations,
fragment_features.py:430-480).
"""

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.constants.settings import MASS_NEUTRON_AVG
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.rawdata.source import SpectrumData
from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig

N_CYCLES = 16
MONO_MZ = 450.2
CHARGE = 2
WIN_LO, WIN_HI = 400.0, 500.0
S = 4  # scan bins
MOB_MIN, MOB_MAX = 0.7, 1.3
# mobilities that land exactly in bins 1 and 2, with a 0.6/0.4 split
MOB_BIN1, MOB_BIN2 = 0.925, 1.075
SPLIT = (0.6, 0.4)

# fragments: (mz, library intensity, type, position); f2 never observed
FRAGS = [(420.10, 1.0, 98, 4), (460.20, 0.8, 121, 3), (430.40, 0.3, 98, 2)]
PROF = np.zeros((3, N_CYCLES), np.float32)
PROF[0, 4:13] = np.array([1, 2, 4, 8, 17, 8, 4, 2, 1], np.float32) * 100
PROF[1, 4:13] = np.array([1, 3, 5, 9, 15, 9, 5, 3, 1], np.float32) * 80
MS1_PROF = np.zeros(N_CYCLES, np.float32)
MS1_PROF[4:13] = np.array([2, 4, 7, 12, 18, 12, 7, 4, 2], np.float32) * 50
ISO_MZ = MONO_MZ + np.arange(3) * MASS_NEUTRON_AVG / CHARGE


def _build_spectra() -> SpectrumData:
    rt, ms, lo, hi, starts, stops = [], [], [], [], [], []
    mzs, ints, mobs = [], [], []

    def emit(spec_peaks):
        spec_peaks.sort()
        starts.append(sum(len(m) for m in mzs))
        mzs.append([p[0] for p in spec_peaks])
        ints.append([p[1] for p in spec_peaks])
        mobs.append([p[2] for p in spec_peaks])
        stops.append(starts[-1] + len(spec_peaks))

    for c in range(N_CYCLES):
        rt.append(c * 1.0)
        ms.append(1)
        lo.append(-1.0)
        hi.append(-1.0)
        pk = []
        if MS1_PROF[c] > 0:
            for m in ISO_MZ:
                for w, mob in zip(SPLIT, (MOB_BIN1, MOB_BIN2)):
                    pk.append((float(m), float(MS1_PROF[c] * w), mob))
        emit(pk)

        rt.append(c * 1.0 + 0.5)
        ms.append(2)
        lo.append(WIN_LO)
        hi.append(WIN_HI)
        pk = []
        if c == 0:  # mobility-range anchors far from any query window
            pk += [(900.0, 1.0, MOB_MIN), (901.0, 1.0, MOB_MAX)]
        for f, (fmz, _, _, _) in enumerate(FRAGS):
            if PROF[f, c] > 0:
                for w, mob in zip(SPLIT, (MOB_BIN1, MOB_BIN2)):
                    pk.append((float(fmz), float(PROF[f, c] * w), mob))
        emit(pk)

    return SpectrumData(
        rt=np.array(rt, np.float32),
        ms_level=np.array(ms, np.uint8),
        isolation_lower_mz=np.array(lo, np.float32),
        isolation_upper_mz=np.array(hi, np.float32),
        peak_start_idx=np.array(starts, np.int64),
        peak_stop_idx=np.array(stops, np.int64),
        mz=np.array([m for s_ in mzs for m in s_], np.float32),
        intensity=np.array([i for s_ in ints for i in s_], np.float32),
        mobility=np.array([m for s_ in mobs for m in s_], np.float32),
    )


@pytest.fixture(scope="module")
def scored_4d():
    dia = DiaData.from_spectra(_build_spectra(), n_scan_bins=S)
    assert dia.has_mobility and dia.n_scan_bins == S
    assert abs(dia.mobility_min - MOB_MIN) < 1e-6
    prec = pd.DataFrame(
        {
            "precursor_idx": [7],
            "charge": [CHARGE],
            "mz_library": [MONO_MZ],
            "rt_library": [8.0],
            "flat_frag_start_idx": [0],
            "flat_frag_stop_idx": [len(FRAGS)],
            "i_0": [1.0],
            "i_1": [0.6],
            "i_2": [0.3],
        }
    )
    frag = pd.DataFrame(
        {
            "mz_library": [f[0] for f in FRAGS],
            "intensity": [f[1] for f in FRAGS],
            "type": [f[2] for f in FRAGS],
            "position": [f[3] for f in FRAGS],
            "number": [1, 2, 3],
            "charge": [1, 1, 1],
            "loss_type": [0, 0, 0],
            "cardinality": [1, 1, 1],
        }
    )
    cand = pd.DataFrame(
        {
            "precursor_idx": [7],
            "rank": [0],
            "score": [1.0],
            "frame_center": [8],
            "frame_start": [2],
            "frame_stop": [14],
            "scan_center": [1],
            "scan_start": [0],
            "scan_stop": [S],
        }
    )
    psm, _ = CandidateScoring(
        dia, prec, frag, ScoringConfig(top_k_fragments=3, quant_window=3)
    )(cand)
    assert len(psm) == 1
    return psm.iloc[0]


# bin centers: 0.7 + (k + 0.5) * 0.15 -> width over [bin0, bin3] = 0.45
WIDTH = 0.45


def test_scan_correlations_golden(scored_4d):
    # only 2 of 3 fragments are observed: the reference zeroes both scan
    # correlations below 3 valid fragments (fragment_features.py:440-441)
    assert scored_4d["fragment_scan_correlation"] == pytest.approx(0.0, abs=1e-6)
    assert scored_4d["template_scan_correlation"] == pytest.approx(0.0, abs=1e-6)


def test_mobility_fwhm_golden(scored_4d):
    # scan profiles are or-enveloped first (reference candidate.py:344):
    # [0, .6G, .4G, 0] -> [0, .6G, .3G, 0]; half max .3G, strict '>' keeps
    # only 1 of 4 bins
    frac = 1 / S
    # normalized-intensity weights (1.0 + 0.8 over their sum)
    want = frac * WIDTH * 1.0
    assert scored_4d["mobility_fwhm"] == pytest.approx(want, rel=2e-3)


def test_observed_mobility_golden(scored_4d):
    # scan center of mass of the ENVELOPED profile [0, .6, .3, 0]:
    # (0.6 * 1.5 + 0.3 * 2.5) / 0.9 = 1.8333 bins
    want = MOB_MIN + (0.6 * 1.5 + 0.3 * 2.5) / 0.9 / S * (MOB_MAX - MOB_MIN)
    assert scored_4d["mobility_observed"] == pytest.approx(want, rel=1e-3)


def test_base_width_mobility_golden(scored_4d):
    assert scored_4d["base_width_mobility"] == pytest.approx(WIDTH, rel=1e-6)


def test_frame_features_survive_4d(scored_4d):
    # scan-split peaks must not distort the collapsed frame features
    # f_masked travels f16 in the packed transport (~5e-4 relative)
    assert scored_4d["f_masked"] == pytest.approx(2 / 3, abs=1e-3)
    # rt_observed is in the f32 transport class: stays exact
    assert scored_4d["rt_observed"] == pytest.approx(8.0, abs=1e-5)
    assert scored_4d["n_y_ions"] == 1.0 and scored_4d["n_b_ions"] == 1.0