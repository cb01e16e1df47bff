import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.search.scoring import FEATURE_COLUMNS, CandidateScoring, ScoringConfig
from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


@pytest.fixture(scope="module")
def searched():
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=120, n_windows=6, n_cycles=300, seed=5)
    )
    dia = DiaData.from_spectra(spectra)
    cands = CandidateSelection(
        dia, prec, frag, SelectionConfig(rt_tolerance=40.0, batch_size=128)
    )()
    return dia, prec, frag, cands


def test_scoring_shapes_and_features(searched):
    dia, prec, frag, cands = searched
    scoring = CandidateScoring(dia, prec, frag, ScoringConfig(batch_size=128))
    psm_df, frag_df = scoring(cands)

    assert len(psm_df) > 0
    for col in FEATURE_COLUMNS:
        assert col in psm_df.columns
        assert np.isfinite(psm_df[col].to_numpy(np.float64)).all(), col
    assert (psm_df["mobility_fwhm"] == 0).all()

    # rt_observed corresponds to candidate apex
    np.testing.assert_allclose(
        psm_df["rt_observed"],
        dia.cycle_rt[np.clip(psm_df["frame_center"], 0, dia.n_cycles - 1)],
        rtol=1e-5,
    )

    # detectable precursors: observed intensities positive, correlations high
    merged = psm_df.merge(prec[["precursor_idx", "_truth_detectable"]], on="precursor_idx")
    det = merged[merged["_truth_detectable"]]
    assert (det["sum_ms1_intensity"] > 0).mean() > 0.9
    assert det["fragment_frame_correlation"].median() > 0.5

    # mass error features should recover the +4 ppm synthetic bias;
    # weighted_mass_deviation is an (unnormalized) isotope-intensity-weighted
    # sum (reference precursor_features.py:73) — scale ~ 4 ppm x sum(iso)
    assert 2.0 < det["mean_ms2_mass_error"].median() < 6.0
    assert 4.0 < det["weighted_mass_deviation"].median() < 10.0


def test_scoring_fragment_output(searched):
    dia, prec, frag, cands = searched
    scoring = CandidateScoring(dia, prec, frag, ScoringConfig(batch_size=128))
    psm_df, frag_df = scoring(cands)
    assert len(frag_df) > 0
    assert (frag_df["intensity"] >= 0).all()
    # fragment rows only for scored candidates
    keys_psm = set(zip(psm_df["precursor_idx"], psm_df["rank"]))
    keys_frag = set(zip(frag_df["precursor_idx"], frag_df["rank"]))
    assert keys_frag.issubset(keys_psm)
    # observed fragment mz close to library mz for matched fragments
    m = frag_df[frag_df["mz_observed"] > 0]
    ppm = (m["mz_observed"] - m["mz"]) / m["mz"] * 1e6
    assert np.abs(ppm).median() < 10


def test_scoring_discriminates_shuffled_precursors(searched):
    """Scoring features must separate true precursors from mz-shuffled fakes."""
    dia, prec, frag, _ = searched
    fake_prec = prec.copy()
    rng = np.random.default_rng(0)
    # shuffle fragment assignment: point each precursor at another's fragments
    perm = rng.permutation(len(prec))
    fake_prec["flat_frag_start_idx"] = prec["flat_frag_start_idx"].to_numpy()[perm]
    fake_prec["flat_frag_stop_idx"] = prec["flat_frag_stop_idx"].to_numpy()[perm]

    sel_cfg = SelectionConfig(rt_tolerance=40.0, batch_size=128)
    true_cands = CandidateSelection(dia, prec, frag, sel_cfg)()
    fake_cands = CandidateSelection(dia, fake_prec, frag, sel_cfg)()

    sc_cfg = ScoringConfig(batch_size=128)
    true_psm, _ = CandidateScoring(dia, prec, frag, sc_cfg)(true_cands)
    fake_psm, _ = CandidateScoring(dia, fake_prec, frag, sc_cfg)(fake_cands)

    det = set(prec.loc[prec._truth_detectable, "precursor_idx"])
    t = true_psm[true_psm["precursor_idx"].isin(det)]
    f = fake_psm
    # true precursors vastly outnumber surviving fakes, and frame
    # correlation separates them (the fake sample is tiny, so compare
    # means rather than a small-sample median with a fixed margin)
    assert len(t) > 5 * max(len(f), 1)
    assert (
        t["fragment_frame_correlation"].mean()
        > f["fragment_frame_correlation"].mean() + 0.1
    )
    assert t["intensity_fraction"].median() >= f["intensity_fraction"].median()
