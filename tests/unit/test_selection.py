import numpy as np
import pytest

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


@pytest.fixture(scope="module")
def synth():
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=120, n_windows=6, n_cycles=300, seed=3)
    )
    dia = DiaData.from_spectra(spectra)
    return dia, prec, frag


def test_selection_finds_detectable_precursors(synth):
    dia, prec, frag = synth
    cfg = SelectionConfig(
        rt_tolerance=40.0,
        fragment_mz_tolerance=15.0,
        precursor_mz_tolerance=15.0,
        candidate_count=3,
        batch_size=64,
    )
    sel = CandidateSelection(dia, prec, frag, cfg)
    cands = sel()
    assert len(cands) > 0
    assert (cands["frame_stop"] > cands["frame_start"]).all()
    assert (cands["frame_center"] >= cands["frame_start"]).all()
    assert (cands["frame_center"] <= cands["frame_stop"]).all()

    # recall: detectable precursors should yield a candidate near truth RT
    best = cands.sort_values("score", ascending=False).drop_duplicates("precursor_idx")
    merged = best.merge(prec, on="precursor_idx")
    det = merged[merged["_truth_detectable"]]
    found_rt = dia.cycle_rt[np.clip(det["frame_center"], 0, dia.n_cycles - 1)]
    err = np.abs(found_rt - det["_truth_rt"])
    recall = (err < 10.0).mean()
    assert recall > 0.8, f"recall {recall}"

    # undetectable precursors should mostly have low scores
    n_det = prec["_truth_detectable"].sum()
    top_scores = merged.sort_values("score", ascending=False).head(int(n_det * 0.5))
    frac_true = top_scores["_truth_detectable"].mean()
    assert frac_true > 0.8


def test_selection_rank_and_validity(synth):
    dia, prec, frag = synth
    cfg = SelectionConfig(rt_tolerance=30.0, candidate_count=3, batch_size=50)
    cands = CandidateSelection(dia, prec, frag, cfg)()
    # ranks within a precursor are contiguous from 0
    for pid, grp in cands.groupby("precursor_idx"):
        assert sorted(grp["rank"].tolist()) == list(range(len(grp)))
    # batches with padding should not leak phantom precursors
    assert set(cands["precursor_idx"]).issubset(set(prec["precursor_idx"]))


def test_wide_window_coarsening_matches_fine():
    """Wide-window selection on the cycle-coarsened store (stride k, full
    signal kept) finds the same detectable precursors with apexes within
    ~stride cycles of the fine path, and extents map back covering them."""
    import numpy as np

    from alphadia_tpu.rawdata import DiaData
    from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
    from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia

    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=80, n_windows=4, n_cycles=1400,
                        noise_peaks_per_spectrum=20, seed=12)
    )
    dia = DiaData.from_spectra(spectra)
    # rt tolerance wide enough for W > 512 -> stride engages
    wide = dia.cycle_time * 600
    base = dict(rt_tolerance=wide, candidate_count=2, batch_size=128)

    fine = CandidateSelection(
        dia, prec, frag,
        SelectionConfig(coarsen_wide_windows=False, **base),
    )()
    coarse = CandidateSelection(
        dia, prec, frag,
        SelectionConfig(coarsen_wide_windows=True, **base),
    )()

    f_best = fine.sort_values("score", ascending=False).drop_duplicates("precursor_idx")
    c_best = coarse.sort_values("score", ascending=False).drop_duplicates("precursor_idx")
    truth = prec.set_index("precursor_idx")
    det = truth[truth["_truth_detectable"]].index

    hits_f = f_best[f_best["precursor_idx"].isin(det)]
    hits_c = c_best[c_best["precursor_idx"].isin(det)]
    # coarse finds (nearly) as many detectable precursors
    assert len(hits_c) >= 0.95 * len(hits_f), (len(hits_c), len(hits_f))

    # apexes agree within the coarsening granularity
    m = hits_f.merge(hits_c, on="precursor_idx", suffixes=("_f", "_c"))
    stride = 2
    while 2 * 600 // stride > 512:
        stride *= 2
    delta = (m["frame_center_f"] - m["frame_center_c"]).abs()
    assert delta.median() <= stride, delta.median()
    # mapped-back extents contain the coarse apex
    assert (m["frame_start_c"] <= m["frame_center_c"]).all()
    assert (m["frame_stop_c"] > m["frame_center_c"]).all()
    assert (coarse["frame_stop"] <= dia.n_cycles).all()
