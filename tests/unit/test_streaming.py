"""RT-windowed streaming search must reproduce the whole-run search:
the pad guarantees every precursor's full selection window and scoring
extent exist inside its window's slab store."""

import numpy as np
import pandas as pd

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.search.pipelined import PipelinedExtraction
from alphadia_tpu.search.scoring import FEATURE_COLUMNS, ScoringConfig
from alphadia_tpu.search.selection import SelectionConfig
from alphadia_tpu.search.streaming import RtWindowedSearch, iter_rt_windows
from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)


def test_windowed_matches_whole_run():
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=250, n_windows=6, n_cycles=400, seed=23)
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    sel_cfg = SelectionConfig(rt_tolerance=40.0, candidate_count=2, batch_size=512)
    score_cfg = ScoringConfig(batch_size=512, collect_fragments=True)

    dia = DiaData.from_spectra(spectra)
    _, psm_whole, frag_whole = PipelinedExtraction(
        dia, prec, frag, sel_cfg, score_cfg
    )()

    sw = RtWindowedSearch(
        spectra, prec, frag, sel_cfg, score_cfg, n_rt_windows=4
    )
    psm_win, frag_win = sw()

    assert sw.peak_window_slab_mb > 0
    # every precursor searched exactly once
    key = ["precursor_idx", "rank"]
    assert not psm_win.duplicated(key).any()
    assert len(psm_win) == len(psm_whole)

    a = psm_whole.sort_values(key).reset_index(drop=True)
    b = psm_win.sort_values(key).reset_index(drop=True)
    # absolute frame mapping and features identical
    np.testing.assert_array_equal(
        a["frame_center"].to_numpy(), b["frame_center"].to_numpy()
    )
    np.testing.assert_allclose(
        a[FEATURE_COLUMNS].to_numpy(),
        b[FEATURE_COLUMNS].to_numpy(),
        rtol=1e-5,
        atol=1e-5,
    )
    assert len(frag_win) == len(frag_whole)


def test_iter_rt_windows_partitions_cycles():
    spectra, _, _ = make_synthetic_dia(
        SyntheticConfig(n_peptides=40, n_windows=4, n_cycles=200, seed=1)
    )
    cores = []
    for (lo, hi), sub, c0 in iter_rt_windows(spectra, 5, pad_s=20.0):
        assert sub.ms_level[0] == 1  # cut on cycle boundaries
        cores.append((lo, hi))
    # cores partition the RT axis
    assert cores[0][0] == float("-inf") and cores[-1][1] == float("inf")
    for (_, hi), (lo, _) in zip(cores[:-1], cores[1:]):
        assert hi == lo
