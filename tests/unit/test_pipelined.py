"""PipelinedExtraction must be numerically identical to the two-stage
CandidateSelection -> CandidateScoring sequence (the pipeline only
reorders transport/decode, never math), including when its per-chunk
scoring window buckets differ from the global one."""

import numpy as np
import pandas as pd

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.search.pipelined import PipelinedExtraction
from alphadia_tpu.search.scoring import (
    FEATURE_COLUMNS,
    CandidateScoring,
    ScoringConfig,
)
from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)


def _world(n_peptides=300, n_cycles=350, **kw):
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=n_peptides, n_windows=6, n_cycles=n_cycles, seed=21, **kw
        )
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    return DiaData.from_spectra(spectra), prec, frag


def test_pipelined_matches_sequential():
    dia, prec, frag = _world()
    sel_cfg = SelectionConfig(
        rt_tolerance=60.0, candidate_count=3, batch_size=4096
    )
    # tiny scoring batches force many chunks, incl. chunk cuts across
    # selection-frame boundaries and a pow2 tail
    score_cfg = ScoringConfig(batch_size=256, collect_fragments=True)

    cands_seq = CandidateSelection(dia, prec, frag, sel_cfg)()
    psm_seq, frag_seq = CandidateScoring(dia, prec, frag, score_cfg)(cands_seq)

    pipe = PipelinedExtraction(
        dia, prec, frag, sel_cfg, score_cfg, sel_batch_cap=128
    )
    cands_p, psm_p, frag_p = pipe()

    # candidate sets identical (order may differ across sel batch sizes —
    # compare sorted)
    key = ["precursor_idx", "rank"]
    a = cands_seq.sort_values(key).reset_index(drop=True)
    b = cands_p.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)

    assert len(psm_p) == len(psm_seq)
    a = psm_seq.sort_values(key).reset_index(drop=True)
    b = psm_p.sort_values(key).reset_index(drop=True)
    np.testing.assert_allclose(
        a[FEATURE_COLUMNS].to_numpy(),
        b[FEATURE_COLUMNS].to_numpy(),
        rtol=0,
        atol=0,
    )

    fkey = ["precursor_idx", "rank", "mz"]
    a = frag_seq.sort_values(fkey).reset_index(drop=True)
    b = frag_p.sort_values(fkey).reset_index(drop=True)
    np.testing.assert_allclose(
        a[["height", "intensity", "mass_error", "correlation"]].to_numpy(),
        b[["height", "intensity", "mass_error", "correlation"]].to_numpy(),
        rtol=0,
        atol=0,
    )


def test_pipelined_empty_library():
    dia, prec, frag = _world(n_peptides=50)
    pipe = PipelinedExtraction(dia, prec.iloc[:0], frag, None, None)
    cands, psm, fr = pipe()
    assert len(cands) == 0 and len(psm) == 0 and len(fr) == 0


def test_pipelined_4d():
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=120,
            n_windows=4,
            n_cycles=250,
            seed=7,
            with_mobility=True,
        )
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    dia = DiaData.from_spectra(spectra, n_scan_bins=8)

    sel_cfg = SelectionConfig(rt_tolerance=60.0, candidate_count=2, batch_size=512)
    score_cfg = ScoringConfig(batch_size=128, collect_fragments=True)
    cands_seq = CandidateSelection(dia, prec, frag, sel_cfg)()
    psm_seq, _ = CandidateScoring(dia, prec, frag, score_cfg)(cands_seq)

    pipe = PipelinedExtraction(dia, prec, frag, sel_cfg, score_cfg, sel_batch_cap=64)
    _, psm_p, _ = pipe()
    assert len(psm_p) == len(psm_seq)
    key = ["precursor_idx", "rank"]
    a = psm_seq.sort_values(key).reset_index(drop=True)
    b = psm_p.sort_values(key).reset_index(drop=True)
    np.testing.assert_allclose(
        a[FEATURE_COLUMNS].to_numpy(), b[FEATURE_COLUMNS].to_numpy(), rtol=0, atol=0
    )
