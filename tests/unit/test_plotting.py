"""Kernel debug plotting (search/plotting.py): figures render and land in
the figure directory (reference: search/scoring/plotting/)."""

import numpy as np
import pytest

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.search.plotting import (
    debug_candidates,
    plot_dia_cycle,
    plot_fragment_profiles,
    plot_selection_score,
)
from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig
from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig
from alphadia_tpu.testing.synthetic import SyntheticConfig, make_synthetic_dia


@pytest.fixture(scope="module")
def small_run():
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=40, n_windows=4, n_cycles=120, seed=3)
    )
    return DiaData.from_spectra(spectra), prec, frag


def test_plot_dia_cycle(small_run):
    dia, _, _ = small_run
    fig = plot_dia_cycle(dia)
    assert fig is not None


def test_plot_profiles_standalone():
    fig = plot_fragment_profiles(
        np.random.default_rng(0).random((4, 2, 16)).astype(np.float32),
        np.random.default_rng(1).random((2, 16)).astype(np.float32),
        np.array([300.0, 400.0, 500.0, 600.0], np.float32),
        np.array([True, True, False, True]),
        title="test",
    )
    assert fig is not None
    fig2 = plot_selection_score(np.random.default_rng(2).random(32), [10, 20], [(8, 12)])
    assert fig2 is not None


def test_debug_candidates_writes_figures(small_run, tmp_path):
    dia, prec, frag = small_run
    cands = CandidateSelection(
        dia, prec, frag, SelectionConfig(rt_tolerance=40.0, batch_size=64)
    )()
    scoring = CandidateScoring(dia, prec, frag, ScoringConfig(batch_size=64))
    names = debug_candidates(scoring, cands, n=2, figure_dir=tmp_path)
    assert len(names) == 4  # fragments + precursor per candidate
    for n in names:
        assert (tmp_path / f"{n}.png").exists()
