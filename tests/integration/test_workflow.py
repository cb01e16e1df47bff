"""End-to-end per-run workflow on synthetic ground-truth data.

Covers the minimum e2e slice (SURVEY §7 step 7): raw file load ->
library init -> optimization/calibration loop -> full extraction -> PSMs
at 1% FDR, checked against planted ground truth.
"""

import numpy as np
import pytest

from alphadia_tpu.config import load_default_config
from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.rawdata.source import save_npz
from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)
from alphadia_tpu.workflow.peptidecentric.peptidecentric import PeptideCentricWorkflow


@pytest.fixture(scope="module")
def synthetic_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=400,
            n_windows=6,
            n_cycles=400,
            seed=11,
            lib_ppm_bias=5.0,
            lib_rt_sigma=10.0,
        )
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    raw_path = tmp / "synthetic.npz"
    save_npz(raw_path, spectra)
    return tmp, str(raw_path), prec, frag


def _test_config(tmp):
    cfg = load_default_config()
    cfg.update_layer(
        {
            "output_directory": str(tmp / "out"),
            "general": {"random_state": 42, "save_figures": False},
            "calibration": {
                "batch_size": 150,
                "optimization_lock_target": 100,
                "min_steps": 2,
                "max_steps": 6,
            },
            "search": {
                "target_ms1_tolerance": 10,
                "target_ms2_tolerance": 12,
                "target_rt_tolerance": 30,
            },
            "search_initial": {
                "ms1_tolerance": 25,
                "ms2_tolerance": 25,
                "rt_tolerance": 0.3,
            },
            "tpu": {"selection_batch": 256, "scoring_batch": 256},
        },
        name="test",
    )
    return cfg


def test_full_workflow_synthetic(synthetic_run):
    tmp, raw_path, prec, frag = synthetic_run
    cfg = _test_config(tmp)
    lib = SpecLibFlat(prec, frag)

    wf = PeptideCentricWorkflow("synthetic", cfg)
    wf.load(raw_path, lib)
    assert wf.dia_data.n_cycles == 400
    assert wf.spectral_library.n_precursors > 0

    wf.search_parameter_optimization()

    # calibration should have recovered the planted 5 ppm bias
    ms2_est = wf.calibration_manager.get_estimator("fragment", "mz")
    assert ms2_est.is_fitted
    # optimized tolerances applied
    assert wf.optimization_manager.ms2_error <= 25

    psm_df, frag_df = wf.extraction()

    assert len(psm_df) > 0
    assert (psm_df["qval"] <= 0.01).all()
    # decoys now pass through extraction when qval <= fdr (reference
    # peptidecentric.py:227-229 — protein FDR needs them as its null);
    # targets must still dominate at 1% FDR
    targets = psm_df[psm_df["decoy"] == 0]
    assert len(targets) / len(psm_df) >= 0.95

    truth = prec.set_index("precursor_idx")["_truth_detectable"]
    hit_truth = truth.loc[targets["precursor_idx"]].to_numpy()
    # identified PSMs should overwhelmingly be planted peptides
    assert hit_truth.mean() > 0.93, f"precision {hit_truth.mean()}"
    # and we should find a decent share of them
    n_detectable = int(prec[prec.decoy == 0]["_truth_detectable"].sum())
    recall = hit_truth.sum() / n_detectable
    assert recall > 0.5, f"recall {recall}"

    # RT accuracy of identifications
    merged = psm_df.merge(
        prec[["precursor_idx", "_truth_rt"]], on="precursor_idx", how="left"
    )
    rt_err = (merged["rt_observed"] - merged["_truth_rt"]).abs()
    assert rt_err.median() < 3.0

    # fragments belong to surviving PSMs only
    assert set(frag_df["precursor_idx"]).issubset(set(psm_df["precursor_idx"]))

    # managers persisted for reuse_calibration
    assert (wf.path / wf.CALIBRATION_MANAGER_PKL).exists()
    assert (wf.path / wf.OPTIMIZATION_MANAGER_PKL).exists()
