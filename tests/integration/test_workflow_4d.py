"""End-to-end per-run workflow on 4D (ion mobility) synthetic data.

The timsTOF-analog slice: mobility-annotated peaks -> scan-binned peak
store -> 4D selection (2D peak finding in scan x cycle) -> scoring with
observed-mobility features -> mobility calibration -> FDR.
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
def synthetic_4d_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run4d")
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=300,
            n_windows=6,
            n_cycles=300,
            seed=23,
            lib_ppm_bias=5.0,
            lib_rt_sigma=10.0,
            with_mobility=True,
        )
    )
    assert spectra.has_mobility
    prec, frag = add_synthetic_decoys(prec, frag)
    raw_path = tmp / "synthetic4d.npz"
    save_npz(raw_path, spectra)
    return tmp, str(raw_path), prec, frag


def test_full_workflow_4d(synthetic_4d_run):
    tmp, raw_path, prec, frag = synthetic_4d_run
    cfg = load_default_config()
    cfg.update_layer(
        {
            "output_directory": str(tmp / "out"),
            "general": {"random_state": 7, "save_figures": False},
            "calibration": {
                "batch_size": 150,
                "optimization_lock_target": 80,
                "min_steps": 2,
                "max_steps": 5,
            },
            "search": {
                "target_ms1_tolerance": 10,
                "target_ms2_tolerance": 12,
                "target_rt_tolerance": 30,
                "target_mobility_tolerance": 0.1,
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
    lib = SpecLibFlat(prec, frag)

    wf = PeptideCentricWorkflow("synthetic4d", cfg)
    wf.load(raw_path, lib)
    assert wf.dia_data.has_mobility
    assert wf.dia_data.n_scan_bins == 8

    wf.search_parameter_optimization()
    psm_df, frag_df = wf.extraction()

    assert len(psm_df) > 0
    # decoys pass through extraction at qval <= fdr (reference semantics);
    # targets must dominate
    targets = psm_df[psm_df["decoy"] == 0]
    assert len(targets) / len(psm_df) >= 0.95
    assert (psm_df["qval"] <= 0.01).all()

    truth = prec.set_index("precursor_idx")
    hit_truth = truth["_truth_detectable"].loc[targets["precursor_idx"]].to_numpy()
    assert hit_truth.mean() > 0.9, f"precision {hit_truth.mean()}"

    # observed mobility matches planted ground truth
    m = psm_df.merge(
        prec[["precursor_idx", "_truth_mobility"]], on="precursor_idx", how="left"
    )
    m = m[m["mobility_observed"] > 0]
    assert len(m) > 10
    mob_err = (m["mobility_observed"] - m["_truth_mobility"]).abs()
    assert mob_err.median() < 0.03, f"mobility error {mob_err.median()}"

    # candidates carry real scan coordinates
    assert (psm_df["scan_stop"] - psm_df["scan_start"] >= 1).all()
    assert psm_df["scan_center"].max() > 0

    # in-kernel 4D features are live (not the 3D hard zeros):
    # scan correlations (29/30), mobility fwhm (39), base width (0)
    assert psm_df["fragment_scan_correlation"].abs().max() > 0.1
    assert psm_df["template_scan_correlation"].abs().max() > 0.1
    assert (psm_df["mobility_fwhm"] > 0).mean() > 0.5
    assert (psm_df["base_width_mobility"] > 0).any()
    # true hits should show coherent scan profiles on average
    assert psm_df["fragment_scan_correlation"].median() > 0.2
