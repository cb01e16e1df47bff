"""Bruker .d e2e: synthetic 4D world re-encoded as a native TDF directory,
searched end-to-end through the CLI (reader -> 4D selection/scoring ->
mobility calibration -> outputs).

This is the vendor-format counterpart of test_4d_cli_e2e (npz input);
identifications must survive the tof/scan quantization of the TDF
encoding (~2 ppm m/z, ~0.001 1/K0).
"""

import json

import pandas as pd
import pytest

from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)
from alphadia_tpu.testing.tdf_writer import spectrum_data_to_tdf


@pytest.mark.slow
def test_cli_search_from_bruker_d(tmp_path):
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(
            n_peptides=300,
            n_windows=6,
            n_cycles=300,
            seed=29,
            with_mobility=True,
        )
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    d_dir = spectrum_data_to_tdf(spectra, tmp_path / "run4d.d")
    lib_path = tmp_path / "lib.hdf"
    SpecLibFlat(prec, frag).save_hdf(lib_path)

    from alphadia_tpu.cli import run

    overrides = {
        "general": {"random_state": 3, "save_figures": False,
                    "input_library_type": "flat"},
        "calibration": {
            "batch_size": 150,
            "optimization_lock_target": 50,
            "min_steps": 2,
            "max_steps": 5,
        },
        "search": {
            "target_ms1_tolerance": 10,
            "target_ms2_tolerance": 12,
            "target_rt_tolerance": 40,
        },
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }
    out_dir = tmp_path / "out"
    run(
        [
            "-o", str(out_dir),
            "-f", str(d_dir),
            "-l", str(lib_path),
            "--config-dict", json.dumps(overrides),
        ]
    )

    psm = pd.read_parquet(out_dir / "precursors.parquet")
    assert len(psm) > 20, f"only {len(psm)} identifications"
    assert "precursor.mobility.observed" in psm.columns
    truth = prec.set_index("precursor_idx")["_truth_mobility"]
    merged = psm.merge(
        truth.rename("truth_mob"),
        left_on="precursor.idx",
        right_index=True,
        how="left",
    )
    err = (merged["precursor.mobility.observed"] - merged["truth_mob"]).abs()
    assert err.median() < 0.03, f"mobility error {err.median()}"
