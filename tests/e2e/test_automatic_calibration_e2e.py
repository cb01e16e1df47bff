"""Fully automatic tolerance calibration e2e (the reference's
`astral_automatic_calibration` case: e2e_test_cases.yaml — fixed vs
automatic optimization).

All search tolerances start at the wide initial values and are optimized
by the AUTOMATIC optimizers (target <= 0), not targeted convergence: the
run must still find the synthetic peptides and record the optimized
tolerances in stat.tsv.
"""

import json

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.rawdata.source import save_npz
from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)


@pytest.mark.slow
def test_cli_automatic_calibration(tmp_path):
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=300, n_windows=4, n_cycles=300, seed=17)
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    raw = tmp_path / "run.npz"
    save_npz(raw, spectra)
    lib = tmp_path / "lib.hdf"
    SpecLibFlat(prec, frag).save_hdf(lib)
    out = tmp_path / "out"

    overrides = {
        "general": {"random_state": 7, "save_figures": False,
                    "input_library_type": "flat"},
        "calibration": {"batch_size": 200, "optimization_lock_target": 60,
                        "min_steps": 2, "max_steps": 6},
        # every tolerance <= 0 => automatic optimizers for ms1/ms2/rt
        "search": {
            "target_ms1_tolerance": 0,
            "target_ms2_tolerance": 0,
            "target_rt_tolerance": 0.0,
        },
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }

    from alphadia_tpu.cli import run

    run(
        [
            "-o", str(out),
            "-f", str(raw),
            "-l", str(lib),
            "--config-dict", json.dumps(overrides),
        ]
    )

    psm = pd.read_parquet(out / "precursors.parquet")
    assert len(psm) > 50, f"only {len(psm)} identifications"
    # IDs are real: median RT error of matched truth is small
    truth = prec.set_index("precursor_idx")["_truth_rt"]
    merged = psm.merge(
        truth.rename("truth_rt"), left_on="precursor.idx",
        right_index=True, how="left",
    )
    err = (merged["precursor.rt.observed"] - merged["truth_rt"]).abs()
    assert err.median() < 5.0, f"rt error {err.median()}"

    # the automatic optimizers recorded optimized (narrowed) tolerances
    stat = pd.read_csv(out / "stat.tsv", sep="\t")
    row = stat.iloc[0]
    assert 0 < row["optimization.ms2_error"] < 30, row["optimization.ms2_error"]
    # ms1's automatic rule maximizes isotope correlation — it may
    # legitimately keep the initial width; it must still be recorded
    assert 0 < row["optimization.ms1_error"] <= 30, row["optimization.ms1_error"]
    assert 0 < row["optimization.rt_error"] < 0.5 * float(
        spectra.rt.max()
    ), row["optimization.rt_error"]
