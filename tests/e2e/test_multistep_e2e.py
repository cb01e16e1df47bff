"""Multistep transfer workflow: search -> transfer library -> fine-tuned models."""

import json

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.rawdata.source import save_npz
from alphadia_tpu.search_plan import SearchPlan
from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)


@pytest.mark.slow
def test_transfer_step_produces_models(tmp_path):
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=300, n_windows=6, n_cycles=350, seed=31)
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    raw = tmp_path / "run_t.npz"
    save_npz(raw, spectra)
    lib = tmp_path / "lib.hdf"
    SpecLibFlat(
        prec.drop(columns=["_truth_detectable", "_truth_rt"]), frag
    ).save_hdf(lib)

    config = {
        "raw_paths": [str(raw)],
        "library_path": str(lib),
        "general": {
            "random_state": 3,
            "save_figures": False,
            "transfer_step_enabled": True,
        },
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
        },
        "transfer_learning": {"epochs": 6, "batch_size": 128},
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }

    SearchPlan(str(tmp_path / "out"), config=config).run_plan()

    tdir = tmp_path / "out" / "transfer"
    assert (tdir / "speclib.transfer.parquet").exists()
    assert (tdir / "peptdeep.transfer" / "models.pkl").exists()
    assert (tdir / "stats.transfer.tsv").exists()
    stats = pd.read_csv(tdir / "stats.transfer.tsv", sep="\t")
    assert "rt_r2" in stats.columns

    # final (library) step consumed the forwarded tolerances and produced output
    final = tmp_path / "out"
    assert (final / "precursors.parquet").exists()
    frozen = (final / "frozen_config.yaml").read_text()
    assert "target_ms2_tolerance" in frozen

    # the fine-tuned model is loadable and predicts
    from alphadia_tpu.models.finetune import FinetuneManager

    mgr = FinetuneManager.load(tdir / "peptdeep.transfer")
    pred = mgr.predict_rt(["PEPTIDEK", "ACDEFGHIK"])
    assert np.isfinite(pred).all()
