"""End-to-end CLI run on synthetic data: the `basic` e2e analog.

Drives: CLI arg parsing -> SearchPlan -> SearchStep (library load from HDF,
per-file loop over TWO runs) -> workflow -> per-run parquet -> cross-run
aggregation (grouping, protein FDR, LFQ matrices, stat/internal tsv).
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


@pytest.fixture(scope="module")
def e2e_inputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    raw_paths = []
    prec = frag = None
    # same peptides (seed), different acquisition noise / RT shift / level
    for i, (acq, factor, shift) in enumerate([(101, 1.0, 0.0), (202, 1.6, 4.0)]):
        spectra, p, f = make_synthetic_dia(
            SyntheticConfig(
                n_peptides=300,
                n_windows=6,
                n_cycles=350,
                seed=21,
                acq_seed=acq,
                run_intensity_factor=factor,
                run_rt_shift=shift,
            )
        )
        if prec is None:
            prec, frag = p, f
        path = tmp / f"run_{i}.npz"
        save_npz(path, spectra)
        raw_paths.append(str(path))
    prec, frag = add_synthetic_decoys(prec, frag)
    lib_path = tmp / "library.hdf"
    SpecLibFlat(
        prec.drop(columns=["_truth_detectable", "_truth_rt"]), frag
    ).save_hdf(lib_path)
    return tmp, raw_paths, str(lib_path), prec


@pytest.mark.slow
def test_cli_full_search(e2e_inputs):
    tmp, raw_paths, lib_path, prec = e2e_inputs
    out_dir = tmp / "out"

    overrides = {
        "general": {"random_state": 1, "save_figures": False},
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
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }

    from alphadia_tpu.cli import run

    run(
        [
            "-o",
            str(out_dir),
            "-f",
            raw_paths[0],
            "-f",
            raw_paths[1],
            "-l",
            lib_path,
            "--config-dict",
            json.dumps(overrides),
        ]
    )

    # outputs exist
    assert (out_dir / "frozen_config.yaml").exists()
    assert (out_dir / "stat.tsv").exists()
    assert (out_dir / "internal.tsv").exists()
    assert (out_dir / "precursors.parquet").exists()

    psm = pd.read_parquet(out_dir / "precursors.parquet")
    assert len(psm) > 100
    assert {"precursor.idx", "precursor.qval", "pg.name", "raw.name"} <= set(psm.columns)
    assert psm["raw.name"].nunique() == 2

    # identification quality vs ground truth
    truth = prec.set_index("precursor_idx")["_truth_detectable"]
    hit = truth.loc[psm["precursor.idx"]].to_numpy()
    assert hit.mean() > 0.9

    # per-run artifacts
    for name in ("run_0", "run_1"):
        assert (out_dir / "quant" / name / "psm.parquet").exists()
        assert (out_dir / "quant" / name / "frag.parquet").exists()
        assert (out_dir / "quant" / name / "events.jsonl").exists()

    # stat carries optimization columns
    stat = pd.read_csv(out_dir / "stat.tsv", sep="\t")
    assert "optimization.ms2_error" in stat.columns
    assert len(stat) == 2

    # LFQ matrices
    assert (out_dir / "pg.matrix.parquet").exists()
    pg = pd.read_parquet(out_dir / "pg.matrix.parquet")
    assert {"run_0", "run_1"} <= set(pg.columns)
    assert (pg[["run_0", "run_1"]].fillna(0) >= 0).all().all()

    # the CI metrics calculator reads the same outputs (calc_metrics.py)
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "calc_metrics", Path(__file__).parent / "calc_metrics.py"
    )
    calc_metrics = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(calc_metrics)

    metrics = calc_metrics.calc_all(out_dir)
    assert metrics["n_runs"] == 2
    assert metrics["BasicStats/precursors_mean"] > 100
    assert metrics["BasicStats/optimization.ms2_error_mean"] > 0
    assert metrics["Precursors/total"] == len(psm)
    assert metrics["Precursors/protein_groups"] > 0


def test_cli_version(capsys):
    from alphadia_tpu.cli import run

    run(["--version"])
    assert "alphadia-tpu" in capsys.readouterr().out
