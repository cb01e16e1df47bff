"""MBR multistep: library step -> speclib.mbr.hdf -> second-pass search."""

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
def test_mbr_multistep(tmp_path):
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=250, n_windows=6, n_cycles=300, seed=41)
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    raw = tmp_path / "run_m.npz"
    save_npz(raw, spectra)
    lib = tmp_path / "lib.hdf"
    SpecLibFlat(
        prec.drop(columns=["_truth_detectable", "_truth_rt"]), frag
    ).save_hdf(lib)

    config = {
        "raw_paths": [str(raw)],
        "library_path": str(lib),
        "general": {
            "random_state": 4,
            "save_figures": False,
            "mbr_step_enabled": True,
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
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }
    SearchPlan(str(tmp_path / "out"), config=config).run_plan()

    lib_dir = tmp_path / "out" / "library"
    assert (lib_dir / "speclib.mbr.hdf").exists()
    # reference default (fdr.keep_decoys_in_mbr_library=false): the saved
    # MBR library is decoy-free; the consuming step regenerates flat
    # decoys at load (library/decoy.py generate_flat_decoys)
    mbr = SpecLibFlat.load_hdf(lib_dir / "speclib.mbr.hdf")
    assert set(mbr.precursor_df["decoy"].unique()) == {0}
    from alphadia_tpu.library.decoy import generate_flat_decoys

    regen = generate_flat_decoys(mbr)
    assert set(regen.precursor_df["decoy"].unique()) == {0, 1}

    # final MBR pass produced output from the focused library: the second
    # step searched a regenerated-decoy library and still controlled FDR
    final_psm = pd.read_parquet(tmp_path / "out" / "precursors.parquet")
    assert len(final_psm) > 50
    assert (final_psm["precursor.qval"] <= 0.01).all()
