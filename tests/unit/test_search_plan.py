"""SearchPlan multistep orchestration (reference: test_search_plan.py —
which steps run, in which directories, and what config each step inherits),
with run_step mocked so no search executes.
"""

import pandas as pd
import pytest

from alphadia_tpu.search_plan import (
    LIBRARY_STEP_NAME,
    TRANSFER_STEP_NAME,
    SearchPlan,
)


@pytest.fixture()
def recorded(monkeypatch):
    calls = []

    def fake_run_step(self, output_dir, extra_config):
        calls.append((str(output_dir), extra_config))

    monkeypatch.setattr(SearchPlan, "run_step", fake_run_step)
    return calls


def test_plain_plan_runs_single_step(tmp_path, recorded):
    SearchPlan(str(tmp_path)).run_plan()
    assert len(recorded) == 1
    out_dir, extra = recorded[0]
    assert out_dir == str(tmp_path)
    assert extra == {}


def test_transfer_step_plan(tmp_path, recorded):
    plan = SearchPlan(
        str(tmp_path), config={"general": {"transfer_step_enabled": True}}
    )
    plan.run_plan()
    assert len(recorded) == 2
    assert recorded[0][0] == str(tmp_path / TRANSFER_STEP_NAME)
    # transfer step must enable the transfer library+learning machinery
    extra0 = recorded[0][1]
    assert extra0["transfer_library"]["enabled"]
    assert extra0["transfer_learning"]["enabled"]
    # final step runs in the root output dir
    assert recorded[1][0] == str(tmp_path)


def test_transfer_forwards_tolerances_and_model(tmp_path, recorded):
    tdir = tmp_path / TRANSFER_STEP_NAME
    tdir.mkdir(parents=True)
    pd.DataFrame(
        {
            "optimization.ms1_error": [4.0, 6.0, 5.0],
            "optimization.ms2_error": [8.0, 12.0, 10.0],
        }
    ).to_csv(tdir / "stat.tsv", sep="\t", index=False)
    (tdir / "peptdeep.transfer").mkdir()

    plan = SearchPlan(
        str(tmp_path), config={"general": {"transfer_step_enabled": True}}
    )
    plan.run_plan()
    final_extra = recorded[1][1]
    # median of per-run optimized tolerances becomes the next step's target
    assert final_extra["search"]["target_ms1_tolerance"] == 5.0
    assert final_extra["search"]["target_ms2_tolerance"] == 10.0
    # fine-tuned models forwarded
    assert final_extra["library_prediction"]["peptdeep_model_path"] == str(
        tdir / "peptdeep.transfer"
    )


def test_mbr_step_plan(tmp_path, recorded):
    plan = SearchPlan(
        str(tmp_path), config={"general": {"mbr_step_enabled": True}}
    )
    plan.run_plan()
    assert len(recorded) == 2
    # library step writes the MBR library
    lib_dir, lib_extra = recorded[0]
    assert lib_dir == str(tmp_path / LIBRARY_STEP_NAME)
    assert lib_extra["general"]["save_mbr_library"]
    # mbr (final) step in the root dir
    assert recorded[1][0] == str(tmp_path)


def test_mbr_uses_built_library_when_present(tmp_path, recorded, monkeypatch):
    lib_dir = tmp_path / LIBRARY_STEP_NAME
    lib_dir.mkdir(parents=True)
    (lib_dir / "speclib.mbr.hdf").write_bytes(b"x")
    SearchPlan(
        str(tmp_path), config={"general": {"mbr_step_enabled": True}}
    ).run_plan()
    mbr_extra = recorded[1][1]
    assert mbr_extra["library_path"] == str(lib_dir / "speclib.mbr.hdf")
    assert mbr_extra["general"]["input_library_type"] == "flat"


def test_transfer_and_mbr_plan(tmp_path, recorded):
    SearchPlan(
        str(tmp_path),
        config={
            "general": {"transfer_step_enabled": True, "mbr_step_enabled": True}
        },
    ).run_plan()
    assert [c[0] for c in recorded] == [
        str(tmp_path / TRANSFER_STEP_NAME),
        str(tmp_path / LIBRARY_STEP_NAME),
        str(tmp_path),
    ]


def test_cli_config_overrides_user_config(tmp_path, recorded):
    # cli layer wins over the config file for step enabling
    SearchPlan(
        str(tmp_path),
        config={"general": {"transfer_step_enabled": True}},
        cli_config={"general": {"transfer_step_enabled": False}},
    ).run_plan()
    assert len(recorded) == 1


def test_missing_stat_tsv_forwards_nothing(tmp_path):
    assert SearchPlan._get_optimized_values_config(tmp_path) == {}


def test_stat_tsv_with_nan_column(tmp_path):
    pd.DataFrame(
        {
            "optimization.ms1_error": [float("nan")],
            "optimization.ms2_error": [7.0],
        }
    ).to_csv(tmp_path / "stat.tsv", sep="\t", index=False)
    out = SearchPlan._get_optimized_values_config(tmp_path)
    assert out == {"search": {"target_ms2_tolerance": 7.0}}


def test_mbr_inherits_transfer_and_library_forwarding(tmp_path, recorded):
    """The final MBR step must see the transfer extras (tuned model path,
    tolerances) plus the LIBRARY step's optimized tolerances — not start
    from the wide defaults."""
    transfer_dir = tmp_path / TRANSFER_STEP_NAME
    transfer_dir.mkdir(parents=True)
    (transfer_dir / "peptdeep.transfer").mkdir()
    pd.DataFrame(
        {"optimization.ms1_error": [8.0], "optimization.ms2_error": [11.0]}
    ).to_csv(transfer_dir / "stat.tsv", sep="\t", index=False)
    lib_dir = tmp_path / LIBRARY_STEP_NAME
    lib_dir.mkdir(parents=True)
    pd.DataFrame(
        {"optimization.ms1_error": [4.0], "optimization.ms2_error": [7.0]}
    ).to_csv(lib_dir / "stat.tsv", sep="\t", index=False)

    SearchPlan(
        str(tmp_path),
        config={
            "general": {"transfer_step_enabled": True, "mbr_step_enabled": True}
        },
    ).run_plan()
    mbr_extra = recorded[2][1]
    # library step's (tighter) optimized tolerances win over transfer's
    assert mbr_extra["search"]["target_ms1_tolerance"] == 4.0
    assert mbr_extra["search"]["target_ms2_tolerance"] == 7.0
    # the fine-tuned model path survives into the final step
    assert mbr_extra["library_prediction"]["peptdeep_model_path"] == str(
        transfer_dir / "peptdeep.transfer"
    )
    # and the MBR overrides are still applied
    assert mbr_extra["fdr"]["inference_strategy"] == "library"
