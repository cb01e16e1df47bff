"""SearchStep per-run loop semantics (reference: test_search_step.py):
config layering into frozen_config.yaml, reuse_quant skipping, error
collection vs fail_fast, and quant-dir routing — with the heavy pieces
mocked out.
"""

import pandas as pd
import pytest
import yaml

from alphadia_tpu.exceptions import BusinessError
from alphadia_tpu.search_step import QUANT_FOLDER_NAME, SearchStep


@pytest.fixture()
def light_step(monkeypatch):
    """Patch library build + output build so run() touches neither."""
    monkeypatch.setattr(SearchStep, "load_library", lambda self: None)
    import alphadia_tpu.search_step as mod

    built = []

    class FakeOutput:
        def __init__(self, config, folder):
            pass

        def build(self, folders, lib):
            built.append(list(map(str, folders)))

    monkeypatch.setattr(mod, "SearchPlanOutput", FakeOutput)
    return built


def test_config_layering_frozen(tmp_path, light_step):
    step = SearchStep(
        str(tmp_path),
        config={"search": {"target_ms1_tolerance": 7}},
        cli_config={"search": {"target_ms2_tolerance": 9}},
        extra_config={"search": {"target_rt_tolerance": 44}},
    )
    frozen = yaml.safe_load((tmp_path / "frozen_config.yaml").read_text())
    assert frozen["search"]["target_ms1_tolerance"] == 7
    assert frozen["search"]["target_ms2_tolerance"] == 9
    assert frozen["search"]["target_rt_tolerance"] == 44
    assert step.config["output_directory"] == str(tmp_path)


def test_reuse_quant_skips_processed_runs(tmp_path, light_step, monkeypatch):
    quant = tmp_path / QUANT_FOLDER_NAME / "runA"
    quant.mkdir(parents=True)
    pd.DataFrame({"x": [1]}).to_parquet(quant / "psm.parquet")

    processed = []
    monkeypatch.setattr(
        SearchStep,
        "_process_raw_file",
        lambda self, p, n, q: processed.append(n),
    )
    step = SearchStep(
        str(tmp_path),
        config={
            "raw_paths": ["/data/runA.mzML", "/data/runB.mzML"],
            "general": {"reuse_quant": True},
        },
    )
    step.run()
    assert processed == ["runB"]  # runA reused
    # output build still sees BOTH run folders
    assert len(light_step[0]) == 2


def test_errors_collected_without_fail_fast(tmp_path, light_step, monkeypatch):
    def boom(self, path, name, q):
        raise BusinessError(f"bad {name}")

    monkeypatch.setattr(SearchStep, "_process_raw_file", boom)
    step = SearchStep(
        str(tmp_path),
        config={"raw_paths": ["/a/r1.mzML", "/a/r2.mzML"]},
    )
    step.run()  # must not raise
    assert len(step.errors) == 2
    assert {n for n, _ in step.errors} == {"r1", "r2"}
    assert light_step  # outputs still built from whatever succeeded


def test_fail_fast_raises(tmp_path, light_step, monkeypatch):
    def boom(self, path, name, q):
        raise BusinessError("nope")

    monkeypatch.setattr(SearchStep, "_process_raw_file", boom)
    step = SearchStep(
        str(tmp_path),
        config={
            "raw_paths": ["/a/r1.mzML"],
            "general": {"fail_fast": True},
        },
    )
    with pytest.raises(BusinessError):
        step.run()


def test_shared_quant_directory(tmp_path, light_step, monkeypatch):
    seen = []
    monkeypatch.setattr(
        SearchStep,
        "_process_raw_file",
        lambda self, p, n, q: seen.append(str(q)),
    )
    shared = tmp_path / "sharedquant"
    step = SearchStep(
        str(tmp_path / "out"),
        config={
            "raw_paths": ["/a/r1.mzML"],
            "quant_directory": str(shared),
        },
    )
    step.run()
    assert seen == [str(shared)]
    assert light_step[0] == [str(shared / "r1")]
