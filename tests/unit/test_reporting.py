import json

from alphadia_tpu.reporting import init_logging
from alphadia_tpu.reporting.reporting import default_pipeline


def test_jsonl_backend(tmp_path):
    with default_pipeline(tmp_path, save_figures=False) as rep:
        rep.log_event("optimization", "start")
        rep.log_metric("precursors", 123)
        rep.log_string("hello", "progress")
    lines = [
        json.loads(line) for line in (tmp_path / "events.jsonl").read_text().splitlines()
    ]
    kinds = [(r["type"], r["name"]) for r in lines]
    assert ("metric", "precursors") in kinds
    assert lines[0]["name"] == "start"
    assert all("absolute_time" in r and "relative_time" in r for r in lines)


def test_log_rotation(tmp_path):
    init_logging(tmp_path, "INFO")
    (tmp_path / "log.txt").write_text("old")
    init_logging(tmp_path, "INFO")
    assert (tmp_path / "log.bkp.txt").exists()
