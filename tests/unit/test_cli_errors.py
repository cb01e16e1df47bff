"""CLI error taxonomy: exit codes 127 (user error), 126 (business error),
1 (unknown) — the reference's contract (alphadia/cli.py error handling).

Each run goes through the real `cli.run` entry point; SearchPlan is only
stubbed where the error must originate deeper than argument handling.
"""

import json

import pytest

from alphadia_tpu.cli import run
from alphadia_tpu.exceptions import BusinessError, NoPsmFoundError, UserError


def test_version_exits_clean(capsys):
    run(["--version"])
    assert "alphadia-tpu" in capsys.readouterr().out


def test_no_library_is_user_error(tmp_path):
    """Raw files but neither library nor FASTA+prediction -> 127."""
    raw = tmp_path / "run.npz"
    raw.write_bytes(b"")
    with pytest.raises(SystemExit) as exc:
        run(["-o", str(tmp_path / "out"), "-f", str(raw)])
    assert exc.value.code == 127


def test_business_error_exit_code(tmp_path, monkeypatch):
    from alphadia_tpu import search_plan

    class Boom(search_plan.SearchPlan):
        def run_plan(self):
            raise NoPsmFoundError()

    monkeypatch.setattr(search_plan, "SearchPlan", Boom)
    with pytest.raises(SystemExit) as exc:
        run(["-o", str(tmp_path / "out"), "-f", "x.npz"])
    assert exc.value.code == 126


def test_unknown_error_exit_code(tmp_path, monkeypatch):
    from alphadia_tpu import search_plan

    class Boom(search_plan.SearchPlan):
        def run_plan(self):
            raise RuntimeError("disk on fire")

    monkeypatch.setattr(search_plan, "SearchPlan", Boom)
    with pytest.raises(SystemExit) as exc:
        run(["-o", str(tmp_path / "out"), "-f", "x.npz"])
    assert exc.value.code == 1


def test_invalid_config_dict_is_user_error(tmp_path):
    """Unknown config keys fail strict validation before any search."""
    with pytest.raises(SystemExit) as exc:
        run(
            [
                "-o", str(tmp_path / "out"),
                "-f", "x.npz",
                "--config-dict", json.dumps({"search": {"no_such_key": 1}}),
            ]
        )
    assert exc.value.code == 127


def test_error_hierarchy():
    assert issubclass(NoPsmFoundError, BusinessError)
    assert not issubclass(NoPsmFoundError, UserError)


def test_missing_config_file_is_user_error(tmp_path):
    with pytest.raises(SystemExit) as exc:
        run(["-o", str(tmp_path / "out"), "--config", str(tmp_path / "nope.yaml")])
    assert exc.value.code == 127


def test_malformed_config_dict_is_user_error(tmp_path):
    with pytest.raises(SystemExit) as exc:
        run(["-o", str(tmp_path / "out"), "--config-dict", "{not json"])
    assert exc.value.code == 127


def test_nonexistent_directory_is_user_error(tmp_path):
    with pytest.raises(SystemExit) as exc:
        run(["-o", str(tmp_path / "out"), "-d", str(tmp_path / "missing")])
    assert exc.value.code == 127


def test_output_from_config_file(tmp_path, monkeypatch):
    """output_directory in the YAML config satisfies the -o requirement."""
    import yaml as _yaml

    from alphadia_tpu.search_plan import SearchPlan

    seen = {}
    monkeypatch.setattr(
        SearchPlan, "run_plan", lambda self: seen.setdefault("out", str(self.output_directory))
    )
    cfg = tmp_path / "run.yaml"
    cfg.write_text(_yaml.safe_dump({"output_directory": str(tmp_path / "res")}))
    run(["--config", str(cfg)])
    assert seen["out"] == str(tmp_path / "res")


def test_directory_scan_includes_bruker_d(tmp_path, monkeypatch):
    """Bruker .d raw 'files' are directories and must be picked up by -d."""
    from alphadia_tpu.search_plan import SearchPlan

    (tmp_path / "sample1.d").mkdir()
    (tmp_path / "run2.mzML").write_text("")
    (tmp_path / "notes.txt").write_text("")
    captured = {}

    def fake_run_plan(self):
        captured["raw"] = self.cli_config.get("raw_paths", [])

    monkeypatch.setattr(SearchPlan, "run_plan", fake_run_plan)
    run(["-o", str(tmp_path / "out"), "-d", str(tmp_path), "--regex", r"\.(d|mzML)$"])
    names = [p.rsplit("/", 1)[-1] for p in captured["raw"]]
    assert names == ["run2.mzML", "sample1.d"] or names == ["sample1.d", "run2.mzML"]


def test_reference_cli_aliases_parse():
    """Every alphaDIA long/short alias must keep working (reference
    cli.py:38-124) so existing invocations migrate unchanged."""
    from alphadia_tpu.cli import _build_parser

    a = _build_parser().parse_args(
        [
            "--output-directory", "/tmp/out",
            "--raw-path", "a.mzML",
            "--raw-path", "b.mzML",
            "--library-path", "lib.tsv",
            "--fasta-path", "db.fasta",
            "--quant-directory", "/tmp/quant",
            "-r", "run.*",
            "-c", "cfg.yaml",
        ]
    )
    assert a.output == "/tmp/out"
    assert a.file == ["a.mzML", "b.mzML"]
    assert a.library == "lib.tsv"
    assert a.fasta == ["db.fasta"]
    assert a.quant_dir == "/tmp/quant"
    assert a.regex == "run.*"
    assert a.config == "cfg.yaml"
