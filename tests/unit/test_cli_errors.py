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
