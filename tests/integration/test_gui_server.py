"""GUI server integration: schema + browse + a real search run over HTTP.

Starts the stdlib server on an ephemeral port in a thread, drives the
JSON API exactly as the static page does (reference role: the Electron
GUI's run workflow), and waits for a tiny synthetic search launched as a
CLI subprocess to finish.
"""

import json
import threading
import time
import urllib.request

import pytest

from alphadia_tpu.gui.server import JobManager, make_handler
from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.rawdata.source import save_npz
from alphadia_tpu.testing.synthetic import (
    SyntheticConfig,
    add_synthetic_decoys,
    make_synthetic_dia,
)


TOKEN = "test-token-123"


@pytest.fixture()
def server(tmp_path_factory, monkeypatch):
    from http.server import ThreadingHTTPServer

    # isolate the persisted run history from the user's real cache
    monkeypatch.setenv(
        "ALPHADIA_TPU_CACHE", str(tmp_path_factory.mktemp("gui_cache"))
    )
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(JobManager(), TOKEN)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url, token=TOKEN):
    req = urllib.request.Request(url, headers={"X-Auth-Token": token})
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def _post(url, payload, token=TOKEN):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        method="POST",
        headers={"X-Auth-Token": token},
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_auth_required(server):
    # /api without the token (CSRF surface) is refused
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server + "/api/schema", token="wrong")
    assert exc.value.code == 403
    code, _ = _post(server + "/api/run", {}, token="")
    assert code == 403
    # non-loopback Host header (DNS rebinding) is refused even with token
    req = urllib.request.Request(
        server + "/api/schema",
        headers={"X-Auth-Token": TOKEN, "Host": "evil.example:8855"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=10)
    assert exc.value.code == 403
    # the static page itself needs no token (it carries none)
    with urllib.request.urlopen(server + "/", timeout=10) as r:
        assert r.status == 200


def test_schema_and_static_page(server):
    schema = _get(server + "/api/schema")
    assert schema["raw_path_list"]["required"]
    sections = {s["id"] for s in schema["config"]}
    assert {"general", "search", "fdr", "tpu"} <= sections
    n_params = sum(len(s["parameters"]) for s in schema["config"])
    assert n_params > 80
    with urllib.request.urlopen(server + "/", timeout=10) as r:
        page = r.read().decode()
    assert "alphadia-tpu" in page and "/api/run" in page


def test_browse(server, tmp_path):
    (tmp_path / "run.mzML").write_text("x")
    (tmp_path / "sample.d").mkdir()
    (tmp_path / "lib.tsv").write_text("x")
    d = _get(server + f"/api/browse?path={tmp_path}")
    by_name = {e["name"]: e for e in d["entries"]}
    assert by_name["run.mzML"]["raw"]
    assert by_name["sample.d"]["raw"] and by_name["sample.d"]["dir"]
    assert by_name["lib.tsv"]["lib"]


def test_run_validation_errors(server, tmp_path):
    code, res = _post(server + "/api/run", {"raw_path_list": []})
    assert code == 400 and "output_directory" in res["error"]
    code, res = _post(
        server + "/api/run",
        {"output_directory": str(tmp_path), "raw_path_list": ["/nope.mzML"]},
    )
    assert code == 400 and "not found" in res["error"]
    code, res = _post(server + "/api/cancel", {})
    assert code == 400


def test_run_unwritable_output_is_json_error(server, tmp_path):
    """Filesystem failures surface as JSON errors, not dropped sockets."""
    raw = tmp_path / "run.npz"
    raw.write_bytes(b"\x00")  # existence is all the handler checks up front
    # a regular file as path parent: mkdir fails even for root (chmod
    # tricks don't, the test user may be uid 0)
    blocker = tmp_path / "blocker"
    blocker.write_text("")
    code, res = _post(
        server + "/api/run",
        {
            "output_directory": str(blocker / "out"),
            "raw_path_list": [str(raw)],
        },
    )
    assert code == 400
    assert "cannot write to output directory" in res["error"]


@pytest.mark.slow
def test_run_search_through_gui(server, tmp_path, monkeypatch):
    # the GUI subprocess inherits our env; force it onto CPU like the
    # rest of the test suite
    monkeypatch.setenv("ALPHADIA_TPU_PLATFORM", "cpu")
    spectra, prec, frag = make_synthetic_dia(
        SyntheticConfig(n_peptides=150, n_windows=4, n_cycles=200, seed=11)
    )
    prec, frag = add_synthetic_decoys(prec, frag)
    raw = tmp_path / "run.npz"
    save_npz(raw, spectra)
    lib = tmp_path / "lib.hdf"
    SpecLibFlat(prec, frag).save_hdf(lib)
    out = tmp_path / "out"

    payload = {
        "raw_path_list": [str(raw)],
        "library": str(lib),
        "output_directory": str(out),
        "config": {
            "general": {"random_state": 3, "save_figures": False,
                        "input_library_type": "flat"},
            "calibration": {"batch_size": 150, "optimization_lock_target": 50,
                            "min_steps": 2, "max_steps": 4},
            "tpu": {"selection_batch": 256, "scoring_batch": 256},
        },
    }
    code, res = _post(server + "/api/run", payload)
    assert code == 200 and res.get("ok"), res
    # double-start is rejected while running
    code, res2 = _post(server + "/api/run", payload)
    assert code == 400 and "already running" in res2["error"]

    deadline = time.time() + 600
    state = None
    while time.time() < deadline:
        st = _get(server + "/api/status")
        state = st["state"]
        if state in ("done", "failed", "cancelled"):
            break
        time.sleep(2)
    assert state == "done", f"state={state} log={st.get('log_tail', '')[-2000:]}"
    assert "precursors.parquet" in st.get("results", {})
    assert (out / "precursors.parquet").exists()

    # ---- run history records the finished run -------------------------
    hist = _get(server + "/api/history")["runs"]
    assert hist and hist[0]["output"] == str(out)
    assert hist[0]["state"] == "done"

    # ---- results summary over the recorded output dir -----------------
    res = _get(server + "/api/results?output=" + str(out))
    assert res["summary"]["precursors"] > 0
    assert "stat.tsv" in res["files"]
    assert isinstance(res["figures"], list)

    # ---- confinement: un-recorded directories are refused --------------
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server + "/api/results?output=/etc")
    assert ei.value.code == 403
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server + "/api/figure?path=/etc/hostname")
    assert ei.value.code == 403
