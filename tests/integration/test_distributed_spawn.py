"""Real 2-process jax.distributed run (CPU): spawn two workers that join a
coordinator, shard the raw-file list, and execute one batch-parallel
scoring step over the GLOBAL mesh with a cross-host collective.

(reference analog: misc/distributed_search/outer.sh semantics — work split
across hosts; here the jax.distributed replacement is exercised for real,
not just its single-process no-op.)
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parents[2]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_batch_parallel_scoring():
    port = _free_port()
    env = dict(os.environ)
    env.pop("ALPHADIA_TPU_COORDINATOR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "distributed_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    # file shards partition the list
    all_files = sorted(by_pid[0]["files"] + by_pid[1]["files"])
    assert all_files == sorted(f"run{i}.mzML" for i in range(5))
    assert set(by_pid[0]["files"]).isdisjoint(by_pid[1]["files"])
    # the cross-host collective produced the SAME global value on both hosts
    assert by_pid[0]["gmean"] == by_pid[1]["gmean"]
    assert abs(by_pid[0]["gmean"]) > 0
