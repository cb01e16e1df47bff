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


@pytest.mark.slow
def test_two_process_full_search_aggregates_on_process_zero(tmp_path):
    """File-parallel end to end: two processes run the SAME SearchStep
    over two raw files into one shared output; each searches its slice,
    and exactly one aggregation covers BOTH runs."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import pandas as pd

    from alphadia_tpu.library.speclib import SpecLibFlat
    from alphadia_tpu.rawdata.source import save_npz
    from alphadia_tpu.testing.synthetic import (
        SyntheticConfig,
        add_synthetic_decoys,
        make_synthetic_dia,
    )

    prec = frag = None
    for i, acq in enumerate((101, 202)):
        spectra, p, f = make_synthetic_dia(
            SyntheticConfig(
                n_peptides=300, n_windows=6, n_cycles=350, seed=21, acq_seed=acq
            )
        )
        if prec is None:
            prec, frag = p, f
        save_npz(tmp_path / f"run_{i}.npz", spectra)
    prec, frag = add_synthetic_decoys(prec, frag)
    SpecLibFlat(
        prec.drop(columns=["_truth_detectable", "_truth_rt"]), frag
    ).save_hdf(tmp_path / "library.hdf")

    port = _free_port()
    env = dict(os.environ)
    for var in (
        "ALPHADIA_TPU_COORDINATOR",
        "ALPHADIA_TPU_NUM_PROCESSES",
        "ALPHADIA_TPU_PROCESS_ID",
    ):
        env.pop(var, None)
    procs = [
        subprocess.Popen(
            [sys.executable,
             str(REPO / "tests" / "distributed_searchstep_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads([ln for ln in out.splitlines() if ln.startswith("{")][-1]))

    by_pid = {o["pid"]: o for o in outs}
    assert by_pid[0]["process_count"] == 2
    # both per-run quant artifacts exist (one written by each host)
    assert by_pid[0]["runs_with_psm"] == ["run_0", "run_1"]
    # every host leaves run() AFTER the single aggregation completed
    # (multistep plans read the step artifacts right after returning)
    assert by_pid[1]["built_at_return"]
    # the aggregated table (built once, by process 0) covers BOTH runs
    psm = pd.read_parquet(tmp_path / "out" / "precursors.parquet")
    assert psm["raw.name"].nunique() == 2
    assert len(psm) > 100
    stat = pd.read_csv(tmp_path / "out" / "stat.tsv", sep="\t")
    assert len(stat) == 2
