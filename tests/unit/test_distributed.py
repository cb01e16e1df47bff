"""Multi-host wiring helpers (parallel/distributed.py).

True multi-process jax.distributed cannot run in this environment; these
tests cover the deterministic file split and the single-process no-op.
"""

import alphadia_tpu.parallel.distributed as dist


def test_initialize_noop_outside_cluster(monkeypatch):
    monkeypatch.delenv("SLURM_JOB_ID", raising=False)
    monkeypatch.delenv("ALPHADIA_TPU_COORDINATOR", raising=False)
    monkeypatch.setattr(dist, "_INITIALIZED", False)
    assert dist.initialize_distributed() is False


def test_shard_files_balanced():
    files = [f"r{i}.mzML" for i in range(10)]
    got = [
        dist.shard_files_for_host(files, process_id=p, num_processes=3)
        for p in range(3)
    ]
    # covers every file exactly once, balanced to within one file
    flat = [f for g in got for f in g]
    assert sorted(flat) == sorted(files)
    sizes = [len(g) for g in got]
    assert max(sizes) - min(sizes) <= 1
    # deterministic
    assert got[0] == dist.shard_files_for_host(files, process_id=0, num_processes=3)


def test_shard_files_single_process():
    files = ["a.mzML", "b.mzML"]
    assert dist.shard_files_for_host(files, process_id=0, num_processes=1) == files
