"""Multi-host (multi-process) initialization for TPU pods / CPU fleets.

TPU-native replacement of the reference's Slurm file-chunking driver
(reference: misc/distributed_search/outer.sh + inner.sh — N raw files
sharded over N nodes by slicing a file list): here every process joins one
``jax.distributed`` job, the global mesh spans all hosts' devices, and work
is partitioned two ways:

- **file-parallel** (the reference's model, kept): each host searches its
  slice of the raw-file list with a LOCAL mesh over its own chips; results
  meet on the shared filesystem (``--quant-dir``). Use
  ``shard_files_for_host`` for the deterministic file split.
- **batch-parallel** (single large file): the global mesh shards the
  precursor batch axis across all hosts; XLA inserts the cross-host
  collectives (psum for the standardization statistics) over ICI/DCN.

Environment contract (matches jax.distributed defaults): either run under
a supported cluster (GKE/Slurm/TPU pod — auto-detected), or set
``coordinator_address``/``num_processes``/``process_id`` explicitly.
"""

from __future__ import annotations

import os

from alphadia_tpu.reporting import logger

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the jax.distributed job. Safe to call multiple times; no-op for
    single-process runs with no coordinator configured.

    Returns True when the process is part of a multi-process job.
    """
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "ALPHADIA_TPU_COORDINATOR"
    )
    num_processes = num_processes or _env_int("ALPHADIA_TPU_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int(
        "ALPHADIA_TPU_PROCESS_ID"
    )

    in_cluster = any(
        v in os.environ
        for v in ("SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES", "KUBERNETES_SERVICE_HOST")
    )
    if coordinator_address is None and not in_cluster:
        return False

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _INITIALIZED = True
    except Exception as e:  # already initialized or single-process cluster
        logger.warning(f"jax.distributed initialize skipped: {e}")
        _INITIALIZED = True
    n = jax.process_count()
    if n > 1:
        logger.log(
            25,
            f"distributed: process {jax.process_index()}/{n}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices",
        )
    return n > 1


def shard_files_for_host(
    raw_files: list[str],
    process_id: int | None = None,
    num_processes: int | None = None,
) -> list[str]:
    """Deterministic raw-file slice for this host (file-parallel mode).

    Mirrors the reference's chunked file lists (outer.sh): file i goes to
    host i % num_processes — stable under reordering-free lists, balanced
    to within one file.
    """
    import jax

    pid = process_id if process_id is not None else (
        jax.process_index() if _INITIALIZED else 0
    )
    n = num_processes or (jax.process_count() if _INITIALIZED else 1)
    return [f for i, f in enumerate(raw_files) if i % n == pid]


def global_mesh():
    """Mesh over ALL devices of the distributed job (batch-parallel mode)."""
    from alphadia_tpu.parallel.mesh import make_mesh

    return make_mesh()


def _env_int(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None
