"""Worker for the 2-process file-parallel SearchStep test.

Usage: python tests/distributed_searchstep_worker.py <pid> <nproc> <port> <shared_dir>

Joins the jax.distributed job and runs a FULL SearchStep.run() with the
same config on every process: the file list shards across processes, each
host searches its slice into the shared quant dir, and only process 0
builds the cross-run outputs after the global barrier. Prints one JSON
line for the parent test.
"""

import json
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).parents[1]))


def main() -> None:
    pid, nproc, port, shared = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], Path(sys.argv[4])
    )
    os.environ["ALPHADIA_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["ALPHADIA_TPU_NUM_PROCESSES"] = str(nproc)
    os.environ["ALPHADIA_TPU_PROCESS_ID"] = str(pid)

    from alphadia_tpu.search_step import SearchStep

    raw_paths = sorted(str(p) for p in shared.glob("run_*.npz"))
    out_dir = shared / "out"
    config = {
        "raw_paths": raw_paths,
        "library_path": str(shared / "library.hdf"),
        "general": {"random_state": 1, "save_figures": False},
        "calibration": {
            "batch_size": 150,
            "optimization_lock_target": 80,
            "min_steps": 2,
            "max_steps": 5,
        },
        "search": {
            "target_ms1_tolerance": 10,
            "target_ms2_tolerance": 12,
            "target_rt_tolerance": 30,
        },
        "tpu": {"selection_batch": 256, "scoring_batch": 256},
    }
    step = SearchStep(str(out_dir), cli_config=config)
    step.run()

    built = (out_dir / "precursors.parquet").exists()
    quant = out_dir / "quant"
    done_runs = sorted(
        p.parent.name for p in quant.glob("*/psm.parquet")
    ) if quant.exists() else []
    print(
        json.dumps(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "built_at_return": built,
                "runs_with_psm": done_runs,
            }
        )
    )


if __name__ == "__main__":
    main()
