"""Worker process for the 2-process jax.distributed test.

Usage: python tests/distributed_worker.py <process_id> <num_processes> <port>

Joins the distributed job, shards the file list, then runs ONE
batch-parallel scoring step over the GLOBAL mesh (batch axis split across
processes) plus an explicit cross-host collective (global feature mean).
Prints one JSON line the parent test asserts on.
"""

import json
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).parents[1]))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from alphadia_tpu.parallel.distributed import (
        initialize_distributed,
        shard_files_for_host,
    )

    ok = initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert ok, "initialize_distributed returned False"
    assert jax.process_count() == nproc

    files = [f"run{i}.mzML" for i in range(5)]
    mine = shard_files_for_host(files)

    # ---- one batch-parallel scoring step over the global mesh ---------
    import functools

    import numpy as np

    import __graft_entry__ as g
    from alphadia_tpu.ops.scoring import score_candidates_batch
    from alphadia_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    dia, prec, frag = g._make_demo_data()
    n_global_dev = jax.device_count()
    B = 2 * n_global_dev  # batch axis sharded across ALL hosts' devices
    args, static = g._scoring_inputs(dia, prec, frag, B=B)
    mesh = make_mesh(n_global_dev)
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    shardings = tuple([rep] * 6 + [bsh] * 11 + [rep] * 2 + [bsh] * 6 + [rep] * 2)

    import jax.numpy as jnp

    local_rows = B // nproc

    def place(a, s):
        a = np.asarray(a)
        if s is bsh:
            # every process holds the full batch; hand jax this process's rows
            local = a[pid * local_rows : (pid + 1) * local_rows]
            return jax.make_array_from_process_local_data(s, local, a.shape)
        return jax.make_array_from_process_local_data(s, a, a.shape)

    placed = tuple(place(a, s) for a, s in zip(args, shardings))
    fn = functools.partial(score_candidates_batch, **static)

    @functools.partial(jax.jit, in_shardings=shardings, out_shardings=rep)
    def step(*a):
        features, valid, _ = fn(*a)
        # explicit cross-host collective: global mean over the sharded axis
        return jnp.nan_to_num(features, posinf=0.0, neginf=0.0).mean()

    gmean = float(step(*placed))
    print(json.dumps({"pid": pid, "files": mine, "gmean": round(gmean, 6)}))


if __name__ == "__main__":
    main()
