"""shard_map wrappers for the pallas kernels.

The pallas XIC kernel addresses on-chip buffers directly, so under a
multi-device mesh it must run per shard: wrap with ``shard_map`` so every
device executes the kernel on its slice of the query batch against its
replicated copy of the peak store. Collectives are not needed — XIC
extraction is embarrassingly parallel over queries; downstream reductions
(score standardization, FDR training) stay in plain sharded jit where XLA
inserts the psums.

On CPU meshes (tests, dry runs) the kernel runs in pallas interpret mode.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from alphadia_tpu.ops.xic_pallas import extract_xic_pallas
from alphadia_tpu.parallel.mesh import DATA_AXIS


def extract_xic_pallas_sharded(
    mesh: Mesh,
    peak_packed,
    cell_start,
    slot_idx,  # [B, Q] — B must divide by the mesh size
    query_mz,
    tol_ppm,
    cycle_start,  # [B]
    *,
    n_cycles: int,
    n_bins: int,
    bin_mz_min: float,
    bin_width: float,
    slab: int = 256,
    window_len: int = 64,
    with_mz: bool = False,
    interpret: bool | None = None,
):
    """Batch-sharded pallas XIC over a data-parallel mesh.

    Peak store arrays are replicated, query arrays sharded on axis 0;
    returns [B, Q, W] sharded the same way.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(
        extract_xic_pallas,
        n_cycles=n_cycles,
        n_bins=n_bins,
        bin_mz_min=bin_mz_min,
        bin_width=bin_width,
        slab=slab,
        window_len=window_len,
        with_mz=with_mz,
        interpret=interpret,
    )

    def _local(packed, cs, sidx, qmz, tol, c0):
        return kernel(packed, cs, sidx, qmz, tol, c0)

    sharded = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P(), P(),  # peak store + cell index: replicated
            P(DATA_AXIS), P(DATA_AXIS),  # queries: batch-sharded
            P(),  # tolerance scalar
            P(DATA_AXIS),  # cycle_start
        ),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)) if with_mz else P(DATA_AXIS),
        check_vma=False,
    )
    return sharded(
        peak_packed, cell_start,
        slot_idx, query_mz, tol_ppm, cycle_start,
    )
