"""Policy helpers shared by the selection and scoring drivers.

These encode decisions that MUST agree between the two stages — which
device path runs, how candidate batches shard over a mesh, which
observation slots a precursor matches, and which top-k fragment subset
is used — so they live in one place instead of drifting apart as
copy-pasted blocks.
"""

from __future__ import annotations

import numpy as np


def pallas_available() -> bool:
    """Pallas XIC path: TPU backends, single device (multi-chip runs keep
    the XLA path until the kernel is wrapped in shard_map)."""
    import jax

    return jax.default_backend() not in ("cpu",) and len(jax.devices()) == 1


def data_parallel_mesh(mesh_devices, batch_size: int):
    """Data-parallel mesh when more than one device is visible
    (``tpu.mesh_devices`` caps the data-parallel axis); None when a mesh
    cannot shard the batch evenly.

    Under a multi-process (jax.distributed) job the mesh covers LOCAL
    devices only: file-parallel mode runs a different file on every host,
    so a global mesh here would issue unsynchronized collectives across
    processes executing different programs (deadlock). Cross-host
    batch-parallel execution builds its global mesh explicitly
    (parallel/distributed.py).
    """
    import jax

    devices = jax.local_devices() if jax.process_count() > 1 else jax.devices()
    n = len(devices)
    if mesh_devices:
        n = min(n, int(mesh_devices))
    if n <= 1 or batch_size % n:
        return None
    from alphadia_tpu.parallel.mesh import make_mesh

    return make_mesh(n, devices=devices)


def first_k_true(mask: np.ndarray, k: int) -> np.ndarray:
    """Indices of the first k true columns per row; -1 where fewer."""
    # argsort of ~mask is stable: true columns first in column order
    order = np.argsort(~mask, axis=1, kind="stable")[:, :k]
    has = np.take_along_axis(mask, order, axis=1)
    return np.where(has, order.astype(np.int32), -1)


def top_k_fragment_order(valid: np.ndarray, intensity: np.ndarray, k: int):
    """Column order selecting the top-k fragments by intensity.

    Stable descending sort on the negated key: first occurrence wins
    ties. Selection and scoring both use THIS function so the two stages
    always pick the same fragment subset.
    """
    return np.argsort(-np.where(valid, intensity, -1.0), axis=1, kind="stable")[:, :k]


def assign_observation_slots(
    dia, mono_mz: np.ndarray, iso_mz: np.ndarray, max_ms2_obs: int, max_ms1_obs: int
):
    """Cycle-slot assignment per precursor.

    Returns ``(ms2_slots [n, max_ms2_obs], ms1_slots [n, O1], win_lo,
    win_hi)`` — MS2 slots whose isolation window overlaps the isotope
    envelope (first-k in cycle order, -1 padded, with the matched quad
    window bounds), and the first ``max_ms1_obs`` MS1 slots broadcast per
    row (single [n,1] column of -1 when the run has no MS1).
    """
    n = len(mono_mz)
    win_lo_all = dia.cycle[0, :, 0, 0].astype(np.float32)
    win_hi_all = dia.cycle[0, :, 0, 1].astype(np.float32)
    is_ms2 = win_lo_all >= 0
    iso_hi = iso_mz[:, -1]
    match2 = (
        is_ms2[None, :]
        & (win_hi_all[None, :] > mono_mz[:, None])
        & (win_lo_all[None, :] < iso_hi[:, None])
    )
    ms2_slots = first_k_true(match2, max_ms2_obs)
    slot_safe = np.clip(ms2_slots, 0, len(win_lo_all) - 1)
    win_lo = np.where(ms2_slots >= 0, win_lo_all[slot_safe], 1e7).astype(np.float32)
    win_hi = np.where(ms2_slots >= 0, win_hi_all[slot_safe], 1e7 + 1).astype(
        np.float32
    )
    # trim trailing MS2 observation columns that are invalid for EVERY
    # precursor in the batch: non-overlapping DIA schemes never populate
    # a 2nd window slot, so max_ms2_obs=2 makes HALF the fragment XIC
    # queries invalid by construction (the gather kernel is bound by
    # per-query sequencing). first_k_true fills columns as a prefix, so
    # used columns are contiguous from 0 and a trailing trim is exact —
    # every reduction over the obs axis is a masked sum, and dropped
    # columns contributed only zeros.
    if ms2_slots.shape[1] > 1:
        used = (ms2_slots >= 0).any(axis=0)
        o2_eff = int(used.nonzero()[0].max() + 1) if used.any() else 1
        if o2_eff < ms2_slots.shape[1]:
            ms2_slots = ms2_slots[:, :o2_eff]
            win_lo = win_lo[:, :o2_eff]
            win_hi = win_hi[:, :o2_eff]

    ms1_all = np.nonzero(~is_ms2)[0][:max_ms1_obs]
    if dia.has_ms1 and len(ms1_all):
        ms1_slots = np.broadcast_to(
            ms1_all.astype(np.int32), (n, len(ms1_all))
        ).copy()
    else:
        ms1_slots = np.full((n, 1), -1, np.int32)
    return ms2_slots.astype(np.int32), ms1_slots, win_lo, win_hi


def prefetch_to_host(results) -> None:
    """Kick off async device->host copies for every pending device buffer.

    The harvest loops call ``np.asarray`` per batch with host-side wire
    decode in between; without an async copy the tunnel/PCIe transfer of
    batch N+1 waits for batch N's host decode (measured 10.6 of ~28 MB/s
    tunnel utilization). Starting all copies first lets transfers pipeline
    with both the remaining device compute and the host decode.
    """
    for r in results:
        vals = r.values() if isinstance(r, dict) else (r,)
        for v in vals:
            fn = getattr(v, "copy_to_host_async", None)
            if fn is not None:
                try:
                    fn()
                except Exception:  # relay backends may not implement it
                    return
