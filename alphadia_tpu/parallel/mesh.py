"""Device mesh + sharding helpers.

TPU-native scale-out design (replaces the reference's Slurm file-chunking,
misc/distributed_search/ — see SURVEY §2.6): one data-parallel mesh axis
``data``; the spectral library batch arrays are sharded along the precursor
(candidate) dimension, the raw peak store is replicated, and host-side
statistics consume gathered results. Multi-host uses jax.distributed with
the same mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, arrays: dict, batch_keys: set[str]) -> dict:
    """Device_put arrays: batch arrays sharded on axis 0, rest replicated."""
    out = {}
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    for k, v in arrays.items():
        out[k] = jax.device_put(v, bs if k in batch_keys else rep)
    return out


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, target - n)
    return np.pad(arr, pad)
