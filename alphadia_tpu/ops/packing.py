"""Single-buffer device->host transfer packing.

On the remote-TPU tunnel every device->host materialization costs a
dispatch round trip (~25-55 ms); a kernel returning a dict of k arrays
costs k round trips per batch.  These helpers bitcast every 32-bit leaf
of a result dict into one uint32 [B, C] buffer on device (one download)
and reassemble the dict on host with numpy views.

Keys are laid out in sorted order so pack/unpack agree without shipping
a schema.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DTYPES = {
    "bool": np.uint32,  # stored as 0/1 words
    "int32": np.int32,
    "float32": np.float32,
    "uint32": np.uint32,
}


def pack_u32(result: dict):
    """Pack a dict of [B, ...] 32-bit (or bool) arrays into uint32 [B, C]."""
    B = next(iter(result.values())).shape[0]
    cols = []
    for k in sorted(result):
        a = result[k]
        if a.dtype == jnp.bool_:
            a = a.astype(jnp.uint32)
        if a.dtype.itemsize != 4:
            raise ValueError(f"pack_u32: {k} has non-32-bit dtype {a.dtype}")
        cols.append(jax.lax.bitcast_convert_type(a, jnp.uint32).reshape(B, -1))
    return jnp.concatenate(cols, axis=1)


def unpack_u32(packed: np.ndarray, spec: dict[str, tuple]) -> dict:
    """Inverse of :func:`pack_u32`.

    ``spec`` maps key -> (dtype name in {'bool','int32','float32','uint32'},
    n columns).  Keys are consumed in sorted order, matching pack_u32.
    """
    p = np.ascontiguousarray(packed)
    o = 0
    out = {}
    for k in sorted(spec):
        name, w = spec[k]
        sl = np.ascontiguousarray(p[:, o : o + w])
        o += w
        a = sl.view(_DTYPES[name])
        out[k] = a.astype(bool) if name == "bool" else a
    if o != p.shape[1]:
        raise ValueError(f"unpack_u32: spec covers {o} of {p.shape[1]} columns")
    return out
