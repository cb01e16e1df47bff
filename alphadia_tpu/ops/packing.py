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


# ---- 16-bit validity bitmasks (single definition for every transport) --
# bool[B, K] <-> uint16[B, ceil(K/16)] words, bit i of word w = flag of
# column 16*w + i. The jnp pair runs inside jitted kernels, the np pair on
# host; all four MUST stay bit-for-bit inverses of each other.


def pack_bits_jnp(valid):
    """bool[B, K] -> uint16[B, ceil(K/16)] (device, inside jit)."""
    K = valid.shape[1]
    idx = jnp.arange(K, dtype=jnp.uint32)
    contrib = valid.astype(jnp.uint32) << (idx % 16)
    return jnp.stack(
        [
            (contrib * (idx // 16 == w)).sum(axis=1).astype(jnp.uint16)
            for w in range((K + 15) // 16)
        ],
        axis=1,
    )


def unpack_bits_jnp(words, K: int):
    """uint16[B, n_words] -> bool[B, K] (device, inside jit)."""
    w = words.astype(jnp.uint32)
    bit = jnp.arange(K, dtype=jnp.uint32)
    return ((w[:, bit // 16] >> (bit % 16)[None, :]) & 1).astype(bool)


def pack_valid_bits_np(valid: np.ndarray) -> np.ndarray:
    """bool[B, K] -> uint16[B, ceil(K/16)] (host, numpy)."""
    B, K = valid.shape
    n_words = (K + 15) // 16
    idx = np.arange(K)
    contrib = valid.astype(np.uint32) << (idx % 16)[None, :]
    words = np.zeros((B, n_words), np.uint16)
    for w in range(n_words):
        sel = idx // 16 == w
        words[:, w] = contrib[:, sel].sum(axis=1).astype(np.uint16)
    return words


def unpack_bits_np(words: np.ndarray, K: int) -> np.ndarray:
    """uint16[B, n_words] -> bool[B, K] (host, numpy)."""
    w = np.ascontiguousarray(words).astype(np.uint32)
    idx = np.arange(K)
    return (((w[:, idx // 16] >> (idx % 16)[None, :]) & 1)).astype(bool)


# host->device wire dtypes for the per-candidate scoring batch arrays:
# halves upload bytes through the TPU tunnel (~40 MB/s); the kernel casts
# back to canonical dtypes at trace time. m/z arrays and quad window
# bounds stay f32 (precision / 1e7 sentinel).
_WIRE_F16 = {"frag_intensity", "iso_intensity", "mobility_width"}
_WIRE_U8 = {"frag_type", "frag_position"}
_WIRE_I16 = {
    "ms2_slot", "ms1_slot",
    "frame_center", "frame_start", "frame_stop",
    "scan_lo", "scan_hi",
    # selection batch arrays
    "frag_slot", "iso_slot", "cycle_start", "n_valid_fragments",
}


def compact_wire(key: str, a: np.ndarray) -> np.ndarray:
    """Compact one scoring batch array to its wire dtype (lossless for
    index/slot arrays within i16/u8 range; ~5e-4 relative for f16
    intensities). Falls back to the original dtype when values don't fit,
    so exotic inputs stay correct at full width."""
    if key == "frag_valid":
        return pack_valid_bits_np(a)
    if key in _WIRE_F16:
        # scalar min/max: no |a|-sized temporary on the upload hot path
        if a.size and max(-float(a.min()), float(a.max())) > 60000.0:
            return a
        return a.astype(np.float16)
    if key in _WIRE_U8:
        if a.size and (int(a.min()) < 0 or int(a.max()) > 255):
            return a
        return a.astype(np.uint8)
    if key in _WIRE_I16:
        if a.size and (int(a.min()) < -32768 or int(a.max()) > 32767):
            return a
        return a.astype(np.int16)
    return a


# selection result wire kinds: everything the selection kernel emits is
# 16-bit safe when n_cycles/n_scan_bins < 32768 and candidate_count <= 16
# (valid flags -> one bitmask word, scores -> f16, indices -> i16)
_SEL_KINDS = {
    "valid": "bits",
    "rank": "i16",
    "score": "f16",
    "cycle_center": "i16",
    "cycle_start": "i16",
    "cycle_stop": "i16",
    "scan_center": "i16",
    "scan_start": "i16",
    "scan_stop": "i16",
}


def pack_sel_u16(result: dict):
    """Pack the selection result dict into ONE uint16 [B, C] buffer
    (device side) — half the download bytes of :func:`pack_u32`.

    Keys are consumed in sorted order, matching :func:`unpack_sel_u16`.
    Caller guarantees 16-bit ranges (see driver guard in
    search/selection.py).
    """
    B = next(iter(result.values())).shape[0]
    cols = []
    for k in sorted(result):
        a = result[k]
        kind = _SEL_KINDS[k]
        if kind == "bits":
            cols.append(pack_bits_jnp(a))
        elif kind == "f16":
            cols.append(
                jax.lax.bitcast_convert_type(
                    a.astype(jnp.float16), jnp.uint16
                ).reshape(B, -1)
            )
        else:  # i16
            cols.append(
                jax.lax.bitcast_convert_type(
                    a.astype(jnp.int16), jnp.uint16
                ).reshape(B, -1)
            )
    return jnp.concatenate(cols, axis=1)


def unpack_sel_u16(packed: np.ndarray, spec: dict[str, tuple]) -> dict:
    """Host-side inverse of :func:`pack_sel_u16`.

    ``spec`` is the same mapping used with :func:`unpack_u32` (key ->
    (dtype name, K)); kinds come from the shared ``_SEL_KINDS`` table and
    values are widened back to the spec dtypes.
    """
    p = np.ascontiguousarray(packed)
    o = 0
    out = {}
    for k in sorted(spec):
        name, K = spec[k]
        kind = _SEL_KINDS[k]
        if kind == "bits":
            n_words = (K + 15) // 16
            out[k] = unpack_bits_np(p[:, o : o + n_words], K)
            o += n_words
        elif kind == "f16":
            sl = np.ascontiguousarray(p[:, o : o + K])
            o += K
            out[k] = sl.view(np.float16).astype(np.float32)
        else:
            sl = np.ascontiguousarray(p[:, o : o + K])
            o += K
            out[k] = sl.view(np.int16).astype(np.int32)
    if o != p.shape[1]:
        raise ValueError(f"unpack_sel_u16: spec covers {o} of {p.shape[1]}")
    return out


# ---- byte-plane wire transform (download-side) -------------------------
# The remote-TPU tunnel compresses transfers in flight (measured: constant
# payloads move ~3x faster than random ones at the same byte count). A
# packed [B, C] buffer interleaves high/low bytes of f16/bf16/i16 columns,
# which defeats the compressor. Splitting into byte planes laid out
# column-major — plane p, column c contiguous over candidates — groups the
# highly correlated exponent/sign bytes of each column into long runs:
# measured 5x effective download bandwidth (5 -> 27 MB/s) on realistic
# feature payloads, with no loss (pure bit rearrangement). On directly
# attached TPUs the transform is a cheap on-device shift+transpose.


def wire_encode_jnp(x):
    """uintN [B, C] -> uint8 [N_bytes, C, B] byte planes (device, in jit).

    Plane i holds byte i (little-endian) of every element, transposed so a
    column's bytes are contiguous over the batch dimension.
    """
    nbytes = x.dtype.itemsize
    planes = [(x >> jnp.asarray(8 * i, x.dtype)).astype(jnp.uint8).T for i in range(nbytes)]
    return jnp.stack(planes, axis=0)


def wire_decode_np(planes: np.ndarray, dtype=np.uint16) -> np.ndarray:
    """Host-side inverse of :func:`wire_encode_jnp`: uint8 [N, C, B] ->
    uintN [B, C]."""
    p = np.asarray(planes)
    dtype = np.dtype(dtype)
    if p.shape[0] != dtype.itemsize:
        raise ValueError(
            f"wire_decode_np: {p.shape[0]} planes for {dtype.itemsize}-byte dtype"
        )
    acc = p[0].astype(dtype.type)
    for i in range(1, p.shape[0]):
        acc = acc | (p[i].astype(dtype.type) << np.asarray(8 * i, dtype.type))
    return np.ascontiguousarray(acc.T)


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
