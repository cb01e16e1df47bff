"""MS-Numpress codecs (linear / slof / positive-integer), pure numpy.

Implements the public MS-Numpress specification (Teleman et al., MCP 2014,
"Numerical compression schemes for proteomics mass spectrometry data";
reference C++: ms-numpress/MSNumpress.cpp) so mzML files written with
numpress encoding can be ingested directly — the ingestion reach the
reference gets through alpharaw/pyteomics (reference:
alphadia/raw_data/alpharaw_wrapper.py:20-180). Round 2 detected these
arrays and refused; round 3 decodes them.

Wire formats (all little-endian except the fixed point):

- **linear** (``MS:1002312``): 8-byte big-endian double fixed point F;
  two 4-byte unsigned ints = round(v*F) of the first two values; then for
  each value the signed difference from the linear extrapolation
  ``2*prev - prevprev`` in the variable-length nibble code below.
- **slof** (``MS:1002314``): 8-byte big-endian double fixed point F; each
  value a 2-byte unsigned short ``round(log(1+v)*F)``; decode
  ``exp(x/F)-1``.
- **pic** (``MS:1002313``): each value ``round(v)`` in the nibble code,
  no header.

Nibble code for one 32-bit two's-complement int: a head nibble ``h``;
``h<=8`` means ``h`` leading 0x0 nibbles, ``h>8`` means ``h-8`` leading
0xf nibbles; the remaining ``8-n`` nibbles follow least-significant
first. An odd total nibble count is padded with a trailing 0x0 nibble.

Encoders are provided for fixture generation and round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np


def _to_nibbles(data: bytes | np.ndarray) -> np.ndarray:
    """Byte stream -> uint8 nibble stream (high nibble first per byte)."""
    b = np.frombuffer(bytes(data), dtype=np.uint8)
    out = np.empty(2 * len(b), np.uint8)
    out[0::2] = b >> 4
    out[1::2] = b & 0xF
    return out


def _from_nibbles(nibbles: list[int]) -> bytes:
    if len(nibbles) % 2:
        nibbles = nibbles + [0]
    arr = np.asarray(nibbles, np.uint8)
    return ((arr[0::2] << 4) | arr[1::2]).tobytes()


def _decode_ints(nibbles: np.ndarray) -> np.ndarray:
    """Decode the variable-length nibble stream into signed 32-bit ints."""
    out = []
    i, n_nib = 0, len(nibbles)
    while i < n_nib:
        head = int(nibbles[i])
        i += 1
        if head <= 8:
            n = head
            res = 0
        else:
            n = head - 8
            # n leading 0xf nibbles at the TOP of the 32-bit word
            res = (0xFFFFFFFF << (4 * (8 - n))) & 0xFFFFFFFF
        k = 8 - n
        if i + k > n_nib:
            if head == 0 and i >= n_nib:  # trailing pad nibble
                break
            raise ValueError("truncated numpress nibble stream")
        for j in range(k):
            res |= int(nibbles[i + j]) << (4 * j)
        i += k
        if res & 0x80000000:
            res -= 1 << 32
        out.append(res)
    return np.asarray(out, np.int64)


def _encode_int(x: int, out: list[int]) -> None:
    m = x & 0xFFFFFFFF
    if m >> 28 == 0xF:  # leading-ones (negative) form
        n = 0
        while n < 7 and (m >> (4 * (7 - n))) & 0xF == 0xF:
            n += 1
        out.append(8 + n)
    else:
        n = 0
        while n < 8 and (m >> (4 * (7 - n))) & 0xF == 0:
            n += 1
        out.append(n)
    for j in range(8 - n):
        out.append((m >> (4 * j)) & 0xF)


def _read_fixed_point(data: bytes) -> float:
    if len(data) < 8:
        raise ValueError("numpress buffer too short for fixed-point header")
    return struct.unpack(">d", bytes(data[:8]))[0]


# ---------------------------------------------------------------- linear
def decode_linear(data: bytes) -> np.ndarray:
    fixed = _read_fixed_point(data)
    if len(data) == 8:
        return np.zeros(0, np.float64)
    if len(data) < 12:
        raise ValueError("corrupt numpress-linear buffer")
    first = struct.unpack("<I", bytes(data[8:12]))[0]
    if len(data) < 16:
        return np.array([first / fixed], np.float64)
    second = struct.unpack("<I", bytes(data[12:16]))[0]
    diffs = _decode_ints(_to_nibbles(data[16:]))
    ints = np.empty(2 + len(diffs), np.int64)
    ints[0], ints[1] = first, second
    for k, d in enumerate(diffs):
        ints[k + 2] = ints[k + 1] + (ints[k + 1] - ints[k]) + d
    return ints / fixed


def optimal_linear_fixed_point(values: np.ndarray) -> float:
    values = np.asarray(values, np.float64)
    if len(values) == 0:
        return 0.0
    vmax = max(float(np.abs(values).max()), 1.0)
    return np.floor(0x7FFFFFFF / vmax)


def encode_linear(values: np.ndarray, fixed_point: float | None = None) -> bytes:
    values = np.asarray(values, np.float64)
    fixed = float(fixed_point or optimal_linear_fixed_point(values))
    head = struct.pack(">d", fixed)
    ints = np.round(values * fixed).astype(np.int64)
    if len(values) == 0:
        return head
    out = head + struct.pack("<I", int(ints[0]) & 0xFFFFFFFF)
    if len(values) == 1:
        return out
    out += struct.pack("<I", int(ints[1]) & 0xFFFFFFFF)
    nibbles: list[int] = []
    for k in range(2, len(ints)):
        extrapol = ints[k - 1] + (ints[k - 1] - ints[k - 2])
        _encode_int(int(ints[k] - extrapol), nibbles)
    return out + _from_nibbles(nibbles)


# ------------------------------------------------------------------ slof
def decode_slof(data: bytes) -> np.ndarray:
    fixed = _read_fixed_point(data)
    body = np.frombuffer(bytes(data[8:]), dtype="<u2").astype(np.float64)
    return np.exp(body / fixed) - 1.0


def optimal_slof_fixed_point(values: np.ndarray) -> float:
    values = np.asarray(values, np.float64)
    if len(values) == 0:
        return 0.0
    lmax = max(float(np.log1p(np.abs(values)).max()), 1.0)
    return np.floor(0xFFFF / lmax)


def encode_slof(values: np.ndarray, fixed_point: float | None = None) -> bytes:
    values = np.asarray(values, np.float64)
    fixed = float(fixed_point or optimal_slof_fixed_point(values))
    shorts = np.round(np.log1p(values) * fixed).astype("<u2")
    return struct.pack(">d", fixed) + shorts.tobytes()


# ------------------------------------------------------------------- pic
def decode_pic(data: bytes) -> np.ndarray:
    return _decode_ints(_to_nibbles(data)).astype(np.float64)


def encode_pic(values: np.ndarray) -> bytes:
    nibbles: list[int] = []
    for v in np.round(np.asarray(values, np.float64)).astype(np.int64):
        if v < 0:
            raise ValueError("numpress-pic encodes non-negative counts only")
        _encode_int(int(v), nibbles)
    return _from_nibbles(nibbles)
