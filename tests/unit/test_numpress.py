"""MS-Numpress codec tests.

Byte-level fixtures are hand-derived from the public specification
(Teleman et al. 2014; ms-numpress reference C++), independent of the
encoder under test, so a matched encode/decode bug cannot hide. The role
matches the ingestion reach of the reference's alpharaw/pyteomics readers
(reference: alphadia/raw_data/alpharaw_wrapper.py:20-180).
"""

import struct

import numpy as np
import pytest

from alphadia_tpu.rawdata.numpress import (
    decode_linear,
    decode_pic,
    decode_slof,
    encode_linear,
    encode_pic,
    encode_slof,
)

# ------------------------------------------------------- hand-built bytes


def test_pic_hand_built_bytes():
    # 3 -> head 7 (seven leading zero nibbles), nibble 3
    # 10 -> head 7, nibble 0xA
    # 0 -> head 8, no nibbles; odd count padded with trailing 0x0
    data = bytes([0x73, 0x7A, 0x80])
    np.testing.assert_array_equal(decode_pic(data), [3.0, 10.0, 0.0])
    assert encode_pic([3, 10, 0]) == data


def test_linear_hand_built_bytes():
    # F=100; ints 500,550,600,700; diffs: 0 (head 8) and +50=0x32
    # (head 6, nibbles LSB-first 2,3) -> nibble stream 8,6,2,3
    data = (
        struct.pack(">d", 100.0)
        + struct.pack("<I", 500)
        + struct.pack("<I", 550)
        + bytes([0x86, 0x23])
    )
    np.testing.assert_allclose(decode_linear(data), [5.0, 5.5, 6.0, 7.0])
    assert encode_linear([5.0, 5.5, 6.0, 7.0], fixed_point=100.0) == data


def test_linear_negative_diff_hand_built():
    # F=10; ints 10,30,40; extrapolation 50, diff -10 = 0xFFFFFFF6:
    # seven leading 0xf nibbles -> head 15, nibble 6 -> byte 0xF6
    data = (
        struct.pack(">d", 10.0)
        + struct.pack("<I", 10)
        + struct.pack("<I", 30)
        + bytes([0xF6])
    )
    np.testing.assert_allclose(decode_linear(data), [1.0, 3.0, 4.0])
    assert encode_linear([1.0, 3.0, 4.0], fixed_point=10.0) == data


def test_slof_hand_built_bytes():
    # F=1000 (big-endian double header), u16 little-endian body
    data = struct.pack(">d", 1000.0) + np.array([0, 6908], "<u2").tobytes()
    out = decode_slof(data)
    np.testing.assert_allclose(out, [0.0, np.exp(6.908) - 1.0], rtol=1e-12)


# ------------------------------------------------------------ round trips


def test_linear_roundtrip_mz_like():
    rng = np.random.default_rng(7)
    mz = np.sort(rng.uniform(100.0, 1700.0, 5001))
    data = encode_linear(mz)
    out = decode_linear(data)
    fixed = struct.unpack(">d", data[:8])[0]
    np.testing.assert_allclose(out, mz, atol=0.5 / fixed)


def test_slof_roundtrip_intensity_like():
    rng = np.random.default_rng(8)
    inten = rng.uniform(0.0, 1e7, 4097)
    out = decode_slof(encode_slof(inten))
    # spec guarantee: relative error bounded by the log-space grid
    np.testing.assert_allclose(out, inten, rtol=5e-4, atol=0.5)


def test_pic_roundtrip_counts():
    rng = np.random.default_rng(9)
    counts = rng.integers(0, 2**31 - 1, 999, endpoint=True).astype(np.float64)
    counts[:3] = [0, 1, 2**31 - 1]  # pin the edges
    np.testing.assert_array_equal(decode_pic(encode_pic(counts)), counts)


def test_linear_roundtrip_tiny_arrays():
    for vals in ([], [42.0], [42.0, 43.5]):
        out = decode_linear(encode_linear(vals, fixed_point=1000.0))
        np.testing.assert_allclose(out, vals, atol=1e-3)


def test_pic_rejects_negative():
    with pytest.raises(ValueError, match="non-negative"):
        encode_pic([-1.0])


def test_truncated_stream_raises():
    # head nibble 1 promises seven following nibbles; only one arrives
    data = (
        struct.pack(">d", 100.0)
        + struct.pack("<I", 1)
        + struct.pack("<I", 2)
        + bytes([0x10])
    )
    with pytest.raises(ValueError, match="truncated|corrupt"):
        decode_linear(data)


def test_linear_negative_seeds_roundtrip():
    # legal per spec: seed ints are signed 32-bit two's complement
    # (the encoder stores value & 0xFFFFFFFF); unsigned decoding turned
    # a -5.0 start into ~4.3e6 at fixed_point=1000
    vals = np.array([-5.0, -4.25, -3.5, -1.0, 0.0, 2.5, 7.0])
    out = decode_linear(encode_linear(vals, fixed_point=1000.0))
    np.testing.assert_allclose(out, vals, atol=1e-3)


def test_linear_single_negative_seed():
    out = decode_linear(encode_linear([-42.0], fixed_point=1000.0))
    np.testing.assert_allclose(out, [-42.0], atol=1e-3)
