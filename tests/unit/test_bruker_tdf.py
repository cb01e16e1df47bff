"""Native Bruker TDF reader: format-pinning decode test + writer round-trip.

The decoder golden test pins the exact binary layout (scan-count header,
explicit sizes for all but the last scan, +1 delta tof encoding); the
round-trip test drives reader and the independent test writer against
each other through sqlite + zstd + byte-planar encoding.
"""

import numpy as np
import pytest

from alphadia_tpu.rawdata.bruker_tdf import (
    ScanImConverter,
    TdfFormatError,
    TofMzConverter,
    _decode_frame_blob,
    read_bruker_d,
)
from alphadia_tpu.testing.tdf_writer import encode_frame, write_tdf


def test_decode_frame_blob_golden():
    # 2 scans: scan0 peaks (tof 5, int 100), (tof 7, int 50); scan1 (tof 3, int 10)
    # stream: [scan_count, 2*n(scan0), d0,i0, d1,i1, d2,i2]
    blob = np.asarray([2, 4, 6, 100, 2, 50, 4, 10], dtype=np.uint32)
    scan, tof, inten = _decode_frame_blob(blob)
    np.testing.assert_array_equal(scan, [0, 0, 1])
    np.testing.assert_array_equal(tof, [5, 7, 3])
    np.testing.assert_array_equal(inten, [100, 50, 10])


def test_decode_empty_scans():
    # 4 scans, peaks only in scan 2 (tof 0 -> delta 1)
    blob = np.asarray([4, 0, 0, 2, 1, 9], dtype=np.uint32)
    scan, tof, inten = _decode_frame_blob(blob)
    np.testing.assert_array_equal(scan, [2])
    np.testing.assert_array_equal(tof, [0])
    np.testing.assert_array_equal(inten, [9])


def test_encode_decode_random_frames():
    rng = np.random.default_rng(7)
    for _ in range(5):
        n_scans = int(rng.integers(1, 40))
        scans = []
        expect = []
        for s in range(n_scans):
            n = int(rng.integers(0, 30))
            tofs = np.sort(rng.choice(5000, size=n, replace=False)).astype(np.int64)
            ints = rng.integers(1, 2**16, size=n)
            scans.append((tofs, ints))
            expect.extend((s, t, v) for t, v in zip(tofs, ints))
        blob_bytes = encode_frame(scans)
        # decode through the reader's low-level path
        import zstandard

        from alphadia_tpu.rawdata.bruker_tdf import _unshuffle_u32

        payload = zstandard.ZstdDecompressor().decompress(blob_bytes[8:])
        scan, tof, inten = _decode_frame_blob(_unshuffle_u32(payload))
        got = list(zip(scan.tolist(), tof.tolist(), inten.tolist()))
        assert got == expect


def test_converters_round_trip():
    mz_conv = TofMzConverter(100.0, 1700.0, 400_000)
    mz = np.asarray([100.0, 523.7, 1699.9])
    tof = mz_conv.invert(mz)
    back = mz_conv(tof)
    np.testing.assert_allclose(back, mz, rtol=1e-5)
    im_conv = ScanImConverter(0.6, 1.5, 900)
    assert im_conv(np.asarray([0]))[0] == pytest.approx(1.5)
    assert im_conv(np.asarray([900]))[0] == pytest.approx(0.6)


def test_read_bruker_d_round_trip(tmp_path):
    mz_range, tof_max, im_range = (100.0, 1000.0), 200_000, (0.6, 1.5)
    n_scans = 10
    mz_conv = TofMzConverter(*mz_range, tof_max)
    im_conv = ScanImConverter(*im_range, n_scans)

    def frame_scans(peaks):
        # peaks: list of (scan, tof, intensity)
        out = []
        for s in range(n_scans):
            mine = sorted((t, v) for sc, t, v in peaks if sc == s)
            out.append(
                (
                    np.asarray([t for t, _ in mine], dtype=np.int64),
                    np.asarray([v for _, v in mine], dtype=np.int64),
                )
            )
        return out

    ms1_peaks = [(2, 1000, 55), (2, 40_000, 22), (7, 1000, 11)]
    dia_peaks = [(1, 500, 9), (4, 90_000, 77), (8, 123_456, 5)]
    frames = [
        {"time": 1.0, "msms_type": 0, "scans": frame_scans(ms1_peaks)},
        {
            "time": 1.1,
            "msms_type": 9,
            "window_group": 1,
            "scans": frame_scans(dia_peaks),
        },
    ]
    # window group 1: two windows splitting the scan range
    dia_windows = {1: [(0, 5, 450.0, 25.0), (5, 10, 650.0, 25.0)]}
    d_dir = write_tdf(
        tmp_path / "run.d",
        frames,
        dia_windows=dia_windows,
        mz_range=mz_range,
        tof_max_index=tof_max,
        im_range=im_range,
    )
    data = read_bruker_d(d_dir)

    # 1 MS1 spectrum + 2 DIA pseudo-spectra (one per window)
    assert data.n_spectra == 3
    np.testing.assert_array_equal(data.ms_level, [1, 2, 2])
    np.testing.assert_allclose(data.rt, [1.0, 1.1, 1.1])
    np.testing.assert_allclose(
        data.isolation_lower_mz, [-1.0, 437.5, 637.5]
    )
    np.testing.assert_allclose(
        data.isolation_upper_mz, [-1.0, 462.5, 662.5]
    )
    assert data.has_mobility

    def spectrum(i):
        a, b = data.peak_start_idx[i], data.peak_stop_idx[i]
        return data.mz[a:b], data.intensity[a:b], data.mobility[a:b]

    # MS1: 3 peaks sorted by m/z; two scan-2 peaks + one scan-7 peak
    mz0, int0, mob0 = spectrum(0)
    # sorted by m/z, ties kept in on-disk scan-major order (stable sort)
    exp = sorted(
        (
            float(mz_conv(np.asarray([t]))[0]),
            s,
            v,
            float(im_conv(np.asarray([s]))[0]),
        )
        for s, t, v in ms1_peaks
    )
    exp = [(mz, v, mob) for mz, _s, v, mob in exp]
    np.testing.assert_allclose(mz0, [e[0] for e in exp], rtol=1e-6)
    np.testing.assert_allclose(int0, [e[1] for e in exp])
    np.testing.assert_allclose(mob0, [e[2] for e in exp], rtol=1e-6)
    assert np.all(np.diff(mz0) >= 0)

    # DIA window 1 = scans 0..4 -> peaks at scans 1 and 4
    mz1, int1, _ = spectrum(1)
    assert len(mz1) == 2
    np.testing.assert_allclose(int1, [9, 77])
    # DIA window 2 = scans 5..9 -> the scan-8 peak
    mz2, int2, _ = spectrum(2)
    assert len(mz2) == 1
    np.testing.assert_allclose(int2, [5])
    np.testing.assert_allclose(
        mz2, mz_conv(np.asarray([123_456])), rtol=1e-6
    )


def test_unsupported_compression(tmp_path):
    d_dir = write_tdf(
        tmp_path / "bad.d",
        [{"time": 0.0, "msms_type": 0, "scans": [(np.asarray([1]), np.asarray([1]))]}],
    )
    import sqlite3

    con = sqlite3.connect(d_dir / "analysis.tdf")
    con.execute(
        "UPDATE GlobalMetadata SET Value='1' WHERE Key='TimsCompressionType'"
    )
    con.commit()
    con.close()
    with pytest.raises(TdfFormatError, match="TimsCompressionType"):
        read_bruker_d(d_dir)


def test_not_a_tdf_dir(tmp_path):
    with pytest.raises(TdfFormatError, match="not a TDF"):
        read_bruker_d(tmp_path)
