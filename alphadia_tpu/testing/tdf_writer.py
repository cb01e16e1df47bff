"""Independent Bruker TDF ``.d`` writer for round-trip testing.

Deliberately written loop-by-loop from the format description (header,
byte-planar u32 stream, per-scan +1 delta encoding, zstd per frame) and
sharing NO code with ``rawdata/bruker_tdf.py`` — so a bug in either side
fails the round-trip test instead of cancelling out structurally.
"""

from __future__ import annotations

import sqlite3
import struct
from pathlib import Path

import numpy as np


def encode_frame(scan_peaks: list[tuple[np.ndarray, np.ndarray]]) -> bytes:
    """Encode one frame: list of (tof_indices ascending, intensities) per scan.

    Returns the complete on-disk blob (8-byte header + zstd payload).
    """
    import zstandard

    scan_count = len(scan_peaks)
    words: list[int] = [scan_count]
    # per-scan 2*count for all but the last scan
    for tofs, _ in scan_peaks[:-1]:
        words.append(2 * len(tofs))
    for tofs, intens in scan_peaks:
        prev = -1
        for tof, inten in zip(tofs, intens):
            tof = int(tof)
            if tof <= prev:
                raise ValueError("tof indices must be strictly ascending per scan")
            words.append(tof - prev)  # delta of (tof+1) sequence
            words.append(int(inten))
            prev = tof
    u32 = np.asarray(words, dtype=np.uint32)
    le = u32.view(np.uint8).reshape(-1, 4)  # little-endian byte columns
    planar = bytes(le[:, 0]) + bytes(le[:, 1]) + bytes(le[:, 2]) + bytes(le[:, 3])
    comp = zstandard.ZstdCompressor().compress(planar)
    return struct.pack("<II", len(comp) + 8, scan_count) + comp


def spectrum_data_to_tdf(
    spectra,
    out_dir: str | Path,
    mz_range: tuple[float, float] = (100.0, 1700.0),
    tof_max_index: int = 1_600_000,
    im_range: tuple[float, float] = (0.5, 1.6),
    n_scans: int = 927,
) -> Path:
    """Re-encode a 4D ``SpectrumData`` as a Bruker ``.d`` directory.

    Each MS1 spectrum becomes an MS1 frame; each MS2 pseudo-spectrum
    becomes one diaPASEF frame whose window group holds a single
    full-scan-range isolation window. Inverse index conversions
    (mz->tof sqrt-linear, 1/K0->scan linear descending) are written out
    here from the format description, independent of the reader.
    """
    sqrt_lo, sqrt_hi = np.sqrt(mz_range[0]), np.sqrt(mz_range[1])
    tof_slope = (sqrt_hi - sqrt_lo) / tof_max_index
    im_slope = (im_range[0] - im_range[1]) / n_scans  # scan 0 = upper bound

    def mz_to_tof(mz):
        return np.round((np.sqrt(mz) - sqrt_lo) / tof_slope).astype(np.int64)

    def im_to_scan(im):
        scan = np.round((im - im_range[1]) / im_slope).astype(np.int64)
        return np.clip(scan, 0, n_scans - 1)

    # distinct isolation windows -> window groups
    window_key = {}
    dia_windows = {}
    frames = []
    for i in range(spectra.n_spectra):
        a, b = int(spectra.peak_start_idx[i]), int(spectra.peak_stop_idx[i])
        mz = spectra.mz[a:b]
        inten = np.maximum(np.round(spectra.intensity[a:b]), 1).astype(np.int64)
        mob = (
            spectra.mobility[a:b]
            if spectra.mobility is not None
            else np.full(b - a, (im_range[0] + im_range[1]) / 2, np.float32)
        )
        tof = mz_to_tof(mz)
        scan = im_to_scan(mob)
        # bucket peaks per scan; merge duplicate (scan, tof) intensities
        per_scan: dict[int, dict[int, int]] = {}
        for s, t, v in zip(scan, tof, inten):
            per_scan.setdefault(int(s), {})
            per_scan[int(s)][int(t)] = per_scan[int(s)].get(int(t), 0) + int(v)
        scans = []
        for s in range(n_scans):
            if s in per_scan:
                ts = sorted(per_scan[s])
                scans.append(
                    (
                        np.asarray(ts, dtype=np.int64),
                        np.asarray([per_scan[s][t] for t in ts], dtype=np.int64),
                    )
                )
            else:
                e = np.empty(0, dtype=np.int64)
                scans.append((e, e))
        if spectra.ms_level[i] == 1:
            frames.append(
                {"time": float(spectra.rt[i]), "msms_type": 0, "scans": scans}
            )
        else:
            lo = float(spectra.isolation_lower_mz[i])
            hi = float(spectra.isolation_upper_mz[i])
            key = (round(lo, 4), round(hi, 4))
            if key not in window_key:
                g = len(window_key) + 1
                window_key[key] = g
                dia_windows[g] = [(0, n_scans, (lo + hi) / 2, hi - lo)]
            frames.append(
                {
                    "time": float(spectra.rt[i]),
                    "msms_type": 9,
                    "window_group": window_key[key],
                    "scans": scans,
                }
            )
    return write_tdf(
        out_dir,
        frames,
        dia_windows=dia_windows,
        mz_range=mz_range,
        tof_max_index=tof_max_index,
        im_range=im_range,
    )


def write_tdf(
    out_dir: str | Path,
    frames: list[dict],
    dia_windows: dict[int, list[tuple[int, int, float, float]]] | None = None,
    mz_range: tuple[float, float] = (100.0, 1700.0),
    tof_max_index: int = 400_000,
    im_range: tuple[float, float] = (0.6, 1.5),
) -> Path:
    """Write a ``.d`` directory.

    ``frames``: list of dicts with keys ``time`` (s), ``msms_type``
    (0 MS1 / 9 DIA), ``window_group`` (for DIA), ``scans``: list of
    (tof_indices, intensities) per scan index starting at 0.
    ``dia_windows``: window_group -> [(scan_begin, scan_end, iso_mz, iso_w)].
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    blobs = []
    offsets = []
    pos = 0
    for fr in frames:
        blob = encode_frame(fr["scans"])
        offsets.append(pos)
        blobs.append(blob)
        pos += len(blob)
    (out_dir / "analysis.tdf_bin").write_bytes(b"".join(blobs))

    db = out_dir / "analysis.tdf"
    if db.exists():
        db.unlink()
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE GlobalMetadata (Key TEXT, Value TEXT)")
    meta = {
        "TimsCompressionType": "2",
        "MzAcqRangeLower": repr(mz_range[0]),
        "MzAcqRangeUpper": repr(mz_range[1]),
        "DigitizerNumSamples": str(tof_max_index),
        "OneOverK0AcqRangeLower": repr(im_range[0]),
        "OneOverK0AcqRangeUpper": repr(im_range[1]),
        "SchemaType": "TDF",
    }
    con.executemany("INSERT INTO GlobalMetadata VALUES (?, ?)", meta.items())
    con.execute(
        "CREATE TABLE Frames (Id INTEGER PRIMARY KEY, Time REAL, ScanMode "
        "INTEGER, MsMsType INTEGER, TimsId INTEGER, NumScans INTEGER, "
        "NumPeaks INTEGER, MaxIntensity INTEGER, SummedIntensities INTEGER)"
    )
    for i, fr in enumerate(frames):
        n_peaks = sum(len(t) for t, _ in fr["scans"])
        all_int = [v for _, ii in fr["scans"] for v in ii]
        con.execute(
            "INSERT INTO Frames VALUES (?,?,?,?,?,?,?,?,?)",
            (
                i + 1,
                fr["time"],
                9,
                fr["msms_type"],
                offsets[i],
                len(fr["scans"]),
                n_peaks,
                max(all_int) if all_int else 0,
                sum(all_int),
            ),
        )
    if dia_windows:
        con.execute(
            "CREATE TABLE DiaFrameMsMsInfo (Frame INTEGER, WindowGroup INTEGER)"
        )
        for i, fr in enumerate(frames):
            if fr["msms_type"] == 9:
                con.execute(
                    "INSERT INTO DiaFrameMsMsInfo VALUES (?, ?)",
                    (i + 1, fr["window_group"]),
                )
        con.execute(
            "CREATE TABLE DiaFrameMsMsWindows (WindowGroup INTEGER, "
            "ScanNumBegin INTEGER, ScanNumEnd INTEGER, IsolationMz REAL, "
            "IsolationWidth REAL, CollisionEnergy REAL)"
        )
        for g, rows in dia_windows.items():
            for b, e, mz, w in rows:
                con.execute(
                    "INSERT INTO DiaFrameMsMsWindows VALUES (?,?,?,?,?,?)",
                    (g, b, e, mz, w, 30.0),
                )
    con.commit()
    con.close()
    return out_dir
