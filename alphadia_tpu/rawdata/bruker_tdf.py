"""Native Bruker timsTOF ``.d`` (TDF) ingestion — no vendor SDK.

Reads ``analysis.tdf`` (SQLite) + ``analysis.tdf_bin`` (per-frame
zstd-compressed peak blobs) directly, the way the open reimplementations
do (timsrust, OpenTIMS, alphatims), and normalizes to ``SpectrumData``
(reference role: alphadia/raw_data/bruker.py:18-274 via alphatims, which
wraps the Bruker SDK; here the binary format is decoded natively).

Binary frame layout (TimsCompressionType == 2, the modern scheme):

- at byte offset ``Frames.TimsId``: ``u32 byte_count`` (including this
  8-byte header), ``u32 scan_count``, then ``byte_count - 8`` bytes of
  zstd-compressed data.
- decompressed payload is a u32 little-endian array stored byte-PLANAR:
  all least-significant bytes first, then the 2nd bytes, etc. (a 4 x n
  byte transpose — undone here with one reshape).
- u32 stream: ``blob[0] == scan_count``; ``blob[1:scan_count]`` holds
  ``2 * n_peaks(scan i-1)`` for scans 0..scan_count-2 (the last scan's
  count is implicit); the remainder alternates (tof_delta, intensity)
  pairs, tof indices delta-encoded within each scan with a +1 offset
  (true tof = cumsum(deltas) - 1).

Index -> physical-unit conversion uses the acquisition-range boundary
model (sqrt-linear in m/z over the digitizer samples, linear descending
in 1/K0 over scans), exactly the pre-calibration model timsrust uses;
the per-run CalibrationManager absorbs the residual, mirroring how the
reference recalibrates on top of vendor calibration.
"""

from __future__ import annotations

import logging
import sqlite3
from pathlib import Path

import numpy as np

from alphadia_tpu.rawdata.source import SpectrumData

logger = logging.getLogger(__name__)

# Frames.MsMsType codes (Bruker TDF schema)
MSMS_TYPE_MS1 = 0
MSMS_TYPE_MSMS = 2
MSMS_TYPE_PASEF = 8
MSMS_TYPE_DIA = 9


class TdfFormatError(ValueError):
    """Raised when a .d directory is malformed or uses an unsupported scheme."""


def _unshuffle_u32(payload: bytes) -> np.ndarray:
    """Undo the byte-planar layout: 4 planes of n bytes -> n u32 (LE)."""
    u8 = np.frombuffer(payload, dtype=np.uint8)
    if len(u8) % 4:
        raise TdfFormatError(f"frame payload length {len(u8)} not a multiple of 4")
    n = len(u8) // 4
    planes = u8.reshape(4, n).astype(np.uint32)
    return planes[0] | (planes[1] << 8) | (planes[2] << 16) | (planes[3] << 24)


def _decode_frame_blob(blob: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one unshuffled u32 frame blob.

    Returns (scan_index u32[n_peaks], tof_index u32[n_peaks],
    intensity u32[n_peaks]); peaks ordered scan-major, ascending tof
    within each scan (the on-disk order).
    """
    scan_count = int(blob[0])
    if scan_count < 1 or scan_count > len(blob):
        raise TdfFormatError(f"implausible scan_count {scan_count}")
    n_peaks = (len(blob) - scan_count) // 2
    if scan_count + 2 * n_peaks != len(blob):
        raise TdfFormatError("frame blob length does not match scan_count")
    if n_peaks == 0:
        e = np.empty(0, dtype=np.uint32)
        return e, e.copy(), e.copy()
    # per-scan peak counts: explicit for scans 0..scan_count-2, last implicit
    counts = np.empty(scan_count, dtype=np.int64)
    counts[:-1] = blob[1:scan_count] // 2
    counts[-1] = n_peaks - counts[:-1].sum()
    if counts[-1] < 0:
        raise TdfFormatError("negative peak count in last scan")
    scan_index = np.repeat(
        np.arange(scan_count, dtype=np.uint32), counts
    )
    deltas = blob[scan_count::2].astype(np.int64)
    intensity = blob[scan_count + 1 :: 2]
    # segmented cumsum: global cumsum minus the running total at each
    # scan's first peak (vectorized; no per-scan python loop)
    cs = np.cumsum(deltas)
    starts = np.zeros(scan_count, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    base = np.where(starts > 0, cs[starts - 1], 0)
    # scans with zero peaks contribute nothing; repeat base per peak
    tof = (cs - np.repeat(base, counts) - 1).astype(np.uint32)
    return scan_index, tof, intensity.astype(np.uint32)


def _read_frame(
    bin_data: memoryview, offset: int, decompressor
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read + decode the frame blob at ``offset`` in analysis.tdf_bin."""
    if offset < 0 or offset + 8 > len(bin_data):
        raise TdfFormatError(
            f"frame header at offset {offset} overruns tdf_bin "
            f"({len(bin_data)} bytes) — truncated or corrupt file"
        )
    header = np.frombuffer(bin_data[offset : offset + 8], dtype=np.uint32)
    byte_count, _scan_count = int(header[0]), int(header[1])
    if byte_count < 8 or offset + byte_count > len(bin_data):
        raise TdfFormatError(f"frame at offset {offset} overruns tdf_bin")
    comp = bytes(bin_data[offset + 8 : offset + byte_count])
    return _decode_frame_blob(_unshuffle_u32(decompressor.decompress(comp)))


class TofMzConverter:
    """sqrt-linear index->m/z over the acquisition range (timsrust model)."""

    def __init__(self, mz_min: float, mz_max: float, tof_max_index: int):
        self.intercept = np.sqrt(mz_min)
        self.slope = (np.sqrt(mz_max) - np.sqrt(mz_min)) / tof_max_index

    def __call__(self, tof: np.ndarray) -> np.ndarray:
        s = self.intercept + self.slope * tof.astype(np.float64)
        return (s * s).astype(np.float32)

    def invert(self, mz: np.ndarray) -> np.ndarray:
        return np.round(
            (np.sqrt(np.asarray(mz, dtype=np.float64)) - self.intercept) / self.slope
        ).astype(np.uint32)


class ScanImConverter:
    """linear descending scan->1/K0 (scan 0 = upper mobility bound)."""

    def __init__(self, im_min: float, im_max: float, scan_max_index: int):
        self.intercept = im_max
        self.slope = (im_min - im_max) / scan_max_index

    def __call__(self, scan: np.ndarray) -> np.ndarray:
        return (self.intercept + self.slope * scan.astype(np.float64)).astype(
            np.float32
        )

    def invert(self, im: np.ndarray) -> np.ndarray:
        return np.round(
            (np.asarray(im, dtype=np.float64) - self.intercept) / self.slope
        ).astype(np.uint32)


def _metadata(con: sqlite3.Connection) -> dict:
    rows = con.execute("SELECT Key, Value FROM GlobalMetadata").fetchall()
    return {k: v for k, v in rows}


def read_bruker_d(path: str | Path) -> SpectrumData:
    """Read a Bruker ``.d`` directory into normalized ``SpectrumData``.

    MS1 frames become one spectrum each; diaPASEF frames become one
    pseudo-spectrum PER isolation window of their window group (the scan
    slice [ScanNumBegin, ScanNumEnd)), so the downstream cycle detector
    sees the same flattened layout alpharaw produces for timsTOF data.
    Per-peak ion mobility is carried, enabling the 4D search path.
    """
    import zstandard

    path = Path(path)
    tdf = path / "analysis.tdf"
    tdf_bin = path / "analysis.tdf_bin"
    if not tdf.exists() or not tdf_bin.exists():
        raise TdfFormatError(
            f"{path} is not a TDF .d directory (need analysis.tdf + analysis.tdf_bin)"
        )
    con = sqlite3.connect(f"file:{tdf}?mode=ro", uri=True)
    try:
        meta = _metadata(con)
        compression = int(float(meta.get("TimsCompressionType", 2)))
        if compression != 2:
            raise TdfFormatError(
                f"TimsCompressionType={compression} not supported (only the "
                "modern per-frame zstd scheme, type 2)"
            )
        mz_min = float(meta["MzAcqRangeLower"])
        mz_max = float(meta["MzAcqRangeUpper"])
        tof_max = int(float(meta["DigitizerNumSamples"]))
        im_min = float(meta.get("OneOverK0AcqRangeLower", 0.5))
        im_max = float(meta.get("OneOverK0AcqRangeUpper", 1.6))

        frames = con.execute(
            "SELECT Id, Time, MsMsType, TimsId, NumScans, NumPeaks "
            "FROM Frames ORDER BY Id"
        ).fetchall()
        if not frames:
            raise TdfFormatError("Frames table is empty")
        scan_max = max(int(f[4]) for f in frames)

        # diaPASEF window tables
        frame_group: dict[int, int] = {}
        group_windows: dict[int, list[tuple[int, int, float, float]]] = {}
        tables = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
        if "DiaFrameMsMsInfo" in tables and "DiaFrameMsMsWindows" in tables:
            frame_group = dict(
                con.execute("SELECT Frame, WindowGroup FROM DiaFrameMsMsInfo")
            )
            for g, b, e, mz, w in con.execute(
                "SELECT WindowGroup, ScanNumBegin, ScanNumEnd, IsolationMz, "
                "IsolationWidth FROM DiaFrameMsMsWindows "
                "ORDER BY WindowGroup, ScanNumBegin"
            ):
                group_windows.setdefault(int(g), []).append(
                    (int(b), int(e), float(mz), float(w))
                )
    finally:
        con.close()

    import mmap

    tof2mz = TofMzConverter(mz_min, mz_max, tof_max)
    scan2im = ScanImConverter(im_min, im_max, scan_max)
    dctx = zstandard.ZstdDecompressor()
    # real runs have multi-GB tdf_bin files: mmap pages frames on demand
    # instead of loading the whole file into RAM
    with open(tdf_bin, "rb") as bin_file:
        mm = mmap.mmap(bin_file.fileno(), 0, access=mmap.ACCESS_READ)
    bin_bytes = memoryview(mm)

    rts, levels, iso_lo, iso_hi = [], [], [], []
    mz_parts, int_parts, mob_parts, counts = [], [], [], []
    n_skipped: dict[str, int] = {}

    for frame_id, time_s, msms_type, tims_id, _n_scans, n_peaks in frames:
        msms_type = int(msms_type)
        is_dia = msms_type == MSMS_TYPE_DIA and int(frame_id) in frame_group
        if msms_type != MSMS_TYPE_MS1 and not is_dia:
            # ddaPASEF (8), bbCID/MRM (2), or DIA frames missing from
            # DiaFrameMsMsInfo: without an isolation annotation they would
            # corrupt the cycle detection, so they are skipped
            key = f"MsMsType={msms_type}"
            n_skipped[key] = n_skipped.get(key, 0) + 1
            continue
        scan_idx, tof, inten = _read_frame(bin_bytes, int(tims_id), dctx)
        if n_peaks is not None and len(tof) != int(n_peaks):
            raise TdfFormatError(
                f"frame {frame_id}: decoded {len(tof)} peaks, "
                f"Frames.NumPeaks says {n_peaks}"
            )
        mz = tof2mz(tof)
        mob = scan2im(scan_idx)

        if is_dia:
            windows = group_windows.get(frame_group[int(frame_id)], [])
            for begin, end, iso_mz, iso_w in windows:
                m = (scan_idx >= begin) & (scan_idx < end)
                order = np.argsort(mz[m], kind="stable")
                mz_parts.append(mz[m][order])
                int_parts.append(inten[m][order].astype(np.float32))
                mob_parts.append(mob[m][order])
                counts.append(int(m.sum()))
                rts.append(float(time_s))
                levels.append(2)
                iso_lo.append(iso_mz - iso_w / 2)
                iso_hi.append(iso_mz + iso_w / 2)
        else:
            order = np.argsort(mz, kind="stable")
            mz_parts.append(mz[order])
            int_parts.append(inten[order].astype(np.float32))
            mob_parts.append(mob[order])
            counts.append(len(mz))
            rts.append(float(time_s))
            levels.append(1)
            iso_lo.append(-1.0)
            iso_hi.append(-1.0)

    bin_bytes.release()
    mm.close()

    for key, n in n_skipped.items():
        logger.warning(
            "skipped %d %s frames — only MS1 and annotated diaPASEF frames "
            "are searched",
            n,
            key,
        )
    if not counts:
        raise TdfFormatError("no usable MS1/DIA frames found")

    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(np.asarray(counts[:-1], dtype=np.int64), out=starts[1:])
    return SpectrumData(
        rt=np.asarray(rts, dtype=np.float32),
        ms_level=np.asarray(levels, dtype=np.uint8),
        isolation_lower_mz=np.asarray(iso_lo, dtype=np.float32),
        isolation_upper_mz=np.asarray(iso_hi, dtype=np.float32),
        peak_start_idx=starts,
        peak_stop_idx=starts + np.asarray(counts, dtype=np.int64),
        mz=np.concatenate(mz_parts) if mz_parts else np.empty(0, np.float32),
        intensity=(
            np.concatenate(int_parts) if int_parts else np.empty(0, np.float32)
        ),
        mobility=np.concatenate(mob_parts) if mob_parts else None,
    )
