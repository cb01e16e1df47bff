"""Streaming mzML reader (self-contained, lxml-based).

Fills the role of alpharaw's MzMLReader in the reference
(reference: alphadia/raw_data/alpharaw_wrapper.py:158-163 ``MzML``):
produces the normalized SpectrumData contract (RT seconds, isolation
bounds, flat sorted peak arrays).

Handles real converter output (msconvert / timsconvert):
- the ``indexedmzML`` wrapper and trailing byte-offset index
- 32/64-bit float arrays, zlib or no compression
- ms level / scan start time (minute or second units, by unitAccession or
  unitName) / isolation window cvParams
- ion mobility: per-peak inverse-reduced-mobility binary arrays
  (MS:1002816 / MS:1003006) and per-spectrum scan mobility (MS:1002815,
  broadcast over the spectrum's peaks — timsconvert frame-split layout)
- MS-Numpress arrays (linear / slof / pic, each optionally + zlib) are
  decoded natively (rawdata/numpress.py).

Profile-mode spectra (MS:1000128) are centroided on the fly: intensity
traces are split at zero gaps and local minima, each segment becomes one
peak with an intensity-weighted m/z centroid and the summed intensity
(the role alpharaw's centroiding plays for the reference).
"""

from __future__ import annotations

import base64
import zlib
from pathlib import Path

import numpy as np

from alphadia_tpu.rawdata.source import SpectrumData
from alphadia_tpu.reporting import logger

_NS = "{http://psi.hupo.org/ms/mzml}"

# PSI-MS accessions
ACC_MS_LEVEL = "MS:1000511"
ACC_SCAN_START = "MS:1000016"
ACC_ISO_TARGET = "MS:1000827"
ACC_ISO_LOWER = "MS:1000828"
ACC_ISO_UPPER = "MS:1000829"
ACC_MZ_ARRAY = "MS:1000514"
ACC_INT_ARRAY = "MS:1000515"
ACC_F64 = "MS:1000523"
ACC_F32 = "MS:1000521"
ACC_ZLIB = "MS:1000574"
ACC_NO_COMP = "MS:1000576"
ACC_PROFILE = "MS:1000128"
# ion mobility
ACC_MOB_ARRAY_MEAN_INV = "MS:1002816"  # mean inverse reduced ion mobility array
ACC_MOB_ARRAY_MEAN = "MS:1003006"  # mean ion mobility array
ACC_MOB_ARRAY_RAW_INV = "MS:1003007"  # raw inverse reduced ion mobility array
ACC_SCAN_INV_MOB = "MS:1002815"  # inverse reduced ion mobility (scan-level)
# MS-Numpress: (codec, zlib-after-numpress) per accession
ACC_NUMPRESS = {
    "MS:1002312": ("linear", False),
    "MS:1002313": ("pic", False),
    "MS:1002314": ("slof", False),
    "MS:1002746": ("linear", True),
    "MS:1002747": ("pic", True),
    "MS:1002748": ("slof", True),
}
# time units
UNIT_MINUTE = "UO:0000031"
UNIT_SECOND = "UO:0000010"

_MOB_ARRAY_ACCS = {ACC_MOB_ARRAY_MEAN_INV, ACC_MOB_ARRAY_MEAN, ACC_MOB_ARRAY_RAW_INV}


def _decode_binary(data_elem) -> tuple[str | None, np.ndarray]:
    """Decode one <binaryDataArray> -> (kind, values)."""
    dtype = np.float64
    compressed = False
    kind = None
    numpress = None
    for cv in data_elem.iter(f"{_NS}cvParam"):
        acc = cv.get("accession")
        if acc == ACC_F64:
            dtype = np.float64
        elif acc == ACC_F32:
            dtype = np.float32
        elif acc == ACC_ZLIB:
            compressed = True
        elif acc == ACC_MZ_ARRAY:
            kind = "mz"
        elif acc == ACC_INT_ARRAY:
            kind = "intensity"
        elif acc in _MOB_ARRAY_ACCS:
            kind = "mobility"
        elif acc in ACC_NUMPRESS:
            # some writers emit a plain numpress accession PLUS a separate
            # MS:1000574 zlib cvParam (instead of the combined term) — never
            # clobber an already-seen zlib flag, in either cvParam order
            numpress, np_zlib = ACC_NUMPRESS[acc]
            compressed = compressed or np_zlib
    b = data_elem.find(f"{_NS}binary")
    if b is None or not b.text:
        return kind, np.zeros(0, dtype)
    raw = base64.b64decode(b.text)
    if compressed:
        raw = zlib.decompress(raw)
    if numpress is not None:
        from alphadia_tpu.rawdata import numpress as np_codec

        decode = {
            "linear": np_codec.decode_linear,
            "slof": np_codec.decode_slof,
            "pic": np_codec.decode_pic,
        }[numpress]
        return kind, decode(raw)
    return kind, np.frombuffer(raw, dtype=dtype)


def _rt_seconds(cv) -> float:
    """Scan start time -> seconds, honoring unitAccession over unitName."""
    rt = float(cv.get("value"))
    unit_acc = cv.get("unitAccession")
    if unit_acc == UNIT_SECOND:
        return rt
    if unit_acc == UNIT_MINUTE:
        return rt * 60.0
    unit = cv.get("unitName", "minute")
    return rt * 60.0 if unit.startswith("minute") else rt


def centroid_profile(
    mz: np.ndarray, intensity: np.ndarray, mobility: np.ndarray | None = None
):
    """Centroid one profile-mode spectrum (vectorized numpy).

    Splits the trace into segments at zero-intensity gaps and at local
    minima (valleys); each segment yields one centroid: the
    intensity-weighted mean m/z (and mobility, if given) with the summed
    intensity. Returns (mz, intensity, mobility|None), m/z ascending.
    """
    n = len(mz)
    pos = intensity > 0
    if n < 3 or not pos.any():
        keep = pos
        return (
            mz[keep],
            intensity[keep],
            mobility[keep] if mobility is not None else None,
        )
    d = np.diff(intensity)
    valley = np.zeros(n, bool)
    valley[1:-1] = (d[:-1] < 0) & (d[1:] > 0)
    # a segment starts at the first positive point after a gap or at a valley
    start = pos & (~np.concatenate(([False], pos[:-1])) | valley)
    seg_id = np.cumsum(start) - 1
    ids = seg_id[pos]
    w = intensity[pos].astype(np.float64)
    n_seg = int(ids[-1]) + 1
    tot = np.bincount(ids, weights=w, minlength=n_seg)
    cmz = np.bincount(ids, weights=w * mz[pos], minlength=n_seg) / tot
    cmob = None
    if mobility is not None:
        cmob = (
            np.bincount(ids, weights=w * mobility[pos], minlength=n_seg) / tot
        ).astype(np.float32)
    return cmz.astype(np.float32), tot.astype(np.float32), cmob


def read_mzml(path: str | Path, thread_count: int = 4) -> SpectrumData:
    from lxml import etree

    rts, levels, iso_lo, iso_hi = [], [], [], []
    mz_chunks, int_chunks, mob_chunks = [], [], []
    counts = []
    any_mobility = False
    n_profile = 0

    # converters commonly gzip whole mzML files (.mzML.gz); iterparse
    # streams from any file object, so decompress on the fly. try/finally
    # so a malformed file can't leak the descriptor (the GUI server is
    # long-running).
    if str(path).lower().endswith(".gz"):
        import gzip

        source = gzip.open(str(path), "rb")
    else:
        source = str(path)
    try:
        context = etree.iterparse(
            source, events=("end",), tag=f"{_NS}spectrum"
        )
        for _, spec in context:
            ms_level = 1
            rt = 0.0
            target = lower_off = upper_off = None
            scan_mobility = None
            is_profile = False

            for cv in spec.iter(f"{_NS}cvParam"):
                acc = cv.get("accession")
                if acc == ACC_MS_LEVEL:
                    ms_level = int(cv.get("value"))
                elif acc == ACC_SCAN_START:
                    rt = _rt_seconds(cv)
                elif acc == ACC_ISO_TARGET:
                    target = float(cv.get("value"))
                elif acc == ACC_ISO_LOWER:
                    lower_off = float(cv.get("value"))
                elif acc == ACC_ISO_UPPER:
                    upper_off = float(cv.get("value"))
                elif acc == ACC_SCAN_INV_MOB:
                    scan_mobility = float(cv.get("value"))
                elif acc == ACC_PROFILE:
                    is_profile = True
                    n_profile += 1

            if target is not None:
                lo = target - (lower_off if lower_off is not None else 0.0)
                hi = target + (upper_off if upper_off is not None else 0.0)
            else:
                lo = hi = -1.0

            mz = inten = np.zeros(0, np.float32)
            mob = None
            for arr_elem in spec.iter(f"{_NS}binaryDataArray"):
                kind, vals = _decode_binary(arr_elem)
                if kind == "mz":
                    mz = vals.astype(np.float32)
                elif kind == "intensity":
                    inten = vals.astype(np.float32)
                elif kind == "mobility":
                    mob = vals.astype(np.float32)

            if mob is None and scan_mobility is not None:
                mob = np.full(len(mz), scan_mobility, np.float32)
            if mob is not None and len(mob) != len(mz):
                mob = None  # malformed array: drop rather than misalign

            if is_profile and len(mz):
                mz, inten, mob = centroid_profile(mz, inten, mob)

            if ms_level == 1:
                lo = hi = -1.0
            order = np.argsort(mz, kind="stable")
            rts.append(rt)
            levels.append(ms_level)
            iso_lo.append(lo)
            iso_hi.append(hi)
            mz_chunks.append(mz[order])
            int_chunks.append(inten[order])
            if mob is not None:
                any_mobility = True
                mob_chunks.append(mob[order])
            else:
                mob_chunks.append(np.zeros(len(mz), np.float32))

            spec.clear()
            while spec.getprevious() is not None:
                del spec.getparent()[0]
    finally:
        if not isinstance(source, str):
            source.close()

    if n_profile:
        logger.info(
            f"mzML: centroided {n_profile} profile-mode spectra "
            "(weighted-centroid peak picking)"
        )

    n = len(rts)
    start = np.zeros(n, dtype=np.int64)
    counts_arr = np.array([len(c) for c in mz_chunks], dtype=np.int64)
    if n > 1:
        np.cumsum(counts_arr[:-1], out=start[1:])
    logger.info(f"mzML: {n} spectra, {int(counts_arr.sum()):,} peaks from {path}")
    return SpectrumData(
        rt=np.array(rts, np.float32),
        ms_level=np.array(levels, np.uint8),
        isolation_lower_mz=np.array(iso_lo, np.float32),
        isolation_upper_mz=np.array(iso_hi, np.float32),
        peak_start_idx=start,
        peak_stop_idx=start + counts_arr,
        mz=np.concatenate(mz_chunks) if mz_chunks else np.zeros(0, np.float32),
        intensity=np.concatenate(int_chunks) if int_chunks else np.zeros(0, np.float32),
        mobility=(
            np.concatenate(mob_chunks)
            if (any_mobility and mob_chunks)
            else None
        ),
    )
