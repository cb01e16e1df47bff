"""Streaming mzML reader (self-contained, lxml-based).

Fills the role of alpharaw's MzMLReader in the reference
(reference: alphadia/raw_data/alpharaw_wrapper.py:158-163 ``MzML``):
produces the normalized SpectrumData contract (RT seconds, isolation
bounds, flat sorted peak arrays).

Supports the standard PSI-MS encodings: 32/64-bit float binary arrays,
zlib or no compression, ms level / scan start time / isolation window
cvParams. Peaks are expected centroided.
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


def _decode_binary(data_elem) -> np.ndarray | None:
    """Decode one <binaryDataArray>."""
    dtype = np.float64
    compressed = False
    kind = None
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
    b = data_elem.find(f"{_NS}binary")
    if b is None or not b.text:
        return kind, np.zeros(0, dtype)
    raw = base64.b64decode(b.text)
    if compressed:
        raw = zlib.decompress(raw)
    return kind, np.frombuffer(raw, dtype=dtype)


def read_mzml(path: str | Path, thread_count: int = 4) -> SpectrumData:
    from lxml import etree

    rts, levels, iso_lo, iso_hi = [], [], [], []
    mz_chunks, int_chunks = [], []
    counts = []

    context = etree.iterparse(str(path), events=("end",), tag=f"{_NS}spectrum")
    for _, spec in context:
        ms_level = 1
        rt = 0.0
        target = lower_off = upper_off = None

        for cv in spec.iter(f"{_NS}cvParam"):
            acc = cv.get("accession")
            if acc == ACC_MS_LEVEL:
                ms_level = int(cv.get("value"))
            elif acc == ACC_SCAN_START:
                rt = float(cv.get("value"))
                unit = cv.get("unitName", "minute")
                if unit.startswith("minute"):
                    rt *= 60.0
            elif acc == ACC_ISO_TARGET:
                target = float(cv.get("value"))
            elif acc == ACC_ISO_LOWER:
                lower_off = float(cv.get("value"))
            elif acc == ACC_ISO_UPPER:
                upper_off = float(cv.get("value"))

        if target is not None:
            lo = target - (lower_off if lower_off is not None else 0.0)
            hi = target + (upper_off if upper_off is not None else 0.0)
        else:
            lo = hi = -1.0

        mz = inten = np.zeros(0, np.float32)
        for arr_elem in spec.iter(f"{_NS}binaryDataArray"):
            kind, vals = _decode_binary(arr_elem)
            if kind == "mz":
                mz = vals.astype(np.float32)
            elif kind == "intensity":
                inten = vals.astype(np.float32)

        if ms_level == 1:
            lo = hi = -1.0
        order = np.argsort(mz, kind="stable")
        rts.append(rt)
        levels.append(ms_level)
        iso_lo.append(lo)
        iso_hi.append(hi)
        mz_chunks.append(mz[order])
        int_chunks.append(inten[order])
        counts.append(len(mz))

        spec.clear()
        while spec.getprevious() is not None:
            del spec.getparent()[0]

    n = len(rts)
    start = np.zeros(n, dtype=np.int64)
    counts_arr = np.array(counts, dtype=np.int64)
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
    )
