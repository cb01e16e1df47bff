"""Host-side raw spectrum container and file-format dispatch.

``SpectrumData`` is the normalized product of every reader (mzML, alphaRaw
HDF, synthetic): per-spectrum metadata plus flat sorted peak arrays
(reference contract: alphadia/raw_data/alpharaw_wrapper.py:20-180 —
``spectrum_df`` + ``peak_df``). RT is ALWAYS seconds here (the reference
converts minutes→seconds in ``_preprocess_raw_data``).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class SpectrumData:
    """Normalized spectra of one raw file (host memory)."""

    rt: np.ndarray  # f32[n_spectra], seconds
    ms_level: np.ndarray  # u8[n_spectra]
    isolation_lower_mz: np.ndarray  # f32[n_spectra], -1 for MS1
    isolation_upper_mz: np.ndarray  # f32[n_spectra], -1 for MS1
    peak_start_idx: np.ndarray  # i64[n_spectra]
    peak_stop_idx: np.ndarray  # i64[n_spectra]
    mz: np.ndarray  # f32[n_peaks], ascending within each spectrum
    intensity: np.ndarray  # f32[n_peaks]
    # per-peak ion mobility (timsTOF 4D data); None for 3D data
    # (reference: alpharaw Bruker layout carries a mobility peak column)
    mobility: np.ndarray | None = None  # f32[n_peaks] or None

    @property
    def n_spectra(self) -> int:
        return len(self.rt)

    @property
    def has_mobility(self) -> bool:
        return self.mobility is not None and len(self.mobility) == len(self.mz)

    def is_ms1_dia(self) -> bool:
        """Whether MS1 spectra recur with a constant period.

        (reference: alpharaw_wrapper.py `_is_ms1_dia`)
        """
        ms1_idx = np.nonzero(self.ms_level == 1)[0]
        if len(ms1_idx) < 2:
            return False
        return len(np.unique(np.diff(ms1_idx))) == 1

    def drop_ms1(self) -> "SpectrumData":
        """Remove all MS1 spectra (used when MS1 does not follow the cycle)."""
        keep = self.ms_level > 1
        return self.select(keep)

    def select(self, mask_or_idx) -> "SpectrumData":
        """Subset spectra, rebuilding the flat peak arrays."""
        arr = np.asarray(mask_or_idx)
        idx = np.nonzero(arr)[0] if arr.dtype == bool else arr
        counts = (self.peak_stop_idx[idx] - self.peak_start_idx[idx]).astype(np.int64)
        new_start = np.zeros(len(idx), dtype=np.int64)
        if len(idx) > 1:
            np.cumsum(counts[:-1], out=new_start[1:])
        new_stop = new_start + counts
        total = int(counts.sum())
        # one vectorized gather instead of a per-spectrum Python loop
        # (~200k interpreter iterations per load on a large raw file):
        # flat source index = start[spectrum] + offset-within-spectrum
        src = (
            np.repeat(self.peak_start_idx[idx], counts)
            + np.arange(total, dtype=np.int64)
            - np.repeat(new_start, counts)
        )
        mz = self.mz[src]
        inten = self.intensity[src]
        mob = self.mobility[src] if self.has_mobility else None
        return SpectrumData(
            rt=self.rt[idx],
            ms_level=self.ms_level[idx],
            isolation_lower_mz=self.isolation_lower_mz[idx],
            isolation_upper_mz=self.isolation_upper_mz[idx],
            peak_start_idx=new_start,
            peak_stop_idx=new_stop,
            mz=mz,
            intensity=inten,
            mobility=mob,
        )


def load_raw_file(path: str | Path, thread_count: int = 4) -> SpectrumData:
    """Dispatch on file extension (reference:
    alphadia/workflow/managers/raw_file_manager.py:37-92).

    Supported here: .mzml / .mzml.gz (XML, plain or gzipped),
    .hdf/.hdf5/.h5 (alphaRaw layout or our cache), .d (Bruker TDF
    directories, decoded natively), .npz (synthetic/test dumps). Thermo
    .raw / Sciex .wiff require external conversion to mzML and raise a
    clear error.
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".mzml" or path.name.lower().endswith(".mzml.gz"):
        from alphadia_tpu.rawdata.mzml import read_mzml

        return read_mzml(path, thread_count=thread_count)
    if suffix in (".hdf", ".hdf5", ".h5"):
        from alphadia_tpu.rawdata.hdf import read_alpharaw_hdf

        return read_alpharaw_hdf(path)
    if suffix == ".npz":
        return load_npz(path)
    if suffix == ".d":
        from alphadia_tpu.rawdata.bruker_tdf import read_bruker_d

        return read_bruker_d(path)
    raise ValueError(
        f"Unsupported raw file format '{suffix}' ({path}). Supported: "
        ".mzML, .hdf (alphaRaw), .d (Bruker TDF), .npz. Convert other vendor "
        "formats (.raw/.wiff) to mzML first."
    )


def save_npz(path: str | Path, data: SpectrumData) -> None:
    arrays = dict(
        rt=data.rt,
        ms_level=data.ms_level,
        isolation_lower_mz=data.isolation_lower_mz,
        isolation_upper_mz=data.isolation_upper_mz,
        peak_start_idx=data.peak_start_idx,
        peak_stop_idx=data.peak_stop_idx,
        mz=data.mz,
        intensity=data.intensity,
    )
    if data.has_mobility:
        arrays["mobility"] = data.mobility
    np.savez_compressed(path, **arrays)


def load_npz(path: str | Path) -> SpectrumData:
    with np.load(path) as z:
        return SpectrumData(**{k: z[k] for k in z.files})
