"""AlphaRaw-layout HDF reader.

Loads raw files stored in the alphaRaw/alphabase HDF layout the reference
consumes via ``AlphaRawBase`` (reference: alphadia/raw_data/
alpharaw_wrapper.py:150-156): an ``ms_data`` (or root) group holding
``spectrum_df`` and ``peak_df`` column groups. RT is stored in minutes
there and converted to seconds per the SpectrumData contract.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from alphadia_tpu.rawdata.source import SpectrumData
from alphadia_tpu.reporting import logger


def _find_group(f, name: str):
    """Locate a dataframe group at root or one level deep."""
    if name in f:
        return f[name]
    for key in f:
        node = f[key]
        if hasattr(node, "keys") and name in node:
            return node[name]
    return None


def _col(group, *names):
    for n in names:
        if n in group:
            return group[n][:]
    return None


def read_alpharaw_hdf(path: str | Path) -> SpectrumData:
    import h5py

    with h5py.File(path, "r") as f:
        if f.attrs.get("format", "") == "alphadia_tpu_spectra":
            return SpectrumData(**{k: f[k][:] for k in f})

        spec = _find_group(f, "spectrum_df")
        peak = _find_group(f, "peak_df")
        if spec is None or peak is None:
            raise ValueError(
                f"{path}: no spectrum_df/peak_df groups found (alphaRaw layout)"
            )

        rt = _col(spec, "rt", "rt_values")
        rt_unit = str(spec.attrs.get("rt_unit", ""))
        ms_level = _col(spec, "ms_level")
        iso_lo = _col(spec, "isolation_lower_mz", "precursor_mz_lower")
        iso_hi = _col(spec, "isolation_upper_mz", "precursor_mz_upper")
        start = _col(spec, "peak_start_idx", "peak_start_idxes")
        stop = _col(spec, "peak_stop_idx", "peak_stop_idxes")
        mz = _col(peak, "mz", "mz_values")
        inten = _col(peak, "intensity", "intensity_values")
        # Bruker timsTOF layouts carry per-peak ion mobility (1/K0)
        mobility = _col(peak, "mobility", "mobility_values", "inv_ion_mobility")

    for name, arr in (
        ("rt", rt), ("ms_level", ms_level), ("isolation bounds", iso_lo),
        ("peak offsets", start), ("mz", mz), ("intensity", inten),
    ):
        if arr is None:
            raise ValueError(f"{path}: missing {name} column")

    rt_s = np.asarray(rt, np.float64)
    if rt_s.size == 0:
        raise ValueError(f"{path}: empty spectrum table")
    # the alphaRaw layout stores RT in MINUTES by specification — convert
    # unconditionally (a <6h range heuristic would silently keep minute
    # units for long acquisitions); an explicit rt_unit attribute wins
    if rt_unit == "second":
        pass
    elif rt_unit in ("", "minute"):
        rt_s = rt_s * 60.0
        if rt_s.max() > 36000:  # > 10 h after conversion
            logger.warning(
                f"{path}: RT range is {rt_s.max() / 3600:.1f} h after the "
                "minutes->seconds conversion the alphaRaw layout implies — "
                "if this file stores seconds, set the spectrum_df attribute "
                "rt_unit='second'"
            )
    else:
        raise ValueError(f"{path}: unknown rt_unit attribute {rt_unit!r}")

    if iso_hi is None:
        iso_hi = iso_lo
    ms_level = np.asarray(ms_level, np.uint8)
    iso_lo = np.where(ms_level == 1, -1.0, np.asarray(iso_lo, np.float32))
    iso_hi = np.where(ms_level == 1, -1.0, np.asarray(iso_hi, np.float32))

    data = SpectrumData(
        rt=rt_s.astype(np.float32),
        ms_level=ms_level,
        isolation_lower_mz=iso_lo.astype(np.float32),
        isolation_upper_mz=iso_hi.astype(np.float32),
        peak_start_idx=np.asarray(start, np.int64),
        peak_stop_idx=np.asarray(stop, np.int64),
        mz=np.asarray(mz, np.float32),
        intensity=np.asarray(inten, np.float32),
        mobility=np.asarray(mobility, np.float32) if mobility is not None else None,
    )
    logger.info(
        f"HDF: {data.n_spectra} spectra, {len(data.mz):,} peaks"
        f"{' (4D, mobility)' if data.has_mobility else ''} from {path}"
    )
    return data


def save_spectra_hdf(path: str | Path, data: SpectrumData) -> None:
    """Fast-reload cache in our own layout."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["format"] = "alphadia_tpu_spectra"
        keys = [
            "rt", "ms_level", "isolation_lower_mz", "isolation_upper_mz",
            "peak_start_idx", "peak_stop_idx", "mz", "intensity",
        ]
        if data.has_mobility:
            keys.append("mobility")
        for k in keys:
            f.create_dataset(k, data=getattr(data, k), compression="gzip", compression_opts=1)
