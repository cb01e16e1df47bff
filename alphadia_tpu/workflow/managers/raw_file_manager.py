"""Raw file loading + acquisition statistics.

(reference: alphadia/workflow/managers/raw_file_manager.py:37-92 —
extension dispatch + stats logging; here the dispatch lives in
rawdata.source.load_raw_file and this manager adds the DiaData
tensorization + stat record.)
"""

from __future__ import annotations

from alphadia_tpu.rawdata import DiaData, load_raw_file
from alphadia_tpu.reporting import logger
from alphadia_tpu.workflow.managers.base import BaseManager


class RawFileManager(BaseManager):
    def __init__(self, config=None, path=None, load_from_file=False):
        super().__init__(path, load_from_file)
        self.config = config
        if not self.is_loaded_from_file:
            self.stats: dict = {}

    def _load_with_cache(self, raw_path: str, thread_count: int):
        """XML parsing of large mzML files is the slow part of ingestion;
        cache the normalized spectra as HDF next to the source (analogous
        to alpharaw's .hdf conversion caching) and reuse while fresh."""
        from pathlib import Path

        src = Path(raw_path)
        if not src.name.lower().endswith((".mzml", ".mzml.gz")):
            return load_raw_file(raw_path, thread_count=thread_count)
        cache = src.parent / (src.name + ".cache.hdf")
        if cache.exists() and cache.stat().st_mtime >= src.stat().st_mtime:
            try:
                from alphadia_tpu.rawdata.hdf import read_alpharaw_hdf

                logger.info(f"Reusing spectra cache {cache.name}")
                return read_alpharaw_hdf(cache)
            except Exception as e:
                logger.warning(f"spectra cache unreadable ({e}); re-parsing")
        spectra = load_raw_file(raw_path, thread_count=thread_count)
        try:
            from alphadia_tpu.rawdata.hdf import save_spectra_hdf

            save_spectra_hdf(cache, spectra)
        except Exception as e:  # read-only dirs etc.
            logger.info(f"spectra cache not written: {e}")
        return spectra

    def get_dia_data_object(self, raw_path: str) -> DiaData:
        thread_count = (
            self.config["general"]["thread_count"] if self.config else 4
        )
        coarse_bin = (
            self.config["tpu"]["coarse_bin_width"] if self.config else 1.0
        )
        n_scan_bins = (
            self.config["tpu"]["n_scan_bins"] if self.config else 8
        )
        spectra = self._load_with_cache(raw_path, thread_count)
        dia = DiaData.from_spectra(
            spectra, coarse_bin_width=coarse_bin, n_scan_bins=n_scan_bins
        )
        self.stats = {
            "rt_limit_min": dia.rt_min,
            "rt_limit_max": dia.rt_max,
            "cycle_len": dia.n_slots,
            "n_cycles": dia.n_cycles,
            "n_peaks": dia.n_peaks,
            "has_ms1": dia.has_ms1,
            "has_mobility": dia.has_mobility,
            "quad_min_mz": dia.quad_min_mz,
            "quad_max_mz": dia.quad_max_mz,
        }
        logger.info(
            f"Raw file: {dia.n_cycles} cycles x {dia.n_slots} slots, "
            f"{dia.n_peaks:,} peaks, RT {dia.rt_min:.0f}-{dia.rt_max:.0f}s, "
            f"quad {dia.quad_min_mz:.0f}-{dia.quad_max_mz:.0f}"
        )
        return dia
