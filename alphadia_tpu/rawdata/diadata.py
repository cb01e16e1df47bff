"""TPU-native DIA data structure.

Design (replaces the per-peak binary search of the reference's
``AlphaRawJIT.get_dense``, alphadia/search/jitclasses/alpharaw_jit.py:208-425,
with a gather-friendly layout):

- spectra are re-ordered **slot-major**: all cycles of cycle-slot 0, then all
  cycles of slot 1, ... — so the spectra a kernel touches for one fragment
  XIC (fixed slot, contiguous cycle range) are contiguous;
- peaks stay sorted by m/z within each spectrum, concatenated flat;
- a per-spectrum **coarse m/z bin index** ``bin_start[slot, cycle, bin]``
  holds the absolute flat-array offset of the first peak at/above each bin
  edge. An XIC probe (spectrum, query m/z ± ppm) then becomes: O(1) bin
  lookup → gather a fixed-size slab of ``gather_slab`` consecutive peaks →
  ppm mask → masked sum. No data-dependent control flow on device.

Everything handed to JAX is a static-shape numpy/jax array; `device_arrays`
returns the dict the kernels consume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from alphadia_tpu.constants.settings import NO_MOBILITY_VALUE
from alphadia_tpu.rawdata.dia_cycle import determine_dia_cycle
from alphadia_tpu.rawdata.source import SpectrumData


@dataclass
class DiaData:
    """One raw file, cycle-aligned and tensorized for TPU kernels."""

    # --- cycle structure -------------------------------------------------
    cycle: np.ndarray  # f64 (1, n_slots, 1, 2) isolation bounds; -1 = MS1
    rt_values: np.ndarray  # f32[n_cycles * n_slots] seconds, acquisition order
    cycle_rt: np.ndarray  # f32[n_cycles] RT of each cycle (first spectrum)
    n_cycles: int
    n_slots: int
    has_ms1: bool
    has_mobility: bool = False
    mobility_values: np.ndarray = field(
        default_factory=lambda: np.array([NO_MOBILITY_VALUE, 0.0], dtype=np.float32)
    )

    # --- peak store (slot-major) ----------------------------------------
    peak_mz: np.ndarray = None  # f32[n_peaks + pad]
    peak_intensity: np.ndarray = None  # f32[n_peaks + pad]
    # absolute offsets into peak arrays; shape (n_slots, n_cycles, n_bins+1)
    bin_start: np.ndarray = None
    bin_mz_min: float = 0.0
    coarse_bin_width: float = 1.0

    # --- observable ranges ----------------------------------------------
    mz_min: float = 0.0  # smallest peak m/z
    mz_max: float = 0.0  # largest peak m/z
    quad_min_mz: float = 0.0  # lowest MS2 isolation lower bound
    quad_max_mz: float = 0.0  # highest MS2 isolation upper bound

    _device: dict | None = None

    # =====================================================================
    @classmethod
    def from_spectra(
        cls,
        spectra: SpectrumData,
        coarse_bin_width: float = 1.0,
        astral_ms1: bool = False,
    ) -> "DiaData":
        """Cycle-align and tensorize a raw file.

        Mirrors the preprocessing contract of the reference
        (alpharaw_wrapper.py `_preprocess_raw_data`): drop non-DIA MS1,
        detect cycle, truncate to whole cycles — then builds the slot-major
        gather layout (new design).
        """
        has_ms1 = True
        if not spectra.is_ms1_dia():
            spectra = spectra.drop_ms1()
            has_ms1 = False

        cycle, cycle_start, n_slots = determine_dia_cycle(
            spectra.rt, spectra.isolation_lower_mz, spectra.isolation_upper_mz
        )
        n_usable = spectra.n_spectra - cycle_start
        n_cycles = n_usable // n_slots
        used = np.arange(cycle_start, cycle_start + n_cycles * n_slots)
        spectra = spectra.select(used)

        ms_level_slot = np.where(cycle[0, :, 0, 0] < 0, 1, 2).astype(np.int32)
        if not has_ms1:
            ms_level_slot[:] = 2

        rt_values = spectra.rt.astype(np.float32)
        cycle_rt = rt_values[::n_slots].copy()

        quad_mask = cycle[0, :, 0, 0] >= 0
        quad_min = float(cycle[0, quad_mask, 0, 0].min()) if quad_mask.any() else 0.0
        quad_max = float(cycle[0, quad_mask, 0, 1].max()) if quad_mask.any() else 0.0

        obj = cls(
            cycle=cycle,
            rt_values=rt_values,
            cycle_rt=cycle_rt,
            n_cycles=n_cycles,
            n_slots=n_slots,
            has_ms1=has_ms1,
            quad_min_mz=quad_min,
            quad_max_mz=quad_max,
            coarse_bin_width=coarse_bin_width,
        )
        obj._build_peak_store(spectra)
        return obj

    # ------------------------------------------------------------------
    def _build_peak_store(self, spectra: SpectrumData) -> None:
        """Re-order peaks slot-major and build the coarse bin index."""
        n_slots, n_cycles = self.n_slots, self.n_cycles
        counts = (spectra.peak_stop_idx - spectra.peak_start_idx).astype(np.int64)

        if len(spectra.mz):
            self.mz_min = float(spectra.mz.min())
            self.mz_max = float(spectra.mz.max())
        bin_w = self.coarse_bin_width
        self.bin_mz_min = np.floor(self.mz_min / bin_w) * bin_w
        n_bins = max(1, int(np.ceil((self.mz_max - self.bin_mz_min) / bin_w)) + 1)
        edges = self.bin_mz_min + bin_w * np.arange(1, n_bins, dtype=np.float64)

        # spectrum order after reordering: (slot, cycle)
        # original spectrum index of (slot s, cycle c) is c * n_slots + s
        order = (
            np.arange(n_cycles)[None, :] * n_slots + np.arange(n_slots)[:, None]
        ).ravel()

        total = int(counts.sum())
        peak_mz = np.empty(total, dtype=np.float32)
        peak_int = np.empty(total, dtype=np.float32)
        spec_start = np.zeros(len(order) + 1, dtype=np.int64)
        np.cumsum(counts[order], out=spec_start[1:])

        bin_start = np.empty((len(order), n_bins + 1), dtype=np.int32)
        for j, i in enumerate(order):
            a, b = spectra.peak_start_idx[i], spectra.peak_stop_idx[i]
            s = spec_start[j]
            peak_mz[s : s + (b - a)] = spectra.mz[a:b]
            peak_int[s : s + (b - a)] = spectra.intensity[a:b]
            bin_start[j, 0] = s
            bin_start[j, -1] = s + (b - a)
            if n_bins > 1:
                bin_start[j, 1:-1] = s + np.searchsorted(spectra.mz[a:b], edges)

        # pad the flat arrays so a full gather slab past the end stays in range
        pad = 256
        self.peak_mz = np.concatenate(
            [peak_mz, np.full(pad, np.float32(np.inf))]
        )
        self.peak_intensity = np.concatenate([peak_int, np.zeros(pad, np.float32)])
        self.bin_start = bin_start.reshape(n_slots, n_cycles, n_bins + 1)

    # ------------------------------------------------------------------
    @property
    def n_peaks(self) -> int:
        return int(self.bin_start[-1, -1, -1]) if self.bin_start is not None else 0

    @property
    def rt_max(self) -> float:
        return float(self.cycle_rt[-1]) if len(self.cycle_rt) else 0.0

    @property
    def rt_min(self) -> float:
        return float(self.cycle_rt[0]) if len(self.cycle_rt) else 0.0

    @property
    def cycle_time(self) -> float:
        """Average seconds per DIA cycle."""
        if self.n_cycles < 2:
            return 1.0
        return float((self.cycle_rt[-1] - self.cycle_rt[0]) / (self.n_cycles - 1))

    def ms1_slots(self) -> np.ndarray:
        return np.nonzero(self.cycle[0, :, 0, 0] < 0)[0].astype(np.int32)

    def ms2_slots_for_mz(self, mz: float) -> np.ndarray:
        """Cycle slots whose isolation window contains `mz`."""
        lo = self.cycle[0, :, 0, 0]
        hi = self.cycle[0, :, 0, 1]
        return np.nonzero((lo >= 0) & (lo <= mz) & (mz < hi))[0].astype(np.int32)

    # ------------------------------------------------------------------
    def device_arrays(self) -> dict:
        """Upload (once) and return the arrays consumed by the JAX kernels."""
        if self._device is None:
            import jax.numpy as jnp

            self._device = {
                "peak_mz": jnp.asarray(self.peak_mz),
                "peak_intensity": jnp.asarray(self.peak_intensity),
                "bin_start": jnp.asarray(self.bin_start),
                "cycle_rt": jnp.asarray(self.cycle_rt),
            }
        return self._device

    def free_device(self) -> None:
        self._device = None
