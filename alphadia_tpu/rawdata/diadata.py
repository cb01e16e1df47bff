"""TPU-native DIA data structure.

Design (replaces the per-peak binary search of the reference's
``AlphaRawJIT.get_dense``, alphadia/search/jitclasses/alpharaw_jit.py:208-425,
with a slab layout built for TPU memory access):

- peaks are sorted by (cycle-slot, coarse m/z bin, cycle, m/z) with a
  ``cell_start[slot, bin, cycle]`` offset index — one XIC query's whole
  cycle window is a single contiguous slab of peaks;
- peaks within ``ghost_width`` of a bin edge are duplicated into the
  neighboring bin ("ghost peaks"), so a ±ppm window centered anywhere in a
  bin never needs a second slab;
- per-cycle XIC values fall out of prefix sums sliced at cell boundaries
  (ops/xic.py). No per-element random gather, no data-dependent shapes.

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
    # 4D (timsTOF): per-peak ion mobility quantized to scan bins; the 4D XIC
    # kernel resolves intensities per (scan bin, cycle). 3D data has S=1.
    n_scan_bins: int = 1
    peak_scanbin: np.ndarray = None  # i32[n_peaks + pad], 0 for 3D data
    mobility_min: float = 0.0
    mobility_max: float = 0.0

    # --- peak store: sorted by (slot, coarse bin, cycle, mz) -------------
    peak_mz: np.ndarray = None  # f32[n_peaks + pad]
    peak_intensity: np.ndarray = None  # f32[n_peaks + pad]
    # start offsets per (slot, bin, cycle); shape (n_slots, n_bins, n_cycles+1)
    cell_start: np.ndarray = None
    n_bins: int = 1
    bin_mz_min: float = 0.0
    coarse_bin_width: float = 1.0
    # bin-edge duplication width (Th): must exceed max ppm window half-width
    ghost_width: float = 0.25
    peak_is_ghost: np.ndarray = None
    _n_canonical: int = 0
    # use the C++ peak-store builder when available
    use_native: bool = True

    # --- observable ranges ----------------------------------------------
    mz_min: float = 0.0  # smallest peak m/z
    mz_max: float = 0.0  # largest peak m/z
    quad_min_mz: float = 0.0  # lowest MS2 isolation lower bound
    quad_max_mz: float = 0.0  # highest MS2 isolation upper bound

    _device: dict | None = None
    _device_coarse: dict | None = None

    # =====================================================================
    @classmethod
    def from_spectra(
        cls,
        spectra: SpectrumData,
        coarse_bin_width: float = 1.0,
        astral_ms1: bool = False,
        n_scan_bins: int = 8,
        use_native: bool = True,
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

        rt_values = spectra.rt.astype(np.float32)
        cycle_rt = rt_values[::n_slots].copy()

        quad_mask = cycle[0, :, 0, 0] >= 0
        quad_min = float(cycle[0, quad_mask, 0, 0].min()) if quad_mask.any() else 0.0
        quad_max = float(cycle[0, quad_mask, 0, 1].max()) if quad_mask.any() else 0.0

        has_mobility = spectra.has_mobility
        if has_mobility:
            mob_min = float(spectra.mobility.min())
            mob_max = float(spectra.mobility.max())
            S = max(2, int(n_scan_bins))
            centers = mob_min + (np.arange(S, dtype=np.float32) + 0.5) * (
                (mob_max - mob_min) / S
            )
        else:
            mob_min = mob_max = 0.0
            S = 1
            centers = np.array([NO_MOBILITY_VALUE, 0.0], dtype=np.float32)

        obj = cls(
            cycle=cycle,
            rt_values=rt_values,
            cycle_rt=cycle_rt,
            n_cycles=n_cycles,
            n_slots=n_slots,
            has_ms1=has_ms1,
            has_mobility=has_mobility,
            mobility_values=centers,
            n_scan_bins=S,
            mobility_min=mob_min,
            mobility_max=mob_max,
            quad_min_mz=quad_min,
            quad_max_mz=quad_max,
            coarse_bin_width=coarse_bin_width,
            use_native=use_native,
        )
        obj._build_peak_store(spectra)
        return obj

    # ------------------------------------------------------------------
    def _build_peak_store(self, spectra: SpectrumData) -> None:
        """Sort peaks by (slot, coarse m/z bin, cycle, m/z) and build the
        per-cell offset index ``cell_start[slot, bin, cycle]``.

        With cycle as the minor index dimension, an XIC query (slot, query
        m/z, cycle window [c0, c0+W)) touches ONE contiguous peak slab per
        coarse bin — the layout TPUs want (contiguous DMA / slab gather
        instead of per-element random gather).
        """
        n_slots, n_cycles = self.n_slots, self.n_cycles

        if len(spectra.mz):
            self.mz_min = float(spectra.mz.min())
            self.mz_max = float(spectra.mz.max())
        bin_w = self.coarse_bin_width
        self.bin_mz_min = float(np.floor(self.mz_min / bin_w) * bin_w)
        n_bins = max(1, int(np.ceil((self.mz_max + bin_w - self.bin_mz_min) / bin_w)))

        # native (C++) fast path: counting sort + ghost duplication; the
        # 4D (timsTOF) path threads the per-peak mobility scan bin through
        # the same builder (peakstore_scatter_sb)
        if self.use_native:
            from alphadia_tpu.native import build_peak_store_native

            spec_start = np.zeros(spectra.n_spectra + 1, np.int64)
            np.cumsum(
                (spectra.peak_stop_idx - spectra.peak_start_idx).astype(np.int64),
                out=spec_start[1:],
            )
            sb_src = None
            if self.has_mobility:
                S = self.n_scan_bins
                span = max(self.mobility_max - self.mobility_min, 1e-9)
                sb_src = np.clip(
                    ((spectra.mobility - self.mobility_min) / span * S).astype(
                        np.int32
                    ),
                    0,
                    S - 1,
                )
            native = build_peak_store_native(
                spectra.mz, spectra.intensity, spec_start,
                n_slots, n_cycles, self.bin_mz_min, bin_w, n_bins, self.ghost_width,
                scanbin=sb_src,
            )
            if native is not None:
                out_mz, out_int, out_ghost, cell_off, out_sb = native
                rows = cell_off[:-1].reshape(n_slots * n_bins, n_cycles)
                row_ends = np.append(rows[1:, 0], cell_off[-1])
                self.cell_start = (
                    np.concatenate([rows, row_ends[:, None]], axis=1)
                    .reshape(n_slots, n_bins, n_cycles + 1)
                    .astype(np.int32)
                )
                pad = 1024
                self.peak_mz = np.concatenate(
                    [out_mz, np.full(pad, np.float32(np.inf))]
                )
                self.peak_intensity = np.concatenate([out_int, np.zeros(pad, np.float32)])
                self.peak_is_ghost = np.concatenate([out_ghost, np.zeros(pad, bool)])
                self.peak_scanbin = (
                    np.concatenate([out_sb, np.zeros(pad, np.int32)])
                    if out_sb is not None
                    else np.zeros(len(self.peak_mz), np.int32)
                )
                self._n_canonical = len(spectra.mz)
                self.n_bins = n_bins
                return

        counts = (spectra.peak_stop_idx - spectra.peak_start_idx).astype(np.int64)
        n_spectra = spectra.n_spectra
        # original spectrum i = cycle * n_slots + slot
        spec_of_peak = np.repeat(np.arange(n_spectra), counts)
        cycle_of_peak = (spec_of_peak // n_slots).astype(np.int64)
        slot_of_peak = (spec_of_peak % n_slots).astype(np.int64)
        bin_of_peak = np.clip(
            ((spectra.mz - self.bin_mz_min) / bin_w).astype(np.int64), 0, n_bins - 1
        )

        # ghost peaks: peaks within `ghost` Th of a bin edge are duplicated
        # into the adjacent bin, so any +-ppm window centered inside a bin
        # is fully contained in that bin's cells (ONE slab per query)
        ghost = self.ghost_width
        up = np.clip(
            ((spectra.mz + ghost - self.bin_mz_min) / bin_w).astype(np.int64),
            0,
            n_bins - 1,
        )
        dn = np.clip(
            ((spectra.mz - ghost - self.bin_mz_min) / bin_w).astype(np.int64),
            0,
            n_bins - 1,
        )
        ghosts_up = np.nonzero(up != bin_of_peak)[0]
        ghosts_dn = np.nonzero(dn != bin_of_peak)[0]

        all_mz = np.concatenate(
            [spectra.mz, spectra.mz[ghosts_up], spectra.mz[ghosts_dn]]
        )
        all_int = np.concatenate(
            [
                spectra.intensity,
                spectra.intensity[ghosts_up],
                spectra.intensity[ghosts_dn],
            ]
        )
        all_slot = np.concatenate(
            [slot_of_peak, slot_of_peak[ghosts_up], slot_of_peak[ghosts_dn]]
        )
        all_cycle = np.concatenate(
            [cycle_of_peak, cycle_of_peak[ghosts_up], cycle_of_peak[ghosts_dn]]
        )
        all_bin = np.concatenate([bin_of_peak, up[ghosts_up], dn[ghosts_dn]])
        is_ghost = np.zeros(len(all_mz), dtype=bool)
        is_ghost[len(spectra.mz) :] = True

        if self.has_mobility:
            S = self.n_scan_bins
            span = max(self.mobility_max - self.mobility_min, 1e-9)
            sb = np.clip(
                ((spectra.mobility - self.mobility_min) / span * S).astype(np.int32),
                0,
                S - 1,
            )
            all_scanbin = np.concatenate([sb, sb[ghosts_up], sb[ghosts_dn]])
        else:
            all_scanbin = np.zeros(len(all_mz), np.int32)

        key = (all_slot * n_bins + all_bin) * n_cycles + all_cycle
        order = np.argsort(key, kind="stable")  # keeps mz ascending within cell

        n_cells = n_slots * n_bins * n_cycles
        cell_counts = np.bincount(key, minlength=n_cells)
        cell_off = np.zeros(n_cells + 1, dtype=np.int64)
        np.cumsum(cell_counts, out=cell_off[1:])
        # cell_start[slot, bin, cycle] = start offset; extra trailing column
        # holds the end of the last cycle of each (slot, bin) row
        cs = cell_off[:-1].reshape(n_slots, n_bins, n_cycles)
        ends = cell_off[1:].reshape(n_slots, n_bins, n_cycles)[:, :, -1:]
        self.cell_start = np.concatenate([cs, ends], axis=2).astype(np.int32)

        pad = 1024
        self.peak_mz = np.concatenate(
            [all_mz[order].astype(np.float32), np.full(pad, np.float32(np.inf))]
        )
        self.peak_intensity = np.concatenate(
            [all_int[order].astype(np.float32), np.zeros(pad, np.float32)]
        )
        self.peak_is_ghost = np.concatenate([is_ghost[order], np.zeros(pad, bool)])
        self.peak_scanbin = np.concatenate(
            [all_scanbin[order].astype(np.int32), np.zeros(pad, np.int32)]
        )
        self._n_canonical = len(spectra.mz)
        self.n_bins = n_bins

    # ------------------------------------------------------------------
    @property
    def n_peaks(self) -> int:
        """Number of canonical (non-ghost) peaks."""
        return self._n_canonical

    @property
    def n_stored_peaks(self) -> int:
        return int(self.cell_start[-1, -1, -1]) if self.cell_start is not None else 0

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
    def device_arrays(self, stride: int = 1) -> dict:
        """Upload (once) and return the arrays consumed by the JAX kernels.

        ``stride`` > 1 returns a cycle-coarsened VIEW of the same peak
        store: because cycle is the minor index dimension before m/z, the
        peaks of ``stride`` adjacent cycles are already contiguous per
        (slot, bin), so coarsening is just a strided ``cell_start`` — the
        big peak arrays are shared with the fine view (no re-upload). Wide
        pre-calibration selection windows use this to cut XIC work by
        ``stride`` at full signal fidelity (cells sum, not subsample).
        """
        if stride > 1:
            if self._device_coarse is None:
                self._device_coarse = {}
            if stride not in self._device_coarse:
                import jax.numpy as jnp

                base = self.device_arrays()
                n_k = -(-self.n_cycles_dev // stride)  # ceil over BUCKETED
                # boundary c' -> fine boundary min(stride*c', n_cycles);
                # boundaries in the bucketed pad region stay at the real
                # end (empty cells)
                b_idx = np.minimum(
                    np.arange(n_k + 1, dtype=np.int64) * stride, self.n_cycles
                )
                cs_k = self.cell_start[:, :, b_idx]
                crt_k = self._cycle_rt_padded()[::stride][: n_k]
                d = dict(base)
                d["cell_start"] = jnp.asarray(np.ascontiguousarray(cs_k))
                d["cycle_rt"] = jnp.asarray(np.ascontiguousarray(crt_k))
                d["n_cycles"] = n_k
                self._device_coarse[stride] = d
            return self._device_coarse[stride]
        if self._device is None:
            import jax.numpy as jnp

            from alphadia_tpu.ops.xic_pallas import pack_peak_store
            from alphadia_tpu.utils.device import bucket_count

            # cycle of every stored peak, reconstructed from the cell index
            counts = np.diff(
                np.concatenate(
                    [self.cell_start[:, :, :-1].reshape(-1), [self.n_stored_peaks]]
                )
            )
            cyc = np.repeat(
                np.tile(
                    np.arange(self.n_cycles, dtype=np.int32),
                    self.cell_start.shape[0] * self.cell_start.shape[1],
                ),
                counts,
            )
            # SHAPE BUCKETING: peak counts and cycle counts differ per raw
            # file; exact-size uploads would recompile every kernel for
            # every file (measured ~270 s of a 388 s per-file wall on the
            # remote TPU). Pad peaks + the cycle axis to quarter-pow2
            # buckets so same-instrument runs share all compiled programs.
            # Padded peaks: mz=+inf (matches nothing), intensity 0,
            # cycle -1; padded cycles: empty cells (edge-repeated offsets)
            # and monotone rt. Kernels mask these out by construction.
            n = len(self.peak_mz)
            n_p = bucket_count(n)
            pad = n_p - n
            cyc = np.concatenate([cyc, np.full(n_p - len(cyc), -1, np.int32)])
            peak_mz = np.concatenate(
                [self.peak_mz, np.full(pad, np.float32(np.inf))]
            )
            peak_int = np.concatenate([self.peak_intensity, np.zeros(pad, np.float32)])
            scanbin = (
                self.peak_scanbin
                if self.peak_scanbin is not None
                else np.zeros(n, np.int32)
            )
            scanbin = np.concatenate([scanbin, np.zeros(pad, np.int32)])

            Nc_p = self.n_cycles_dev
            cs = self.cell_start
            if Nc_p > self.n_cycles:
                cs = np.pad(
                    cs, ((0, 0), (0, 0), (0, Nc_p - self.n_cycles)), mode="edge"
                )
            self._device = {
                "peak_mz": jnp.asarray(peak_mz),
                "peak_intensity": jnp.asarray(peak_int),
                "peak_scanbin": jnp.asarray(scanbin),
                # interleaved [NR, 4, 128] store: one DMA per slab in the
                # pallas kernel (fields mz, intensity, cycle, scanbin)
                "peak_packed": jnp.asarray(
                    pack_peak_store(peak_mz, peak_int, cyc, scanbin)
                ),
                "cell_start": jnp.asarray(cs),
                "cycle_rt": jnp.asarray(self._cycle_rt_padded()),
                "n_cycles": Nc_p,
            }
        return self._device

    @property
    def n_cycles_dev(self) -> int:
        """Bucketed cycle count of the device view (static kernel shape;
        see device_arrays shape bucketing)."""
        from alphadia_tpu.utils.device import bucket_count

        return bucket_count(self.n_cycles, minimum=256)

    def _cycle_rt_padded(self) -> np.ndarray:
        Nc_p = self.n_cycles_dev
        if Nc_p == self.n_cycles:
            return self.cycle_rt
        step = (
            float(self.cycle_time)
            if np.isfinite(self.cycle_time) and self.cycle_time > 0
            else 1.0
        )
        tail = self.cycle_rt[-1] + step * np.arange(
            1, Nc_p - self.n_cycles + 1, dtype=np.float32
        )
        return np.concatenate([self.cycle_rt, tail]).astype(np.float32)

    def free_device(self) -> None:
        self._device = None
        self._device_coarse = None
