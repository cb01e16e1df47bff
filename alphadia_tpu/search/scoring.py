"""Host driver for candidate scoring.

(reference: alphadia/search/scoring/scoring.py:114-661 ``CandidateScoring`` —
score-group container build, pjit dispatch, PSM/fragment df collection; here
batch-array preparation + one fused device kernel per batch.)

Produces the PSM feature dataframe (46 named features + precursor metadata +
derived columns like delta_rt) and the per-fragment quantification frame.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pandas as pd

from alphadia_tpu.constants.settings import MASS_NEUTRON_AVG
from alphadia_tpu.ops.scoring import (
    score_candidates_batch_lib,
    score_candidates_batch_packed,
    unpack_scoring_output,
)
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.reporting import logger
from alphadia_tpu.search.common import (
    assign_observation_slots,
    data_parallel_mesh,
    pallas_available,
    prefetch_to_host,
    top_k_fragment_order,
)
from alphadia_tpu.utils.device import (
    bucket_window,
    effective_batch,
    enable_compilation_cache,
)

# order must match ops/scoring.py feature indices
FEATURE_COLUMNS = [
    "base_width_mobility",
    "base_width_rt",
    "rt_observed",
    "mobility_observed",
    "mono_ms1_intensity",
    "top_ms1_intensity",
    "sum_ms1_intensity",
    "weighted_ms1_intensity",
    "weighted_mass_deviation",
    "weighted_mass_error",
    "mz_observed",
    "mono_ms1_height",
    "top_ms1_height",
    "sum_ms1_height",
    "weighted_ms1_height",
    "isotope_intensity_correlation",
    "isotope_height_correlation",
    "n_observations",
    "intensity_correlation",
    "height_correlation",
    "intensity_fraction",
    "height_fraction",
    "intensity_fraction_weighted",
    "height_fraction_weighted",
    "mean_observation_score",
    "sum_b_ion_intensity",
    "sum_y_ion_intensity",
    "diff_b_y_ion_intensity",
    "f_masked",
    "fragment_scan_correlation",
    "template_scan_correlation",
    "fragment_frame_correlation",
    "top3_frame_correlation",
    "template_frame_correlation",
    "top3_b_ion_correlation",
    "n_b_ions",
    "top3_y_ion_correlation",
    "n_y_ions",
    "cycle_fwhm",
    "mobility_fwhm",
    "delta_frame_peak",
    "top_3_ms2_mass_error",
    "mean_ms2_mass_error",
    "n_overlapping",
    "mean_overlapping_intensity",
    "mean_overlapping_mass_error",
]

# library SoA / candidate geometry key sets (upload layout)
LIB_KEYS = (
    "frag_mz", "frag_valid", "frag_intensity", "frag_type",
    "frag_position", "iso_mz", "iso_intensity", "ms2_slot",
    "ms1_slot", "win_lo", "win_hi",
)
GEO_KEYS = (
    "rows", "frame_center", "frame_start", "frame_stop",
    "scan_lo", "scan_hi", "mobility_width",
)

# precursor columns carried into the PSM table when present
PRECURSOR_CARRY_COLUMNS = [
    "elution_group_idx",
    "decoy",
    "channel",
    "charge",
    "mz_library",
    "rt_library",
    "mobility_library",
    "flat_frag_start_idx",
    "flat_frag_stop_idx",
    "proteins",
    "genes",
    "sequence",
    "mods",
    "mod_sites",
    "mod_seq_hash",
    "mod_seq_charge_hash",
    "nAA",
    "i_0",
    "i_1",
    "i_2",
    "i_3",
]


@dataclass
class ScoringConfig:
    """(reference: alphadia/search/scoring/config.py CandidateScoringConfig)"""

    precursor_mz_tolerance: float = 10.0
    fragment_mz_tolerance: float = 15.0
    top_k_fragments: int = 12
    top_k_isotopes: int = 3
    exclude_shared_ions: bool = True
    quant_window: int = 3
    quant_all: bool = True
    experimental_xic: bool = True
    collect_fragments: bool = True
    # emit every library fragment slot (zeros for unobserved) instead of
    # only kernel-matched ones — transfer learning trains on the complete
    # intensity vector (reference requantify_fragments contract)
    collect_unobserved_fragments: bool = False
    # False = optimization-iteration transport: per-fragment quant
    # (height/intensity) is dropped from the device->host download (~23%
    # fewer bytes; the calibration loop only consumes mass_error,
    # correlation, obs_intensity and scan_com)
    transport_quant: bool = True
    batch_size: int = 16384
    gather_slab: int = 256
    # cap on the data-parallel mesh axis (None = all visible devices)
    mesh_devices: int | None = None
    max_ms2_obs: int = 2
    max_ms1_obs: int = 1
    quad_sigma: tuple = (0.2, 0.2)
    quad_delta_mu: tuple = (0.0, 0.0)
    # pallas DMA kernel for XIC extraction (TPU only; XLA path on CPU)
    use_pallas: bool = True
    # 'bfloat16' halves HBM traffic of the dense intensity chains on TPU;
    # m/z and mass-error math stays f32 either way (tpu.compute_dtype)
    compute_dtype: str = "float32"
    # bench instrumentation: block on uploads before dispatch and on all
    # outputs after it, record the pure device compute time in
    # CandidateScoring.last_device_seconds, and skip the download/decode
    # leg entirely (returns empty frames). Never used in production.
    bench_device_time: bool = False


class CandidateScoring:
    def __init__(
        self,
        dia_data: DiaData,
        precursor_df: pd.DataFrame,
        fragment_df: pd.DataFrame,
        config: ScoringConfig | None = None,
        rt_column: str = "rt_library",
        precursor_mz_column: str = "mz_library",
        fragment_mz_column: str = "mz_library",
    ):
        self.dia = dia_data
        self.precursor_df = precursor_df.reset_index(drop=True)
        self.fragment_df = fragment_df
        self.config = config or ScoringConfig()
        self.rt_column = rt_column
        self.precursor_mz_column = precursor_mz_column
        self.fragment_mz_column = fragment_mz_column
        self._residue_counts: dict | None = None
        self._lib_arrays: dict | None = None

    # ------------------------------------------------------------------
    def _library_arrays(self):
        """Per-PRECURSOR scoring inputs (fragment top-k SoA, isotopes,
        observation slots, quad windows) — everything that does not depend
        on the candidate. Computed once per scoring instance over the
        library rows and gathered BY ROW INDEX on device, so the tunnel
        never ships per-candidate copies (candidates duplicate precursors
        ~2-3x) and the host prep runs at library size, not candidate size.
        """
        if self._lib_arrays is not None:
            return self._lib_arrays
        cfg = self.config
        dia = self.dia
        prec = self.precursor_df
        frag = self.fragment_df

        mono_mz = prec[self.precursor_mz_column].to_numpy(np.float32)
        charge = prec["charge"].to_numpy(np.int32)
        n = len(prec)

        KI = cfg.top_k_isotopes
        iso_cols = [c for c in (f"i_{k}" for k in range(KI)) if c in prec.columns]
        if iso_cols:
            iso_int = prec[iso_cols].to_numpy(np.float32)
            if iso_int.shape[1] < KI:
                iso_int = np.pad(iso_int, ((0, 0), (0, KI - iso_int.shape[1])))
        else:
            iso_int = np.tile(
                np.array([[1.0, 0.5, 0.25]], np.float32)[:, :KI], (n, 1)
            )
        iso_mz = (
            mono_mz[:, None]
            + np.arange(KI, dtype=np.float32)[None, :] * MASS_NEUTRON_AVG / charge[:, None]
        ).astype(np.float32)

        # fragments: same selection semantics as CandidateSelection
        starts = prec["flat_frag_start_idx"].to_numpy(np.int64)
        stops = prec["flat_frag_stop_idx"].to_numpy(np.int64)
        max_len = max(int((stops - starts).max()) if n else 1, cfg.top_k_fragments)
        k_idx = starts[:, None] + np.arange(max_len)[None, :]
        in_range = k_idx < stops[:, None]
        k_idx = np.minimum(k_idx, max(len(frag) - 1, 0))
        fmz = frag[self.fragment_mz_column].to_numpy(np.float32)[k_idx]
        fint = frag["intensity"].to_numpy(np.float32)[k_idx]
        fcard = frag["cardinality"].to_numpy()[k_idx]
        ftype = frag["type"].to_numpy(np.int32)[k_idx]
        fpos = frag["position"].to_numpy(np.int32)[k_idx]
        fnum = frag["number"].to_numpy(np.int32)[k_idx]
        fch = frag["charge"].to_numpy(np.int32)[k_idx]
        floss = frag["loss_type"].to_numpy(np.int32)[k_idx]
        valid = in_range
        if cfg.exclude_shared_ions:
            valid &= fcard <= 1
        KF = cfg.top_k_fragments
        # shared policy with selection: both stages pick the same subset
        order = top_k_fragment_order(valid, fint, KF)

        def takef(a):
            return np.take_along_axis(a, order, axis=1)

        sel_valid = takef(valid)
        out = {
            "frag_mz": np.where(sel_valid, takef(fmz), 0.0).astype(np.float32),
            "frag_valid": sel_valid,
            "frag_intensity": np.where(sel_valid, takef(fint), 0.0).astype(np.float32),
            "frag_type": takef(ftype),
            "frag_position": takef(fpos),
            "frag_number": takef(fnum),
            "frag_charge": takef(fch),
            "frag_loss_type": takef(floss),
            "frag_mz_library": np.where(
                sel_valid,
                np.take_along_axis(
                    frag["mz_library"].to_numpy(np.float32)[k_idx], order, axis=1
                ),
                0.0,
            ).astype(np.float32),
        }

        # ms2/ms1 slots + quad windows (shared policy with selection)
        ms2_slots, ms1_slots, win_lo, win_hi = assign_observation_slots(
            dia, mono_mz, iso_mz, cfg.max_ms2_obs, cfg.max_ms1_obs
        )
        out.update(
            {
                "iso_mz": iso_mz,
                "iso_intensity": iso_int.astype(np.float32),
                "ms2_slot": ms2_slots.astype(np.int32),
                "ms1_slot": ms1_slots.astype(np.int32),
                "win_lo": win_lo,
                "win_hi": win_hi,
            }
        )
        self._lib_arrays = out
        return out

    def _candidate_geometry(self, cand: pd.DataFrame):
        """Per-CANDIDATE arrays: the precursor row index plus the elution
        window geometry selection emitted — ~18 bytes/candidate on the
        wire vs ~150 for the full per-candidate expansion."""
        dia = self.dia
        prec = self.precursor_df

        row_of = pd.Series(
            np.arange(len(prec)), index=prec["precursor_idx"].to_numpy()
        )
        rows = row_of.loc[cand["precursor_idx"].to_numpy()].to_numpy()

        frame_center = cand["frame_center"].to_numpy(np.int64).astype(np.int32)
        frame_start = cand["frame_start"].to_numpy(np.int64).astype(np.int32)
        frame_stop = cand["frame_stop"].to_numpy(np.int64).astype(np.int32)
        half = np.maximum(frame_center - frame_start, frame_stop - frame_center)
        W = bucket_window(max(2 * int(half.max()) + 1, 16))

        # candidate scan (mobility) window; degenerate [0, 1) for 3D data
        n = len(frame_center)
        if dia.has_mobility and "scan_start" in cand.columns:
            S = dia.n_scan_bins
            scan_lo = np.clip(
                cand["scan_start"].to_numpy(np.int64), 0, S - 1
            ).astype(np.int32)
            scan_hi = np.clip(
                cand["scan_stop"].to_numpy(np.int64), 1, S
            ).astype(np.int32)
            scan_hi = np.maximum(scan_hi, scan_lo + 1)
            mv = np.asarray(dia.mobility_values, np.float32)
            mobility_width = np.abs(
                mv[np.clip(scan_hi - 1, 0, S - 1)] - mv[scan_lo]
            ).astype(np.float32)
        else:
            scan_lo = np.zeros(n, np.int32)
            scan_hi = np.ones(n, np.int32)
            mobility_width = np.zeros(n, np.float32)

        return {
            "rows": rows.astype(np.int32),
            "frame_center": frame_center,
            "frame_start": frame_start,
            "frame_stop": frame_stop,
            "scan_lo": scan_lo,
            "scan_hi": scan_hi,
            "mobility_width": mobility_width,
            "window_len": W,
        }

    def _candidate_arrays(self, cand: pd.DataFrame):
        """Per-candidate expansion (library arrays gathered by row on
        host) — only the mesh path uploads this layout; the single-device
        path ships the library SoA + geometry and gathers on device."""
        lib = self._library_arrays()
        geo = self._candidate_geometry(cand)
        rows = geo["rows"]
        out = {k: v[rows] for k, v in lib.items()}
        out.update(geo)
        return out

    # ------------------------------------------------------------------
    def _mesh(self):
        return data_parallel_mesh(self.config.mesh_devices, self.config.batch_size)

    def _static_kw(self, W: int) -> dict:
        cfg = self.config
        dia = self.dia
        return dict(
            # bucket-padded device cycle count (static shape shared across
            # same-instrument files; see DiaData.device_arrays)
            n_cycles=dia.n_cycles_dev,
            n_bins=dia.n_bins,
            bin_mz_min=dia.bin_mz_min,
            bin_width=dia.coarse_bin_width,
            n_scan_bins=dia.n_scan_bins if dia.has_mobility else 1,
            slab=cfg.gather_slab,
            window_len=W,
            quant_window=cfg.quant_window,
            quant_all=cfg.quant_all,
            experimental_xic=cfg.experimental_xic,
            use_pallas=_pallas_available() and cfg.use_pallas,
            compute_dtype=cfg.compute_dtype,
        )

    def _batch_cap(self) -> int:
        cap = self.config.batch_size
        if self.dia.has_mobility and self.dia.n_scan_bins > 1:
            cap = min(cap, 4096)  # scan-profile extraction is S-times heavier
        return cap

    def _upload_lib(self):
        """Upload the per-precursor SoA once (async, compact wire dtypes).
        Returns (lib_host, lib_dev)."""
        import jax as _jax

        from alphadia_tpu.ops.packing import compact_wire

        lib = self._library_arrays()
        lib_dev = {
            k: _jax.device_put(compact_wire(k, lib[k])) for k in LIB_KEYS
        }
        return lib, lib_dev

    @staticmethod
    def _geo_chunk(geo: dict, b0: int, b1: int, bsz: int) -> dict:
        """Slice per-candidate geometry [b0:b1], pad to bsz, compact."""
        from alphadia_tpu.ops.packing import compact_wire

        out = {}
        for k in GEO_KEYS:
            a = geo[k][b0:b1]
            if b1 - b0 < bsz:
                a = np.concatenate(
                    [a, np.repeat(a[-1:], bsz - (b1 - b0), axis=0)], axis=0
                )
            out[k] = compact_wire(k, a)
        return out

    def _dispatch_chunk(self, dev, lib_dev, geo_chunk, bsz: int, W: int):
        """One scoring dispatch for an exact-[bsz] geometry chunk (values
        may be host numpy — device_put'd here, async — or pre-staged
        device arrays)."""
        import jax as _jax

        cfg = self.config
        geo_dev = {
            k: (v if hasattr(v, "devices") else _jax.device_put(v))
            for k, v in geo_chunk.items()
        }
        return score_candidates_batch_lib(
            dev["peak_mz"], dev["peak_intensity"],
            dev["peak_packed"], dev["peak_scanbin"],
            dev["cell_start"], dev["cycle_rt"],
            *(lib_dev[k] for k in LIB_KEYS),
            np.asarray(cfg.quad_sigma, np.float32),
            np.asarray(cfg.quad_delta_mu, np.float32),
            *(geo_dev[k] for k in GEO_KEYS),
            np.int32(0),
            np.float32(cfg.fragment_mz_tolerance),
            np.float32(cfg.precursor_mz_tolerance),
            bsz=bsz, pack_output=True,
            transport_quant=cfg.transport_quant,
            **self._static_kw(W),
        )

    def __call__(
        self, candidates_df: pd.DataFrame, thread_count: int | None = None
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Score all candidates. Returns (psm_features_df, fragment_df)."""
        cfg = self.config
        dia = self.dia
        cand = candidates_df.reset_index(drop=True)
        if len(cand) == 0:
            return _empty_psm_df(), _empty_fragment_df()

        # wall-time budget of this call, by segment (seconds); read via
        # self.last_trace after the call — the measured basis for the
        # docs/architecture.md transfer-economics numbers
        trace = {
            "prep": 0.0, "wire": 0.0, "submit": 0.0,
            "transfer_wait": 0.0, "decode": 0.0, "df_build": 0.0,
        }
        _t = time.perf_counter()

        enable_compilation_cache()
        mesh = self._mesh()
        lib = self._library_arrays()
        geo = self._candidate_geometry(cand)
        arrays = None
        if mesh is not None:
            # mesh path ships per-candidate copies (library gather on host)
            arrays = {k: v[geo["rows"]] for k, v in lib.items()}
            arrays.update(geo)
        trace["prep"] = time.perf_counter() - _t
        W = geo["window_len"]
        dev = dia.device_arrays()
        static_kw = self._static_kw(W)

        n = len(cand)
        cap = self._batch_cap()
        Bsz = effective_batch(cap, n)

        # non-mesh path: greedy pow2 schedule (fewer dispatches for the
        # bulk, halving batches toward the tail to bound padded rows)
        from alphadia_tpu.utils.device import batch_schedule

        if mesh is None:
            schedule = batch_schedule(n, cap)
        else:
            schedule = [(b0, Bsz) for b0 in range(0, n, Bsz)]

        n_padded = max(b0 + bsz for b0, bsz in schedule)
        import jax as _jax

        _BATCH_KEYS = (
            "frag_mz", "frag_valid", "frag_intensity", "frag_type",
            "frag_position", "iso_mz", "iso_intensity", "ms2_slot",
            "ms1_slot", "win_lo", "win_hi", "frame_center", "frame_start",
            "frame_stop", "scan_lo", "scan_hi", "mobility_width",
        )

        from alphadia_tpu.ops.packing import compact_wire

        def _padded(a):
            if n_padded > n:
                a = np.concatenate(
                    [a, np.repeat(a[-1:], n_padded - n, axis=0)], axis=0
                )
            return a

        # library-indexed uploads (non-mesh production + device-time
        # bench): the per-precursor SoA goes up ONCE in compact wire
        # dtypes (f16/u8/i16/bit-packed validity — the kernel decodes);
        # per-batch inputs are a small exact-[bsz] geometry chunk + a
        # device-side row gather. device_put is async, so uploads ride
        # the tunnel while earlier batches compute and their downloads
        # stream back full-duplex.
        _t = time.perf_counter()
        if mesh is None:
            lib, lib_dev = self._upload_lib()
            batch_dev = None
        else:
            # mesh path: per-candidate arrays, per-batch placement below
            batch_dev = {
                k: compact_wire(k, _padded(arrays[k])) for k in _BATCH_KEYS
            }
        trace["wire"] = time.perf_counter() - _t

        if cfg.bench_device_time:
            # stage ALL inputs (incl. every geometry chunk) before the clock
            staged = [
                {
                    k: _jax.device_put(v)
                    for k, v in self._geo_chunk(
                        geo, b0, min(b0 + bsz, n), bsz
                    ).items()
                }
                for b0, bsz in schedule
            ]
            _jax.block_until_ready(list(lib_dev.values()))
            for s in staged:
                _jax.block_until_ready(list(s.values()))
            _jax.block_until_ready(list(dev.values()))
            _t_device0 = time.perf_counter()

        qs = np.asarray(cfg.quad_sigma, np.float32)
        qd = np.asarray(cfg.quad_delta_mu, np.float32)
        ftol = np.float32(cfg.fragment_mz_tolerance)
        ptol = np.float32(cfg.precursor_mz_tolerance)
        _t = time.perf_counter()
        pending = []  # device results collected after all batches are submitted
        for i, (b0, bsz) in enumerate(schedule):
            b1 = min(b0 + bsz, n)
            pad = bsz - (b1 - b0)

            if mesh is None:
                # single dispatch per batch: exact-[bsz] geometry chunk,
                # library rows gathered on device; packed byte-plane
                # output = single device->host download per batch
                chunk = (
                    staged[i]
                    if cfg.bench_device_time
                    else self._geo_chunk(geo, b0, b1, bsz)
                )
                packed = self._dispatch_chunk(dev, lib_dev, chunk, bsz, W)
                pending.append((bsz - pad, b0, packed))
                continue

            def _pad(key):
                from alphadia_tpu.parallel.mesh import batch_sharding

                sl = batch_dev[key][b0 : b0 + Bsz]
                return _jax.device_put(np.asarray(sl), batch_sharding(mesh))

            packed = score_candidates_batch_packed(
                dev["peak_mz"],
                dev["peak_intensity"],
                dev["peak_packed"],
                dev["peak_scanbin"],
                dev["cell_start"],
                dev["cycle_rt"],
                _pad("frag_mz"),
                _pad("frag_valid"),
                _pad("frag_intensity"),
                _pad("frag_type"),
                _pad("frag_position"),
                _pad("iso_mz"),
                _pad("iso_intensity"),
                _pad("ms2_slot"),
                _pad("ms1_slot"),
                _pad("win_lo"),
                _pad("win_hi"),
                qs,
                qd,
                _pad("frame_center"),
                _pad("frame_start"),
                _pad("frame_stop"),
                _pad("scan_lo"),
                _pad("scan_hi"),
                _pad("mobility_width"),
                ftol,
                ptol,
                transport_quant=cfg.transport_quant,
                **static_kw,
            )
            # virtual-CPU meshes: a pending collective program can hit the
            # hard 40 s rendezvous timeout if the host thread is busy
            # compiling the next batch's shape (observed CHECK-failure
            # aborts on 8 virtual devices / 4 cores) — block per batch.
            # Real TPU meshes keep the async queue (ICI rendezvous is
            # hardware-side).
            if _jax.default_backend() == "cpu":
                _jax.block_until_ready(packed)
            pending.append((bsz - pad, b0, packed))

        if cfg.bench_device_time:
            _jax.block_until_ready([p for _, _, p in pending])
            self.last_device_seconds = (
                time.perf_counter() - _t_device0
            )
            return _empty_psm_df(), _empty_fragment_df()

        trace["submit"] = time.perf_counter() - _t

        psm_df, fragment_df = self._harvest(pending, cand, lib, geo, trace)
        self.last_trace = trace
        logger.info(
            f"Candidate scoring: {len(psm_df)}/{n} candidates scored "
            f"(window {W} cycles)"
        )
        return psm_df, fragment_df

    def _harvest(self, pending, cand, lib, geo, trace):
        """Collect, decode and assemble all pending batch results into
        the (psm_df, fragment_df) pair. ``pending`` entries are
        (take, b0, packed) where b0 indexes into cand/geo order."""
        cfg = self.config

        feat_rows = []
        valid_rows = []
        frag_out_rows = {k: [] for k in ("mz_observed", "mass_error", "height", "intensity", "correlation", "valid", "obs_intensity", "scan_com")}

        # pipeline the downloads: start every device->host copy now so the
        # tunnel transfer of batch N+1 overlaps the host decode of batch N
        prefetch_to_host([p for _, _, p in pending])

        from alphadia_tpu.ops.packing import wire_decode_np

        KF = cfg.top_k_fragments
        for take, b0, packed in pending:
            _t = time.perf_counter()
            buf = np.asarray(packed)
            trace["transfer_wait"] += time.perf_counter() - _t
            _t = time.perf_counter()
            # both the mesh and non-mesh paths ship byte planes (the
            # compressible wire format); the dtype gate only guards the
            # pack_output=False debug path, whose buffers are u16
            if buf.dtype == np.uint8:
                buf = wire_decode_np(buf, np.uint16)
            features, valid, frag_out = unpack_scoring_output(
                buf[:take],
                KF,
                lib["ms2_slot"].shape[1],
                with_quant=cfg.transport_quant,
            )
            # mz_observed reconstructed exactly from mass_error (ppm, f16:
            # resolution ~0.01 ppm) and the queried library m/z
            fmz = lib["frag_mz"][geo["rows"][b0 : b0 + take]]
            frag_out["mz_observed"] = np.where(
                frag_out["valid"] & (frag_out["height"] > 0),
                fmz * (1.0 + frag_out["mass_error"] * 1e-6),
                0.0,
            ).astype(np.float32)
            feat_rows.append(features)
            valid_rows.append(valid)
            for k in frag_out_rows:
                frag_out_rows[k].append(frag_out[k][:take])
            trace["decode"] += time.perf_counter() - _t

        _t = time.perf_counter()
        features = np.concatenate(feat_rows)
        valid = np.concatenate(valid_rows)
        frag_out = {k: np.concatenate(v) for k, v in frag_out_rows.items()}

        # filter to valid candidates FIRST (typically ~25% of the batch
        # rows survive), then build all columns as numpy and construct the
        # frame ONCE — filtering a built 80-column frame and incremental
        # pandas inserts both cost block-manager reallocations (profiled
        # ~0.08 s/run on the hot path before this layout)
        keep_rows = np.nonzero(valid)[0]
        rows = geo["rows"][keep_rows]  # library row per surviving candidate
        data: dict = {
            name: features[keep_rows, j]
            for j, name in enumerate(FEATURE_COLUMNS)
        }
        # raw per-quad-window fragment sums + window bounds: the training
        # data for per-run quadrupole fitting (search/quadrupole.py)
        for o in range(frag_out["obs_intensity"].shape[1]):
            data[f"obs_intensity_{o}"] = frag_out["obs_intensity"][keep_rows, o]
            data[f"obs_win_lo_{o}"] = lib["win_lo"][rows, o]
            data[f"obs_win_hi_{o}"] = lib["win_hi"][rows, o]
        if self.dia.has_mobility and self.dia.n_scan_bins > 1:
            # kernel scan center of mass (bin units) -> mobility values;
            # mobility_fwhm (feature 39) is already computed in-kernel
            S = self.dia.n_scan_bins
            span = self.dia.mobility_max - self.dia.mobility_min
            com = frag_out["scan_com"][keep_rows]
            data["mobility_observed"] = np.where(
                com > 0, self.dia.mobility_min + com / S * span, 0.0
            ).astype(np.float32)
            # base_width_mobility (feature 0): candidate scan extent
            # (reference location_features.py:19-22)
            data["base_width_mobility"] = geo["mobility_width"][keep_rows]
        data["precursor_idx"] = cand["precursor_idx"].to_numpy()[keep_rows]
        data["rank"] = cand["rank"].to_numpy()[keep_rows]
        data["score"] = (
            cand["score"].to_numpy()[keep_rows]
            if "score" in cand.columns
            else np.zeros(len(keep_rows), np.float32)
        )
        for col in ("scan_center", "scan_start", "scan_stop", "frame_center", "frame_start", "frame_stop"):
            if col in cand.columns:
                data[col] = cand[col].to_numpy()[keep_rows]

        # merge precursor metadata
        prec = self.precursor_df
        carry = [c for c in PRECURSOR_CARRY_COLUMNS if c in prec.columns]
        for c in carry:
            data[c] = prec[c].to_numpy()[rows]

        rt_ref = prec[self.rt_column].to_numpy(np.float32)[rows]
        data["delta_rt"] = data["rt_observed"] - rt_ref
        if "sequence" in prec.columns:
            # residue counts are per-precursor constants: computed once per
            # scoring instance, indexed per candidate
            if self._residue_counts is None:
                seqs = prec["sequence"].astype(str)
                self._residue_counts = {
                    aa: seqs.str.count(aa).to_numpy(np.float32)
                    for aa in ("K", "R", "P")
                }
            for aa, counts in self._residue_counts.items():
                data[f"n_{aa}"] = counts[rows]

        psm_df = pd.DataFrame(data)

        # fragment output frame
        fragment_df = _empty_fragment_df()
        if cfg.collect_fragments:
            cand_frag_valid = lib["frag_valid"][geo["rows"]]
            obs_mask = frag_out["valid"] & cand_frag_valid
            fv = (
                cand_frag_valid
                if cfg.collect_unobserved_fragments
                else obs_mask
            )[keep_rows]
            rr, cc = np.nonzero(fv)
            sel = (keep_rows[rr], cc)
            lib_sel = (geo["rows"][sel[0]], sel[1])
            obs_sel = obs_mask[sel]

            def observed(a):
                # unobserved slots carry kernel padding values — zero them
                return np.where(obs_sel, a[sel], 0.0).astype(np.float32)

            fragment_df = pd.DataFrame(
                {
                    "precursor_idx": cand["precursor_idx"].to_numpy()[keep_rows][rr],
                    "rank": cand["rank"].to_numpy()[keep_rows][rr],
                    "mz_library": lib["frag_mz_library"][lib_sel],
                    "mz": lib["frag_mz"][lib_sel],
                    "mz_observed": observed(frag_out["mz_observed"]),
                    "height": observed(frag_out["height"]),
                    "intensity": observed(frag_out["intensity"]),
                    "mass_error": observed(frag_out["mass_error"]),
                    "correlation": observed(frag_out["correlation"]),
                    "position": lib["frag_position"][lib_sel].astype(np.uint8),
                    "number": lib["frag_number"][lib_sel].astype(np.uint8),
                    "type": lib["frag_type"][lib_sel].astype(np.uint8),
                    "charge": lib["frag_charge"][lib_sel].astype(np.uint8),
                    "loss_type": lib["frag_loss_type"][lib_sel].astype(np.uint8),
                }
            )

        trace["df_build"] = time.perf_counter() - _t
        return psm_df, fragment_df


# shared policy alias (search/common.py)
_pallas_available = pallas_available


def _empty_psm_df() -> pd.DataFrame:
    return pd.DataFrame(columns=FEATURE_COLUMNS + ["precursor_idx", "rank", "score"])


def _empty_fragment_df() -> pd.DataFrame:
    return pd.DataFrame(
        columns=[
            "precursor_idx",
            "rank",
            "mz_library",
            "mz",
            "mz_observed",
            "height",
            "intensity",
            "mass_error",
            "correlation",
            "position",
            "number",
            "type",
            "charge",
            "loss_type",
        ]
    )
