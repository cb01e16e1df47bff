"""Host driver for candidate selection.

(reference: alphadia/search/selection/selection.py:547-737
``CandidateSelection`` host class — container build, pjit dispatch, df
merge; here the per-precursor work happens in one fused JAX batch kernel,
ops/selection.py)

The driver vectorizes library -> batch-array preparation on host (numpy),
pads every batch to a static shape, and streams batches through the device
kernel. Candidates come back as a dataframe in absolute cycle coordinates.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pandas as pd

from alphadia_tpu.constants.settings import MASS_NEUTRON_AVG
from alphadia_tpu.ops.selection import (
    select_candidates_batch,
    select_candidates_batch_4d,
    select_candidates_batch_4d_sliced,
    select_candidates_batch_sliced,
)
from alphadia_tpu.ops.smooth import gaussian_kernel_1d, rt_kernel_sigma
from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.reporting import logger
from alphadia_tpu.search.common import (
    assign_observation_slots,
    data_parallel_mesh,
    first_k_true,
    pallas_available,
    prefetch_to_host,
    top_k_fragment_order,
)
from alphadia_tpu.utils.device import (
    bucket_window,
    effective_batch,
    enable_compilation_cache,
)


@dataclass
class SelectionConfig:
    """Hyperparameters of candidate selection (reference:
    CandidateSelectionConfig, search/selection/config_df.py:140-175 +
    optimization_handler.py:350-355 overrides)."""

    rt_tolerance: float = 60.0
    precursor_mz_tolerance: float = 10.0
    fragment_mz_tolerance: float = 15.0
    candidate_count: int = 3
    top_k_fragments: int = 12
    top_k_precursors: int = 3  # isotopes
    exclude_shared_ions: bool = True
    kernel_size: int = 30
    fwhm_rt: float = 5.0
    sigma_scale_rt: float = 0.5
    f_rt: float = 0.99
    center_fraction: float = 0.5
    min_size_rt: int = 3
    max_size_rt: int = 15
    # 4D (ion mobility) extents in scan-bin units (reference
    # CandidateSelectionConfig f_mobility / *_size_mobility)
    f_mobility: float = 0.99
    min_size_mobility: int = 2
    max_size_mobility: int = 6
    join_close_candidates: bool = True
    join_close_candidates_cycle_threshold: float = 0.6
    peak_cycle_tolerance: int = 3
    # 4D close-peak suppression: both tolerances must hold (reference
    # _join_close_peaks(scan_tol=3, cycle_tol=3))
    peak_scan_tolerance: int = 3
    # pallas DMA kernel for XIC extraction (TPU only; XLA path on CPU)
    use_pallas: bool = True
    # merge adjacent cycles when the RT window exceeds 512 cycles
    # (pre-calibration searches): k x less XIC work, full signal (sums)
    coarsen_wide_windows: bool = True
    # device batching
    batch_size: int = 16384
    gather_slab: int = 256
    # cap on the data-parallel mesh axis (None = all visible devices)
    mesh_devices: int | None = None
    max_ms2_obs: int = 2
    max_ms1_obs: int = 1
    # bench instrumentation: block on uploads before dispatch and on all
    # outputs after it, record pure device compute time in
    # CandidateSelection.last_device_seconds, skip the download/decode leg
    # (returns an empty frame). Never used in production.
    bench_device_time: bool = False


class CandidateSelection:
    def __init__(
        self,
        dia_data: DiaData,
        precursor_df: pd.DataFrame,
        fragment_df: pd.DataFrame,
        config: SelectionConfig | None = None,
        rt_column: str = "rt_library",
        precursor_mz_column: str = "mz_library",
        fragment_mz_column: str = "mz_library",
    ):
        self.dia = dia_data
        self.precursor_df = precursor_df
        self.fragment_df = fragment_df
        self.config = config or SelectionConfig()
        self.rt_column = rt_column
        self.precursor_mz_column = precursor_mz_column
        self.fragment_mz_column = fragment_mz_column

    # ------------------------------------------------------------------
    def _window_len(self) -> int:
        """Cycle-window length: rt tolerance padded to a multiple of 16,
        at least max(32, kernel_size) (reference alpharaw_jit.py:140-203)."""
        cfg = self.config
        need = int(np.ceil(2.0 * cfg.rt_tolerance / self.dia.cycle_time))
        return bucket_window(max(need, 32, cfg.kernel_size))

    def _prepare_batch_arrays(self):
        cfg = self.config
        dia = self.dia
        prec = self.precursor_df
        frag = self.fragment_df
        n = len(prec)

        mono_mz = prec[self.precursor_mz_column].to_numpy(np.float32)
        charge = prec["charge"].to_numpy(np.int32)
        rt = prec[self.rt_column].to_numpy(np.float32)

        # --- isotopes ------------------------------------------------
        KI = cfg.top_k_precursors
        iso_mz = (
            mono_mz[:, None]
            + np.arange(KI, dtype=np.float32)[None, :] * MASS_NEUTRON_AVG / charge[:, None]
        ).astype(np.float32)

        # --- fragments (ragged -> padded, cardinality filter, top-k) --
        starts = prec["flat_frag_start_idx"].to_numpy(np.int64)
        stops = prec["flat_frag_stop_idx"].to_numpy(np.int64)
        max_len = int((stops - starts).max()) if n else 1
        k_idx = starts[:, None] + np.arange(max_len)[None, :]
        in_range = k_idx < stops[:, None]
        k_idx = np.minimum(k_idx, max(len(frag) - 1, 0))
        fmz = frag[self.fragment_mz_column].to_numpy(np.float32)[k_idx]
        fint = frag["intensity"].to_numpy(np.float32)[k_idx]
        fcard = frag["cardinality"].to_numpy()[k_idx]
        valid = in_range
        if cfg.exclude_shared_ions:
            valid &= fcard <= 1
        # top-k by intensity among valid (padded to exactly KF columns)
        KF = cfg.top_k_fragments
        if max_len < KF:
            pad_w = KF - max_len
            fmz = np.pad(fmz, ((0, 0), (0, pad_w)))
            fint = np.pad(fint, ((0, 0), (0, pad_w)), constant_values=-1.0)
            valid = np.pad(valid, ((0, 0), (0, pad_w)))
        # top-k order shared with scoring: both stages pick the same
        # fragment subset (ties included)
        order = top_k_fragment_order(valid, fint, KF)
        sel_valid = np.take_along_axis(valid, order, axis=1)
        sel_mz = np.where(sel_valid, np.take_along_axis(fmz, order, axis=1), 0.0)
        n_valid_fragments = sel_valid.sum(axis=1).astype(np.int32)

        # --- cycle-slot assignment (shared policy with scoring) --------
        ms2_slots, ms1_slots, _, _ = assign_observation_slots(
            dia, mono_mz, iso_mz, cfg.max_ms2_obs, cfg.max_ms1_obs
        )

        # fragment queries: KF fragments x (trimmed) observation columns
        n_obs2 = ms2_slots.shape[1]
        QF = KF * n_obs2
        frag_slot = np.repeat(ms2_slots, KF, axis=1)  # [n, QF]
        frag_mz_q = np.tile(sel_mz, n_obs2)
        frag_slot = np.where(
            np.tile(sel_valid, n_obs2), frag_slot, -1
        ).astype(np.int32)

        # isotope queries
        n_obs1 = ms1_slots.shape[1]
        iso_slot = np.repeat(ms1_slots, KI, axis=1).astype(np.int32)
        iso_mz_q = np.tile(iso_mz, n_obs1)

        # --- cycle windows -------------------------------------------
        W = self._window_len()
        center = np.searchsorted(dia.cycle_rt, rt).astype(np.int64)
        cycle_start = np.clip(center - W // 2, 0, max(dia.n_cycles - W, 0)).astype(
            np.int32
        )

        return {
            "frag_slot": frag_slot,
            "frag_mz": frag_mz_q.astype(np.float32),
            "iso_slot": iso_slot,
            "iso_mz": iso_mz_q.astype(np.float32),
            "cycle_start": cycle_start,
            "n_valid_fragments": n_valid_fragments,
            "window_len": W,
        }

    # ------------------------------------------------------------------
    def _mesh(self):
        return data_parallel_mesh(self.config.mesh_devices, self.config.batch_size)

    def __call__(self, thread_count: int | None = None) -> pd.DataFrame:
        state = self._submit()
        if isinstance(state, pd.DataFrame):
            # degenerate paths (empty library, device-time bench) return
            # their frame directly
            return state
        out_frames = [df for _, df in self._harvest_iter(state)]
        candidates = pd.concat(out_frames, ignore_index=True)
        self.last_trace = state["trace"]
        logger.info(
            f"Candidate selection: {len(candidates)} candidates for "
            f"{state['n']} precursors (window {state['window_len']} cycles)"
        )
        return candidates

    def _submit(self):
        """Prepare arrays, upload, and dispatch every selection batch
        (async). Returns a state dict for :meth:`_harvest_iter`, or a
        final DataFrame for degenerate paths."""
        cfg = self.config
        dia = self.dia
        n = len(self.precursor_df)
        if n == 0:
            return _empty_candidates_df()

        # wall-time budget by segment; read via self.last_trace (same
        # contract as CandidateScoring.last_trace)
        trace = {
            "prep": 0.0, "wire": 0.0, "submit": 0.0,
            "transfer_wait": 0.0, "decode": 0.0,
        }
        _t = time.perf_counter()
        enable_compilation_cache()
        arrays = self._prepare_batch_arrays()
        trace["prep"] = time.perf_counter() - _t
        W = arrays["window_len"]

        # wide-window coarsening: pre-calibration RT tolerances produce
        # W > 512 cycle windows; merging `stride` adjacent cycles per cell
        # cuts XIC work by `stride` at full signal fidelity (cells sum,
        # not subsample — the peak store is shared, only a strided cell
        # index uploads; see DiaData.device_arrays). Peak positions and
        # extents map back to fine cycles below; scoring then re-extracts
        # candidates at full resolution, so features are unaffected.
        stride = 1
        if cfg.coarsen_wide_windows:
            while W // stride > 512:
                stride *= 2
        if stride > 1:
            dev = dia.device_arrays(stride)
            n_cycles_dev = dev["n_cycles"]
            W = bucket_window(
                max(-(-arrays["window_len"] // stride), 32, cfg.kernel_size)
            )
            arrays["cycle_start"] = np.clip(
                arrays["cycle_start"] // stride, 0, max(n_cycles_dev - W, 0)
            ).astype(np.int32)
            logger.info(
                f"selection: coarsened {arrays['window_len']}-cycle window "
                f"to {W} (stride {stride})"
            )
        else:
            dev = dia.device_arrays()
            # bucket-padded cycle count (device view; see DiaData shape
            # bucketing) — the static kernel shape must match the arrays
            n_cycles_dev = dev["n_cycles"]

        sigma = rt_kernel_sigma(
            cfg.fwhm_rt, cfg.sigma_scale_rt, dia.cycle_time * stride
        )
        kernel = gaussian_kernel_1d(cfg.kernel_size, sigma)

        mesh = self._mesh()
        use_4d = bool(dia.has_mobility) and dia.n_scan_bins > 1
        # size/tolerance knobs are in cycle units: scale to coarse cells
        min_rt_k = max(1, cfg.min_size_rt // stride)
        max_rt_k = max(min_rt_k + 1, -(-cfg.max_size_rt // stride))
        tol_k = max(1, cfg.peak_cycle_tolerance // stride)
        if use_4d:
            static_kw = dict(
                n_cycles=n_cycles_dev,
                n_bins=dia.n_bins,
                bin_mz_min=dia.bin_mz_min,
                bin_width=dia.coarse_bin_width,
                n_scan_bins=dia.n_scan_bins,
                slab=cfg.gather_slab,
                window_len=W,
                kernel_size=cfg.kernel_size,
                candidate_count=cfg.candidate_count,
                min_size_rt=min_rt_k,
                max_size_rt=max_rt_k,
                min_size_mobility=cfg.min_size_mobility,
                max_size_mobility=cfg.max_size_mobility,
                f_rt=cfg.f_rt,
                f_mobility=cfg.f_mobility,
                center_fraction=cfg.center_fraction,
                peak_cycle_tolerance=tol_k,
                peak_scan_tolerance=cfg.peak_scan_tolerance,
                join_close_candidates=cfg.join_close_candidates,
                join_cycle_threshold=cfg.join_close_candidates_cycle_threshold,
            )
        else:
            static_kw = dict(
                n_cycles=n_cycles_dev,
                n_bins=dia.n_bins,
                bin_mz_min=dia.bin_mz_min,
                bin_width=dia.coarse_bin_width,
                slab=cfg.gather_slab,
                window_len=W,
                kernel_size=cfg.kernel_size,
                candidate_count=cfg.candidate_count,
                min_size_rt=min_rt_k,
                max_size_rt=max_rt_k,
                f_rt=cfg.f_rt,
                center_fraction=cfg.center_fraction,
                join_close_candidates=cfg.join_close_candidates,
                join_cycle_threshold=cfg.join_close_candidates_cycle_threshold,
                peak_cycle_tolerance=tol_k,
                use_pallas=_pallas_available() and cfg.use_pallas,
                cycle_stride=stride,
            )

        cap = cfg.batch_size
        if use_4d:
            # the 4D score map keeps the scan axis: dense [B, Q, S, W]
            # intermediates are S times the 3D footprint, so cap the batch
            # like the scoring driver does
            cap = min(cap, 4096)
        Bsz = effective_batch(cap, n)
        out_frames = []
        precursor_idx = self.precursor_df["precursor_idx"].to_numpy(np.int64)

        # non-mesh path: greedy pow2 schedule (fewer dispatches for the
        # bulk, halving batches toward the tail to bound padded rows)
        from alphadia_tpu.utils.device import batch_schedule

        if mesh is None:
            schedule = batch_schedule(n, cap)
        else:
            schedule = [(b0, Bsz) for b0 in range(0, n, Bsz)]

        # pad the full prepared arrays to cover the last batch and upload
        # ONCE; per-batch inputs are then device-side slices (no
        # host->device transfer or host concat inside the batch loop — on
        # the remote tunnel each small upload costs ~dispatch latency)
        n_padded = max(b0 + bsz for b0, bsz in schedule) if schedule else Bsz
        import jax as _jax

        from alphadia_tpu.ops.packing import compact_wire

        def _full(key, a, zero_tail=False):
            if n_padded > n:
                tail = (
                    np.zeros((n_padded - n,) + a.shape[1:], a.dtype)
                    if zero_tail
                    else np.repeat(a[-1:], n_padded - n, axis=0)
                )
                a = np.concatenate([a, tail], axis=0)
            # i16 wire dtypes for slot/index arrays halve upload bytes
            # through the tunnel; the kernel decodes
            a = compact_wire(key, a)
            # slicing a mesh-sharded array crashes/reshards; with a mesh the
            # per-batch device_put below handles placement instead
            if mesh is not None:
                return a
            return _jax.device_put(a)

        _t = time.perf_counter()
        batch_dev = {
            "frag_slot": _full("frag_slot", arrays["frag_slot"]),
            "frag_mz": _full("frag_mz", arrays["frag_mz"]),
            "iso_slot": _full("iso_slot", arrays["iso_slot"]),
            "iso_mz": _full("iso_mz", arrays["iso_mz"]),
            "cycle_start": _full("cycle_start", arrays["cycle_start"]),
            # padded tail rows must not emit candidates
            "n_valid_fragments": _full(
                "n_valid_fragments", arrays["n_valid_fragments"], zero_tail=True
            ),
        }
        trace["wire"] = time.perf_counter() - _t

        if cfg.bench_device_time:
            # stage ALL inputs before starting the clock
            _jax.block_until_ready(list(batch_dev.values()))
            _jax.block_until_ready(list(dev.values()))
            _t_device0 = time.perf_counter()

        ftol = np.float32(cfg.fragment_mz_tolerance)
        ptol = np.float32(cfg.precursor_mz_tolerance)
        # u16 packed download (half the bytes) whenever every emitted value
        # is 16-bit safe; u32 fallback for exotic geometries
        pack_mode = (
            "u16"
            if dia.n_cycles < 32000
            and cfg.candidate_count <= 16
            and (not use_4d or dia.n_scan_bins < 32000)
            else "u32"
        )
        _t = time.perf_counter()
        pending = []  # (b0, bsz, pad, device results) — collect after all submits
        for b0, bsz in schedule:
            b1 = min(b0 + bsz, n)
            pad = bsz - (b1 - b0)

            if mesh is None:
                # single dispatch per batch: slice-on-device inside the jit
                bi = np.int32(b0)
                if use_4d:
                    result = select_candidates_batch_4d_sliced(
                        dev["peak_mz"], dev["peak_intensity"],
                        dev["peak_scanbin"], dev["cell_start"],
                        batch_dev["frag_slot"], batch_dev["frag_mz"],
                        batch_dev["iso_slot"], batch_dev["iso_mz"],
                        batch_dev["cycle_start"],
                        batch_dev["n_valid_fragments"],
                        bi, kernel, ftol, ptol, bsz=bsz, pack_output=True,
                        pack_mode=pack_mode,
                        **static_kw,
                    )
                else:
                    result = select_candidates_batch_sliced(
                        dev["peak_mz"], dev["peak_intensity"],
                        dev["peak_packed"], dev["cell_start"],
                        batch_dev["frag_slot"], batch_dev["frag_mz"],
                        batch_dev["iso_slot"], batch_dev["iso_mz"],
                        batch_dev["cycle_start"],
                        batch_dev["n_valid_fragments"],
                        bi, kernel, ftol, ptol, bsz=bsz, pack_output=True,
                        pack_mode=pack_mode,
                        **static_kw,
                    )
                pending.append((b0, bsz, pad, result))
                continue

            def _pad(a):
                from alphadia_tpu.parallel.mesh import batch_sharding

                sl = batch_dev[a][b0 : b0 + Bsz]
                return _jax.device_put(np.asarray(sl), batch_sharding(mesh))

            nvf = _pad("n_valid_fragments")
            if use_4d:
                result = select_candidates_batch_4d(
                    dev["peak_mz"],
                    dev["peak_intensity"],
                    dev["peak_scanbin"],
                    dev["cell_start"],
                    _pad("frag_slot"),
                    _pad("frag_mz"),
                    _pad("iso_slot"),
                    _pad("iso_mz"),
                    _pad("cycle_start"),
                    kernel,
                    ftol,
                    ptol,
                    nvf,
                    **static_kw,
                )
            else:
                result = select_candidates_batch(
                    dev["peak_mz"],
                    dev["peak_intensity"],
                    dev["peak_packed"],
                    dev["cell_start"],
                    _pad("frag_slot"),
                    _pad("frag_mz"),
                    _pad("iso_slot"),
                    _pad("iso_mz"),
                    _pad("cycle_start"),
                    kernel,
                    ftol,
                    ptol,
                    nvf,
                    **static_kw,
                )
            # virtual-CPU meshes: block per batch (see scoring driver —
            # pending collectives can abort on the 40 s CPU rendezvous
            # timeout when the host is compiling)
            if _jax.default_backend() == "cpu":
                _jax.block_until_ready(result)
            pending.append((b0, bsz, pad, result))

        if cfg.bench_device_time:
            _jax.block_until_ready([p[-1] for p in pending])
            self.last_device_seconds = time.perf_counter() - _t_device0
            return _empty_candidates_df()

        trace["submit"] = time.perf_counter() - _t

        # pipeline the downloads: start every device->host copy now so the
        # tunnel transfer of batch N+1 overlaps the host decode of batch N
        prefetch_to_host([p[-1] for p in pending])

        return {
            "pending": pending,
            "pack_mode": pack_mode,
            "use_4d": use_4d,
            "stride": stride,
            "trace": trace,
            "n": n,
            "window_len": W,
        }

    def _harvest_iter(self, state):
        """Yield (b0, candidates_frame) per dispatched batch, in order —
        each frame decodes as soon as its download lands, so a consumer
        (search/pipelined.py) can dispatch scoring while later selection
        batches are still computing/downloading."""
        cfg = self.config
        pending = state["pending"]
        pack_mode = state["pack_mode"]
        use_4d = state["use_4d"]
        stride = state["stride"]
        trace = state["trace"]
        precursor_idx = self.precursor_df["precursor_idx"].to_numpy(np.int64)

        K = cfg.candidate_count
        unpack_spec = {
            "valid": ("bool", K), "rank": ("int32", K), "score": ("float32", K),
            "cycle_center": ("int32", K), "cycle_start": ("int32", K),
            "cycle_stop": ("int32", K),
        }
        if use_4d:
            unpack_spec.update(
                scan_center=("int32", K), scan_start=("int32", K),
                scan_stop=("int32", K),
            )
        for b0, bsz, pad, result in pending:
            _t = time.perf_counter()
            if isinstance(result, dict):  # mesh path (unpacked)
                result = {k: np.asarray(v) for k, v in result.items()}
                trace["transfer_wait"] += time.perf_counter() - _t
                _t = time.perf_counter()
            else:  # packed single-download buffer (byte-plane wire format)
                from alphadia_tpu.ops.packing import (
                    unpack_sel_u16,
                    unpack_u32,
                    wire_decode_np,
                )

                raw = np.asarray(result)
                trace["transfer_wait"] += time.perf_counter() - _t
                _t = time.perf_counter()
                buf = wire_decode_np(
                    raw,
                    np.uint16 if pack_mode == "u16" else np.uint32,
                )
                result = (
                    unpack_sel_u16(buf, unpack_spec)
                    if pack_mode == "u16"
                    else unpack_u32(buf, unpack_spec)
                )
            valid = result["valid"].copy()
            if pad:
                valid[bsz - pad :] = False
            rows, cands = np.nonzero(valid)
            if "scan_center" in result:
                scan_start = result["scan_start"][rows, cands].astype(np.int64)
                scan_center = result["scan_center"][rows, cands].astype(np.int64)
                scan_stop = result["scan_stop"][rows, cands].astype(np.int64)
            else:
                scan_start = np.zeros(len(rows), np.int64)
                scan_center = np.zeros(len(rows), np.int64)
                scan_stop = np.ones(len(rows), np.int64)
            frame = (
                pd.DataFrame(
                    {
                        "precursor_idx": precursor_idx[b0 + rows],
                        "rank": result["rank"][rows, cands].astype(np.uint8),
                        "score": result["score"][rows, cands],
                        "scan_start": scan_start,
                        "scan_center": scan_center,
                        "scan_stop": scan_stop,
                        # coarse cells map back to fine cycles (stride=1
                        # is the identity)
                        "frame_start": result["cycle_start"][rows, cands].astype(np.int64) * stride,
                        "frame_center": np.minimum(
                            result["cycle_center"][rows, cands].astype(np.int64) * stride
                            + stride // 2,
                            self.dia.n_cycles - 1,
                        ),
                        "frame_stop": np.minimum(
                            result["cycle_stop"][rows, cands].astype(np.int64) * stride,
                            self.dia.n_cycles,
                        ),
                    }
                )
            )
            trace["decode"] += time.perf_counter() - _t
            yield b0, frame


# kept as an alias: the shared policy lives in search/common.py
_pallas_available = pallas_available
_first_k_true = first_k_true


def _empty_candidates_df() -> pd.DataFrame:
    cols = {
        "precursor_idx": np.int64,
        "rank": np.uint8,
        "score": np.float32,
        "scan_start": np.int64,
        "scan_center": np.int64,
        "scan_stop": np.int64,
        "frame_start": np.int64,
        "frame_center": np.int64,
        "frame_stop": np.int64,
    }
    return pd.DataFrame({k: np.array([], dtype=v) for k, v in cols.items()})
