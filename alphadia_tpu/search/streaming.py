"""RT-windowed streaming search: bounded device + host memory at
predicted-library scale.

A 1M-precursor predicted-library search over a long gradient cannot hold
one monolithic slab store per chip alongside the candidate workspaces.
This driver searches the run in RT windows: build the slab store for one
window's cycles (padded by the RT tolerance so every XIC is complete),
search the library slice whose calibrated RT falls in the window's core,
free the device store, advance. Device and host footprints are bounded
by the window size instead of the run size; each precursor is searched
exactly once (core ranges partition the RT axis), and scores are
identical to a whole-run search because the pad guarantees the full
selection window and scoring extent around every candidate apex.

(reference: no equivalent — the numba engine holds the whole transposed
run in host RAM, alphadia/search/jitclasses/alpharaw_jit.py:40-110;
streaming by RT is the TPU-native answer to HBM residency.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.rawdata.source import SpectrumData
from alphadia_tpu.reporting import logger
from alphadia_tpu.search.pipelined import PipelinedExtraction
from alphadia_tpu.search.scoring import ScoringConfig, _empty_psm_df
from alphadia_tpu.search.selection import SelectionConfig


def iter_rt_windows(
    spectra: SpectrumData, n_windows: int, pad_s: float
):
    """Yield ``((core_lo, core_hi), sub_spectra, cycle_offset)`` for
    ``n_windows`` equal-RT windows, each padded by ``pad_s`` seconds and
    cut on cycle (MS1) boundaries so DiaData sees whole cycles."""
    ms1_idx = np.nonzero(spectra.ms_level == 1)[0]
    if len(ms1_idx) < 2:  # no cycle structure — single window
        yield (float("-inf"), float("inf")), spectra, 0
        return
    cyc_rt = spectra.rt[ms1_idx]
    edges = np.linspace(float(cyc_rt[0]), float(spectra.rt[-1]), n_windows + 1)
    n_cyc = len(ms1_idx)
    for w in range(n_windows):
        core_lo = float(edges[w]) if w else float("-inf")
        core_hi = float(edges[w + 1]) if w < n_windows - 1 else float("inf")
        c0 = int(np.searchsorted(cyc_rt, edges[w] - pad_s, side="left"))
        c1 = int(np.searchsorted(cyc_rt, edges[w + 1] + pad_s, side="right"))
        c0, c1 = max(c0, 0), min(max(c1, c0 + 1), n_cyc)
        s0 = int(ms1_idx[c0])
        s1 = int(ms1_idx[c1]) if c1 < n_cyc else spectra.n_spectra
        yield (core_lo, core_hi), spectra.select(np.arange(s0, s1)), c0


class RtWindowedSearch:
    """Stream selection + scoring over RT windows of one run.

    Returns the same (psm_df, fragment_df) pair as a whole-run
    PipelinedExtraction, with candidate frame_* columns mapped back to
    absolute cycles.
    """

    def __init__(
        self,
        spectra: SpectrumData,
        precursor_df: pd.DataFrame,
        fragment_df: pd.DataFrame,
        sel_config: SelectionConfig | None = None,
        score_config: ScoringConfig | None = None,
        rt_column: str = "rt_library",
        precursor_mz_column: str = "mz_library",
        fragment_mz_column: str = "mz_library",
        n_rt_windows: int = 8,
        pad_s: float | None = None,
        diadata_kwargs: dict | None = None,
    ):
        self.spectra = spectra
        self.precursor_df = precursor_df
        self.fragment_df = fragment_df
        self.sel_config = sel_config or SelectionConfig()
        self.score_config = score_config or ScoringConfig()
        self.cols = dict(
            rt_column=rt_column,
            precursor_mz_column=precursor_mz_column,
            fragment_mz_column=fragment_mz_column,
        )
        self.n_rt_windows = n_rt_windows
        # pad covers the selection RT window plus scoring extents
        self.pad_s = (
            pad_s if pad_s is not None else self.sel_config.rt_tolerance + 30.0
        )
        self.diadata_kwargs = diadata_kwargs or {}

    def __call__(self) -> tuple[pd.DataFrame, pd.DataFrame]:
        prec = self.precursor_df
        rt = prec[self.cols["rt_column"]].to_numpy(np.float32)
        psms, frags = [], []
        peak_slab_mb = 0.0
        for (lo, hi), sub, c0 in iter_rt_windows(
            self.spectra, self.n_rt_windows, self.pad_s
        ):
            p = prec[(rt >= lo) & (rt < hi)]
            if not len(p):
                continue
            dia = DiaData.from_spectra(sub, **self.diadata_kwargs)
            slab_mb = sum(
                int(np.asarray(v).nbytes)
                for v in dia.device_arrays().values()
                if hasattr(v, "nbytes")
            ) / 1e6
            peak_slab_mb = max(peak_slab_mb, slab_mb)
            pipe = PipelinedExtraction(
                dia,
                p.reset_index(drop=True),
                self.fragment_df,
                self.sel_config,
                self.score_config,
                **self.cols,
            )
            cands, psm, fr = pipe()
            # window-local cycles -> absolute
            for col in ("frame_start", "frame_center", "frame_stop"):
                if col in psm.columns:
                    psm[col] = psm[col] + c0
            psms.append(psm)
            frags.append(fr)
            dia.free_device()
            logger.info(
                f"RT window [{lo:.0f}, {hi:.0f})s: {len(p)} precursors -> "
                f"{len(psm)} PSMs (slab {slab_mb:.0f} MB)"
            )
        self.peak_window_slab_mb = peak_slab_mb
        if not psms:
            from alphadia_tpu.search.scoring import _empty_fragment_df

            return _empty_psm_df(), _empty_fragment_df()
        return (
            pd.concat(psms, ignore_index=True),
            pd.concat(frags, ignore_index=True),
        )
