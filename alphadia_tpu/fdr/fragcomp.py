"""Fragment competition: invalidate lower-confidence PSMs that share
fragments with a better PSM in the same DIA window.

Behavioral contract (reference: alphadia/fragcomp/fragcomp.py:20-298):

- PSMs are assigned a window index from the quad isolation range containing
  their precursor m/z;
- within a window, sorted by confidence (proba ascending), a PSM j is
  invalidated when a better, still-valid PSM i within `rt_tol_seconds` has
  >= 3 fragments matching within `mass_tol_ppm`;
- applied only to the PSM slice below the FDR heuristic (caller's choice);
- PSM <-> fragment association is the (precursor_idx, rank) candidate hash.

Implementation: per-window numpy with an RT-sorted sliding neighborhood
instead of numba threads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.reporting import logger
from alphadia_tpu.utils.misc import candidate_hash


class FragmentCompetition:
    def __init__(self, rt_tol_seconds: float = 3.0, mass_tol_ppm: float = 15.0):
        self.rt_tol_seconds = rt_tol_seconds
        self.mass_tol_ppm = mass_tol_ppm

    # ------------------------------------------------------------------
    @staticmethod
    def _add_window_idx(psm_df: pd.DataFrame, cycle: np.ndarray) -> pd.DataFrame:
        if "window_idx" in psm_df.columns:
            return psm_df
        lower = cycle[0, :, 0, 0]
        upper = cycle[0, :, 0, 1]
        # reference windows by the OBSERVED precursor m/z (fragcomp.py:196)
        col = "mz_observed" if "mz_observed" in psm_df.columns else "mz_library"
        mz = psm_df[col].to_numpy()[:, None]
        inside = (mz >= lower[None, :]) & (mz < upper[None, :]) & (lower[None, :] >= 0)
        psm_df = psm_df.copy()
        # PSMs landing in NO window (m/z outside every isolation range,
        # e.g. after a calibration shift) must not compete — argmax over
        # an all-False row would wrongly bucket them into window 0
        widx = np.argmax(inside, axis=1)
        widx[~inside.any(axis=1)] = -1
        psm_df["window_idx"] = widx
        return psm_df

    # ------------------------------------------------------------------
    def __call__(
        self, psm_df: pd.DataFrame, frag_df: pd.DataFrame, cycle: np.ndarray
    ) -> pd.DataFrame:
        if len(psm_df) == 0 or len(frag_df) == 0:
            return psm_df

        psm_df = psm_df.copy()
        psm_df["_candidate_idx"] = candidate_hash(
            psm_df["precursor_idx"].to_numpy(), psm_df["rank"].to_numpy()
        )
        frag_hash = candidate_hash(
            frag_df["precursor_idx"].to_numpy(), frag_df["rank"].to_numpy()
        )

        # fragment slices per candidate (fragment df is candidate-contiguous)
        order = np.argsort(frag_hash, kind="stable")
        frag_mz_sorted = frag_df["mz"].to_numpy()[order]
        hash_sorted = frag_hash[order]
        uniq, start = np.unique(hash_sorted, return_index=True)
        stop = np.append(start[1:], len(hash_sorted))
        slice_of = {h: (a, b) for h, a, b in zip(uniq, start, stop)}

        psm_df = self._add_window_idx(psm_df, cycle)
        psm_df.sort_values(
            ["window_idx", "proba", "precursor_idx"], inplace=True, kind="stable"
        )

        rt = psm_df["rt_observed"].to_numpy()
        win = psm_df["window_idx"].to_numpy()
        hashes = psm_df["_candidate_idx"].to_numpy()
        valid = np.ones(len(psm_df), dtype=bool)

        for w in np.unique(win):
            if w < 0:  # outside every isolation window: nothing to share
                continue
            idx = np.nonzero(win == w)[0]
            self._compete_window(idx, rt, hashes, slice_of, frag_mz_sorted, valid)

        n_removed = int((~valid).sum())
        if n_removed:
            logger.info(f"Fragment competition removed {n_removed} PSMs")
        out = psm_df[valid].drop(columns=["window_idx", "_candidate_idx"])
        return out.sort_index()

    # ------------------------------------------------------------------
    def _compete_window(self, idx, rt, hashes, slice_of, frag_mz, valid):
        """idx is proba-ascending within the window (best first).

        The inner scan is bounded to the RT-sorted ±rt_tol neighborhood
        (near-linear for real RT spreads instead of all O(n²) pairs)."""
        n = len(idx)
        rt_w = rt[idx]
        rt_order = np.argsort(rt_w, kind="stable")  # proba rank by RT
        rt_sorted = rt_w[rt_order]
        rt_pos = np.argsort(rt_order, kind="stable")  # proba rank -> RT pos
        for a in range(n):
            i = idx[a]
            if not valid[i]:
                continue
            si = slice_of.get(hashes[i])
            if si is None:
                continue
            mz_i = frag_mz[si[0] : si[1]]
            p = rt_pos[a]
            # strict |Δrt| < tol, matching the pairwise formulation
            lo = np.searchsorted(rt_sorted, rt_sorted[p] - self.rt_tol_seconds, "right")
            hi = np.searchsorted(rt_sorted, rt_sorted[p] + self.rt_tol_seconds, "left")
            for q in range(lo, hi):
                b = rt_order[q]
                if b <= a:  # only worse-ranked PSMs can be invalidated
                    continue
                j = idx[b]
                if not valid[j]:
                    continue
                sj = slice_of.get(hashes[j])
                if sj is None:
                    continue
                mz_j = frag_mz[sj[0] : sj[1]]
                d = np.abs(mz_i[:, None] - mz_j[None, :]) / mz_i[:, None] * 1e6
                if int((d < self.mass_tol_ppm).sum()) >= 3:
                    valid[j] = False
