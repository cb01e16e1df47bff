"""Transfer-library fragment requantification.

(reference: alphadia/workflow/peptidecentric/
transfer_library_requantification_handler.py:26-137 — for confident PSMs,
regenerate the FULL fragment space of the configured transfer fragment
types/charges, calibrate it, re-quantify every fragment (top_k effectively
unbounded), and re-index psm rows onto the new fragment table. The scored
top-12 set is too sparse to train the MS2 intensity model.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.library.flatten import FlattenLibrary, InitFlatColumns
from alphadia_tpu.library.speclib import SpecLibBase
from alphadia_tpu.reporting import logger
from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig
from alphadia_tpu.utils.misc import candidate_hash
from alphadia_tpu.workflow.managers.calibration_manager import CalibrationGroups


def _bucket_topk(n: int) -> int:
    """Static top-k shape for the scoring kernel (caps recompiles)."""
    for b in (16, 32, 64, 128, 192, 256):
        if n <= b:
            return b
    return n


class TransferRequantHandler:
    def __init__(self, config, calibration_manager, optimization_manager):
        self._config = config
        self._cm = calibration_manager
        self._om = optimization_manager

    # ------------------------------------------------------------------
    def requantify(
        self, dia_data, psm_df: pd.DataFrame
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Returns (psm_df with flat_frag_{start,stop}_idx onto the new
        table, fragments_df quantified over the full fragment space)."""
        logger.log(25, "=== Transfer learning quantification ===")
        types = tuple(self._config["transfer_library"]["fragment_types"])
        max_charge = int(self._config["transfer_library"]["max_charge"])
        logger.info(
            f"transfer requant: fragment types {types} up to charge {max_charge}"
        )

        scored = psm_df.drop_duplicates(["precursor_idx", "rank"]).reset_index(
            drop=True
        )
        prec = scored.drop_duplicates("precursor_idx").reset_index(drop=True).copy()

        # full fragment space for the configured types
        lib = SpecLibBase(prec)
        lib.calc_fragment_mz(max_charge=max_charge, types=types)
        lib.fragment_intensity_df = pd.DataFrame(
            np.ones_like(lib.fragment_mz_df.to_numpy(), dtype=np.float32),
            columns=lib.fragment_mz_df.columns,
        )
        flat = InitFlatColumns()(
            FlattenLibrary(top_k_fragments=10**6, min_fragment_intensity=0.0)(lib)
        )
        fprec, ffrag = flat.precursor_df, flat.fragment_df

        # calibrate the regenerated coordinates with the run's estimators
        self._cm.predict(fprec, CalibrationGroups.PRECURSOR)
        self._cm.predict(ffrag, CalibrationGroups.FRAGMENT)

        n_frag_max = int(
            (fprec["flat_frag_stop_idx"] - fprec["flat_frag_start_idx"]).max()
        )
        top_k = _bucket_topk(n_frag_max)

        mz_col = "mz_calibrated" if "mz_calibrated" in ffrag.columns else "mz_library"
        scoring = CandidateScoring(
            dia_data,
            fprec,
            ffrag,
            ScoringConfig(
                precursor_mz_tolerance=self._om.ms1_error,
                fragment_mz_tolerance=self._om.ms2_error,
                top_k_fragments=top_k,
                exclude_shared_ions=False,
                collect_fragments=True,
                collect_unobserved_fragments=True,
                batch_size=self._config["tpu"]["scoring_batch"],
            ),
            rt_column="rt_library",
            precursor_mz_column=(
                "mz_calibrated" if "mz_calibrated" in fprec.columns else "mz_library"
            ),
            fragment_mz_column=mz_col,
        )
        cand_cols = [
            c
            for c in (
                "precursor_idx", "rank", "score", "scan_center", "scan_start",
                "scan_stop", "frame_center", "frame_start", "frame_stop",
            )
            if c in scored.columns
        ]
        _, frag_df = scoring(scored[cand_cols])
        logger.log(
            25,
            f"transfer requant: {len(scored):,} precursors -> "
            f"{len(frag_df):,} fragments quantified",
        )

        # re-index psm rows onto the new fragment table (sorted by candidate)
        scored = scored.copy()
        scored["_candidate_idx"] = candidate_hash(
            scored["precursor_idx"].to_numpy(), scored["rank"].to_numpy()
        )
        frag_df["_candidate_idx"] = candidate_hash(
            frag_df["precursor_idx"].to_numpy(), frag_df["rank"].to_numpy()
        )
        frag_df = frag_df.sort_values("_candidate_idx", kind="stable").reset_index(
            drop=True
        )
        counts = frag_df.groupby("_candidate_idx", sort=True).size()
        stop = counts.cumsum()
        start = stop - counts
        scored = scored.sort_values("_candidate_idx", kind="stable").reset_index(
            drop=True
        )
        scored["flat_frag_start_idx"] = (
            start.reindex(scored["_candidate_idx"]).fillna(0).to_numpy(np.int64)
        )
        scored["flat_frag_stop_idx"] = (
            stop.reindex(scored["_candidate_idx"]).fillna(0).to_numpy(np.int64)
        )
        return scored, frag_df
