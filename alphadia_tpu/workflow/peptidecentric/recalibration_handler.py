"""Recalibration side effects after each calibration fit.

(reference: alphadia/workflow/peptidecentric/recalibration_handler.py:13-117
— fit calibration groups; num_candidates <- target; score_cutoff =
0.99 x percentile(score, 1) (or 0.95 x percentile(score, 3) when
optimized_peak_group_score); fwhm <- medians of filtered precursors.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.reporting import logger
from alphadia_tpu.workflow.managers.calibration_manager import CalibrationGroups


class RecalibrationHandler:
    DEFAULT_FAC, DEFAULT_Q = 0.95, 3
    OPTIMIZED_FAC, OPTIMIZED_Q = 0.99, 1

    def __init__(self, config, optimization_manager, calibration_manager):
        self._config = config
        self._om = optimization_manager
        self._cm = calibration_manager

    def recalibrate(
        self, precursor_df_filtered: pd.DataFrame, fragments_df_filtered: pd.DataFrame
    ) -> None:
        self._cm.fit(precursor_df_filtered, CalibrationGroups.PRECURSOR)
        self._cm.fit(fragments_df_filtered, CalibrationGroups.FRAGMENT)

        self._om.update(num_candidates=self._config["search"]["target_num_candidates"])

        score = precursor_df_filtered["score"]
        if self._config["search"]["optimized_peak_group_score"]:
            fac, q = self.DEFAULT_FAC, self.DEFAULT_Q
        else:
            fac, q = self.OPTIMIZED_FAC, self.OPTIMIZED_Q
        score_cutoff = fac * np.percentile(score, q) if len(score) else 0.0
        logger.info(f"score_cutoff {score_cutoff:.3f} (fac={fac}, q={q})")

        self._om.update(
            fwhm_rt=float(precursor_df_filtered["cycle_fwhm"].median()),
            fwhm_mobility=float(precursor_df_filtered["mobility_fwhm"].median()),
            score_cutoff=float(score_cutoff),
        )

        if self._config["search"].get("quadrupole_fit", False):
            self._fit_quadrupole(precursor_df_filtered)

    def _fit_quadrupole(self, psm_df: pd.DataFrame, min_multi: int = 100) -> None:
        """Fit the transmission model from raw per-window fragment sums
        (reference ships SimpleQuadrupole.fit but never calls it in the
        default pipeline — quadrupole.py:163-207; here it runs on every
        recalibration when enough window-overlap observations exist)."""
        from alphadia_tpu.search.quadrupole import (
            QuadrupoleCalibration,
            harvest_transmission,
        )

        data = harvest_transmission(psm_df)
        if data is None or data["n_multi"] < min_multi:
            n = 0 if data is None else data["n_multi"]
            logger.info(
                f"quadrupole fit skipped: {n} overlap observations (<{min_multi})"
            )
            return
        quad = QuadrupoleCalibration(
            sigma=np.asarray(self._om.quad_sigma, np.float64),
            delta_mu=np.asarray(self._om.quad_delta_mu, np.float64),
        ).fit(data["mu1"], data["mu2"], data["x"], data["y"])
        self._om.update(
            quad_sigma=tuple(float(v) for v in quad.sigma),
            quad_delta_mu=tuple(float(v) for v in quad.delta_mu),
        )
        logger.info(
            f"quadrupole fit ({data['n_multi']} overlap obs): "
            f"sigma=({quad.sigma[0]:.3f}, {quad.sigma[1]:.3f}) "
            f"delta_mu=({quad.delta_mu[0]:.3f}, {quad.delta_mu[1]:.3f})"
        )
