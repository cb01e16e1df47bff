"""Calibration manager: estimator groups for precursor/fragment properties.

(reference: alphadia/workflow/managers/calibration_manager.py:36-297 —
groups 'precursor' (mz, rt, mobility) and 'fragment' (mz); LOESS with
n_kernels 2 for m/z (ppm transform) and 6 for RT, reference defaults
(kernel_size 2.0, polynomial degree 2); fit on filtered PSMs,
predict onto PSM/library dataframes producing ``*_calibrated`` columns.)
"""

from __future__ import annotations

import pandas as pd

from alphadia_tpu.calibration import CalibrationEstimator, LOESSRegression
from alphadia_tpu.reporting import logger
from alphadia_tpu.workflow.managers.base import BaseManager


class CalibrationGroups:
    PRECURSOR = "precursor"
    FRAGMENT = "fragment"


class CalibrationEstimators:
    MZ = "mz"
    RT = "rt"
    MOBILITY = "mobility"


def _default_estimators(has_ms1: bool, has_mobility: bool):
    groups: dict[str, dict[str, CalibrationEstimator]] = {
        CalibrationGroups.PRECURSOR: {},
        CalibrationGroups.FRAGMENT: {},
    }
    if has_ms1:
        groups[CalibrationGroups.PRECURSOR][CalibrationEstimators.MZ] = (
            CalibrationEstimator(
                "mz",
                LOESSRegression(n_kernels=2),
                ["mz_library"],
                ["mz_observed"],
                ["mz_calibrated"],
                transform_deviation=1e6,
            )
        )
    groups[CalibrationGroups.PRECURSOR][CalibrationEstimators.RT] = (
        CalibrationEstimator(
            "rt",
            LOESSRegression(n_kernels=6),
            ["rt_library"],
            ["rt_observed"],
            ["rt_calibrated"],
        )
    )
    if has_mobility:
        groups[CalibrationGroups.PRECURSOR][CalibrationEstimators.MOBILITY] = (
            CalibrationEstimator(
                "mobility",
                LOESSRegression(n_kernels=2),
                ["mobility_library"],
                ["mobility_observed"],
                ["mobility_calibrated"],
            )
        )
    groups[CalibrationGroups.FRAGMENT][CalibrationEstimators.MZ] = (
        CalibrationEstimator(
            "mz",
            LOESSRegression(n_kernels=2),
            ["mz_library"],
            ["mz_observed"],
            ["mz_calibrated"],
            transform_deviation=1e6,
        )
    )
    return groups


class CalibrationManager(BaseManager):
    def __init__(
        self,
        path=None,
        load_from_file=False,
        has_ms1: bool = True,
        has_mobility: bool = False,
    ):
        super().__init__(path, load_from_file)
        if self.is_loaded_from_file:
            return
        self.groups = _default_estimators(has_ms1, has_mobility)

    # ------------------------------------------------------------------
    def get_estimator(self, group: str, name: str) -> CalibrationEstimator | None:
        return self.groups.get(group, {}).get(name)

    @property
    def is_fitted(self) -> bool:
        prec = self.groups[CalibrationGroups.PRECURSOR]
        return all(e.is_fitted for e in prec.values()) and all(
            e.is_fitted for e in self.groups[CalibrationGroups.FRAGMENT].values()
        )

    def fit(self, df: pd.DataFrame, group: str, figure_path=None, plot: bool = False):
        for name, est in self.groups[group].items():
            if len(df) < 2:
                logger.warning(f"calibration {group}.{name}: too few rows")
                continue
            est.fit(df)
            if est.metrics:
                logger.info(
                    f"calibration {group}.{name}: accuracy "
                    f"{est.metrics['median_accuracy']:.4g}, precision "
                    f"{est.metrics['median_precision']:.4g}"
                )

    def predict(self, df: pd.DataFrame, group: str) -> None:
        for est in self.groups[group].values():
            if est.is_fitted:
                est.predict(df)

    def fit_predict(self, df: pd.DataFrame, group: str) -> None:
        self.fit(df, group)
        self.predict(df, group)
