"""Targeted optimizers: shrink toward a user-specified tolerance.

(reference: alphadia/workflow/optimizers/targeted.py:17-241 — proposal =
targeted_update_factor x max(ci(df, percentile), target); converged when
proposal <= target after min_steps; classifier version tracked on every
step.)
"""

from __future__ import annotations

import pandas as pd

from alphadia_tpu.reporting import logger
from alphadia_tpu.workflow.managers.calibration_manager import (
    CalibrationEstimators,
    CalibrationGroups,
)
from alphadia_tpu.workflow.optimizers.automatic import BaseOptimizer


class TargetedOptimizer(BaseOptimizer):
    _estimator_group_name: str
    _estimator_name: str

    def __init__(
        self,
        initial_parameter: float,
        target_parameter: float,
        config,
        optimization_manager,
        calibration_manager,
        fdr_manager,
    ):
        super().__init__(config, optimization_manager, calibration_manager, fdr_manager)
        self._optimization_manager.update(**{self.parameter_name: initial_parameter})
        self.target_parameter = target_parameter
        opt_cfg = config["optimization"][self.parameter_name]
        self.update_factor = opt_cfg["targeted_update_factor"]
        self.update_percentile_range = opt_cfg["targeted_update_percentile_range"]
        self.has_converged = False
        self._num_prev_optimizations = 0

    def _propose_new_parameter(self, df: pd.DataFrame) -> float:
        est = self._calibration_manager.get_estimator(
            self._estimator_group_name, self._estimator_name
        )
        return self.update_factor * max(
            est.ci(df, self.update_percentile_range), self.target_parameter
        )

    def step(self, precursors_df: pd.DataFrame, fragments_df: pd.DataFrame) -> None:
        if self.has_converged:
            return
        self._num_prev_optimizations += 1
        df = (
            precursors_df
            if self._estimator_group_name == CalibrationGroups.PRECURSOR
            else fragments_df
        )
        new_parameter = self._propose_new_parameter(df)
        min_steps_reached = (
            self._num_prev_optimizations >= self._config["calibration"]["min_steps"]
        )
        just_converged = new_parameter <= self.target_parameter and min_steps_reached
        self._optimization_manager.update(**{self.parameter_name: new_parameter})
        self._optimization_manager.update(
            classifier_version=self._fdr_manager.current_version
        )
        if just_converged:
            self.has_converged = True
            logger.info(
                f"✅ {self.parameter_name:<15}: "
                f"{new_parameter:.4f} <= {self.target_parameter:.4f}"
            )

    def skip(self) -> None:
        pass

    def proceed_with_insufficient_precursors(self, precursors_df, fragments_df):
        self._optimization_manager.update(
            **{self.parameter_name: self.target_parameter}
        )


class TargetedRTOptimizer(TargetedOptimizer):
    parameter_name = "rt_error"
    _estimator_group_name = CalibrationGroups.PRECURSOR
    _estimator_name = CalibrationEstimators.RT


class TargetedMS2Optimizer(TargetedOptimizer):
    parameter_name = "ms2_error"
    _estimator_group_name = CalibrationGroups.FRAGMENT
    _estimator_name = CalibrationEstimators.MZ


class TargetedMS1Optimizer(TargetedOptimizer):
    parameter_name = "ms1_error"
    _estimator_group_name = CalibrationGroups.PRECURSOR
    _estimator_name = CalibrationEstimators.MZ


class TargetedMobilityOptimizer(TargetedOptimizer):
    parameter_name = "mobility_error"
    _estimator_group_name = CalibrationGroups.PRECURSOR
    _estimator_name = CalibrationEstimators.MOBILITY
