"""Automatic search-parameter optimizers.

(reference: alphadia/workflow/optimizers/automatic.py:21-553 — exact
behavior contract:

- proposal = automatic_update_factor x ci(df, automatic_update_percentile_range);
- convergence needs >= 3 history rows and min_steps optimizations;
  without try_narrower_values: stop when the feature improved < 10% vs
  BOTH of the last two rows; with it: stop when the feature dropped more
  than maximal_decrease vs both, or the parameter changed < 5%;
- optimum row = argmax(feature), or, when favour_narrower_optimum, the
  smallest parameter within maximum_decrease_from_maximum of the max;
- at convergence the optimization manager restores parameter, classifier
  version, score cutoff, fwhm values, and the optlock batch index from the
  optimal row;
- `skip` converges an optimizer after min_steps + max_skips consecutive
  skips.

Feature per parameter: precursor_proportion_detected for rt/ms2/mobility,
mean isotope_intensity_correlation for ms1.)
"""

from __future__ import annotations

import pandas as pd

from alphadia_tpu.reporting import logger
from alphadia_tpu.workflow.managers.calibration_manager import (
    CalibrationEstimators,
    CalibrationGroups,
)


class BaseOptimizer:
    parameter_name: str

    def __init__(self, config, optimization_manager, calibration_manager, fdr_manager):
        self._config = config
        self._optimization_manager = optimization_manager
        self._calibration_manager = calibration_manager
        self._fdr_manager = fdr_manager

    def step(self, precursors_df, fragments_df):  # pragma: no cover - interface
        raise NotImplementedError

    def skip(self):
        pass

    def proceed_with_insufficient_precursors(self, precursors_df, fragments_df):
        pass


class AutomaticOptimizer(BaseOptimizer):
    _estimator_group_name: str
    _estimator_name: str
    _feature_name: str

    def __init__(
        self,
        initial_parameter: float,
        config,
        optimization_manager,
        calibration_manager,
        fdr_manager,
        optlock,
    ):
        super().__init__(config, optimization_manager, calibration_manager, fdr_manager)
        self._optlock = optlock
        self.history_df = pd.DataFrame()
        self._optimization_manager.update(**{self.parameter_name: initial_parameter})
        self.has_converged = False
        self._num_prev_optimizations = 0
        self._num_consecutive_skips = 0

        opt_cfg = config["optimization"][self.parameter_name]
        self.update_factor = opt_cfg["automatic_update_factor"]
        self.update_percentile_range = opt_cfg["automatic_update_percentile_range"]
        self._try_narrower_values = opt_cfg["try_narrower_values"]
        self._maximal_decrease = opt_cfg["maximal_decrease"]
        self._favour_narrower_optimum = opt_cfg["favour_narrower_optimum"]
        self._maximum_decrease_from_maximum = opt_cfg["maximum_decrease_from_maximum"]

    # ------------------------------------------------------------------
    def step(self, precursors_df: pd.DataFrame, fragments_df: pd.DataFrame) -> None:
        if self.has_converged:
            return
        self._num_consecutive_skips = 0
        self._num_prev_optimizations += 1
        self._update_history(precursors_df, fragments_df)

        if self._just_converged:
            self.has_converged = True
            self._update_workflow()
            logger.log(
                25,
                f"✅ {self.parameter_name:<15}: optimal "
                f"{getattr(self._optimization_manager, self.parameter_name):.4f} "
                f"after {len(self.history_df)} searches",
            )
        else:
            df = (
                precursors_df
                if self._estimator_group_name == CalibrationGroups.PRECURSOR
                else fragments_df
            )
            new_parameter = self._propose_new_parameter(df)
            self._optimization_manager.update(**{self.parameter_name: new_parameter})
            logger.info(
                f"❌ {self.parameter_name:<15}: continuing with {new_parameter:.4f}"
            )

    def skip(self) -> None:
        self._num_consecutive_skips += 1
        if self._batch_substantially_bigger:
            self.has_converged = True
            self._update_workflow()

    def proceed_with_insufficient_precursors(self, precursors_df, fragments_df) -> None:
        if len(precursors_df):
            self._update_history(precursors_df, fragments_df)
            self._update_workflow()

    # ------------------------------------------------------------------
    def _propose_new_parameter(self, df: pd.DataFrame) -> float:
        est = self._calibration_manager.get_estimator(
            self._estimator_group_name, self._estimator_name
        )
        proposal = self.update_factor * est.ci(df, self.update_percentile_range)
        if proposal <= 0:
            # est.ci() returns 0 when the calibration fit failed (the fit
            # exception is swallowed and is_fitted stays False) — a zero
            # tolerance would silently find nothing on the next pass
            current = getattr(self._optimization_manager, self.parameter_name)
            logger.warning(
                f"{self.parameter_name}: calibration yielded no usable CI; "
                f"keeping current tolerance {current:.4f}"
            )
            return float(current)
        return proposal

    def _update_history(self, precursors_df, fragments_df) -> None:
        row = pd.DataFrame(
            [
                {
                    "parameter": getattr(
                        self._optimization_manager, self.parameter_name
                    ),
                    self._feature_name: self._get_feature_value(
                        precursors_df, fragments_df
                    ),
                    "classifier_version": self._fdr_manager.current_version,
                    "score_cutoff": self._optimization_manager.score_cutoff,
                    "fwhm_rt": self._optimization_manager.fwhm_rt,
                    "fwhm_mobility": self._optimization_manager.fwhm_mobility,
                    "batch_idx": self._optlock.batch_idx,
                }
            ]
        )
        self.history_df = pd.concat([self.history_df, row], ignore_index=True)

    @property
    def _batch_substantially_bigger(self) -> bool:
        return (
            self._num_prev_optimizations >= self._config["calibration"]["min_steps"]
            and self._num_consecutive_skips > self._config["calibration"]["max_skips"]
        )

    @property
    def _just_converged(self) -> bool:
        if len(self.history_df) < 3:
            return False
        feat = self.history_df[self._feature_name]
        last, second, third = feat.iloc[-1], feat.iloc[-2], feat.iloc[-3]
        min_steps_reached = (
            self._num_prev_optimizations >= self._config["calibration"]["min_steps"]
        )
        if self._try_narrower_values:
            decreased = (last - second) / abs(second) < -self._maximal_decrease and (
                last - third
            ) / abs(third) < -self._maximal_decrease
            params = self.history_df["parameter"]
            param_static = (
                abs((params.iloc[-1] - params.iloc[-2]) / params.iloc[-2]) < 0.05
            )
            return min_steps_reached and (decreased or param_static)
        not_improved = (last - second) / abs(second) < 0.1 and (last - third) / abs(
            third
        ) < 0.1
        return min_steps_reached and not_improved

    def _find_index_of_optimum(self) -> int:
        if len(self.history_df) == 0:
            raise ValueError(f"Optimizer {self.parameter_name} has no history")
        if len(self.history_df) == 1:
            return self.history_df.index[0]
        if self._favour_narrower_optimum:
            fmax = self.history_df[self._feature_name].max()
            threshold = fmax - self._maximum_decrease_from_maximum * abs(fmax)
            within = self.history_df[self.history_df[self._feature_name] > threshold]
            if within.empty:
                return self.history_df[self._feature_name].idxmax()
            return within["parameter"].idxmin()
        return self.history_df[self._feature_name].idxmax()

    def _update_workflow(self) -> None:
        i = self._find_index_of_optimum()
        self._optimization_manager.update(
            **{self.parameter_name: self.history_df["parameter"].loc[i]}
        )
        self._optimization_manager.update(
            classifier_version=int(self.history_df["classifier_version"].loc[i]),
            score_cutoff=self.history_df["score_cutoff"].loc[i],
            fwhm_rt=self.history_df["fwhm_rt"].loc[i],
            fwhm_mobility=self.history_df["fwhm_mobility"].loc[i],
        )
        self._optlock.batch_idx = int(self.history_df["batch_idx"].loc[i])

    def _get_feature_value(self, precursors_df, fragments_df):  # pragma: no cover
        raise NotImplementedError


class AutomaticRTOptimizer(AutomaticOptimizer):
    parameter_name = "rt_error"
    _estimator_group_name = CalibrationGroups.PRECURSOR
    _estimator_name = CalibrationEstimators.RT
    _feature_name = "precursor_proportion_detected"

    def _get_feature_value(self, precursors_df, fragments_df):
        return len(precursors_df) / max(self._optlock.total_elution_groups, 1)


class AutomaticMS2Optimizer(AutomaticOptimizer):
    parameter_name = "ms2_error"
    _estimator_group_name = CalibrationGroups.FRAGMENT
    _estimator_name = CalibrationEstimators.MZ
    _feature_name = "precursor_proportion_detected"

    def _get_feature_value(self, precursors_df, fragments_df):
        return len(precursors_df) / max(self._optlock.total_elution_groups, 1)


class AutomaticMS1Optimizer(AutomaticOptimizer):
    parameter_name = "ms1_error"
    _estimator_group_name = CalibrationGroups.PRECURSOR
    _estimator_name = CalibrationEstimators.MZ
    _feature_name = "mean_isotope_intensity_correlation"

    def _get_feature_value(self, precursors_df, fragments_df):
        return precursors_df["isotope_intensity_correlation"].mean()


class AutomaticMobilityOptimizer(AutomaticOptimizer):
    parameter_name = "mobility_error"
    _estimator_group_name = CalibrationGroups.PRECURSOR
    _estimator_name = CalibrationEstimators.MOBILITY
    _feature_name = "precursor_proportion_detected"

    def _get_feature_value(self, precursors_df, fragments_df):
        return len(precursors_df) / max(self._optlock.total_elution_groups, 1)
