"""The optimization / calibration loop.

(reference: alphadia/workflow/peptidecentric/optimization_handler.py:34-574
— same control flow:

- targeted optimizers (user tolerance > 0) run together first, then
  automatic optimizers sequentially in order ms2 -> rt -> ms1 -> mobility
  (or a config-specified order);
- per step: extract the optlock batch, score, FDR; grow the batch until the
  lock target is reached; then recalibrate, first time only re-records the
  classifier version, afterwards step the optimizers;
- `_filter_dfs`: precursors qval < 0.01 & target; fragments of those
  precursors with |mass_error| <= 200, top <=5000 by correlation among
  those above min_correlation (at least top 500 otherwise).)
"""

from __future__ import annotations

import pandas as pd

from alphadia_tpu.constants.settings import MAX_FRAGMENT_MZ_TOLERANCE
from alphadia_tpu.reporting import logger
from alphadia_tpu.workflow.peptidecentric.column_name_handler import ColumnNameHandler
from alphadia_tpu.workflow.peptidecentric.extraction_handler import ExtractionHandler
from alphadia_tpu.workflow.peptidecentric.recalibration_handler import (
    RecalibrationHandler,
)
from alphadia_tpu.workflow.optimizers.automatic import (
    AutomaticMobilityOptimizer,
    AutomaticMS1Optimizer,
    AutomaticMS2Optimizer,
    AutomaticRTOptimizer,
)
from alphadia_tpu.workflow.optimizers.optimization_lock import OptimizationLock
from alphadia_tpu.workflow.optimizers.targeted import (
    TargetedMobilityOptimizer,
    TargetedMS1Optimizer,
    TargetedMS2Optimizer,
    TargetedRTOptimizer,
)

_AUTOMATIC = {
    "ms2_error": AutomaticMS2Optimizer,
    "rt_error": AutomaticRTOptimizer,
    "ms1_error": AutomaticMS1Optimizer,
    "mobility_error": AutomaticMobilityOptimizer,
}
_TARGETED = {
    "ms2_error": TargetedMS2Optimizer,
    "rt_error": TargetedRTOptimizer,
    "ms1_error": TargetedMS1Optimizer,
    "mobility_error": TargetedMobilityOptimizer,
}
_DEFAULT_AUTOMATIC_ORDER = ["ms2_error", "rt_error", "ms1_error", "mobility_error"]


class OptimizationHandler:
    def __init__(
        self,
        config,
        optimization_manager,
        calibration_manager,
        fdr_manager,
        dia_data,
        library,
    ):
        self._config = config
        self._om = optimization_manager
        self._cm = calibration_manager
        self._fdr_manager = fdr_manager
        self._dia_data = dia_data
        self._optlock = OptimizationLock(library, config)

    # ------------------------------------------------------------------
    def _make_optimizer(self, name: str, targeted: bool):
        gradient = self._dia_data.rt_max - self._dia_data.rt_min
        targets = {
            "ms2_error": self._config["search"]["target_ms2_tolerance"],
            "ms1_error": self._config["search"]["target_ms1_tolerance"],
            "rt_error": self._config["search"]["target_rt_tolerance"],
            "mobility_error": self._config["search"]["target_mobility_tolerance"],
        }
        initials = {
            "ms2_error": self._om.ms2_error,
            "ms1_error": self._om.ms1_error,
            "rt_error": self._om.rt_error,
            "mobility_error": self._om.mobility_error,
        }
        target = targets[name]
        if name == "rt_error" and 0 < target <= 1:
            target = target * gradient
        if targeted:
            return _TARGETED[name](
                initials[name], target, self._config, self._om, self._cm,
                self._fdr_manager,
            )
        return _AUTOMATIC[name](
            initials[name], self._config, self._om, self._cm, self._fdr_manager,
            self._optlock,
        )

    def _get_ordered_optimizers(self):
        """Targeted (target > 0) first as one simultaneous group, then
        automatic ones sequentially."""
        targets = {
            "ms2_error": self._config["search"]["target_ms2_tolerance"],
            "ms1_error": self._config["search"]["target_ms1_tolerance"],
            "rt_error": self._config["search"]["target_rt_tolerance"],
            "mobility_error": self._config["search"]["target_mobility_tolerance"],
        }
        names = list(_DEFAULT_AUTOMATIC_ORDER)
        if not self._dia_data.has_ms1:
            names.remove("ms1_error")
        if not self._dia_data.has_mobility:
            names.remove("mobility_error")

        order_cfg = self._config["optimization"]["order_of_optimization"]
        if order_cfg:
            groups = [[n for n in grp if n in names] for grp in order_cfg]
            return [
                [self._make_optimizer(n, targets[n] > 0) for n in grp]
                for grp in groups
                if grp
            ]

        targeted = [n for n in names if targets[n] > 0]
        automatic = [n for n in names if targets[n] <= 0]
        ordered = []
        if targeted:
            ordered.append([self._make_optimizer(n, True) for n in targeted])
        for n in automatic:
            ordered.append([self._make_optimizer(n, False)])
        return ordered

    # ------------------------------------------------------------------
    def search_parameter_optimization(self) -> None:
        ordered_optimizers = self._get_ordered_optimizers()
        recal = RecalibrationHandler(self._config, self._om, self._cm)
        insufficient = False
        precursor_df = pd.DataFrame()

        for optimizers in ordered_optimizers:
            if insufficient:
                break
            for step in range(self._config["calibration"]["max_steps"]):
                if all(o.has_converged for o in optimizers):
                    logger.log(
                        25,
                        "Optimization finished for "
                        + ", ".join(o.parameter_name for o in optimizers),
                    )
                    self._optlock.reset_after_convergence(self._cm)
                    break

                logger.info(f"Optimization step {step}")
                precursor_df = self._process_batch()

                if not self._optlock.has_target_num_precursors:
                    if not self._optlock.batches_remaining():
                        logger.warning(
                            "Insufficient precursors to continue optimization"
                        )
                        insufficient = True
                        break
                    self._optlock.update()
                    if self._optlock.previously_calibrated:
                        self._optlock.update_with_calibration(self._cm)
                        for o in optimizers:
                            o.skip()
                else:
                    prec_filtered, frag_filtered = self._filter_dfs(
                        precursor_df, self._optlock.fragments_df
                    )
                    self._optlock.update()
                    recal.recalibrate(prec_filtered, frag_filtered)
                    self._optlock.update_with_calibration(self._cm)
                    if not self._optlock.previously_calibrated:
                        self._optlock.previously_calibrated = True
                        self._om.update(
                            classifier_version=self._fdr_manager.current_version
                        )
                        continue
                    for o in optimizers:
                        o.step(prec_filtered, frag_filtered)
            else:
                logger.warning(
                    "Optimization did not converge within "
                    f"{self._config['calibration']['max_steps']} steps"
                )

        if insufficient and len(precursor_df):
            prec_filtered, frag_filtered = self._filter_dfs(
                precursor_df, self._optlock.fragments_df
            )
            if len(prec_filtered) >= 6:
                recal.recalibrate(prec_filtered, frag_filtered)
                # the cutoff was learned from scores standardized over the
                # current (wide) rt window; extraction runs at the target
                # tolerance where the same peak gets a smaller z-score. A
                # cutoff from a never-converged optimization starves
                # extraction — drop it and let FDR do the filtering.
                self._om.update(score_cutoff=0.0)
            for optimizers in ordered_optimizers:
                for o in optimizers:
                    o.proceed_with_insufficient_precursors(
                        prec_filtered, self._optlock.fragments_df
                    )

        for optimizers in ordered_optimizers:
            for o in optimizers:
                logger.log(
                    25,
                    f"{o.parameter_name:<15}: "
                    f"{getattr(self._om, o.parameter_name):.4f}",
                )

    # ------------------------------------------------------------------
    def _process_batch(self) -> pd.DataFrame:
        logger.log(
            25,
            f"=== Extracting elution groups {self._optlock.start_idx} to "
            f"{self._optlock.stop_idx} ===",
        )
        handler = ExtractionHandler.create_handler(
            self._config,
            self._om,
            ColumnNameHandler(
                self._cm,
                dia_data_has_ms1=self._dia_data.has_ms1,
                dia_data_has_mobility=self._dia_data.has_mobility,
            ),
        )
        # pipelined: scoring batches dispatch while later selection
        # batches are still downloading (no score cutoff on optimization
        # iterations, so the overlapped driver is numerically identical)
        _, features_df, fragments_df = handler.select_and_score(
            self._dia_data,
            self._optlock.batch_library,
            light_transport=True,
        )
        self._optlock.update_with_extraction(features_df, fragments_df)

        precursor_df = self._fdr_manager.fit_predict(
            self._optlock.features_df,
            decoy_strategy="precursor",
            competitive=self._config["fdr"]["competitive_scoring"],
            df_fragments=self._optlock.fragments_df
            if self._config["search"]["compete_for_fragments"]
            else None,
            version=self._om.classifier_version,
        )
        self._optlock.update_with_fdr(precursor_df)
        n_pass = int(((precursor_df["qval"] <= 0.01) & (precursor_df["decoy"] == 0)).sum())
        logger.log(25, f"=== {n_pass} target precursors at 1% FDR ===")
        return precursor_df

    # ------------------------------------------------------------------
    def _filter_dfs(self, precursor_df, fragments_df):
        prec = precursor_df[
            (precursor_df["qval"] < 0.01) & (precursor_df["decoy"] == 0)
        ]
        if len(fragments_df) == 0:
            return prec, fragments_df
        frag = fragments_df[
            fragments_df["precursor_idx"].isin(prec["precursor_idx"])
            & (fragments_df["mass_error"].abs() <= MAX_FRAGMENT_MZ_TOLERANCE)
        ].sort_values(["correlation", "precursor_idx"], ascending=False)
        high_corr = int(
            (frag["correlation"] > self._config["calibration"]["min_correlation"]).sum()
        )
        stop = min(
            max(high_corr, min(500, len(frag))),
            self._config["calibration"]["max_fragments"],
        )
        return prec, frag.head(stop)
