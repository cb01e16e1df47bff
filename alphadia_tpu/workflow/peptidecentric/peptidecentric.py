"""Per-raw-file peptide-centric workflow.

(reference: alphadia/workflow/peptidecentric/peptidecentric.py:65-317 —
``load`` (data + FDR manager + per-run library init),
``search_parameter_optimization``, ``extraction`` (full-library search with
optimized parameters, FDR filter at the configured threshold), plus the
requantify hooks for multiplexing / transfer libraries.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.exceptions import NoPsmFoundError
from alphadia_tpu.models.classifier import BinaryClassifier
from alphadia_tpu.reporting import logger
from alphadia_tpu.search.scoring import FEATURE_COLUMNS
from alphadia_tpu.utils.misc import candidate_hash
from alphadia_tpu.workflow.base import WorkflowBase
from alphadia_tpu.workflow.managers.fdr_manager import FDRManager
from alphadia_tpu.workflow.managers.timing_manager import use_timing_manager
from alphadia_tpu.workflow.peptidecentric.column_name_handler import ColumnNameHandler
from alphadia_tpu.workflow.peptidecentric.extraction_handler import ExtractionHandler
from alphadia_tpu.workflow.peptidecentric.library_init import init_spectral_library
from alphadia_tpu.workflow.peptidecentric.optimization_handler import (
    OptimizationHandler,
)

# feature columns handed to the FDR classifier (46 kernel features + derived)
FDR_FEATURE_COLUMNS = FEATURE_COLUMNS + [
    "delta_rt",
    "score",
    "n_K",
    "n_R",
    "n_P",
    "charge",
    "nAA",
]


class PeptideCentricWorkflow(WorkflowBase):
    def __init__(
        self,
        instance_name: str,
        config,
        quant_path: str | None = None,
        random_state: int | None = None,
    ):
        super().__init__(instance_name, config, quant_path)
        self.fdr_manager: FDRManager | None = None
        self.optimization_handler: OptimizationHandler | None = None
        # per-file seed derived by SearchStep from general.random_state
        # (reference seeding discipline, search_step.py:217-226)
        self._random_state = random_state

    # ------------------------------------------------------------------
    @use_timing_manager("load")
    def load(self, raw_path: str, spectral_library) -> None:
        self.reporter.log_event("load", "start")
        super().load(raw_path, spectral_library)

        random_state = (
            self._random_state
            if self._random_state is not None
            else self.config["general"]["random_state"]
        )
        classifier = BinaryClassifier(
            test_size=0.001,
            batch_size=5000,
            learning_rate=0.001,
            epochs=10,
            experimental_hyperparameter_tuning=self.config["fdr"][
                "enable_nn_hyperparameter_tuning"
            ],
            random_state=random_state,
        )
        figure_path = None
        if self.config["general"]["save_figures"]:
            figure_path = str(self.path / "figures" / "fdr.png")
            (self.path / "figures").mkdir(exist_ok=True)
        self.fdr_manager = FDRManager(
            feature_columns=FDR_FEATURE_COLUMNS,
            classifier_base=classifier,
            dia_cycle=self.dia_data.cycle,
            config=self.config,
            random_state=random_state,
            figure_path=figure_path,
        )

        self.spectral_library = init_spectral_library(
            self.dia_data.cycle,
            self.dia_data.cycle_rt,
            spectral_library,
            channel_filter=self.config["search"]["channel_filter"],
        )

        self.optimization_handler = OptimizationHandler(
            self.config,
            self.optimization_manager,
            self.calibration_manager,
            self.fdr_manager,
            self.dia_data,
            self.spectral_library,
        )

    # ------------------------------------------------------------------
    @use_timing_manager("optimization")
    def search_parameter_optimization(self) -> None:
        self.optimization_handler.search_parameter_optimization()
        # apply final calibration to the full library
        from alphadia_tpu.workflow.managers.calibration_manager import (
            CalibrationGroups,
        )

        self.calibration_manager.predict(
            self.spectral_library.precursor_df, CalibrationGroups.PRECURSOR
        )
        self.calibration_manager.predict(
            self.spectral_library.fragment_df, CalibrationGroups.FRAGMENT
        )
        self.calibration_manager.save()
        self.optimization_manager.save()

    # ------------------------------------------------------------------
    @use_timing_manager("extraction")
    def extraction(self) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Full-library search with optimized parameters; returns
        (psm_df at configured FDR, fragment_df of surviving candidates)."""
        self.optimization_manager.update(
            num_candidates=self.config["search"]["target_num_candidates"]
        )
        handler = ExtractionHandler.create_handler(
            self.config,
            self.optimization_manager,
            ColumnNameHandler(
                self.calibration_manager,
                dia_data_has_ms1=self.dia_data.has_ms1,
                dia_data_has_mobility=self.dia_data.has_mobility,
            ),
        )
        candidates_df = handler.select_candidates(
            self.dia_data, self.spectral_library, apply_cutoff=True
        )
        features_df, fragments_df = handler.score_and_quantify_candidates(
            candidates_df, self.dia_data, self.spectral_library
        )
        if len(features_df) == 0:
            raise NoPsmFoundError()

        psm_df = self.fdr_manager.fit_predict(
            features_df,
            decoy_strategy="precursor",
            competitive=self.config["fdr"]["competitive_scoring"],
            df_fragments=fragments_df
            if self.config["search"]["compete_for_fragments"]
            else None,
            version=self.optimization_manager.classifier_version,
        )

        fdr_cutoff = self.config["fdr"]["fdr"]
        # qval filter ONLY — decoy PSMs at <=fdr survive into psm.parquet
        # (reference peptidecentric.py:227-229): the cross-run protein FDR
        # needs them as its null; fdr.keep_decoys is applied AFTER protein
        # FDR in outputs/search_plan_output.py, like the reference
        psm_df = psm_df[psm_df["qval"] <= fdr_cutoff].reset_index(drop=True)

        # filter fragments to surviving candidates
        keep_hashes = set(
            candidate_hash(psm_df["precursor_idx"].to_numpy(), psm_df["rank"].to_numpy())
        )
        frag_hashes = candidate_hash(
            fragments_df["precursor_idx"].to_numpy(), fragments_df["rank"].to_numpy()
        )
        fragments_df = fragments_df[
            np.isin(frag_hashes, list(keep_hashes))
        ].reset_index(drop=True)

        logger.log(
            25,
            f"Extraction: {len(psm_df)} precursors at {fdr_cutoff:.0%} FDR, "
            f"{len(fragments_df)} fragments",
        )
        self.reporter.log_metric("extraction.precursors", len(psm_df))
        self.reporter.log_metric("extraction.fragments", len(fragments_df))
        self.timing_manager.save()
        return psm_df, fragments_df

    # ------------------------------------------------------------------
    @use_timing_manager("requantify")
    def requantify(self, psm_df: pd.DataFrame):
        """Multiplexing: expand confident PSMs to all channels + channel FDR
        (reference: peptidecentric.py:268-293)."""
        from alphadia_tpu.workflow.peptidecentric.multiplexing_handler import (
            MultiplexingHandler,
        )

        handler = ExtractionHandler.create_handler(
            self.config,
            self.optimization_manager,
            ColumnNameHandler(
                self.calibration_manager,
                dia_data_has_ms1=self.dia_data.has_ms1,
                dia_data_has_mobility=self.dia_data.has_mobility,
            ),
        )
        return MultiplexingHandler(
            self.config, self.fdr_manager, handler, self.calibration_manager
        ).requantify(self.dia_data, self.spectral_library, psm_df)

    # ------------------------------------------------------------------
    @use_timing_manager("requantify_fragments")
    def requantify_fragments(
        self, psm_df: pd.DataFrame
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Re-quantify confident PSMs over the full transfer fragment space
        (reference: peptidecentric.py:296-317)."""
        from alphadia_tpu.workflow.peptidecentric.transfer_requant_handler import (
            TransferRequantHandler,
        )

        return TransferRequantHandler(
            self.config, self.calibration_manager, self.optimization_manager
        ).requantify(self.dia_data, psm_df)
