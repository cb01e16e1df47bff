"""Extraction handler: wires optimization state into the device kernels.

(reference: alphadia/workflow/peptidecentric/extraction_handler.py:70-705 —
backend factory + select/score/quantify wrappers; single JAX backend here,
so select_candidates -> score_and_quantify_candidates with the NG-style
score-cutoff filter applied after selection.)
"""

from __future__ import annotations

import pandas as pd

from alphadia_tpu.rawdata import DiaData
from alphadia_tpu.reporting import logger
from alphadia_tpu.search.scoring import CandidateScoring, ScoringConfig
from alphadia_tpu.search.selection import CandidateSelection, SelectionConfig


def _resolve_compute_dtype(setting: str) -> str:
    """'auto' -> bfloat16 on accelerators, float32 on CPU (validated <2%
    feature deviation; m/z math is f32 regardless)."""
    if setting != "auto":
        return setting
    import jax

    return "float32" if jax.default_backend() == "cpu" else "bfloat16"


class ExtractionHandler:
    def __init__(self, config, optimization_manager, column_name_handler):
        self._config = config
        self._om = optimization_manager
        self._cols = column_name_handler

    @classmethod
    def create_handler(cls, config, optimization_manager, column_name_handler):
        return cls(config, optimization_manager, column_name_handler)

    # ------------------------------------------------------------------
    def _selection_config(self) -> SelectionConfig:
        cfg = self._config
        return SelectionConfig(
            rt_tolerance=self._om.rt_error,
            precursor_mz_tolerance=self._om.ms1_error,
            fragment_mz_tolerance=self._om.ms2_error,
            candidate_count=int(self._om.num_candidates),
            top_k_fragments=cfg["search"]["top_k_fragments_selection"],
            exclude_shared_ions=cfg["search"]["exclude_shared_ions"],
            fwhm_rt=self._om.fwhm_rt,
            batch_size=cfg["tpu"]["selection_batch"],
            gather_slab=cfg["tpu"]["gather_slab"],
            mesh_devices=cfg["tpu"]["mesh_devices"],
            coarsen_wide_windows=cfg["tpu"]["coarsen_wide_windows"],
        )

    def _scoring_config(self, light_transport: bool = False) -> ScoringConfig:
        cfg = self._config
        return ScoringConfig(
            # optimization iterations don't consume per-fragment quant:
            # drop it from the device->host download (~23% fewer bytes)
            transport_quant=not light_transport,
            precursor_mz_tolerance=self._om.ms1_error,
            fragment_mz_tolerance=self._om.ms2_error,
            top_k_fragments=cfg["search"]["top_k_fragments_scoring"],
            exclude_shared_ions=cfg["search"]["exclude_shared_ions"],
            quant_window=cfg["search"]["quant_window"],
            quant_all=cfg["search"]["quant_all"],
            experimental_xic=cfg["search"]["experimental_xic"],
            batch_size=cfg["tpu"]["scoring_batch"],
            gather_slab=cfg["tpu"]["gather_slab"],
            mesh_devices=cfg["tpu"]["mesh_devices"],
            quad_sigma=tuple(self._om.quad_sigma),
            quad_delta_mu=tuple(self._om.quad_delta_mu),
            compute_dtype=_resolve_compute_dtype(cfg["tpu"]["compute_dtype"]),
        )

    # ------------------------------------------------------------------
    def select_candidates(
        self, dia_data: DiaData, lib, apply_cutoff: bool = False
    ) -> pd.DataFrame:
        selection = CandidateSelection(
            dia_data,
            lib.precursor_df,
            lib.fragment_df,
            self._selection_config(),
            rt_column=self._cols.get_rt_column(),
            precursor_mz_column=self._cols.get_precursor_mz_column(),
            fragment_mz_column=self._cols.get_fragment_mz_column(),
        )
        candidates_df = selection()

        # the cutoff only exists to save scoring compute on large libraries;
        # on small candidate pools it starves the FDR of decoys (a handful
        # of surviving decoys make q-values collapse on one rogue ranking)
        if apply_cutoff and self._om.score_cutoff > 0 and len(candidates_df) > 5000:
            n_before = len(candidates_df)
            kept = candidates_df[
                candidates_df["score"] > self._om.score_cutoff
            ].reset_index(drop=True)
            # the cutoff is a throughput optimization, not a correctness
            # filter: selection scores are standardized over the rt window,
            # so a cutoff learned at a wider window can overshoot at the
            # final tolerance. Never let it empty the candidate list.
            if len(kept) == 0 and n_before > 0:
                logger.warning(
                    f"score cutoff {self._om.score_cutoff:.3f} would drop all "
                    f"{n_before} candidates; skipping cutoff"
                )
            else:
                candidates_df = kept
                logger.info(
                    f"Applied score cutoff {self._om.score_cutoff:.3f}: "
                    f"{len(candidates_df)}/{n_before} candidates retained"
                )
        return candidates_df

    def select_and_score(
        self,
        dia_data: DiaData,
        lib,
        light_transport: bool = False,
    ) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
        """Cross-phase pipelined selection + scoring (no score cutoff —
        the optimization iterations' shape; search/pipelined.py overlaps
        selection downloads/decodes with scoring uploads/dispatches).
        Returns (candidates_df, psm_df, fragment_df), numerically
        identical to select_candidates + score_and_quantify_candidates.
        """
        from alphadia_tpu.search.pipelined import PipelinedExtraction

        cols = dict(
            rt_column=self._cols.get_rt_column(),
            precursor_mz_column=self._cols.get_precursor_mz_column(),
            fragment_mz_column=self._cols.get_fragment_mz_column(),
        )
        pipe = PipelinedExtraction(
            dia_data,
            lib.precursor_df,
            lib.fragment_df,
            self._selection_config(),
            self._scoring_config(light_transport=light_transport),
            **cols,
        )
        return pipe()

    def score_and_quantify_candidates(
        self,
        candidates_df: pd.DataFrame,
        dia_data: DiaData,
        lib,
        light_transport: bool = False,
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        scoring = CandidateScoring(
            dia_data,
            lib.precursor_df,
            lib.fragment_df,
            self._scoring_config(light_transport=light_transport),
            rt_column=self._cols.get_rt_column(),
            precursor_mz_column=self._cols.get_precursor_mz_column(),
            fragment_mz_column=self._cols.get_fragment_mz_column(),
        )
        return scoring(candidates_df)
