"""Cross-run output aggregation.

(reference: alphadia/outputtransform/search_plan_output.py:91-523
``SearchPlanOutput.build`` — precursor table (concat runs -> protein
grouping -> protein FDR -> pg_qval filter), stat.tsv, internal.tsv, LFQ
tables at precursor/peptide/protein-group level merged back into the psm
table, optional MBR library.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from alphadia_tpu.constants.keys import (
    INTERNAL_TO_OUTPUT_MAPPING,
    QuantLevelKey,
    QuantLevelName,
    SearchStepFiles,
)
from alphadia_tpu.exceptions import NoPsmFoundError, TooFewProteinsError
from alphadia_tpu.outputs.df_builders import build_internal_df, build_stat_df
from alphadia_tpu.outputs.grouping import perform_grouping
from alphadia_tpu.outputs.protein_fdr import perform_protein_fdr
from alphadia_tpu.outputs.quant import (
    DEFAULT_FEATURES,
    QUANTSELECT_FEATURES,
    accumulate_frag_df,
    direct_lfq,
    filter_frag_df,
    quantselect_lfq,
)
from alphadia_tpu.reporting import logger

PSM_OUTPUT_NAME = "precursors"
STAT_OUTPUT_NAME = "stat"
INTERNAL_OUTPUT_NAME = "internal"
PG_OUTPUT_NAME = "pg.matrix"


class SearchPlanOutput:
    def __init__(self, config, output_folder: str | Path):
        self.config = config
        self.output_folder = Path(output_folder)

    # ------------------------------------------------------------------
    def build(self, folder_list: list[str | Path], base_spec_lib=None) -> pd.DataFrame:
        psm_df = self._build_precursor_table(folder_list)
        self._build_stat_df(folder_list, psm_df)
        self._build_internal_df(folder_list)
        psm_df = self._build_lfq_tables(folder_list, psm_df)
        if self.config["general"]["save_mbr_library"] and base_spec_lib is not None:
            self._build_mbr_library(psm_df, base_spec_lib)
        if self.config["transfer_library"]["enabled"]:
            transfer_psm, transfer_frag = self._build_transfer_library(folder_list)
            if self.config["transfer_learning"]["enabled"] and len(transfer_psm):
                self._build_transfer_model(transfer_psm, transfer_frag)
        self._write(psm_df, PSM_OUTPUT_NAME)
        return psm_df

    # ------------------------------------------------------------------
    def _build_transfer_library(self, folder_list):
        from alphadia_tpu.outputs.transfer_library import accumulate_transfer_library

        tl = self.config["transfer_library"]
        psm, frag = accumulate_transfer_library(
            folder_list,
            top_k_samples=tl["top_k_samples"],
            precursor_correlation_cutoff=tl["precursor_correlation_cutoff"],
            fragment_correlation_ratio=tl["fragment_correlation_ratio"],
            norm_delta_max=tl["norm_delta_max"],
        )
        if len(psm):
            psm.to_parquet(self.output_folder / "speclib.transfer.parquet", index=False)
            frag.to_parquet(
                self.output_folder / "speclib.transfer.fragments.parquet", index=False
            )
        return psm, frag

    def _build_transfer_model(self, transfer_psm, transfer_frag) -> None:
        from alphadia_tpu.models.finetune import MODEL_DIR_NAME, FinetuneManager

        manager = FinetuneManager(self.config["transfer_learning"])
        stats = {}
        stats.update({f"rt_{k}": v for k, v in manager.finetune_rt(transfer_psm).items() if not isinstance(v, list)})
        try:
            stats.update({f"charge_{k}": v for k, v in manager.finetune_charge(transfer_psm).items() if not isinstance(v, list)})
        except Exception as e:
            logger.warning(f"charge finetune failed: {e}")
        try:
            stats.update({f"ms2_{k}": v for k, v in manager.finetune_ms2(transfer_psm, transfer_frag).items() if not isinstance(v, list)})
        except Exception as e:
            logger.warning(f"ms2 finetune failed: {e}")
        manager.finetune_ccs(transfer_psm)
        manager.save(self.output_folder / MODEL_DIR_NAME)
        pd.DataFrame([stats]).to_csv(
            self.output_folder / "stats.transfer.tsv", sep="\t", index=False
        )

    def _build_mbr_library(self, psm_df: pd.DataFrame, base_spec_lib) -> None:
        from alphadia_tpu.outputs.mbr import MbrLibraryBuilder

        try:
            # keep_decoys_in_mbr_library=false (reference default) drops
            # decoys here; the consuming SearchStep regenerates flat
            # decoys at load (library/decoy.py generate_flat_decoys)
            mbr_lib = MbrLibraryBuilder(
                fdr=self.config["fdr"]["fdr"],
                keep_decoys=self.config["fdr"]["keep_decoys_in_mbr_library"],
            )(psm_df, base_spec_lib)
            mbr_lib.save_hdf(self.output_folder / "speclib.mbr.hdf")
        except Exception as e:
            logger.warning(f"could not build MBR library: {e}")

    # ------------------------------------------------------------------
    def _load_run_psm(self, folder: Path) -> pd.DataFrame | None:
        path = Path(folder) / SearchStepFiles.PSM_FILE_NAME
        if not path.exists():
            logger.warning(f"missing {path}")
            return None
        df = pd.read_parquet(path)
        df["run"] = Path(folder).name
        return df

    def _build_precursor_table(self, folder_list) -> pd.DataFrame:
        frames = [self._load_run_psm(f) for f in folder_list]
        frames = [f for f in frames if f is not None and len(f)]
        if not frames:
            raise NoPsmFoundError()
        psm_df = pd.concat(frames, ignore_index=True)

        group_level = self.config["fdr"]["group_level"]
        strategy = self.config["fdr"]["inference_strategy"]
        if strategy == "library":
            psm_df["pg"] = psm_df[group_level]
            psm_df["pg_master"] = psm_df[group_level].str.split(";").str[0]
        else:
            psm_df = perform_grouping(
                psm_df,
                genes_or_proteins=group_level,
                group=strategy == "heuristic",
                return_parsimony_groups=strategy == "maximum_parsimony",
            )

        try:
            psm_df = perform_protein_fdr(psm_df)
            psm_df = psm_df[psm_df["pg_qval"] <= self.config["fdr"]["fdr"]]
        except TooFewProteinsError:
            logger.warning("too few proteins for protein FDR; skipping pg_qval filter")
            psm_df["pg_qval"] = np.nan

        if not self.config["fdr"]["keep_decoys"]:
            psm_df = psm_df[psm_df["decoy"] == 0]
        return psm_df.reset_index(drop=True)

    # ------------------------------------------------------------------
    def _build_stat_df(self, folder_list, psm_df: pd.DataFrame) -> pd.DataFrame:
        stats = []
        for folder in folder_list:
            run = Path(folder).name
            run_psm = psm_df[psm_df["run"] == run]
            opt_state = self._load_optimization_state(Path(folder))
            cal_metrics = self._load_calibration_metrics(Path(folder))
            stats.append(build_stat_df(run, run_psm, opt_state, cal_metrics))
        stat_df = pd.concat(stats, ignore_index=True)
        stat_df.to_csv(self.output_folder / f"{STAT_OUTPUT_NAME}.tsv", sep="\t", index=False)
        return stat_df

    @staticmethod
    def _load_optimization_state(folder: Path) -> dict | None:
        import pickle

        path = folder / "optimization_manager.pkl"
        if not path.exists():
            return None
        try:
            with open(path, "rb") as f:
                om = pickle.load(f)
            return {
                k: getattr(om, k)
                for k in ("ms1_error", "ms2_error", "rt_error", "mobility_error")
                if hasattr(om, k)
            }
        except Exception:
            return None

    @staticmethod
    def _load_calibration_metrics(folder: Path) -> dict | None:
        """Per-run calibration accuracy/precision for stat.tsv
        (calibration.* columns, read from the run's manager checkpoint)."""
        import pickle

        from alphadia_tpu.outputs.df_builders import collect_calibration_metrics

        path = folder / "calibration_manager.pkl"
        if not path.exists():
            return None
        try:
            with open(path, "rb") as f:
                cm = pickle.load(f)
            return collect_calibration_metrics(cm)
        except Exception:
            return None

    def _build_internal_df(self, folder_list) -> pd.DataFrame:
        import pickle

        rows = []
        for folder in folder_list:
            path = Path(folder) / "timing_manager.pkl"
            timings = {}
            if path.exists():
                try:
                    with open(path, "rb") as f:
                        timings = pickle.load(f).timings
                except Exception:
                    pass
            rows.append(build_internal_df(Path(folder).name, timings))
        internal_df = pd.concat(rows, ignore_index=True)
        internal_df.to_csv(
            self.output_folder / f"{INTERNAL_OUTPUT_NAME}.tsv", sep="\t", index=False
        )
        return internal_df

    # ------------------------------------------------------------------
    def _build_lfq_tables(self, folder_list, psm_df: pd.DataFrame) -> pd.DataFrame:
        run_frames = {}
        for folder in folder_list:
            path = Path(folder) / SearchStepFiles.FRAG_FILE_NAME
            if path.exists():
                df = pd.read_parquet(path)
                if len(df):
                    run_frames[Path(folder).name] = df
        if not run_frames:
            logger.warning("no fragment data found; skipping LFQ")
            return psm_df

        method = self.config["search_output"].get("normalization_method", "directlfq")
        columns = QUANTSELECT_FEATURES if method == "quantselect" else DEFAULT_FEATURES
        feature_dfs = accumulate_frag_df(run_frames, columns=columns)
        run_cols = list(run_frames.keys())
        min_correlation = self.config["search_output"]["min_correlation"]
        top_n = self.config["search_output"]["min_k_fragments"]

        if self.config["search_output"]["save_fragment_quant_matrix"]:
            # the per-precursor-filtered ion x runs matrix (reference:
            # QuantBuilder's fragment-level output)
            frag_intensity_df, _, _ = filter_frag_df(
                feature_dfs["intensity"],
                feature_dfs["correlation"],
                min_correlation=min_correlation,
                top_n=top_n,
            )
            self._write_matrix(frag_intensity_df, "fragment.matrix", "fragment")

        # map precursor_idx -> group keys from the psm table
        key_maps = {}
        for level, key in (
            (QuantLevelName.PRECURSOR, QuantLevelKey.PRECURSOR),
            (QuantLevelName.PEPTIDE, QuantLevelKey.PEPTIDE),
            (QuantLevelName.PROTEIN, QuantLevelKey.PROTEIN),
        ):
            if key in psm_df.columns:
                key_maps[level] = psm_df.drop_duplicates("precursor_idx").set_index(
                    "precursor_idx"
                )[key]

        normalize = self.config["search_output"]["normalize_directlfq"]
        min_nonnan = self.config["search_output"]["min_nonnan"]
        levels = []
        if self.config["search_output"]["precursor_level_lfq"]:
            levels.append(QuantLevelName.PRECURSOR)
        if self.config["search_output"]["peptide_level_lfq"]:
            levels.append(QuantLevelName.PEPTIDE)
        levels.append(QuantLevelName.PROTEIN)

        for level in levels:
            if level not in key_maps:
                continue
            keys = key_maps[level].reindex(
                feature_dfs["intensity"]["precursor_idx"]
            ).to_numpy()
            valid = pd.notna(keys)
            eff_min_nonnan = min_nonnan if len(run_cols) >= min_nonnan else 1
            if method == "quantselect":
                # quantselect weighs ions by quality itself; no hard filter
                # (reference quant_output_builder.py:264-270 filters only on
                # the directlfq branch)
                lfq = quantselect_lfq(
                    {k: v[valid] for k, v in feature_dfs.items()},
                    pd.Series(keys[valid]),
                    run_cols,
                    min_nonnan=eff_min_nonnan,
                )
            else:
                # per-quant-level ion filtering: top-n by mean correlation
                # within the LEVEL group (reference
                # quant_output_builder.py:243-249 passes
                # group_column=lfq_config.quant_level)
                level_intensity_df, _, _keep = filter_frag_df(
                    feature_dfs["intensity"][valid],
                    feature_dfs["correlation"][valid],
                    min_correlation=min_correlation,
                    top_n=top_n,
                    group_keys=keys[valid],
                )
                if len(level_intensity_df) == 0:
                    logger.warning(
                        f"no fragments survived filtering at the {level} level; skipping"
                    )
                    continue
                lfq = direct_lfq(
                    level_intensity_df,
                    pd.Series(keys[valid][_keep]),
                    run_cols,
                    normalize=normalize,
                    min_nonnan=eff_min_nonnan,
                    num_samples=self.config["search_output"][
                        "num_samples_quadratic"
                    ],
                )
            out_name = PG_OUTPUT_NAME if level == QuantLevelName.PROTEIN else f"{level}.matrix"
            self._write_matrix(lfq, out_name, level)

            # merge per-run intensity into psm table
            long = lfq.melt(id_vars="group", var_name="run", value_name=f"{level}_lfq_intensity")
            key = QuantLevelKey.PROTEIN if level == QuantLevelName.PROTEIN else (
                QuantLevelKey.PRECURSOR if level == QuantLevelName.PRECURSOR else QuantLevelKey.PEPTIDE
            )
            psm_df = psm_df.merge(
                long.rename(columns={"group": key}),
                on=[key, "run"],
                how="left",
            )
        return psm_df

    def _write_matrix(self, lfq: pd.DataFrame, name: str, level: str) -> None:
        fmt = self.config["search_output"]["file_format"]
        path = self.output_folder / f"{name}.{'parquet' if fmt == 'parquet' else 'tsv'}"
        if fmt == "parquet":
            lfq.to_parquet(path, index=False)
        else:
            lfq.to_csv(path, sep="\t", index=False)

    # ------------------------------------------------------------------
    def _write(self, psm_df: pd.DataFrame, name: str) -> None:
        out = psm_df.rename(columns=INTERNAL_TO_OUTPUT_MAPPING)
        keep = [c for c in INTERNAL_TO_OUTPUT_MAPPING.values() if c in out.columns]
        out = out[keep]
        fmt = self.config["search_output"]["file_format"]
        if fmt == "parquet":
            out.to_parquet(self.output_folder / f"{name}.parquet", index=False)
        else:
            out.to_csv(self.output_folder / f"{name}.tsv", sep="\t", index=False)
        logger.log(25, f"Wrote {len(out)} precursors to {name}.{fmt}")
