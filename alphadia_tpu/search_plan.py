"""Multistep search plan: optional transfer step -> library step -> optional MBR step.

(reference: alphadia/search_plan.py:110-254 — runs up to three SearchSteps
in subdirectories, forwarding optimized MS1/MS2 tolerances (median over
runs from stat.tsv) and the transfer model / MBR library paths as extra
config for the next step.)
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd

from alphadia_tpu.constants.keys import StatOutputCols
from alphadia_tpu.reporting import logger
from alphadia_tpu.search_step import SearchStep

TRANSFER_STEP_NAME = "transfer"
LIBRARY_STEP_NAME = "library"
MBR_STEP_NAME = "mbr"

# per-step config overrides (reference: constants/multistep.yaml)
TRANSFER_EXTRA = {
    "transfer_library": {"enabled": True},
    "transfer_learning": {"enabled": True},
}
MBR_EXTRA = {
    "search": {"target_num_candidates": 5},
    "fdr": {"inference_strategy": "library"},
}


def _merge(*layers: dict) -> dict:
    """Deep-merge dict layers left to right (later layers win)."""
    out: dict = {}
    for layer in layers:
        for k, v in layer.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = _merge(out[k], v)
            else:
                out[k] = v
    return out


class SearchPlan:
    def __init__(self, output_directory: str, config: dict | None = None, cli_config: dict | None = None):
        self.output_directory = Path(output_directory)
        self.user_config = config or {}
        self.cli_config = cli_config or {}

        general = {**(config or {}).get("general", {}), **(cli_config or {}).get("general", {})}
        self.transfer_step_enabled = bool(general.get("transfer_step_enabled", False))
        self.mbr_step_enabled = bool(general.get("mbr_step_enabled", False))

    # ------------------------------------------------------------------
    def run_plan(self) -> None:
        extra: dict = {}
        if self.transfer_step_enabled:
            logger.log(25, "=== multistep: transfer step ===")
            transfer_dir = self.output_directory / TRANSFER_STEP_NAME
            self.run_step(transfer_dir, {**TRANSFER_EXTRA})
            extra.update(self._get_optimized_values_config(transfer_dir))
            model_path = transfer_dir / "peptdeep.transfer"
            if model_path.exists():
                extra.setdefault("library_prediction", {})[
                    "peptdeep_model_path"
                ] = str(model_path)

        if self.mbr_step_enabled:
            logger.log(25, "=== multistep: library step ===")
            library_dir = self.output_directory / LIBRARY_STEP_NAME
            self.run_step(
                library_dir,
                _merge(extra, {"general": {"save_mbr_library": True}}),
            )
            mbr_lib = library_dir / "speclib.mbr.hdf"
            logger.log(25, "=== multistep: mbr step ===")
            # the MBR step inherits the transfer extras (tuned model path,
            # transfer tolerances) and the LIBRARY step's optimized
            # tolerances — without them it would re-optimize from the wide
            # initial defaults and, if the MBR library failed to build,
            # rebuild the base library without the fine-tuned model
            mbr_extra = _merge(
                extra,
                self._get_optimized_values_config(library_dir),
                MBR_EXTRA,
            )
            if mbr_lib.exists():
                mbr_extra = _merge(
                    mbr_extra,
                    {
                        "library_path": str(mbr_lib),
                        "general": {"input_library_type": "flat"},
                    },
                )
            self.run_step(self.output_directory, mbr_extra)
        else:
            self.run_step(self.output_directory, extra)

    def run_step(self, output_dir: Path, extra_config: dict) -> None:
        step = SearchStep(
            str(output_dir),
            config=self.user_config,
            cli_config=self.cli_config,
            extra_config=extra_config,
        )
        step.run()

    # ------------------------------------------------------------------
    @staticmethod
    def _get_optimized_values_config(step_dir: Path) -> dict:
        """Median optimized tolerances over runs from the step's stat.tsv."""
        stat_path = step_dir / "stat.tsv"
        if not stat_path.exists():
            return {}
        stat = pd.read_csv(stat_path, sep="\t")
        out: dict = {"search": {}}
        prefix = StatOutputCols.OPTIMIZATION_PREFIX
        for key, target in (
            ("ms1_error", "target_ms1_tolerance"),
            ("ms2_error", "target_ms2_tolerance"),
        ):
            col = f"{prefix}{key}"
            if col in stat.columns and stat[col].notna().any():
                out["search"][target] = float(stat[col].median())
        return out if out["search"] else {}
