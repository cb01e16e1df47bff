"""Workflow base: per-run folders, reporter, raw data, managers.

(reference: alphadia/workflow/base.py:28-200 — creates quant/<raw_name>/,
reporter pipeline, loads raw data via RawFileManager, instantiates
calibration/optimization managers.)
"""

from __future__ import annotations

from pathlib import Path

from alphadia_tpu.reporting.reporting import default_pipeline
from alphadia_tpu.workflow.managers.calibration_manager import CalibrationManager
from alphadia_tpu.workflow.managers.optimization_manager import OptimizationManager
from alphadia_tpu.workflow.managers.raw_file_manager import RawFileManager
from alphadia_tpu.workflow.managers.timing_manager import TimingManager

QUANT_FOLDER_NAME = "quant"


class WorkflowBase:
    CALIBRATION_MANAGER_PKL = "calibration_manager.pkl"
    OPTIMIZATION_MANAGER_PKL = "optimization_manager.pkl"
    TIMING_MANAGER_PKL = "timing_manager.pkl"

    def __init__(self, instance_name: str, config, quant_path: str | None = None):
        self.instance_name = instance_name
        self.config = config
        base = Path(quant_path or Path(config["output_directory"]) / QUANT_FOLDER_NAME)
        self.path = base / instance_name
        self.path.mkdir(parents=True, exist_ok=True)
        self.reporter = default_pipeline(
            self.path, save_figures=config["general"]["save_figures"]
        )
        self.dia_data = None
        self.spectral_library = None
        self.calibration_manager = None
        self.optimization_manager = None
        self.timing_manager = TimingManager(
            self.path / self.TIMING_MANAGER_PKL,
            load_from_file=config["general"]["reuse_calibration"],
        )

    # ------------------------------------------------------------------
    def load(self, raw_path: str, spectral_library) -> None:
        reuse = self.config["general"]["reuse_calibration"]
        raw_manager = RawFileManager(self.config)
        self.dia_data = raw_manager.get_dia_data_object(raw_path)

        self.calibration_manager = CalibrationManager(
            self.path / self.CALIBRATION_MANAGER_PKL,
            load_from_file=reuse,
            has_ms1=self.dia_data.has_ms1,
            has_mobility=self.dia_data.has_mobility,
        )
        self.optimization_manager = OptimizationManager(
            self.config,
            gradient_length=self.dia_data.rt_max - self.dia_data.rt_min,
            path=self.path / self.OPTIMIZATION_MANAGER_PKL,
            load_from_file=reuse,
        )
