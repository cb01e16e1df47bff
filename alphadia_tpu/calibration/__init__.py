from alphadia_tpu.calibration.estimator import (
    CalibrationEstimator,
    CalibrationModelProvider,
    calibration_model_provider,
)
from alphadia_tpu.calibration.models import LOESSRegression

__all__ = [
    "CalibrationEstimator",
    "CalibrationModelProvider",
    "LOESSRegression",
    "calibration_model_provider",
]
