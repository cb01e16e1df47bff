"""Property calibration estimator.

(reference: alphadia/calibration/estimator.py:19-400
``CalibrationEstimator`` + ``CalibrationModelProvider`` — same contracts:

- models the deviation of a target column (observed) from an input column
  (library), optionally on a relative scale (``transform_deviation=1e6``
  for ppm);
- ``predict`` writes the calibrated column into the dataframe;
- ``calc_deviation`` returns [observed, calibrated(explained), residual]
  deviations per row;
- ``ci(df, p)`` = mean of |percentile bounds| of the residual deviation at
  the central p-interval — the quantity driving tolerance proposals;
- metrics: median |calibrated| (accuracy) and median |residual| (precision).)
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

from alphadia_tpu.calibration.models import (
    LOESSRegression,
    construct_polynomial_regression,
)
from alphadia_tpu.reporting import logger


class CalibrationEstimator:
    def __init__(
        self,
        name: str,
        function,
        input_columns: list[str],
        target_columns: list[str],
        output_columns: list[str],
        transform_deviation: float | str | None = None,
    ):
        self.name = name
        self.function = function
        self.input_columns = input_columns
        self.target_columns = target_columns
        self.output_columns = output_columns
        self.transform_deviation = (
            float(transform_deviation) if transform_deviation is not None else None
        )
        self.is_fitted = False
        self.metrics: dict[str, float] | None = None

    def __repr__(self) -> str:
        return f"<Calibration {self.name}, fit={self.is_fitted}>"

    # ------------------------------------------------------------------
    def fit(self, df: pd.DataFrame, plot: bool = False, figure_path=None) -> np.ndarray:
        cols = self.input_columns + self.target_columns
        missing = [c for c in cols if c not in df.columns]
        if missing:
            logger.warning(f"calibration {self.name}: missing columns {missing}")
            return np.zeros(len(self.input_columns))
        x = df[self.input_columns[0]].to_numpy(np.float64)
        y = df[self.target_columns[0]].to_numpy(np.float64)
        try:
            self.function.fit(x, y)
            self.is_fitted = True
        except Exception as e:
            logger.warning(f"calibration {self.name} failed: {e}")
            return np.zeros(len(self.input_columns))
        self.metrics = self._get_metrics(df)
        return np.array([self.ci(df, 0.95)])

    def predict(self, df: pd.DataFrame, inplace: bool = True):
        if not self.is_fitted:
            logger.warning(f"calibration {self.name} is not fitted, cannot predict")
            return None
        x = df[self.input_columns[0]].to_numpy(np.float64)
        calibrated = self.function.predict(x)
        if inplace:
            df[self.output_columns[0]] = calibrated.astype(np.float32)
            return None
        return calibrated

    # ------------------------------------------------------------------
    def calc_deviation(self, df: pd.DataFrame) -> np.ndarray:
        x = df[self.input_columns[0]].to_numpy(np.float64)
        y = df[self.target_columns[0]].to_numpy(np.float64)
        calibrated = self.function.predict(x)
        observed_dev = y - x
        calibrated_dev = calibrated - x
        if self.transform_deviation is not None:
            observed_dev = observed_dev / x * self.transform_deviation
            calibrated_dev = calibrated_dev / x * self.transform_deviation
        residual_dev = observed_dev - calibrated_dev
        return np.stack([observed_dev, calibrated_dev, residual_dev, x], axis=1)

    def _get_metrics(self, df: pd.DataFrame) -> dict[str, float]:
        dev = self.calc_deviation(df)
        return {
            "median_accuracy": float(np.median(np.abs(dev[:, 1]))),
            "median_precision": float(np.median(np.abs(dev[:, 2]))),
        }

    def ci(self, df: pd.DataFrame, ci: float = 0.95) -> float:
        if not 0 < ci < 1:
            raise ValueError("Confidence interval must be between 0 and 1")
        if not self.is_fitted:
            return 0.0
        pct = [100 * (1 - ci) / 2, 100 * (1 + ci) / 2]
        residual = self.calc_deviation(df)[:, 2]
        return float(np.mean(np.abs(np.percentile(residual, pct))))

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def from_file(cls, path: str) -> "CalibrationEstimator":
        with open(path, "rb") as f:
            return pickle.load(f)


class CalibrationModelProvider:
    def __init__(self):
        self.model_dict: dict[str, object] = {}

    def register_model(self, name: str, template) -> None:
        self.model_dict[name] = template

    def get_model(self, name: str):
        if name not in self.model_dict:
            raise KeyError(f"unknown calibration model {name}")
        return self.model_dict[name]


def _linear():
    from sklearn.linear_model import LinearRegression

    return LinearRegression


calibration_model_provider = CalibrationModelProvider()
calibration_model_provider.register_model("LOESSRegression", LOESSRegression)
calibration_model_provider.register_model("LinearRegression", _linear())
calibration_model_provider.register_model(
    "PolynomialRegression", construct_polynomial_regression
)
