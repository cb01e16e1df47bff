"""Lightweight dataframe schema validation.

(reference: alphadia/validation/base.py:1-322 — Required/Optional typed
columns, dtype coercion instead of hard failure where safe, NaN/inf
warnings.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.reporting import logger


class Column:
    required = False

    def __init__(self, name: str, dtype):
        self.name = name
        self.dtype = np.dtype(dtype)

    def check(self, df: pd.DataFrame, warn_on_critical_values: bool = False) -> None:
        if self.name not in df.columns:
            if self.required:
                raise ValueError(f"missing required column '{self.name}'")
            return
        col = df[self.name]
        if self.dtype == object:
            return
        if col.dtype != self.dtype:
            try:
                df[self.name] = col.astype(self.dtype)
            except (TypeError, ValueError) as e:
                raise ValueError(
                    f"column '{self.name}' has dtype {col.dtype}, cannot coerce "
                    f"to {self.dtype}"
                ) from e
        if warn_on_critical_values and np.issubdtype(self.dtype, np.floating):
            vals = df[self.name].to_numpy()
            n_nan = int(np.isnan(vals).sum())
            n_inf = int(np.isinf(vals).sum())
            if n_nan or n_inf:
                logger.warning(
                    f"column '{self.name}': {n_nan} NaN, {n_inf} inf values"
                )


class Required(Column):
    required = True


class Optional(Column):
    required = False


class Schema:
    def __init__(self, name: str, columns: list[Column]):
        self.name = name
        self.columns = columns

    def validate(self, df: pd.DataFrame, warn_on_critical_values: bool = False) -> pd.DataFrame:
        if not isinstance(df, pd.DataFrame):
            raise TypeError(f"{self.name}: expected DataFrame, got {type(df)}")
        for col in self.columns:
            col.check(df, warn_on_critical_values)
        return df
