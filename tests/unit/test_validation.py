"""Dataframe schema validation (reference: alphadia/validation/base.py —
required/optional typed columns, dtype coercion where safe, NaN/inf
warnings)."""

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.validation import Optional, Required, Schema
from alphadia_tpu.validation.schemas import (
    candidates_schema,
    fragments_flat_schema,
    precursors_flat_schema,
)

SCHEMA = Schema(
    "test",
    [
        Required("idx", np.uint32),
        Required("mz", np.float32),
        Optional("decoy", np.uint8),
        Optional("seq", object),
    ],
)


def _df(**over):
    base = {
        "idx": np.arange(4, dtype=np.uint32),
        "mz": np.linspace(400, 500, 4).astype(np.float32),
    }
    base.update(over)
    return pd.DataFrame(base)


def test_valid_frame_passes_unchanged():
    df = _df()
    out = SCHEMA.validate(df)
    assert out is df


def test_missing_required_raises():
    with pytest.raises(ValueError, match="missing required column 'mz'"):
        SCHEMA.validate(pd.DataFrame({"idx": [1]}))


def test_missing_optional_is_fine():
    SCHEMA.validate(_df())  # no decoy/seq columns


def test_dtype_coercion_in_place():
    df = _df(mz=np.linspace(400, 500, 4))  # float64
    SCHEMA.validate(df)
    assert df["mz"].dtype == np.float32


def test_uncoercible_dtype_raises():
    df = _df(mz=["a", "b", "c", "d"])
    with pytest.raises(ValueError, match="cannot coerce"):
        SCHEMA.validate(df)


def test_object_columns_skip_dtype_checks():
    SCHEMA.validate(_df(seq=[1, "x", None, 3.5]))


def test_non_dataframe_raises_typeerror():
    with pytest.raises(TypeError):
        SCHEMA.validate({"idx": [1]})


def test_nan_inf_warning(caplog):
    import logging

    df = _df(mz=np.array([1.0, np.nan, np.inf, 4.0], np.float32))
    with caplog.at_level(logging.WARNING):
        SCHEMA.validate(df, warn_on_critical_values=True)
    assert any("1 NaN, 1 inf" in r.message for r in caplog.records)


def test_shipped_schemas_accept_pipeline_frames():
    """The production schemas validate the frames the pipeline builds."""
    prec = pd.DataFrame(
        {
            "precursor_idx": np.arange(3, dtype=np.uint32),
            "flat_frag_start_idx": np.array([0, 2, 4], np.uint32),
            "flat_frag_stop_idx": np.array([2, 4, 6], np.uint32),
            "rt_library": np.ones(3, np.float32),
            "mz_library": np.full(3, 500.0, np.float32),
        }
    )
    precursors_flat_schema.validate(prec)

    frag = pd.DataFrame(
        {
            "mz_library": np.full(6, 300.0, np.float32),
            "intensity": np.ones(6, np.float32),
            "type": np.full(6, 98, np.uint8),
            "charge": np.ones(6, np.uint8),
            "number": np.arange(6, dtype=np.uint8),
            "position": np.arange(6, dtype=np.uint8),
        }
    )
    fragments_flat_schema.validate(frag)

    cand = pd.DataFrame(
        {
            "precursor_idx": np.arange(2, dtype=np.int64),
            "scan_start": np.zeros(2, np.int64),
            "scan_center": np.zeros(2, np.int64),
            "scan_stop": np.ones(2, np.int64),
            "frame_start": np.zeros(2, np.int64),
            "frame_center": np.ones(2, np.int64),
            "frame_stop": np.full(2, 2, np.int64),
        }
    )
    candidates_schema.validate(cand)
