"""Per-run stat / internal output tables.

(reference: alphadia/outputtransform/df_builders.py:28-309 — ``stat`` rows
carry identification counts, optimized tolerances and calibration
accuracy/precision per run (consumed by the multistep plan); ``internal``
carries phase wall-clock durations.)
"""

from __future__ import annotations

import pandas as pd

from alphadia_tpu.constants.keys import StatOutputCols


def build_stat_df(
    run_name: str,
    run_psm_df: pd.DataFrame,
    optimization_state: dict | None = None,
    calibration_metrics: dict | None = None,
) -> pd.DataFrame:
    rows = []
    channels = (
        sorted(run_psm_df["channel"].unique()) if "channel" in run_psm_df else [0]
    )
    # a run whose PSMs were all filtered away still gets a zero row —
    # multistep plans read per-run stat rows and must see every run
    # (reference df_builders.py:58-69 emits rows unconditionally)
    if not channels:
        channels = [0]
    for channel in channels:
        sub = (
            run_psm_df[run_psm_df["channel"] == channel]
            if "channel" in run_psm_df
            else run_psm_df
        )
        row = {
            "run": run_name,
            "channel": channel,
            "precursors": len(sub),
            "proteins": sub["pg"].nunique() if "pg" in sub else 0,
        }
        if "cycle_fwhm" in sub:
            row["fwhm_rt"] = float(sub["cycle_fwhm"].mean())
        if "mobility_fwhm" in sub:
            row["fwhm_mobility"] = float(sub["mobility_fwhm"].mean())
        if optimization_state:
            prefix = StatOutputCols.OPTIMIZATION_PREFIX
            for key in ("ms1_error", "ms2_error", "rt_error", "mobility_error"):
                if key in optimization_state:
                    row[f"{prefix}{key}"] = optimization_state[key]
        if calibration_metrics:
            for key, value in calibration_metrics.items():
                row[f"calibration.{key}"] = value
        rows.append(row)
    return pd.DataFrame(rows)


def build_internal_df(run_name: str, timings: dict) -> pd.DataFrame:
    row = {"run": run_name}
    for phase, rec in timings.items():
        row[f"duration_{phase}"] = rec.get("duration")
    return pd.DataFrame([row])


def collect_calibration_metrics(calibration_manager) -> dict:
    out = {}
    if calibration_manager is None:
        return out
    for group, ests in calibration_manager.groups.items():
        for name, est in ests.items():
            if est.metrics:
                prefix = "ms1" if (group, name) == ("precursor", "mz") else (
                    "ms2" if (group, name) == ("fragment", "mz") else f"{group}_{name}"
                )
                out[f"{prefix}_median_accuracy"] = est.metrics["median_accuracy"]
                out[f"{prefix}_median_precision"] = est.metrics["median_precision"]
    return out
