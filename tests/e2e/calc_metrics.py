"""Compute CI-trackable metrics from a finished search output directory.

(reference analog: tests/e2e_tests/calc_metrics.py ``BasicStats`` — mean/std
of proteins, precursors, optimized tolerances, and calibration accuracy /
precision per run, read from the ``stat`` output; the reference posts these
to an external dashboard, here they print as one JSON document and back the
e2e assertions.)

Usage: python tests/e2e/calc_metrics.py <output_dir>
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pandas as pd

STAT_COLUMNS = [
    "proteins",
    "precursors",
    "optimization.ms2_error",
    "optimization.ms1_error",
    "optimization.rt_error",
    "optimization.mobility_error",
    "calibration.ms2_median_accuracy",
    "calibration.ms2_median_precision",
    "calibration.ms1_median_accuracy",
    "calibration.ms1_median_precision",
]


def basic_stats(output_dir: str | Path) -> dict[str, float]:
    """Mean/std per tracked stat column over the runs of one search."""
    stat = pd.read_csv(Path(output_dir) / "stat.tsv", sep="\t")
    metrics: dict[str, float] = {"n_runs": int(len(stat))}
    for col in STAT_COLUMNS:
        if col not in stat.columns:
            continue
        vals = pd.to_numeric(stat[col], errors="coerce")
        if vals.notna().any():
            metrics[f"BasicStats/{col}_mean"] = float(vals.mean())
            metrics[f"BasicStats/{col}_std"] = float(vals.std(ddof=0))
    return metrics


def precursor_stats(output_dir: str | Path) -> dict[str, float]:
    """Global precursor-table metrics (1% FDR table)."""
    path = Path(output_dir) / "precursors.parquet"
    if not path.exists():
        return {}
    psm = pd.read_parquet(path)
    out = {
        "Precursors/total": int(len(psm)),
        "Precursors/unique": int(psm["precursor.idx"].nunique()),
    }
    if "pg.name" in psm.columns:
        out["Precursors/protein_groups"] = int(psm["pg.name"].nunique())
    if "precursor.qval" in psm.columns:
        out["Precursors/qval_median"] = float(psm["precursor.qval"].median())
    return out


def calc_all(output_dir: str | Path) -> dict[str, float]:
    return {**basic_stats(output_dir), **precursor_stats(output_dir)}


def main() -> None:
    if len(sys.argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    print(json.dumps(calc_all(sys.argv[1]), indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
