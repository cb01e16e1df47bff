import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.outputs.grouping import perform_grouping
from alphadia_tpu.outputs.protein_fdr import perform_protein_fdr
from alphadia_tpu.outputs.quant import (
    accumulate_frag_df,
    direct_lfq,
    filter_frag_df,
    ion_hash,
)


def test_grouping_parsimony():
    # P1 covers precursors 1,2,3; P2 shares 2; P3 only 4
    df = pd.DataFrame(
        {
            "precursor_idx": [1, 2, 3, 4],
            "proteins": ["P1", "P1;P2", "P1", "P3"],
            "decoy": [0, 0, 0, 0],
        }
    )
    out = perform_grouping(df, group=True)
    assert (out.loc[out.precursor_idx.isin([1, 2, 3]), "pg_master"] == "P1").all()
    assert out.loc[out.precursor_idx == 4, "pg_master"].iloc[0] == "P3"
    # heuristic: P2 never master -> dropped from groups
    assert "P2" not in ";".join(out["pg"])


def test_grouping_decoy_separate():
    df = pd.DataFrame(
        {
            "precursor_idx": [1, 2],
            "proteins": ["P1", "P1"],
            "decoy": [0, 1],
        }
    )
    out = perform_grouping(df)
    assert len(out) == 2
    assert (out["pg_master"] == "P1").all()


def test_protein_fdr_separates():
    rng = np.random.default_rng(0)
    n = 150
    rows = []
    for i in range(n):
        for decoy in (0, 1):
            proba = rng.uniform(0, 0.4) if decoy == 0 else rng.uniform(0.5, 1.0)
            n_prec = rng.integers(2, 8) if decoy == 0 else 1
            for j in range(n_prec):
                rows.append(
                    {
                        "precursor_idx": i * 100 + decoy * 50 + j,
                        "pg": f"PG{i}_{decoy}",
                        "genes": f"G{i}",
                        "proteins": f"P{i}",
                        "sequence": f"SEQ{i}_{j}",
                        "decoy": decoy,
                        "proba": proba + rng.normal(0, 0.02),
                        "run": "r1",
                    }
                )
    psm = pd.DataFrame(rows)
    out = perform_protein_fdr(psm)
    assert "pg_qval" in out.columns
    t_pass = out[(out.decoy == 0) & (out.pg_qval <= 0.01)]["pg"].nunique()
    assert t_pass > 100


def test_lfq_pipeline():
    rng = np.random.default_rng(1)
    n_prec = 40
    runs = {}
    true_level = {}
    for run_i, run in enumerate(["runA", "runB", "runC"]):
        rows = []
        for p in range(n_prec):
            base = 10 ** rng.uniform(3, 6) if p not in true_level else true_level[p]
            true_level[p] = base
            run_factor = [1.0, 2.0, 0.5][run_i]  # systematic sample differences
            for f in range(5):
                rows.append(
                    {
                        "precursor_idx": p,
                        "number": f + 1,
                        "type": 121,
                        "charge": 1,
                        "loss_type": 0,
                        "intensity": base * run_factor * rng.uniform(0.1, 1.0) * [1, 0.5, 0.3, 0.2, 0.1][f],
                        "correlation": rng.uniform(0.6, 1.0),
                    }
                )
        runs[run] = pd.DataFrame(rows)

    feats = accumulate_frag_df(runs)
    inten, corr = feats["intensity"], feats["correlation"]
    assert inten.shape[0] == n_prec * 5
    inten_f, corr_f, keep = filter_frag_df(inten, corr, min_correlation=0.99, top_n=3)
    counts = inten_f.groupby("precursor_idx").size()
    assert (counts >= 3).all()
    assert keep.dtype == bool and keep.sum() == len(inten_f)
    assert (inten[keep]["ion"].to_numpy() == inten_f["ion"].to_numpy()).all()

    # per-quant-level grouping: with an external group_keys column every
    # row with corr > threshold or top-n within ITS group survives
    group_keys = (inten["precursor_idx"] % 4).to_numpy()
    inten_g, _, keep_g = filter_frag_df(
        inten, corr, min_correlation=0.99, top_n=2, group_keys=group_keys
    )
    per_group = pd.Series(group_keys[keep_g]).value_counts()
    assert (per_group >= 2).all()

    lfq = direct_lfq(
        inten,
        inten["precursor_idx"],
        ["runA", "runB", "runC"],
        normalize=True,
    )
    assert len(lfq) == n_prec
    # after normalization systematic run factors are removed:
    ratios = lfq["runB"] / lfq["runA"]
    assert abs(np.log2(ratios).median()) < 0.3
    # quantities correlate with true levels
    truth = np.array([true_level[p] for p in lfq["group"]])
    r = np.corrcoef(np.log2(truth), np.log2(lfq["runA"]))[0, 1]
    assert r > 0.9


def test_ion_hash_unique():
    h1 = ion_hash([1], [2], [98], [1], [0])
    h2 = ion_hash([1], [2], [121], [1], [0])
    h3 = ion_hash([1], [3], [98], [1], [0])
    assert len({int(h1[0]), int(h2[0]), int(h3[0])}) == 3


def test_build_stat_df_zero_rows():
    """A run whose PSMs were all filtered away must still emit one stat row
    (reference df_builders.py:58-69 emits rows unconditionally) — multistep
    tolerance forwarding reads per-run rows and must see every run."""
    from alphadia_tpu.outputs.df_builders import build_stat_df

    empty = pd.DataFrame(
        {"channel": pd.Series([], dtype="int64"), "pg": pd.Series([], dtype=object)}
    )
    stat = build_stat_df(
        "empty_run",
        empty,
        optimization_state={"ms1_error": 5.0, "ms2_error": 10.0},
        calibration_metrics={"ms2_median_accuracy": 1.5},
    )
    assert len(stat) == 1
    row = stat.iloc[0]
    assert row["run"] == "empty_run"
    assert row["precursors"] == 0
    assert row["proteins"] == 0
    assert row["optimization.ms2_error"] == 10.0
    assert row["calibration.ms2_median_accuracy"] == 1.5

    # and a normal run still produces per-channel rows
    psm = pd.DataFrame(
        {"channel": [0, 0, 4], "pg": ["A", "B", "A"], "cycle_fwhm": [2.0, 3.0, 4.0]}
    )
    stat2 = build_stat_df("run", psm)
    assert list(stat2["channel"]) == [0, 4]
    assert list(stat2["precursors"]) == [2, 1]
