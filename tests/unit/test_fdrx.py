"""Unit tests for the classifier-agnostic TargetDecoyFDR (fdr/fdrx.py)."""

import numpy as np
import pandas as pd
from sklearn.linear_model import LogisticRegression

from alphadia_tpu.fdr.fdrx import TargetDecoyFDR, add_q_values, get_pep


def _psm(n=400, seed=0):
    rng = np.random.default_rng(seed)
    half = n // 2
    # targets: high feature values; decoys: low
    f1 = np.concatenate([rng.normal(2, 1, half), rng.normal(-2, 1, half)])
    f2 = np.concatenate([rng.normal(1, 1, half), rng.normal(-1, 1, half)])
    return pd.DataFrame(
        {
            "precursor_idx": np.arange(n),
            "f1": f1,
            "f2": f2,
            "decoy": np.concatenate([np.zeros(half), np.ones(half)]).astype(int),
            "elution_group_idx": np.arange(n) // 2,
            "channel": 0,
        }
    )


def test_fit_predict_qval_separates():
    df = _psm()
    tdf = TargetDecoyFDR(
        LogisticRegression(max_iter=500), ["f1", "f2"], competition_columns=[]
    )
    out = tdf.fit_predict_qval(df)
    assert {"decoy_proba", "qval", "pep"} <= set(out.columns)
    targets = out[out.decoy == 0]
    # well-separated synthetic data: most targets pass 1% FDR
    assert (targets.qval <= 0.01).mean() > 0.8
    # PEP in [0,1], higher for decoys on average
    assert out.pep.between(0, 1).all()
    assert out[out.decoy == 1].pep.mean() > targets.pep.mean()


def test_qval_ratio_normalization():
    # 3:1 target:decoy ratio scales q-values by r_target_decoy
    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {
            "precursor_idx": np.arange(40),
            "decoy_proba": rng.uniform(0, 1, 40),
            "decoy": ([0, 0, 0, 1] * 10),
        }
    )
    q1 = add_q_values(df.copy(), r_target_decoy=1.0)["qval"]
    q3 = add_q_values(df.copy(), r_target_decoy=3.0)["qval"]
    assert np.allclose(q3.to_numpy(), np.minimum(q1.to_numpy() * 3.0, q3.max()))


def test_nan_rows_get_proba_one():
    df = _psm(100)
    df.loc[:4, "f1"] = np.nan
    tdf = TargetDecoyFDR(LogisticRegression(max_iter=500), ["f1", "f2"])
    tdf.fit_classifier(df)
    proba = tdf.predict_classifier(df)
    assert (proba[:5] == 1.0).all()
    assert len(proba) == len(df)


def test_competition_keeps_best_per_group():
    df = _psm(100)
    tdf = TargetDecoyFDR(
        LogisticRegression(max_iter=500),
        ["f1", "f2"],
        competition_columns=["elution_group_idx"],
    )
    out = tdf.fit_predict_qval(df)
    assert out.groupby("elution_group_idx").size().max() == 1


def test_get_pep_monotone_profile():
    df = _psm(1000, seed=3)
    # proxy score: decoys near 1, targets near 0
    df["decoy_proba"] = np.where(
        df.decoy == 1,
        np.random.default_rng(4).uniform(0.6, 1.0, len(df)),
        np.random.default_rng(5).uniform(0.0, 0.4, len(df)),
    )
    pep = get_pep(df)
    assert pep[df.decoy == 1].mean() > 0.8
    assert pep[df.decoy == 0].mean() < 0.2


def test_predict_qval_with_fragment_competition():
    """fdrx + fragment competition end to end (this path crashed with
    KeyError 'proba' before round 3 — fdrx names its score column
    'decoy_proba' while FragmentCompetition ranks by 'proba')."""
    df = _psm(n=200, seed=3)
    df["rank"] = 0
    df["rt_observed"] = np.linspace(100, 400, len(df))
    df["mz_library"] = np.where(df["precursor_idx"] % 2 == 0, 450.0, 550.0)
    frag = pd.DataFrame(
        {
            "precursor_idx": np.repeat(df["precursor_idx"].to_numpy(), 4),
            "rank": 0,
            "mz": np.tile([200.0, 300.0, 400.0, 500.0], len(df))
            + np.repeat(df["precursor_idx"].to_numpy(), 4) * 1e-3,
        }
    )
    cycle = np.zeros((1, 3, 1, 2))
    cycle[0, 0, 0] = [-1, -1]
    cycle[0, 1, 0] = [400, 500]
    cycle[0, 2, 0] = [500, 600]
    tdf = TargetDecoyFDR(
        LogisticRegression(max_iter=200), ["f1", "f2"],
        competition_columns=["elution_group_idx"],
    )
    out = tdf.fit_predict_qval(df, fragments_df=frag, cycle=cycle)
    assert "qval" in out.columns and "pep" in out.columns
    assert out["qval"].between(0, 1).all()
    assert "proba" not in out.columns  # alias never leaks into the output


def test_predict_qval_skips_competition_on_mobility_data():
    """timsTOF-like cycles (scan-varying isolation) must skip fragment
    competition — window assignment only reads scan 0 (same gate as
    fdr/fdr.py)."""
    df = _psm(n=100, seed=4)
    df["rank"] = 0
    df["rt_observed"] = np.linspace(100, 200, len(df))
    df["mz_library"] = 450.0
    frag = pd.DataFrame(
        {"precursor_idx": df["precursor_idx"], "rank": 0, "mz": 300.0}
    )
    cycle = np.zeros((1, 2, 8, 2))  # 8 scan entries = mobility scheme
    tdf = TargetDecoyFDR(
        LogisticRegression(max_iter=200), ["f1", "f2"],
        competition_columns=["elution_group_idx"],
    )
    out = tdf.fit_predict_qval(df, fragments_df=frag, cycle=cycle)
    # nothing was competed away: every elution group still represented
    assert out["elution_group_idx"].nunique() == df["elution_group_idx"].nunique()
