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
