"""FDRManager: versioned classifier store, warm start, packaged default.

(reference contract: alphadia/workflow/managers/fdr_manager.py:54-348 —
version=-1 trains a new classifier warm-started from the latest; a specific
version scores without retraining; packaged pretrained state keyed by the
feature-column hash.)
"""

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.models.classifier import BinaryClassifier
from alphadia_tpu.workflow.managers.fdr_manager import FDRManager
from alphadia_tpu.workflow.peptidecentric.peptidecentric import FDR_FEATURE_COLUMNS

N_FEAT = 6
COLS = [f"feat_{i}" for i in range(N_FEAT)]


def _features(n=600, seed=0, channels=(0,)):
    rng = np.random.default_rng(seed)
    half = n // 2
    X_t = rng.normal(1.0, 1.0, (half, N_FEAT))
    X_d = rng.normal(-1.0, 1.0, (half, N_FEAT))
    df = pd.DataFrame(np.concatenate([X_t, X_d]), columns=COLS)
    df["decoy"] = np.repeat([0, 1], half)
    df["precursor_idx"] = np.arange(n)
    df["elution_group_idx"] = np.arange(n)
    df["channel"] = np.resize(np.asarray(channels), n)
    df["rank"] = 0
    return df


def _manager(tmp_path=None, **kw):
    return FDRManager(
        feature_columns=COLS,
        classifier_base=BinaryClassifier(random_state=0, epochs=4),
        path=None if tmp_path is None else tmp_path / "fdr_manager.pkl",
        random_state=0,
        **kw,
    )


def test_fit_predict_versions_accumulate():
    mgr = _manager()
    assert mgr.current_version == -1
    out1 = mgr.fit_predict(_features(seed=1))
    assert mgr.current_version == 0
    out2 = mgr.fit_predict(_features(seed=2))
    assert mgr.current_version == 1
    for out in (out1, out2):
        assert {"qval", "proba"} <= set(out.columns)
        # targets at 1% FDR exist and scores separate the classes
        assert (out[out["decoy"] == 0]["qval"] < 0.01).sum() > 50


def test_specific_version_scores_without_retraining():
    mgr = _manager()
    mgr.fit_predict(_features(seed=1))
    n_before = len(mgr.classifier_store)
    mgr.fit_predict(_features(seed=3), version=0)
    assert len(mgr.classifier_store) == n_before  # no new classifier stored


def test_warm_start_from_previous_version():
    mgr = _manager()
    mgr.fit_predict(_features(seed=1))
    first = mgr.classifier_store[0]
    # the classifier trained for version 1 starts from version 0's weights,
    # not from scratch: its pre-fit predictions match version 0's
    warm = mgr._get_classifier(-1)
    assert warm.fitted
    X = _features(seed=4)[COLS].to_numpy(np.float32)
    np.testing.assert_allclose(
        warm.predict_proba(X), first.predict_proba(X), atol=1e-5
    )
    assert warm is not first  # deep copy: training it must not mutate v0


def test_packaged_classifier_loads_for_default_features():
    """The shipped default classifier must match the production feature
    set's hash and load as a fitted, usable warm start."""
    mgr = FDRManager(
        feature_columns=FDR_FEATURE_COLUMNS,
        classifier_base=BinaryClassifier(random_state=0, epochs=2),
        random_state=0,
    )
    packaged = mgr._load_packaged_classifier()
    assert packaged is not None, (
        f"no packaged classifier for feature hash {mgr.feature_hash()} — "
        "re-run scripts/train_default_classifier.py after changing the "
        "FDR feature set"
    )
    assert packaged.fitted
    X = np.random.default_rng(0).normal(size=(32, len(FDR_FEATURE_COLUMNS)))
    proba = packaged.predict_proba(X.astype(np.float32))
    assert proba.shape == (32, 2)
    assert np.isfinite(proba).all()


def test_fresh_manager_warm_starts_from_packaged_default():
    mgr = FDRManager(
        feature_columns=FDR_FEATURE_COLUMNS,
        classifier_base=BinaryClassifier(random_state=0, epochs=2),
        random_state=0,
    )
    clf = mgr._get_classifier(-1)
    assert clf.fitted  # packaged weights, not a cold classifier


def test_channel_wise_strategy_fits_per_channel_qvalues():
    mgr = _manager()
    # >= 500 PSMs per channel so the NN trains (below that perform_fdr
    # falls back to logistic regression and stores no classifier version)
    out = mgr.fit_predict(
        _features(n=2400, seed=5, channels=(0, 4)),
        decoy_strategy="precursor_channel_wise",
    )
    assert set(out["channel"].unique()) == {0, 4}
    assert (out["qval"] <= 1.0).all()
    assert mgr.current_version == 0  # one classifier across channels


def test_fallback_fit_does_not_store_unfitted_classifier():
    """Small batches use the logistic-regression fallback; the unfitted NN
    must not land in the version store where predict() would crash on it."""
    mgr = _manager()
    out = mgr.fit_predict(_features(n=80, seed=6))
    assert "qval" in out.columns  # fallback still produced q-values
    assert mgr.current_version == -1
    with pytest.raises(RuntimeError, match="no trained FDR classifier"):
        mgr.predict(_features(n=40, seed=7))


def test_unknown_strategy_raises():
    mgr = _manager()
    with pytest.raises(NotImplementedError):
        mgr.fit_predict(_features(), decoy_strategy="bogus")


def test_save_load_roundtrip(tmp_path):
    mgr = _manager(tmp_path)
    mgr.fit_predict(_features(seed=1))
    mgr.save()
    mgr2 = FDRManager(
        feature_columns=COLS,
        classifier_base=BinaryClassifier(random_state=0, epochs=4),
        path=tmp_path / "fdr_manager.pkl",
        load_from_file=True,
    )
    assert mgr2.is_loaded_from_file
    assert mgr2.current_version == 0
    X = _features(seed=6)[COLS].to_numpy(np.float32)
    np.testing.assert_allclose(
        mgr2.classifier_store[0].predict_proba(X),
        mgr.classifier_store[0].predict_proba(X),
        atol=1e-5,
    )
