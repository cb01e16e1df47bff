import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.calibration import CalibrationEstimator, LOESSRegression


def test_loess_fits_smooth_curve(rng):
    x = np.sort(rng.uniform(0, 100, 800))
    y_true = 0.05 * x + 3 * np.sin(x / 15)
    y = y_true + rng.normal(0, 0.3, len(x))
    model = LOESSRegression(n_kernels=6, polynomial_degree=1)
    model.fit(x, y)
    pred = model.predict(x)
    rmse = np.sqrt(np.mean((pred - y_true) ** 2))
    assert rmse < 0.5
    # extrapolation does not explode
    out = model.predict(np.array([-10.0, 120.0]))
    assert np.isfinite(out).all()


def test_loess_small_data():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = 2 * x
    m = LOESSRegression(n_kernels=6, polynomial_degree=1)
    m.fit(x, y)
    np.testing.assert_allclose(m.predict(x), y, atol=1e-6)


def test_estimator_ppm_calibration(rng):
    # simulate mz calibration: observed = library * (1 + 5ppm + noise)
    mz_lib = rng.uniform(400, 1000, 2000)
    mz_obs = mz_lib * (1 + 5e-6 + rng.normal(0, 1e-6, len(mz_lib)))
    df = pd.DataFrame({"mz_library": mz_lib, "mz_observed": mz_obs})
    est = CalibrationEstimator(
        name="mz",
        function=LOESSRegression(n_kernels=2, polynomial_degree=1),
        input_columns=["mz_library"],
        target_columns=["mz_observed"],
        output_columns=["mz_calibrated"],
        transform_deviation=1e6,
    )
    est.fit(df)
    assert est.is_fitted
    est.predict(df)
    assert "mz_calibrated" in df.columns
    # calibrated values should sit on observed within ~1 ppm
    ppm_res = (df.mz_observed - df.mz_calibrated) / df.mz_library * 1e6
    assert np.abs(np.median(ppm_res)) < 0.5
    # ci should reflect the 1ppm residual noise scale
    ci95 = est.ci(df, 0.95)
    assert 1.0 < ci95 < 4.0
    # metrics
    assert est.metrics["median_accuracy"] > 4.0  # explains the 5ppm shift
    assert est.metrics["median_precision"] < 1.5


def test_estimator_rt_calibration(rng):
    rt_lib = rng.uniform(0, 1, 1500)
    rt_obs = 1200 * rt_lib + 40 * np.sin(rt_lib * 6) + rng.normal(0, 5, len(rt_lib))
    df = pd.DataFrame({"rt_library": rt_lib, "rt_observed": rt_obs})
    est = CalibrationEstimator(
        name="rt",
        function=LOESSRegression(n_kernels=6, polynomial_degree=1),
        input_columns=["rt_library"],
        target_columns=["rt_observed"],
        output_columns=["rt_calibrated"],
    )
    est.fit(df)
    est.predict(df)
    resid = df.rt_observed - df.rt_calibrated
    assert resid.abs().median() < 8
    ci = est.ci(df, 0.95)
    assert 5 < ci < 30


def test_estimator_unfitted_predict():
    est = CalibrationEstimator(
        "x", LOESSRegression(), ["a"], ["b"], ["c"]
    )
    df = pd.DataFrame({"a": [1.0], "b": [1.0]})
    assert est.predict(df) is None
    assert est.ci(df) == 0.0


def test_loess_refit_restores_configured_complexity(rng):
    """A tiny early fit must not permanently degrade later large refits
    (the CalibrationManager reuses one estimator across recalibrations)."""
    m = LOESSRegression(n_kernels=6, polynomial_degree=1)
    m.fit(np.array([0.0, 1.0, 2.0, 3.0]), np.array([0.0, 1.0, 2.0, 3.0]))
    assert m.n_kernels < 6  # small-data reduction applied
    x = np.linspace(0, 100, 5000)
    y = np.sin(x / 15.0) * 5 + 0.05 * x
    m.fit(x, y)
    assert m.n_kernels == 6 and m.polynomial_degree == 1
    pred = m.predict(x)
    assert np.abs(pred - y).mean() < 0.5
