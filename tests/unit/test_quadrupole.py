"""Per-run quadrupole fitting (search/quadrupole.py).

Reference contract: SimpleQuadrupole fits shared (sigma1, sigma2,
delta_mu1, delta_mu2) of a logistic rectangle over (window lo, window hi,
m/z, transmission) samples (quadrupole.py:163-207).
"""

import numpy as np
import pandas as pd

from alphadia_tpu.search.quadrupole import (
    QuadrupoleCalibration,
    fit_quadrupole_params,
    harvest_transmission,
    logistic_rectangle_np,
)


def _make_samples(sigma, delta, n=2000, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(400, 900, n)
    width = rng.uniform(8, 25, n)
    hi = lo + width
    # concentrate samples around the edges where the parameters matter
    x = np.where(
        rng.random(n) < 0.5,
        lo + rng.normal(0, 2.0, n),
        hi + rng.normal(0, 2.0, n),
    )
    y = logistic_rectangle_np(lo + delta[0], hi + delta[1], sigma[0], sigma[1], x)
    y = np.clip(y + rng.normal(0, noise, n), 0, 1)
    return lo, hi, x, y


def test_fit_recovers_known_edge_widths():
    true_sigma, true_delta = (0.45, 0.8), (0.6, -0.4)
    lo, hi, x, y = _make_samples(true_sigma, true_delta)
    sigma, delta = fit_quadrupole_params(lo, hi, x, y)
    assert np.allclose(sigma, true_sigma, atol=0.02)
    assert np.allclose(delta, true_delta, atol=0.02)


def test_fit_robust_to_noise():
    true_sigma, true_delta = (0.3, 0.5), (0.2, 0.1)
    lo, hi, x, y = _make_samples(true_sigma, true_delta, n=5000, noise=0.05)
    sigma, delta = fit_quadrupole_params(lo, hi, x, y)
    assert np.allclose(sigma, true_sigma, atol=0.1)
    assert np.allclose(delta, true_delta, atol=0.15)


def test_harvest_transmission_from_overlap_windows():
    """Candidates seen in two overlapping quad windows yield transmission
    fractions; well-centered single-window candidates anchor the plateau."""
    rng = np.random.default_rng(3)
    n = 400
    # two adjacent windows [500, 510], [509, 519]; overlap region 509-510
    mz = rng.uniform(505.0, 512.0, n)
    true = QuadrupoleCalibration(sigma=np.array([0.5, 0.5]))
    t0 = true.predict(np.full(n, 500.0), np.full(n, 510.0), mz)
    t1 = true.predict(np.full(n, 509.0), np.full(n, 519.0), mz)
    base = rng.uniform(1e3, 1e5, n)
    df = pd.DataFrame(
        {
            "mz_library": mz,
            "obs_intensity_0": base * t0,
            "obs_intensity_1": base * t1,
            "obs_win_lo_0": 500.0,
            "obs_win_hi_0": 510.0,
            "obs_win_lo_1": 509.0,
            "obs_win_hi_1": 519.0,
        }
    )
    data = harvest_transmission(df)
    assert data is not None
    assert data["n_multi"] >= 2 * n * 0.9  # almost all rows have 2 windows
    # fitted sigma should land near the generating sigma
    quad = QuadrupoleCalibration().fit(
        data["mu1"], data["mu2"], data["x"], data["y"]
    )
    assert 0.2 < quad.sigma[0] < 1.2
    assert 0.2 < quad.sigma[1] < 1.2


def test_harvest_returns_none_without_columns():
    assert harvest_transmission(pd.DataFrame({"mz_library": [500.0]})) is None


def test_calibrated_cycle_widens_windows():
    cycle = np.zeros((1, 3, 1, 2))
    cycle[0, 0] = [-1.0, -1.0]  # ms1 slot untouched
    cycle[0, 1] = [500.0, 510.0]
    cycle[0, 2] = [510.0, 520.0]
    quad = QuadrupoleCalibration(sigma=np.array([1.0, 1.0]))
    cal = quad.calibrated_cycle(cycle, threshold=0.01)
    assert cal[0, 0, 0, 0] == -1.0
    assert cal[0, 1, 0, 0] < 500.0 - 1.0  # 1% contour is several sigma out
    assert cal[0, 1, 0, 1] > 510.0 + 1.0
    assert cal[0, 2, 0, 1] > 520.0 + 1.0


def test_recalibration_handler_updates_quad_params():
    """RecalibrationHandler pushes fitted params into OptimizationManager."""
    from alphadia_tpu.config import load_default_config
    from alphadia_tpu.workflow.managers.calibration_manager import (
        CalibrationManager,
    )
    from alphadia_tpu.workflow.managers.optimization_manager import (
        OptimizationManager,
    )
    from alphadia_tpu.workflow.peptidecentric.recalibration_handler import (
        RecalibrationHandler,
    )

    config = load_default_config()
    config["search"]["quadrupole_fit"] = True
    om = OptimizationManager(config, gradient_length=1200.0)
    cm = CalibrationManager()

    rng = np.random.default_rng(5)
    n = 600
    mz = rng.uniform(500.0, 512.0, n)
    true = QuadrupoleCalibration(sigma=np.array([0.6, 0.6]))
    t0 = true.predict(np.full(n, 500.0), np.full(n, 510.0), mz)
    t1 = true.predict(np.full(n, 509.0), np.full(n, 519.0), mz)
    base = rng.uniform(1e3, 1e5, n)
    psm = pd.DataFrame(
        {
            "precursor_idx": np.arange(n),
            "mz_library": mz,
            "mz_observed": mz,
            "rt_library": rng.uniform(0, 1200, n),
            "rt_observed": rng.uniform(0, 1200, n),
            "score": rng.uniform(1, 10, n),
            "cycle_fwhm": np.full(n, 5.0),
            "mobility_fwhm": np.zeros(n),
            "obs_intensity_0": base * t0,
            "obs_intensity_1": base * t1,
            "obs_win_lo_0": 500.0,
            "obs_win_hi_0": 510.0,
            "obs_win_lo_1": 509.0,
            "obs_win_hi_1": 519.0,
        }
    )
    frag = pd.DataFrame(
        {
            "mz_library": rng.uniform(200, 1200, 50),
            "mz_observed": rng.uniform(200, 1200, 50),
            "correlation": np.full(50, 0.9),
            "height": rng.uniform(1e3, 1e5, 50),
        }
    )
    handler = RecalibrationHandler(config, om, cm)
    handler.recalibrate(psm, frag)
    assert om.quad_sigma != (0.2, 0.2)  # fit ran and moved the params
    assert 0.2 < om.quad_sigma[0] < 2.0


def test_delta_mu_bounded():
    """Ill-conditioned observation sets (hard-edged synthetic windows, few
    overlap samples) must not drift delta_mu to unphysical offsets."""
    rng = np.random.default_rng(9)
    n = 60
    lo = np.full(n, 500.0)
    hi = np.full(n, 510.0)
    # degenerate y: all ~1 regardless of x (no edge information at all)
    x = rng.uniform(500.5, 509.5, n)
    y = np.ones(n)
    sigma, delta = fit_quadrupole_params(lo, hi, x, y)
    assert np.all(np.abs(delta) <= 1.0 + 1e-9), delta
    assert np.all((sigma >= 0.02) & (sigma <= 10.0)), sigma
