"""Optimization lock + automatic/targeted optimizer behavior contracts."""

import numpy as np
import pandas as pd
import pytest

from alphadia_tpu.config import load_default_config
from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.workflow.managers.calibration_manager import CalibrationManager
from alphadia_tpu.workflow.managers.optimization_manager import OptimizationManager
from alphadia_tpu.workflow.optimizers.automatic import (
    AutomaticMS2Optimizer,
    AutomaticRTOptimizer,
)
from alphadia_tpu.workflow.optimizers.optimization_lock import OptimizationLock
from alphadia_tpu.workflow.optimizers.targeted import TargetedMS2Optimizer


def _library(n_eg=2500, per_eg=2):
    n = n_eg * per_eg
    prec = pd.DataFrame(
        {
            "precursor_idx": np.arange(n, dtype=np.uint32),
            "elution_group_idx": np.repeat(np.arange(n_eg, dtype=np.uint32), per_eg),
            "decoy": np.tile([0, 1], n // 2).astype(np.uint8),
            "flat_frag_start_idx": (np.arange(n) * 3).astype(np.uint32),
            "flat_frag_stop_idx": ((np.arange(n) + 1) * 3).astype(np.uint32),
        }
    )
    frag = pd.DataFrame({"mz_library": np.zeros(3 * n, np.float32)})
    return SpecLibFlat(prec, frag)


def test_batch_plan_doubles():
    plan = OptimizationLock._get_batch_plan(10_000, 1000)
    assert plan == [(0, 1000), (1000, 3000), (3000, 7000), (7000, 10_000)]
    assert OptimizationLock._get_batch_plan(500, 1000) == [(0, 500)]


def test_optlock_shuffle_deterministic():
    cfg = load_default_config()
    cfg.set_path("calibration.batch_size", 100)
    lib = _library()
    lock_a = OptimizationLock(lib, cfg)
    lock_b = OptimizationLock(lib, cfg)
    np.testing.assert_array_equal(
        lock_a._elution_group_order, lock_b._elution_group_order
    )
    # seed 772 shuffle is not the identity
    assert not np.array_equal(
        lock_a._elution_group_order, np.arange(len(lock_a._elution_group_order))
    )


def test_optlock_growth_and_reset():
    cfg = load_default_config()
    cfg.set_path("calibration.batch_size", 100)
    cfg.set_path("calibration.optimization_lock_target", 50)
    lib = _library(n_eg=1000)
    lock = OptimizationLock(lib, cfg)
    assert lock.stop_idx - lock.start_idx == 100
    # not enough precursors -> batches grow
    lock.update_with_fdr(pd.DataFrame({"qval": [0.5], "decoy": [0]}))
    assert not lock.has_target_num_precursors
    lock.update()
    assert lock.stop_idx - lock.start_idx == 200
    # target reached -> lock re-extracts cumulatively from 0
    lock.update_with_fdr(
        pd.DataFrame({"qval": np.zeros(60), "decoy": np.zeros(60)})
    )
    assert lock.has_target_num_precursors
    lock.update()
    assert lock.start_idx == 0


class _FakeEstimator:
    def __init__(self, ci_value):
        self._ci = ci_value
        self.is_fitted = True

    def ci(self, df, p):
        return self._ci


class _FakeCalibration:
    def __init__(self, ci_value):
        self.est = _FakeEstimator(ci_value)

    def get_estimator(self, group, name):
        return self.est


class _FakeFdr:
    current_version = 0


class _FakeLock:
    total_elution_groups = 100
    batch_idx = 0


def _om(cfg):
    return OptimizationManager(cfg, gradient_length=1000.0)


def test_automatic_optimizer_converges_on_plateau():
    cfg = load_default_config()
    cfg.set_path("calibration.min_steps", 2)
    om = _om(cfg)
    opt = AutomaticMS2Optimizer(
        30.0, cfg, om, _FakeCalibration(8.0), _FakeFdr(), _FakeLock()
    )
    prec = pd.DataFrame({"precursor_idx": np.arange(50)})
    frag = pd.DataFrame({"mz_library": np.zeros(10)})
    # identical feature values every step -> ms2 uses try_narrower_values:
    # parameter stabilizes at update_factor * ci -> converges on <5% change
    for _ in range(6):
        if opt.has_converged:
            break
        opt.step(prec, frag)
    assert opt.has_converged
    # converged parameter restored from the optimum row
    assert om.ms2_error == pytest.approx(opt.history_df["parameter"].iloc[
        opt._find_index_of_optimum()
    ])


def test_targeted_optimizer_reaches_target():
    cfg = load_default_config()
    cfg.set_path("calibration.min_steps", 2)
    om = _om(cfg)
    opt = TargetedMS2Optimizer(
        30.0, 10.0, cfg, om, _FakeCalibration(5.0), _FakeFdr()
    )
    prec = pd.DataFrame({"precursor_idx": np.arange(10)})
    frag = pd.DataFrame({"mz_library": np.zeros(5)})
    opt.step(prec, frag)
    assert not opt.has_converged  # min_steps not reached
    opt.step(prec, frag)
    assert opt.has_converged
    # proposal = factor * max(ci, target) = 1.0 * 10.0
    assert om.ms2_error == pytest.approx(10.0)


def _history(opt, rows):
    """Seed an optimizer history: rows = [(parameter, feature), ...]."""
    opt.history_df = pd.DataFrame(
        [
            {
                "parameter": p,
                opt._feature_name: f,
                "classifier_version": i,
                "score_cutoff": 10.0 + i,
                "fwhm_rt": 5.0 + i,
                "fwhm_mobility": 0.1 * i,
                "batch_idx": i,
            }
            for i, (p, f) in enumerate(rows)
        ]
    )


def test_favour_narrower_optimum_picks_narrowest_within_threshold():
    """(reference automatic.py: narrowest parameter within
    maximum_decrease_from_maximum of the best feature wins)"""
    cfg = load_default_config()
    cfg.set_path("optimization.rt_error.favour_narrower_optimum", True)
    cfg.set_path("optimization.rt_error.maximum_decrease_from_maximum", 0.1)
    om = _om(cfg)
    opt = AutomaticRTOptimizer(
        100.0, cfg, om, _FakeCalibration(8.0), _FakeFdr(), _FakeLock()
    )
    assert opt._favour_narrower_optimum
    # rows: wide 200 scores best (105), but narrow 60 is within 10% -> wins
    _history(opt, [(200.0, 105.0), (120.0, 100.0), (60.0, 98.0), (30.0, 50.0)])
    i = opt._find_index_of_optimum()
    assert opt.history_df["parameter"].loc[i] == 60.0


def test_favour_narrower_optimum_falls_back_to_max():
    cfg = load_default_config()
    cfg.set_path("optimization.rt_error.favour_narrower_optimum", True)
    om = _om(cfg)
    opt = AutomaticRTOptimizer(
        100.0, cfg, om, _FakeCalibration(8.0), _FakeFdr(), _FakeLock()
    )
    # degenerate: nothing passes the threshold filter (all equal-negative)
    _history(opt, [(200.0, -1.0), (100.0, -1.0)])
    i = opt._find_index_of_optimum()
    assert i in opt.history_df.index


def test_update_workflow_restores_full_optimum_row_state():
    """Convergence must restore classifier version / cutoff / fwhm / batch
    from the OPTIMUM row, not the last row."""
    cfg = load_default_config()
    om = _om(cfg)
    lock = _FakeLock()
    opt = AutomaticMS2Optimizer(
        30.0, cfg, om, _FakeCalibration(8.0), _FakeFdr(), lock
    )
    _history(opt, [(30.0, 200.0), (15.0, 190.0), (10.0, 100.0)])
    opt._update_workflow()
    i = opt._find_index_of_optimum()
    row = opt.history_df.loc[i]
    assert om.ms2_error == row["parameter"]
    assert om.classifier_version == row["classifier_version"]
    assert om.score_cutoff == row["score_cutoff"]
    assert om.fwhm_rt == row["fwhm_rt"]
    assert lock.batch_idx == row["batch_idx"]
    assert i != opt.history_df.index[-1]  # genuinely not the last row


def test_skip_converges_after_max_skips():
    """Repeated skips (batch grew past the lock target) finish the
    optimizer once min_steps were done (reference skip() semantics)."""
    cfg = load_default_config()
    cfg.set_path("calibration.min_steps", 1)
    cfg.set_path("calibration.max_skips", 1)
    om = _om(cfg)
    opt = AutomaticMS2Optimizer(
        30.0, cfg, om, _FakeCalibration(8.0), _FakeFdr(), _FakeLock()
    )
    prec = pd.DataFrame({"precursor_idx": np.arange(50)})
    frag = pd.DataFrame({"mz_library": np.zeros(10)})
    opt.step(prec, frag)
    assert not opt.has_converged
    opt.skip()
    assert not opt.has_converged  # 1 skip <= max_skips
    opt.skip()
    assert opt.has_converged


def test_try_narrower_convergence_on_feature_drop():
    """ms2 try_narrower_values: two consecutive drops beyond
    maximal_decrease end the scan (and the optimum row is restored)."""
    cfg = load_default_config()
    cfg.set_path("calibration.min_steps", 1)
    om = _om(cfg)
    opt = AutomaticMS2Optimizer(
        30.0, cfg, om, _FakeCalibration(4.0), _FakeFdr(), _FakeLock()
    )
    assert opt._try_narrower_values
    _history(opt, [(30.0, 200.0), (15.0, 210.0)])
    opt._num_prev_optimizations = 3
    # next feature value collapses far below both previous rows
    prec = pd.DataFrame({"precursor_idx": np.arange(20)})
    frag = pd.DataFrame({"mz_library": np.zeros(5)})
    # monkey-patch the feature: history update reads _get_feature_value
    opt._get_feature_value = lambda p, f: 50.0
    opt.step(prec, frag)
    assert opt.has_converged
    # optimum = the 15.0 row (feature 210), not the collapsed last row
    assert om.ms2_error == 15.0


def test_zero_ci_keeps_current_tolerance():
    """When the calibration fit failed (unfitted estimator -> ci()=0),
    the proposal must keep the current tolerance instead of writing a
    zero search window."""
    cfg = load_default_config()
    om = OptimizationManager(cfg, gradient_length=1000.0)
    om.update(ms2_error=30.0)
    opt = AutomaticMS2Optimizer(
        30.0, cfg, om, _FakeCalibration(0.0), _FakeFdr(), _FakeLock()
    )
    proposal = opt._propose_new_parameter(pd.DataFrame({"x": [1.0]}))
    assert proposal == pytest.approx(30.0)
