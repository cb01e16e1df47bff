"""jax profiler hooks: trace capture + phase annotation (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from alphadia_tpu.utils.profiling import annotate, profile_trace


def test_profile_trace_none_is_noop():
    with profile_trace(None):
        pass


def test_profile_trace_writes_trace(tmp_path):
    log_dir = tmp_path / "trace"
    with profile_trace(str(log_dir)):
        with annotate("unit-test-span"):
            x = jnp.ones((64, 64))
            float(jnp.sum(x @ x))
    # the CPU backend writes a plugins/profile/<ts>/ tree
    produced = list(log_dir.rglob("*"))
    assert produced, "no trace files written"


def test_annotate_outside_trace_is_safe():
    with annotate("no-active-trace"):
        assert float(jnp.sum(jnp.arange(4.0))) == 6.0


def test_workflow_phase_lands_in_timing_manager(tmp_path):
    from alphadia_tpu.workflow.managers.timing_manager import (
        TimingManager,
        use_timing_manager,
    )

    class W:
        timing_manager = TimingManager(path=str(tmp_path / "tm.pkl"))

        @use_timing_manager("demo")
        def work(self):
            return np.int64(7)

    w = W()
    assert w.work() == 7
    assert "demo" in w.timing_manager.timings
    assert w.timing_manager.timings["demo"]["duration"] >= 0
