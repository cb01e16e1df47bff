"""Wall-clock phase timings (reference:
alphadia/workflow/managers/timing_manager.py:10-43 + the
``@use_timing_manager`` decorator pattern)."""

from __future__ import annotations

import time
from functools import wraps

import pandas as pd

from alphadia_tpu.workflow.managers.base import BaseManager


class TimingManager(BaseManager):
    def __init__(self, path=None, load_from_file=False):
        super().__init__(path, load_from_file)
        if self.is_loaded_from_file:
            return
        self.timings: dict[str, dict] = {}

    def set_start_time(self, phase: str) -> None:
        self.timings.setdefault(phase, {})["start"] = time.time()

    def set_end_time(self, phase: str) -> None:
        rec = self.timings.setdefault(phase, {})
        rec["end"] = time.time()
        rec["duration"] = rec["end"] - rec.get("start", rec["end"])

    def to_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {"phase": k, "duration": v.get("duration", float("nan"))}
                for k, v in self.timings.items()
            ]
        )


def use_timing_manager(phase: str):
    """Decorator timing a workflow method into self.timing_manager.

    Also annotates the span in an active jax profiler trace so the
    device timeline and stat.tsv phase durations line up (SURVEY §5).
    """

    def deco(fn):
        @wraps(fn)
        def wrapper(self, *args, **kwargs):
            from alphadia_tpu.utils.profiling import annotate

            tm = getattr(self, "timing_manager", None)
            if tm is not None:
                tm.set_start_time(phase)
            try:
                with annotate(f"alphadia_tpu.{phase}"):
                    return fn(self, *args, **kwargs)
            finally:
                if tm is not None:
                    tm.set_end_time(phase)
                    tm.save()

        return wrapper

    return deco
