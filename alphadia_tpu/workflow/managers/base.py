"""Manager persistence base — the checkpoint/resume primitive.

(reference: alphadia/workflow/managers/base.py:17-111 — pickle save/load
with version check; reused when ``general.reuse_calibration``.)
"""

from __future__ import annotations

import pickle
from pathlib import Path

from alphadia_tpu import __version__
from alphadia_tpu.reporting import logger


class BaseManager:
    def __init__(self, path: str | Path | None = None, load_from_file: bool = False):
        self.path = str(path) if path is not None else None
        self._version = __version__
        self.is_loaded_from_file = False
        if load_from_file and self.path:
            self.load()

    def save(self) -> None:
        if not self.path:
            return
        Path(self.path).parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "wb") as f:
            pickle.dump(self, f)

    def load(self) -> None:
        if not self.path or not Path(self.path).exists():
            return
        try:
            with open(self.path, "rb") as f:
                loaded = pickle.load(f)
        except Exception as e:
            logger.warning(f"could not load manager from {self.path}: {e}")
            return
        if getattr(loaded, "_version", None) != self._version:
            logger.warning(
                f"manager at {self.path} was saved with version "
                f"{getattr(loaded, '_version', '?')}, not reusing"
            )
            return
        state = dict(loaded.__dict__)
        state.pop("path", None)
        self.__dict__.update(state)
        self.is_loaded_from_file = True
