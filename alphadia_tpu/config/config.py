"""Layered configuration system.

Behavioral contract (reference: alphadia/workflow/config.py:34-460):

- a ``Config`` is a nested dict initialised from the packaged default YAML;
- subsequent layers (user file < CLI dict < multistep extras) are applied in
  order with ``update()``;
- an update may never ADD a key that is absent from the defaults
  (``KeyAddedConfigError``) and may never CHANGE the type of a value
  (``TypeMismatchConfigError``; int→float widening and assignments to/None
  are allowed);
- each applied layer is remembered by name so the effective config can be
  pretty-printed with provenance;
- the effective config can be frozen to ``frozen_config.yaml`` in the output
  directory.
"""

from __future__ import annotations

import copy
import json
from collections import UserDict
from pathlib import Path
from typing import Any

import yaml

from alphadia_tpu.exceptions import KeyAddedConfigError, TypeMismatchConfigError

DEFAULT_CONFIG_PATH = Path(__file__).parent / "default.yaml"

# keys that may be set from CLI even though they default to null/empty
_PERMISSIVE_TYPES = (type(None),)

# removed config keys still tolerated in user files (warn + ignore), so old
# configs keep loading (reference: workflow/config.py:176-199 TOLERATED_KEYS)
TOLERATED_KEYS = {
    "general.astral_ms1",
    "general.mmap_detector_events",
    "fdr.enable_two_step_classifier",
    "fdr.two_step_classifier_max_iterations",
    "scoring_config",
    "selection_config",
    # superseded by the fixed window-bucket grid (utils/device.py
    # WINDOW_BUCKETS) which already bounds recompiles
    "tpu.cycle_pad",
    # reference-engine knobs without a TPU-build equivalent: device
    # selection is the JAX platform, and there is one extraction backend
    "general.use_gpu",
    "search.extraction_backend",
}


def _compatible(old: Any, new: Any) -> bool:
    """True when `new` may replace `old` without a type change."""
    if old is None or new is None:
        return True
    if isinstance(old, bool) or isinstance(new, bool):
        return isinstance(old, bool) and isinstance(new, bool)
    if isinstance(old, (int, float)) and isinstance(new, (int, float)):
        return True
    return type(old) is type(new)


def _deep_update(
    base: dict, patch: dict, source: str, path: str = ""
) -> list[tuple[str, Any, Any]]:
    """Recursively apply `patch` onto `base` in place.

    Returns list of (dotted_key, old, new) for provenance tracking.
    Raises on unknown keys or incompatible types.
    """
    changes: list[tuple[str, Any, Any]] = []
    for key, new_val in patch.items():
        dotted = f"{path}.{key}" if path else str(key)
        if key not in base:
            if dotted in TOLERATED_KEYS:
                from alphadia_tpu.reporting import logger

                logger.warning(
                    f"config key '{dotted}' was removed and is ignored "
                    f"(from {source})"
                )
                continue
            raise KeyAddedConfigError(dotted, source)
        old_val = base[key]
        if isinstance(old_val, dict) and isinstance(new_val, dict):
            changes += _deep_update(old_val, new_val, source, dotted)
        elif isinstance(old_val, dict) != isinstance(new_val, dict):
            raise TypeMismatchConfigError(dotted, type(old_val), new_val, source)
        else:
            if not _compatible(old_val, new_val):
                raise TypeMismatchConfigError(dotted, type(old_val), new_val, source)
            if old_val != new_val:
                changes.append((dotted, copy.deepcopy(old_val), copy.deepcopy(new_val)))
            base[key] = copy.deepcopy(new_val)
    return changes


class Config(UserDict):
    """Nested configuration with strict layered updates and provenance."""

    def __init__(self, data: dict | None = None, name: str = "default"):
        super().__init__(copy.deepcopy(data) if data else {})
        self.name = name
        # provenance: list of (layer_name, [(key, old, new), ...])
        self.layers: list[tuple[str, list[tuple[str, Any, Any]]]] = []

    # -- IO ------------------------------------------------------------
    @classmethod
    def from_yaml(cls, path: str | Path, name: str | None = None) -> "Config":
        path = Path(path)
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return cls(data, name=name or path.stem)

    @classmethod
    def from_json(cls, text: str, name: str = "json") -> "Config":
        return cls(json.loads(text), name=name)

    def to_yaml(self, path: str | Path) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.data, f, sort_keys=False)

    # -- layered update ------------------------------------------------
    def update_layer(self, patch: dict | "Config", name: str = "update") -> None:
        """Apply one configuration layer; strict keys and types."""
        if isinstance(patch, Config):
            name = patch.name if name == "update" else name
            patch = patch.data
        changes = _deep_update(self.data, patch, name)
        self.layers.append((name, changes))

    def update_layers(self, patches: list[tuple[str, dict]]) -> None:
        for name, patch in patches:
            if patch:
                self.update_layer(patch, name)

    # -- access helpers ------------------------------------------------
    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self.data
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value: Any) -> None:
        """Restricted setter used by orchestration (key must already exist)."""
        parts = dotted.split(".")
        node = self.data
        for part in parts[:-1]:
            node = node[part]
        if parts[-1] not in node:
            raise KeyAddedConfigError(dotted, "set_path")
        node[parts[-1]] = value

    # -- provenance pretty print ---------------------------------------
    def modified_summary(self) -> str:
        lines = []
        for layer_name, changes in self.layers:
            for key, old, new in changes:
                lines.append(f"  [{layer_name}] {key}: {old!r} -> {new!r}")
        return "\n".join(lines) if lines else "  (defaults)"


def load_default_config() -> Config:
    """Load the packaged default configuration, stamping the version."""
    from alphadia_tpu import __version__

    cfg = Config.from_yaml(DEFAULT_CONFIG_PATH, name="default")
    cfg["version"] = __version__
    return cfg
