"""Typed GUI parameter schema derived from config/default.yaml.

The reference's Electron GUI is driven by a workflow schema
(gui/workflows/PeptideCentric.v1.json: sections -> parameters with
id/name/default/description/type). Here the schema is built at runtime
straight from the packaged default.yaml — comment lines above each key
become its description — so the GUI can never drift from the actual
config surface (reference role: alphadia gui workflow definitions).
"""

from __future__ import annotations

import re
from pathlib import Path

import yaml

DEFAULT_YAML = Path(__file__).parents[1] / "config" / "default.yaml"

# sections surfaced in the GUI (order = display order); others stay CLI-only
SECTIONS = [
    ("general", "General"),
    ("tpu", "TPU Engine"),
    ("library_prediction", "Library Prediction"),
    ("search", "Search"),
    ("calibration", "Calibration"),
    ("search_initial", "Initial Search Tolerances"),
    ("fdr", "False Discovery Rate"),
    ("search_output", "Search Output"),
    ("multiplexing", "Multiplexing"),
    ("library_multiplexing", "Library Multiplexing"),
    ("transfer_library", "Transfer Library"),
    ("transfer_learning", "Transfer Learning"),
]

_ADVANCED = {"tpu", "search_initial", "transfer_library", "transfer_learning"}


# null defaults carry no type information; without an explicit entry the
# GUI would submit them as strings (np.random.default_rng("42") crashes)
_NULL_TYPES = {
    ("general", "random_state"): "integer",
    ("general", "profile_directory"): "string",
    ("tpu", "mesh_devices"): "integer",
    ("library_prediction", "peptdeep_model_path"): "string",
    ("optimization", "order_of_optimization"): "list",
}


def _type_of(v, section=None, key=None):
    if v is None:
        return _NULL_TYPES.get((section, key), "string")
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "float"
    if isinstance(v, list):
        return "list"
    return "string"


def _title(key: str) -> str:
    return key.replace("_", " ").title().replace("Tpu", "TPU").replace(
        "Fdr", "FDR"
    ).replace("Mz", "m/z").replace("Ms1", "MS1").replace("Ms2", "MS2").replace(
        "Rt", "RT"
    )


def _parse_comments(yaml_text: str) -> dict[tuple[str, str], str]:
    """(section, key) -> comment text of the lines directly above the key."""
    comments: dict[tuple[str, str], str] = {}
    section = None
    pending: list[str] = []
    for line in yaml_text.splitlines():
        m_sec = re.match(r"^(\w[\w_]*):\s*(#.*)?$", line)
        m_key = re.match(r"^  (\w[\w_]*):\s*(.+?)\s*(#.*)?$", line)
        m_com = re.match(r"^\s*#\s?(.*)$", line)
        if m_sec:
            section = m_sec.group(1)
            pending = []
        elif m_com:
            pending.append(m_com.group(1))
        elif m_key and section:
            if pending:
                comments[(section, m_key.group(1))] = " ".join(pending)
            pending = []
        else:
            pending = []
    return comments


def build_schema() -> dict:
    """Build the full workflow schema (sections, parameters, IO slots)."""
    text = DEFAULT_YAML.read_text()
    cfg = yaml.safe_load(text)
    comments = _parse_comments(text)

    config_sections = []
    for sec_id, sec_name in SECTIONS:
        params = [
            {
                "id": key,
                "name": _title(key),
                "default": val,
                "description": comments.get((sec_id, key), ""),
                "type": _type_of(val, sec_id, key),
            }
            for key, val in (cfg.get(sec_id) or {}).items()
        ]
        config_sections.append(
            {
                "id": sec_id,
                "name": sec_name,
                "hidden": False,
                "advanced": sec_id in _ADVANCED,
                "parameters": params,
            }
        )
    return {
        "library": {"active": True, "required": False, "path": ""},
        "fasta_list": {"active": True, "required": False, "path": []},
        "raw_path_list": {"active": True, "required": True, "path": []},
        "output_directory": {"active": True, "required": True, "path": ""},
        "config": config_sections,
    }
