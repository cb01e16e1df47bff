"""Dump the GUI parameter schema to gui/workflows/PeptideCentric.v1.json.

The schema itself is built at runtime by alphadia_tpu.gui.schema (the
live GUI always reflects the packaged default.yaml); this script just
materializes a copy for inspection / external tooling.

Run: python scripts/generate_gui_schema.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from alphadia_tpu.gui.schema import build_schema  # noqa: E402

OUT = Path(__file__).parents[1] / "gui" / "workflows" / "PeptideCentric.v1.json"


def main() -> None:
    schema = build_schema()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(schema, indent=1) + "\n")
    n = sum(len(s["parameters"]) for s in schema["config"])
    print(f"wrote {OUT} ({len(schema['config'])} sections, {n} parameters)")


if __name__ == "__main__":
    sys.exit(main())
