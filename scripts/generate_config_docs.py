"""Generate docs/config.md — the parameter reference — from the live
schema (gui/schema.py builds it from config/default.yaml + its comments,
so the doc can never drift from the code).

Run: python scripts/generate_config_docs.py
"""

from __future__ import annotations

from pathlib import Path

from alphadia_tpu.gui.schema import build_schema

OUT = Path(__file__).resolve().parents[1] / "docs" / "config.md"

HEADER = """\
# Configuration reference

Generated from `alphadia_tpu/config/default.yaml` by
`scripts/generate_config_docs.py` — do not edit by hand.

Config is layered (reference: alphaDIA's multistep config merge): the
defaults below, then `--config <yaml>`, then `--config-dict <json>`, then
CLI flags. Unknown keys fail validation (strict mode); removed legacy
keys warn and are dropped.

Set any parameter under its section, e.g.

```yaml
search:
  target_ms2_tolerance: 15.0
tpu:
  scoring_batch: 4096
```
"""


def fmt_default(v) -> str:
    if v is None:
        return "`null`"
    if isinstance(v, bool):
        return "`true`" if v else "`false`"
    if isinstance(v, list):
        return "`" + repr(v) + "`"
    return f"`{v}`"


def main() -> None:
    schema = build_schema()
    lines = [HEADER]
    for sec in schema["config"]:
        tag = " *(advanced)*" if sec.get("advanced") else ""
        lines.append(f"\n## `{sec['id']}` — {sec['name']}{tag}\n")
        lines.append("| Parameter | Default | Type | Description |")
        lines.append("|---|---|---|---|")
        for p in sec["parameters"]:
            desc = (p["description"] or "").replace("|", "\\|")
            lines.append(
                f"| `{p['id']}` | {fmt_default(p['default'])} "
                f"| {p['type']} | {desc} |"
            )
    n_params = sum(len(s["parameters"]) for s in schema["config"])
    lines.append(
        f"\n---\n{n_params} parameters across "
        f"{len(schema['config'])} sections.\n"
    )
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({n_params} parameters)")


if __name__ == "__main__":
    main()
