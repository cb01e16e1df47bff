#!/bin/bash
# Tutorial-notebook runner (reference analog: tests/run_nb_tests.sh).
# Executes every notebook under nbs/tutorial_nbs headlessly; finetuning is
# excluded (it trains a model and takes minutes, same exclusion as the
# reference runner).
set -euo pipefail
cd "$(dirname "$0")/.."

python - <<'EOF'
import sys
import time
from pathlib import Path

import nbformat
from nbclient import NotebookClient

failed = []
for path in sorted(Path("nbs/tutorial_nbs").glob("*.ipynb")):
    if path.name == "finetuning.ipynb":
        print(f"SKIP {path.name} (slow; run manually)")
        continue
    t0 = time.time()
    nb = nbformat.read(path, as_version=4)
    try:
        NotebookClient(nb, timeout=600, kernel_name="python3").execute()
        print(f"OK   {path.name} ({time.time() - t0:.1f}s)")
    except Exception as e:
        print(f"FAIL {path.name}: {e}")
        failed.append(path.name)
sys.exit(1 if failed else 0)
EOF
