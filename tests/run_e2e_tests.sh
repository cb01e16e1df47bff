#!/bin/bash
# End-to-end test runner (reference analog: tests/run_e2e_tests.sh).
# Full searches over synthetic raw data + libraries through the CLI layer.
set -euo pipefail
cd "$(dirname "$0")"
python -m pytest e2e -q
