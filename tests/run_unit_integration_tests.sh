#!/bin/bash
# Unit + integration test runner (reference analog: tests/run_unit_integration_tests.sh).
# Usage: ./run_unit_integration_tests.sh [all|unit|integration]
set -euo pipefail
cd "$(dirname "$0")"

TEST_TYPE=${1:-all}

run() {
    if python -c "import coverage" 2>/dev/null; then
        python -m coverage run --source=../alphadia_tpu -m pytest "$@" -q
        python -m coverage report | tail -5
    else
        python -m pytest "$@" -q
    fi
}

case "$(echo "$TEST_TYPE" | tr '[:upper:]' '[:lower:]')" in
    all) run unit integration ;;
    unit) run unit ;;
    integration) run integration ;;
    *) echo "unknown test type: $TEST_TYPE (all|unit|integration)"; exit 2 ;;
esac
