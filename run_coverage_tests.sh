#!/usr/bin/env bash
# Coverage run over the test suite (reference: run_coverage_tests.sh).
# Falls back to a plain test run where coverage.py isn't installed.
set -euo pipefail
if command -v coverage >/dev/null 2>&1; then
    coverage run -m pytest tests/ -q
    coverage report -m --include="runia_core_tpu/*"
    coverage xml -o coverage.xml || true
else
    echo "coverage.py not installed; running plain pytest" >&2
    python -m pytest tests/ -q
fi
