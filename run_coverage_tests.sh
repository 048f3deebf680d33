#!/usr/bin/env bash
# Coverage run over the test suite (reference: run_coverage_tests.sh).
set -euo pipefail
coverage run -m pytest tests/ -q
coverage report -m --include="runia_core_tpu/*"
coverage xml -o coverage.xml || true
