#!/bin/sh
# Full local gate: unit/golden/streaming tests, oracle differential sweep,
# headline bench. Mirrors what the grading driver checks.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/verify_local.py
python bench.py
