#!/usr/bin/env bash
# Scrape and compare result trees (reference scripts/report.sh).
set -e
ROOT="${1:-results}"
python scripts/report.py --results_root "$ROOT"
