#!/usr/bin/env bash
# Simulation regression gate (parity: reference scripts/ci/regress.sh):
# bench each baselined example, export telemetry to CSV, diff against the
# stored baseline with per-metric tolerances.
#
# Usage:
#   scripts/regress.sh            # compare against scripts/baseline/
#   scripts/regress.sh --update   # (re)capture baselines
set -euo pipefail

cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORMS=cpu

EXAMPLES=(ball three-body stablehlo drone linalg rocket cube-sat)
TICKS=240
MODE="${1:-check}"

for ex in "${EXAMPLES[@]}"; do
  echo "== $ex =="
  out="/tmp/elodin-regress/$ex"
  rm -rf "$out"
  python scripts/export_example.py "$ex" "$TICKS" "$out"
  if [ "$MODE" = "--update" ]; then
    mkdir -p "scripts/baseline/$ex"
    cp "$out"/*.csv "scripts/baseline/$ex/"
    echo "baseline updated"
  else
    python scripts/compare_baseline_csv.py "scripts/baseline/$ex" "$out" \
      --tolerances scripts/baseline/tolerances.json
  fi
done
echo "regression gate: OK"
