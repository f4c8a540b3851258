"""Diff exported telemetry CSVs against stored baselines with per-metric
tolerances (parity: reference scripts/ci/compare_baseline_csv.py +
scripts/ci/baseline/tolerances.json)."""

import argparse
import csv
import json
import math
import os
import sys


def load_csv(path):
    with open(path) as f:
        rows = list(csv.reader(f))
    header, data = rows[0], rows[1:]
    cols = {h: [] for h in header}
    for row in data:
        for h, v in zip(header, row):
            try:
                cols[h].append(float(v))
            except ValueError:
                cols[h].append(float("nan"))
    return cols


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline_dir")
    ap.add_argument("actual_dir")
    ap.add_argument("--tolerances", default=None)
    args = ap.parse_args()

    tol = {"value": {"abs": 1e-4, "rel": 1e-4}}
    if args.tolerances and os.path.exists(args.tolerances):
        tol.update(json.load(open(args.tolerances)))
    abs_tol = tol["value"]["abs"]
    rel_tol = tol["value"]["rel"]

    failures = []
    baselines = [f for f in os.listdir(args.baseline_dir) if f.endswith(".csv")]
    if not baselines:
        print("no baselines stored; run scripts/regress.sh --update first")
        sys.exit(1)
    for fname in baselines:
        base = load_csv(os.path.join(args.baseline_dir, fname))
        actual_path = os.path.join(args.actual_dir, fname)
        if not os.path.exists(actual_path):
            failures.append(f"{fname}: missing from actual export")
            continue
        act = load_csv(actual_path)
        for col in base:
            if col == "time" or col not in act:
                continue
            b, a = base[col], act[col]
            n = min(len(b), len(a))
            if len(b) != len(a):
                failures.append(f"{fname}:{col}: row count {len(a)} vs {len(b)}")
            for i in range(n):
                if math.isnan(b[i]) and math.isnan(a[i]):
                    continue
                d = abs(b[i] - a[i])
                scale = max(abs(b[i]), abs(a[i]))
                if d > abs_tol and (scale == 0 or d / scale > rel_tol):
                    failures.append(
                        f"{fname}:{col}[{i}]: {a[i]} vs baseline {b[i]} "
                        f"(abs {d:.3e})"
                    )
                    break
    if failures:
        print("REGRESSION FAILURES:")
        for f in failures:
            print(" ", f)
        sys.exit(1)
    print(f"{len(baselines)} baselined files match within tolerance")


if __name__ == "__main__":
    main()
