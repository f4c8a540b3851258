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
        # deep-merge so a partial override ({"value": {"abs": ...}}) keeps
        # the other default instead of KeyError'ing; per-column entries
        # ({"ball.wind": {...}}) override the global "value" tolerance
        for k, v in json.load(open(args.tolerances)).items():
            merged = dict(tol.get(k) or tol["value"])
            merged.update(v if isinstance(v, dict) else {})
            tol[k] = merged

    def tols_for(col):
        t = tol.get(col, tol["value"])
        return t.get("abs", tol["value"]["abs"]), t.get("rel", tol["value"]["rel"])

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
            if col == "time":
                continue
            if col not in act:
                # a vanished column is a regression, not a skip — renamed
                # or dropped telemetry must not pass the gate silently
                failures.append(f"{fname}:{col}: column missing from export")
                continue
            abs_tol, rel_tol = tols_for(col)
            b, a = base[col], act[col]
            n = min(len(b), len(a))
            if len(b) != len(a):
                failures.append(f"{fname}:{col}: row count {len(a)} vs {len(b)}")
            for i in range(n):
                if math.isnan(b[i]) and math.isnan(a[i]):
                    continue
                if math.isnan(b[i]) != math.isnan(a[i]):
                    # nan-vs-number: abs(nan - x) > tol is False, so this
                    # (the worst divergence) used to pass silently
                    failures.append(
                        f"{fname}:{col}[{i}]: {a[i]} vs baseline {b[i]} (NaN)"
                    )
                    break
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
