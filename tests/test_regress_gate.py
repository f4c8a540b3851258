"""The CSV regression gate itself (scripts/compare_baseline_csv.py) must
fail on vanished columns and NaN divergence — both used to pass silently."""

import os
import subprocess
import sys

SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)


def _run_gate(tmp_path, base_rows, act_rows):
    base = tmp_path / "base"
    act = tmp_path / "act"
    base.mkdir(exist_ok=True)
    act.mkdir(exist_ok=True)
    (base / "x.csv").write_text(base_rows)
    (act / "x.csv").write_text(act_rows)
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "compare_baseline_csv.py"),
         str(base), str(act)],
        capture_output=True, text=True,
    )


def test_gate_passes_identical(tmp_path):
    csv = "time,value\n0,1.0\n1,2.0\n"
    r = _run_gate(tmp_path, csv, csv)
    assert r.returncode == 0, r.stdout + r.stderr


def test_gate_fails_missing_column(tmp_path):
    r = _run_gate(tmp_path, "time,value\n0,1.0\n", "time,other\n0,1.0\n")
    assert r.returncode != 0
    assert "missing" in r.stdout


def test_gate_fails_nan_vs_number(tmp_path):
    r = _run_gate(tmp_path, "time,value\n0,nan\n", "time,value\n0,5.0\n")
    assert r.returncode != 0
    assert "NaN" in r.stdout
    # nan vs nan is equal, not a failure
    r = _run_gate(tmp_path, "time,value\n0,nan\n", "time,value\n0,nan\n")
    assert r.returncode == 0


def test_gate_fails_out_of_tolerance(tmp_path):
    r = _run_gate(tmp_path, "time,value\n0,1.0\n", "time,value\n0,1.5\n")
    assert r.returncode != 0
