"""Reference DB query/export goldens, byte-for-byte.

The golden files under tests/goldens/ are the reference's own fixtures
(/root/reference/libs/db/tests_query/testdata/csv_export_*.golden —
REFERENCE TEST DATA vendored verbatim, declared as such); this suite
rebuilds the same fixture database through this repo's storage API and
asserts the CSV export reproduces the goldens exactly, pinning wire-format
parity with real editor/client exports (csv_export_goldie.rs)."""

import os
from pathlib import Path

import numpy as np
import pytest

import elodin  # noqa: F401
from elodin_tpu.db.export import save_archive
from elodin_tpu.db.storage import Database
from elodin_tpu.db.vtable import component_id_of

GOLDENS = Path(__file__).parent / "goldens"

TS_BASE = 1_700_000_000_000_000
TS_STEP = 1_000_000
NUM_ROWS = 5

# (name, prim, shape, element_names) — csv_export_goldie.rs fixture_specs()
SPECS = [
    ("scalar_f64", "f64", (), None),
    ("vec3_f64", "f64", (3,), "x,y,z"),
    ("vec3_f64_unnamed", "f64", (3,), None),
    ("mat3_f64", "f64", (3, 3), None),
    ("vec3_f32", "f32", (3,), "x,y,z"),
    ("scalar_i64", "i64", (), None),
    ("vec2_i32", "i32", (2,), "a,b"),
    ("scalar_u8", "u8", (), None),
    ("vec3_u16", "u16", (3,), None),
    ("scalar_bool", "bool", (), None),
    ("vec3_bool", "bool", (3,), "p,q,r"),
    ("edge_floats", "f64", (4,), "nan,pinf,ninf,tiny"),
]


def _sample(name: str, prim: str, shape, step: int) -> bytes:
    n = int(np.prod(shape)) if shape else 1
    if name == "edge_floats":
        return np.array(
            [np.nan, np.inf, -np.inf, 1e-7 * (step + 1)], dtype="<f8"
        ).tobytes()
    if prim == "f64":
        return (np.arange(n) * 0.25 + step * 1.5).astype("<f8").tobytes()
    if prim == "f32":
        return (np.arange(n) * 0.125 + step * 0.5).astype("<f4").tobytes()
    if prim == "i64":
        return (-1000 + step * 13 + np.arange(n)).astype("<i8").tobytes()
    if prim == "i32":
        return (100 + step * 7 + np.arange(n)).astype("<i4").tobytes()
    if prim == "u8":
        return (1 + step * 3 + np.arange(n)).astype("u1").tobytes()
    if prim == "u16":
        return (1 + step * 5 + np.arange(n)).astype("<u2").tobytes()
    if prim == "bool":
        return ((np.arange(n) + step) % 2).astype("u1").tobytes()
    raise AssertionError(prim)


def _build_fixture(tmp_path) -> Database:
    db = Database(str(tmp_path / "db"))
    for name, prim, shape, elem in SPECS:
        store = db.get_or_create(component_id_of(name), prim, shape, name)
        if elem:
            store.set_metadata(metadata={"element_names": elem})
        for step in range(NUM_ROWS):
            store.append(TS_BASE + TS_STEP * step, _sample(name, prim, shape, step))
    db.flush()
    return db


def _build_private_fixture(tmp_path) -> Database:
    db = Database(str(tmp_path / "db"))
    pub = db.get_or_create(component_id_of("public_scalar"), "f64", (), "public_scalar")
    sec = db.get_or_create(component_id_of("secret_scalar"), "f64", (), "secret_scalar")
    sec.set_metadata(metadata={"private": "true"})
    for step in range(NUM_ROWS):
        ts = TS_BASE + TS_STEP * step
        pub.append(ts, np.float64(step).tobytes())
        sec.append(ts, np.float64(step + 100.0).tobytes())
    db.flush()
    return db


def _snapshot(out_dir: Path, label: str) -> str:
    """snapshot_csv_dir format (csv_export_goldie.rs:225-242)."""
    s = f"# csv export goldens: {label}\n\n"
    for p in sorted(out_dir.glob("*.csv")):
        s += f"=== {p.name} ===\n"
        s += p.read_text()
        s += "\n"
    return s


def _golden(name: str) -> str:
    return (GOLDENS / name).read_text()


def test_csv_export_mono_us_flatten(tmp_path):
    db = _build_fixture(tmp_path)
    out = tmp_path / "out"
    save_archive(db, str(out), "csv", flatten=True, time_format="us")
    assert _snapshot(out, "mono_us_flatten") == _golden(
        "csv_export_mono_us_flatten.golden"
    )


def test_csv_export_mono_ns_no_flatten(tmp_path):
    db = _build_fixture(tmp_path)
    out = tmp_path / "out"
    save_archive(db, str(out), "csv", flatten=False, time_format="ns")
    assert _snapshot(out, "mono_ns_no_flatten") == _golden(
        "csv_export_mono_ns_no_flatten.golden"
    )


def test_csv_export_private_default_skips(tmp_path):
    db = _build_private_fixture(tmp_path)
    out = tmp_path / "out"
    save_archive(db, str(out), "csv", time_format="iso")
    assert _snapshot(out, "private_default_skips") == _golden(
        "csv_export_private_default_skips.golden"
    )


def test_csv_export_private_include_overrides(tmp_path):
    db = _build_private_fixture(tmp_path)
    out = tmp_path / "out"
    save_archive(db, str(out), "csv", include_private=True, time_format="iso")
    assert _snapshot(out, "private_include_overrides") == _golden(
        "csv_export_private_include_overrides.golden"
    )
