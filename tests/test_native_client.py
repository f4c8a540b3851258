"""C++ client <-> Python server wire interop (parity model:
libs/db/examples/client.c against the Rust DB)."""

import os
import subprocess
import time

import numpy as np
import pytest

import elodin_tpu.db as edb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")


@pytest.fixture(scope="module")
def cpp_client(tmp_path_factory):
    out = tmp_path_factory.mktemp("native") / "client"
    src = os.path.join(NATIVE, "examples", "client.cpp")
    inc = os.path.join(NATIVE, "include")
    proc = subprocess.run(
        ["g++", "-std=c++20", "-O2", f"-I{inc}", src, "-o", str(out)],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        pytest.fail(f"C++ client failed to compile:\n{proc.stderr}")
    return str(out)


def test_cpp_client_roundtrip(cpp_client, tmp_path):
    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        port = srv.addr.rsplit(":", 1)[1]
        proc = subprocess.run(
            [cpp_client, port, "50"], capture_output=True, text=True, timeout=30
        )
        assert proc.returncode == 0, proc.stderr
        assert "wrote 50 rows" in proc.stdout
        time.sleep(0.5)

        client = edb.Client.connect(srv.addr)
        ts, accel = client.time_series("cpp.imu.accel", 0, 2**62)
        assert len(ts) == 50
        np.testing.assert_allclose(accel[0], [0.0, 0.0, -9.81])
        np.testing.assert_allclose(accel[-1], [0.0, 0.0, -9.81 + 0.49])
        assert ts[0] == 1_700_000_000_000_000

        ts2, status = client.time_series("cpp.status", 0, 2**62)
        assert status[-1] == 49
        comps = client.components()
        assert "cpp.imu.gyro" in comps

        msgs = client.get_msgs("cpp.events")
        assert msgs and msgs[0][1] == {"event": "boot"}
        client.close()
    finally:
        srv.stop()


def test_native_store_roundtrip(tmp_path):
    from elodin_tpu.native import NativeStore, available

    if not available():
        pytest.skip("no C toolchain")
    s = NativeStore(tmp_path / "ts.bin", tmp_path / "data.bin", 24)
    ts = np.arange(100, dtype="<i8")
    rows = np.arange(300, dtype="<f8").reshape(100, 3)
    s.append(ts, rows)
    assert len(s) == 100
    assert s.lower_bound(50) == 50
    np.testing.assert_allclose(s.rows("<f8", 3)[7], rows[7])
    s.close()
    s2 = NativeStore(tmp_path / "ts.bin", tmp_path / "data.bin", 24)
    assert len(s2) == 100
    np.testing.assert_allclose(s2.rows("<f8", 3)[99], rows[99])
    s2.close()


def test_component_store_uses_native_backend(tmp_path):
    from elodin_tpu.db.storage import ComponentStore
    from elodin_tpu.native import available

    store = ComponentStore(42, "f64", (3,), "x.y", tmp_path / "comp")
    if available():
        assert store._native is not None
    store.append_batch(
        np.arange(10, dtype="<i8"), np.ones((10, 3))
    )
    store.flush()
    re = ComponentStore.load(tmp_path / "comp")
    assert re.len == 10
    np.testing.assert_allclose(re.values[:10], 1.0)
