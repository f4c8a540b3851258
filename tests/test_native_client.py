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


@pytest.fixture(scope="module")
def postcard_c(tmp_path_factory):
    out = tmp_path_factory.mktemp("native") / "postcard_diff"
    src = os.path.join(NATIVE, "examples", "postcard_diff.c")
    inc = os.path.join(NATIVE, "include")
    proc = subprocess.run(
        ["gcc", "-std=c11", "-O2", "-Wall", "-Werror", f"-I{inc}", src,
         "-o", str(out)],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        pytest.fail(f"postcard.h failed to compile:\n{proc.stderr}")
    return str(out)


def _python_battery_bytes() -> bytes:
    from elodin_tpu.db.postcard import Writer

    w = Writer()
    w.varint(0).varint(127).varint(128).varint(300).varint(1 << 40)
    w.zigzag(0).zigzag(-1).zigzag(1).zigzag(-(1 << 40))
    w.string("héllo").bytes_(b"\x00\x01")
    w.option(None, lambda w, v: w.varint(v))
    w.option(5, lambda w, v: w.varint(v))
    w.bool(True).u8(200).f32(1.5).f64(-2.25)
    w.discriminant(2)
    w.varint(3)  # seq length prefix
    return w.bytes()


def test_postcard_c_encode_matches_python(postcard_c):
    """C encoder output is byte-identical to the Python codec
    (postcard-c parity, libs/postcard-c/postcard.h)."""
    proc = subprocess.run([postcard_c, "encode"], capture_output=True,
                          text=True, timeout=30)
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == _python_battery_bytes().hex()


def test_postcard_c_decodes_python_bytes(postcard_c):
    data = _python_battery_bytes()
    proc = subprocess.run([postcard_c, "decode", data.hex()],
                          capture_output=True, text=True, timeout=30)
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.splitlines()
    assert lines[:5] == ["u 0", "u 127", "u 128", "u 300",
                         f"u {1 << 40}"]
    assert lines[5:9] == ["i 0", "i -1", "i 1", f"i {-(1 << 40)}"]
    assert lines[9] == "s héllo"
    assert lines[10] == "b 2"
    assert lines[11] == "opt 0"
    assert lines[12] == "opt 1 5"
    assert lines[13] == "scalars 1 200 1.50 -2.25"
    assert lines[14] == "enum 2 seq 3"
    assert lines[15] == f"consumed {len(data)} of {len(data)}"


def test_postcard_c_id_derivations(postcard_c):
    from elodin_tpu.db.postcard import msg_id
    from elodin_tpu.db.vtable import component_id_of

    proc = subprocess.run([postcard_c, "ids"], capture_output=True,
                          text=True, timeout=30)
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.splitlines()
    assert lines[0] == f"cid {component_id_of('rocket.world_pos'):016x}"
    assert lines[1] == f"mid {msg_id('my_msg').hex()}"


def test_gen_cpp_typed_structs_compile_and_write(tmp_path):
    """gen-cpp emits typed Row structs + writer wiring that compile and
    round-trip real rows (postcard-c codegen parity)."""
    import sys
    import textwrap

    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        client = edb.Client.connect(srv.addr)
        writer = client.table_writer(
            {"gen.pos": edb.f64[3], "gen.flag": edb.f64}
        )
        writer.write(timestamp_us=1, values={"gen.pos": [1, 2, 3], "gen.flag": 0.0})
        time.sleep(0.3)
        writer.close()

        gen = tmp_path / "gen.hpp"
        proc = subprocess.run(
            [sys.executable, "-m", "elodin_tpu.db", "gen-cpp",
             str(tmp_path / "db"), "--output", str(gen)],
            capture_output=True, text=True, cwd=ROOT,
        )
        assert proc.returncode == 0, proc.stderr
        text = gen.read_text()
        assert "double gen_pos[3]" in text and "double gen_flag" in text

        main_cpp = tmp_path / "writer_main.cpp"
        main_cpp.write_text(textwrap.dedent(f'''
            #include "{gen}"
            #include <cstdio>
            int main(int argc, char** argv) {{
                elodin::Client c("127.0.0.1", (uint16_t)atoi(argv[1]));
                auto w = make_writer(c);
                Row row;
                for (int i = 0; i < 10; i++) {{
                    row.gen_pos[0] = i; row.gen_pos[1] = 2.0 * i;
                    row.gen_pos[2] = -i; row.gen_flag = 1.0;
                    row.write(w, 1000 + i);
                }}
                std::printf("wrote 10 rows\\n");
                return 0;
            }}
        '''))
        exe = tmp_path / "writer_main"
        inc = os.path.join(NATIVE, "include")
        proc = subprocess.run(
            ["g++", "-std=c++20", "-O2", f"-I{inc}", str(main_cpp),
             "-o", str(exe)],
            capture_output=True, text=True,
        )
        assert proc.returncode == 0, f"generated header failed:\n{proc.stderr}"
        port = srv.addr.rsplit(":", 1)[1]
        proc = subprocess.run([str(exe), port], capture_output=True,
                              text=True, timeout=30)
        assert proc.returncode == 0, proc.stderr
        time.sleep(0.4)
        ts, vals = client.time_series("gen.pos", start_us=500)
        assert len(ts) == 10
        np.testing.assert_allclose(vals[-1], [9.0, 18.0, -9.0])
        client.close()
    finally:
        srv.stop()
