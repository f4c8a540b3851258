"""DB + impeller2 protocol tests (parity model:
libs/db/tests/src/lib.rs and python/tests/test_db.py — ephemeral server,
wire round trips, streams, SQL, archive)."""

import threading
import time

import numpy as np
import pytest

import elodin_tpu.db as edb
from elodin_tpu.db import msgs as M
from elodin_tpu.db.postcard import Reader, Writer, auto_msg_id, msg_id
from elodin_tpu.db.vtable import VTable, build_table_vtable, component_id_of


@pytest.fixture()
def server(tmp_path):
    srv = edb.Server.start(str(tmp_path / "db"))
    yield srv
    srv.stop()


def test_postcard_roundtrip():
    w = Writer()
    w.varint(0).varint(127).varint(128).varint(300).varint(2**40)
    w.zigzag(0).zigzag(-1).zigzag(1).zigzag(-(2**40))
    w.string("héllo").bytes_(b"\x00\x01")
    w.option(None, lambda w, v: w.varint(v)).option(5, lambda w, v: w.varint(v))
    r = Reader(w.bytes())
    assert [r.varint() for _ in range(5)] == [0, 127, 128, 300, 2**40]
    assert [r.zigzag() for _ in range(4)] == [0, -1, 1, -(2**40)]
    assert r.string() == "héllo"
    assert r.bytes_() == b"\x00\x01"
    assert r.option(lambda r: r.varint()) is None
    assert r.option(lambda r: r.varint()) == 5


def test_component_id_fnv1a():
    # FNV-1a of "" is the offset basis
    assert component_id_of("") == 0xCBF29CE484222325
    # and known value for "a": (0xcbf29ce484222325 ^ 0x61) * 0x100000001b3
    assert component_id_of("a") == ((0xCBF29CE484222325 ^ 0x61) * 0x100000001B3) % 2**64


def test_msg_id_avoids_reserved_range():
    for name in ["a", "b", "set_throttle", "race.collision", "x" * 40]:
        assert msg_id(name)[0] != 224


def test_vtable_roundtrip():
    vt = build_table_vtable(
        [
            ("drone.imu.accel", "f64", (3,), 8, 24),
            ("drone.cmd.throttle", "f64", (), 32, 8),
        ],
        timestamp_offset=0,
    )
    w = Writer()
    vt.write(w)
    vt2 = VTable.read(Reader(w.bytes()))
    body = bytearray(40)
    body[0:8] = np.int64(123456).tobytes()
    body[8:32] = np.asarray([1.0, 2.0, 3.0]).tobytes()
    body[32:40] = np.float64(0.42).tobytes()
    fields = list(vt2.realize_fields(bytes(body)))
    assert fields[0]["component_id"] == component_id_of("drone.imu.accel")
    assert fields[0]["ty"] == "f64"
    assert fields[0]["shape"] == (3,)
    assert fields[0]["timestamp"] == 123456
    np.testing.assert_allclose(
        np.frombuffer(fields[0]["data"], dtype="<f8"), [1.0, 2.0, 3.0]
    )
    assert fields[1]["component_id"] == component_id_of("drone.cmd.throttle")


def test_write_and_time_series(server):
    client = edb.Client.connect(server.addr)
    writer = client.table_writer(
        {
            "drone.imu.accel": edb.f64[3].labeled("x", "y", "z"),
            "drone.cmd.throttle": edb.f64,
        }
    )
    t0 = 1_000_000
    for i in range(10):
        writer.write(
            timestamp_us=t0 + i * 1000,
            values={
                "drone.imu.accel": [0.0, 0.0, -9.81 + i],
                "drone.cmd.throttle": 0.1 * i,
            },
        )
    time.sleep(0.3)
    ts, accel = client.time_series("drone.imu.accel", t0, t0 + 10_000)
    assert len(ts) == 10
    np.testing.assert_allclose(accel[0], [0.0, 0.0, -9.81])
    np.testing.assert_allclose(accel[-1], [0.0, 0.0, -0.81])
    sample = client.latest("drone.cmd.throttle")
    assert sample is not None
    np.testing.assert_allclose(sample.values, 0.9)
    assert client.earliest_timestamp() == t0
    writer.close()
    client.close()


def test_components_metadata(server):
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"v.pos": edb.f64[3].labeled("x", "y", "z")})
    writer.write(timestamp_us=1, values={"v.pos": [1.0, 2.0, 3.0]})
    time.sleep(0.3)
    comps = client.components()
    assert "v.pos" in comps
    assert comps["v.pos"].shape == (3,)
    assert comps["v.pos"].metadata.get("element_names") == "x,y,z"
    writer.close()
    client.close()


def test_sql(server):
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"craft.alt": edb.f64})
    for i in range(20):
        writer.write(timestamp_us=i * 100, values={"craft.alt": float(i)})
    time.sleep(0.3)
    table = client.sql(
        f"SELECT * FROM {edb.sql_table_name('craft.alt')} WHERE craft_alt > 15"
    )
    assert table.num_rows == 4
    agg = client.sql(
        f"SELECT max(craft_alt) AS peak FROM {edb.sql_table_name('craft.alt')}"
    )
    assert agg.to_pydict()["peak"][0] == 19.0
    writer.close()
    client.close()


def test_msg_log_roundtrip(server):
    client = edb.Client.connect(server.addr)
    client.send_msg("race.collision", {"id": 1}, timestamp_us=500)
    client.send_msg("race.collision", {"id": 2}, timestamp_us=600)
    time.sleep(0.3)
    msgs = client.get_msgs("race.collision")
    assert [m[1]["id"] for m in msgs] == [1, 2]
    assert [m[0] for m in msgs] == [500, 600]
    client.close()


def test_msg_stream(server):
    client = edb.Client.connect(server.addr)
    stream = client.msg_stream("events.ping")
    got = []

    def consume():
        got.append(next(stream))

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.2)
    sender = edb.Client.connect(server.addr)
    sender.send_msg("events.ping", "hello", timestamp_us=42)
    t.join(timeout=5)
    assert got and got[0][0] == 42 and got[0][1] == "hello"
    stream.close()
    client.close()
    sender.close()


def test_component_stream(server):
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"sat.temp": edb.f64})
    writer.write(timestamp_us=1, values={"sat.temp": 20.0})
    time.sleep(0.3)
    stream = client.stream(["sat.temp"])
    rows = []

    def consume():
        rows.append(next(stream))

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.3)
    writer.write(timestamp_us=2, values={"sat.temp": 21.5})
    t.join(timeout=5)
    assert rows, "no stream row received"
    assert "sat.temp" in rows[0]
    np.testing.assert_allclose(rows[0]["sat.temp"], 21.5)
    stream.close()
    writer.close()
    client.close()


def test_persistence_reload(tmp_path):
    path = str(tmp_path / "db")
    srv = edb.Server.start(path)
    client = edb.Client.connect(srv.addr)
    writer = client.table_writer({"x.y": edb.f64})
    writer.write(timestamp_us=10, values={"x.y": 3.5})
    time.sleep(0.3)
    writer.close()
    client.close()
    srv.stop()

    srv2 = edb.Server.start(path)
    client2 = edb.Client.connect(srv2.addr)
    ts, vals = client2.time_series("x.y", 0, 100)
    assert len(ts) == 1 and vals[0] == 3.5
    client2.close()
    srv2.stop()


def test_exec_db_integration(tmp_path):
    """World.build + serve_exec: sim telemetry lands in the DB."""
    import elodin as el
    from jax import numpy as jnp
    from elodin_tpu.db.server import serve_exec

    w = el.World()
    w.spawn(
        el.Body(world_vel=el.SpatialMotion(linear=jnp.array([1.0, 0.0, 0.0]))),
        "craft",
    )
    exec_ = w.build(el.six_dof(1.0 / 60.0), db_path=str(tmp_path / "db"))
    server = serve_exec(exec_, "127.0.0.1:0")
    try:
        exec_.run(30)
        client = edb.Client.connect(f"127.0.0.1:{server.port}")
        ts, pos = client.time_series("craft.world_pos", 0, 2**62)
        assert len(ts) == 31  # init + 30 ticks
        np.testing.assert_allclose(pos[-1][4], 0.5, rtol=1e-6)
        client.close()
    finally:
        server.stop()


def test_eql_queries():
    from elodin_tpu.db.eql import eql
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.vtable import component_id_of

    db = Database()
    pos = db.get_or_create(component_id_of("a.world_pos"), "f64", (7,), "a.world_pos")
    vel = db.get_or_create(component_id_of("a.world_vel"), "f64", (6,), "a.world_vel")
    x = db.get_or_create(component_id_of("a.x"), "f64", (), "a.x")
    x.metadata["element_names"] = ""
    for i in range(100):
        t = i * 1000
        pos.append(t, np.array([0, 0, 0, 1, 3.0 * i, 4.0 * i, 0.0]))
        vel.append(t, np.array([0, 0, 0, 1.0, 0.0, 0.0]))
        x.append(t, np.float64(i))

    s = eql(db, "a.world_pos[4]")
    np.testing.assert_allclose(s.values[-1], 3.0 * 99)

    s = eql(db, "a.world_pos.linear().norm()")
    np.testing.assert_allclose(s.values[10], 5.0 * 10)  # 3-4-5 triangle

    s = eql(db, "a.x * 2.0 + 1.0")
    np.testing.assert_allclose(s.values[5], 11.0)

    s = eql(db, "(a.world_pos[4] - a.world_pos[5]).abs()")
    np.testing.assert_allclose(s.values[7], 7.0)

    s = eql(db, "a.x.time_slice(0.0, 0.05)")
    assert len(s.values) == 50

    s = eql(db, "a.world_vel.linear()[0]")
    np.testing.assert_allclose(s.values, 1.0)


def test_db_cli_export_merge_trim(tmp_path):
    """elodin-db CLI subcommands (reference libs/db/src/main.rs surgery)."""
    from elodin_tpu.db.__main__ import main as db_main
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.vtable import component_id_of

    # build two dbs
    for name, base in (("a", 0), ("b", 1000)):
        db = Database(str(tmp_path / name))
        s = db.get_or_create(component_id_of("v.x"), "f64", (), "v.x")
        for i in range(10):
            s.append(base + i, float(base + i))
        db.flush()

    db_main(["merge", str(tmp_path / "merged"), str(tmp_path / "a"), str(tmp_path / "b")])
    merged = Database(str(tmp_path / "merged"))
    assert merged.by_name("v.x").len == 20

    db_main(["trim", str(tmp_path / "merged"), "--start-us", "1000"])
    trimmed = Database(str(tmp_path / "merged"))
    assert trimmed.by_name("v.x").len == 10

    db_main(["export", str(tmp_path / "a"), "--output", str(tmp_path / "out"), "--format", "csv"])
    assert (tmp_path / "out" / "v.x.csv").exists()

    db_main(["compact", str(tmp_path / "a")])
    db_main(["gen-cpp", str(tmp_path / "a"), "--output", str(tmp_path / "gen.hpp")])
    assert "v.x" in (tmp_path / "gen.hpp").read_text()


def test_follow_replication(tmp_path):
    """leader -> follower mirroring (libs/db/src/follow.rs)."""
    from elodin_tpu.db.follow import follow

    leader = edb.Server.start(str(tmp_path / "leader"))
    try:
        f = follow(leader.addr, str(tmp_path / "follower"))
        time.sleep(0.3)
        client = edb.Client.connect(leader.addr)
        writer = client.table_writer({"f.x": edb.f64})
        for i in range(5):
            writer.write(timestamp_us=i, values={"f.x": float(i)})
        deadline = time.time() + 5
        while time.time() < deadline and f.rows_mirrored < 5:
            time.sleep(0.1)
        store = f.db.by_name("f.x")
        assert store is not None and store.len >= 5
        np.testing.assert_allclose(store.values[4], 4.0)
        f.stop()
        writer.close()
        client.close()
    finally:
        leader.stop()


def test_assets_store_and_http(tmp_path):
    import urllib.request

    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        from elodin_tpu.db import msgs as M2

        client = edb.Client.connect(srv.addr)
        client._conn.send_bytes(
            M2.StoreAsset("models/probe.glb", b"\x00GLBDATA").packet()
        )
        client._conn.send_bytes(
            M2.StoreAsset("schematic.kdl", b"viewport name=V").packet()
        )
        time.sleep(0.3)
        http_port = srv._server.port + 1
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{http_port}/assets/models/probe.glb", timeout=5
        ).read()
        assert body == b"\x00GLBDATA"
        listing = urllib.request.urlopen(
            f"http://127.0.0.1:{http_port}/assets", timeout=5
        ).read().decode()
        assert "schematic.kdl" in listing
        # PUT path
        req = urllib.request.Request(
            f"http://127.0.0.1:{http_port}/assets/uploaded.txt",
            data=b"hello",
            method="PUT",
        )
        urllib.request.urlopen(req, timeout=5)
        assert srv.db.assets.get("uploaded.txt") == b"hello"
        client.close()
    finally:
        srv.stop()


def test_fixed_rate_replay_and_stream_state(server):
    """Fixed-rate historical replay with rewind via SetStreamState."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"r.x": edb.f64})
    for i in range(50):
        writer.write(timestamp_us=i * 1000, values={"r.x": float(i)})
    time.sleep(0.3)

    stream = client.stream(["r.x"], frequency=200)
    rows = []

    def consume():
        for _ in range(5):
            rows.append(next(stream))

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=10)
    assert len(rows) == 5
    vals = [float(r["r.x"]) for r in rows]
    # replay advances through history from the earliest timestamp
    assert vals == sorted(vals)
    assert vals[0] <= 10.0
    stream.close()
    writer.close()
    client.close()


def test_subscribe_last_updated(server):
    client = edb.Client.connect(server.addr)
    req_id = client._conn.next_req_id()
    q = client._conn.request_stream(
        M.SubscribeLastUpdated().packet(req_id), req_id
    )
    first = q.get(timeout=5)
    assert first.id == M.LastUpdated.ID
    writer = client.table_writer({"lu.x": edb.f64})
    writer.write(timestamp_us=12345, values={"lu.x": 1.0})
    deadline = time.time() + 5
    latest = None
    while time.time() < deadline:
        try:
            pkt = q.get(timeout=1)
            latest = M.LastUpdated.decode(pkt.body).timestamp
            if latest == 12345:
                break
        except Exception:
            pass
    assert latest == 12345
    writer.close()
    client.close()


def test_db_config_roundtrip(server):
    client = edb.Client.connect(server.addr)
    req_id = client._conn.next_req_id()
    [pkt] = client._conn.request(M.GetDbSettings().packet(req_id), req_id)
    cfg = M.DbConfig.decode(pkt.body)
    assert cfg.recording is True
    client._conn.send_bytes(M.SetDbConfig(recording=False).packet())
    time.sleep(0.2)
    req_id = client._conn.next_req_id()
    [pkt] = client._conn.request(M.GetDbSettings().packet(req_id), req_id)
    assert M.DbConfig.decode(pkt.body).recording is False
    client.close()


def test_cobs_roundtrip():
    from elodin_tpu.db.framing import CobsStream, cobs_decode, cobs_encode

    cases = [
        b"",
        b"\x00",
        b"\x00\x00",
        b"hello",
        b"a\x00b\x00c",
        bytes(range(256)),
        bytes(300),  # long zero run
        b"\x01" * 600,  # > 254 nonzero run
    ]
    for data in cases:
        enc = cobs_encode(data)
        assert b"\x00" not in enc[:-1]
        assert enc[-1] == 0
        assert cobs_decode(enc) == data

    # streaming decoder across fragmented chunks
    stream = CobsStream()
    frames = [b"alpha", b"\x00beta\x00", b"gamma" * 100]
    wire = b"".join(cobs_encode(f) for f in frames)
    got = []
    for i in range(0, len(wire), 7):
        got.extend(stream.feed(wire[i : i + 7]))
    assert got == frames


def test_shm_ring_cross_process(tmp_path):
    import os
    import subprocess
    import sys as _sys

    from elodin_tpu.db.framing import ShmRing

    path = str(tmp_path / "ring.shm")
    ring = ShmRing(path, capacity=1 << 16)
    # producer in a separate process
    code = f"""
import sys
sys.path.insert(0, {repr(os.getcwd())})
from elodin_tpu.db.framing import ShmRing
ring = ShmRing({path!r}, capacity=1 << 16, create=False)
for i in range(100):
    assert ring.push(f"frame-{{i}}".encode())
ring.close()
"""
    proc = subprocess.run([_sys.executable, "-c", code], capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    got = []
    while (f := ring.pop()) is not None:
        got.append(f)
    assert got == [f"frame-{i}".encode() for i in range(100)]
    ring.close()


def test_shm_ring_wraparound(tmp_path):
    from elodin_tpu.db.framing import ShmRing

    ring = ShmRing(str(tmp_path / "r2.shm"), capacity=256)
    payload = b"x" * 40
    for round_ in range(50):
        assert ring.push(payload + str(round_ % 10).encode())
        got = ring.pop()
        assert got == payload + str(round_ % 10).encode()
    ring.close()


def test_component_name_survives_reopen(tmp_path):
    """Names set via SetComponentMetadata after store creation must persist
    to schema.json so `elodin-db list`/`export` on a reopened DB show names,
    not hex ids (reference keeps names in its metadata log)."""
    import numpy as np

    from elodin_tpu.db.storage import Database

    path = str(tmp_path / "db")
    db = Database(path)
    store = db.get_or_create(0x1234, "f64", (3,))  # created unnamed
    store.append(1_000, np.array([1.0, 2.0, 3.0]))
    store.set_metadata(name="probe.pos", metadata={"element_names": "x,y,z"})
    db.flush()

    db2 = Database(path)
    s2 = db2.components[0x1234]
    assert s2.name == "probe.pos"
    assert s2.metadata["element_names"] == "x,y,z"
    assert s2.len == 1


def test_plotline_downsampling():
    """Curvature-weighted downsampler (parity: libs/hamann-chen-line):
    corners keep their vertices, straight runs collapse, endpoints kept."""
    import numpy as np

    from elodin_tpu.plotline import (
        select_polyline2_indices,
        select_polyline3_indices,
        select_time_value_indices,
        select_trajectory_time_norm_indices,
    )

    # straight line -> uniform fallback, endpoints kept
    pts = np.stack([np.linspace(0, 1, 100), np.zeros(100)], axis=1)
    idx = select_polyline2_indices(pts, 10)
    assert idx[0] == 0 and idx[-1] == 99
    assert len(idx) <= 10
    gaps = np.diff(idx)
    assert gaps.max() <= 2 * gaps.min() + 1  # roughly uniform

    # L-shaped corner: the corner vertex must survive aggressive reduction
    a = np.stack([np.linspace(0, 1, 50), np.zeros(50)], axis=1)
    b = np.stack([np.ones(50), np.linspace(0, 1, 50)], axis=1)
    corner = np.concatenate([a, b[1:]], axis=0)
    idx = select_polyline2_indices(corner, 8)
    assert any(abs(int(i) - 49) <= 1 for i in idx), idx

    # smooth sine: reconstruction from the reduced set stays accurate
    t = np.linspace(0, 4 * np.pi, 400)
    y = np.sin(t)
    idx = select_time_value_indices(t, y, 40)
    err = np.abs(np.interp(t, t[idx], y[idx]) - y).max()
    assert err < 0.05

    # localized feature (narrow spike in a flat signal): curvature weighting
    # must beat uniform spacing, which likely skips the spike entirely
    ys = np.zeros(400)
    ys[198:203] = [0.5, 1.0, 1.5, 1.0, 0.5]
    idx = select_time_value_indices(t, ys, 20)
    err = np.abs(np.interp(t, t[idx], ys[idx]) - ys).max()
    uni = np.unique(np.round(np.linspace(0, 399, 20)).astype(int))
    err_uni = np.abs(np.interp(t, t[uni], ys[uni]) - ys).max()
    assert err < err_uni, (err, err_uni)

    # 3D helix + shared index list for xyz streams
    pts3 = np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=1)
    idx3 = select_polyline3_indices(pts3, 50)
    assert idx3[0] == 0 and idx3[-1] == 399 and 10 < len(idx3) <= 50
    idxn = select_trajectory_time_norm_indices(t, pts3, 30)
    assert idxn[0] == 0 and idxn[-1] == 399

    # degenerate inputs
    assert len(select_polyline2_indices(np.zeros((0, 2)), 5)) == 0
    assert list(select_polyline2_indices([[1.0, 2.0]], 5)) == [0]
    dup = np.array([[0.0, 0.0]] * 10 + [[1.0, 0.0]] * 10)
    idx = select_polyline2_indices(dup, 4)
    assert len(idx) >= 2


def test_mcap_export_roundtrip(tmp_path):
    """MCAP export (libs/db/src/export_mcap.rs parity): one JSON channel per
    component; framing validates via the in-module reader."""
    import json

    import numpy as np

    from elodin_tpu.db.export_mcap import export_mcap, read_mcap
    from elodin_tpu.db.storage import Database

    db = Database(str(tmp_path / "db"))
    pos = db.get_or_create(0x1, "f64", (3,), "ball.world_pos")
    pos.set_metadata(metadata={"element_names": "x,y,z"})
    temp = db.get_or_create(0x2, "f32", (), "ball.temp")
    for i in range(5):
        pos.append(1_000_000 + i, np.array([1.0 * i, 2.0 * i, 3.0 * i]))
        temp.append(1_000_000 + i, np.array([20.0 + i], dtype=np.float32))

    out = tmp_path / "archive.mcap"
    n = export_mcap(db, str(out))
    assert n == 10

    channels, messages = read_mcap(str(out))
    topics = {c["topic"] for c in channels.values()}
    assert topics == {"/ball/world_pos", "/ball/temp"}
    by_topic = {c["topic"]: cid for cid, c in channels.items()}
    pos_msgs = [m for m in messages if m[0] == by_topic["/ball/world_pos"]]
    assert len(pos_msgs) == 5
    assert pos_msgs[0][1] == 1_000_000 * 1000  # log_time in ns
    row = json.loads(pos_msgs[2][2])
    assert row["x"] == 2.0 and row["y"] == 4.0 and row["z"] == 6.0
    # schema carries the element fields (no timestamp field in the row —
    # log_time carries it, matching the reference component_json_schema)
    sch = json.loads(
        channels[by_topic["/ball/world_pos"]]["schema"]["data"]
    )
    assert set(sch["properties"]) == {"x", "y", "z"}
    sch2 = json.loads(channels[by_topic["/ball/temp"]]["schema"]["data"])
    assert set(sch2["properties"]) == {"value"}


def test_component_metadata_survives_double_reopen(tmp_path):
    """load() must not clobber schema.json before metadata is restored —
    a second reopen used to lose element_names."""
    import numpy as np

    from elodin_tpu.db.storage import Database

    path = str(tmp_path / "db")
    db = Database(path)
    s = db.get_or_create(0x77, "f64", (2,))
    s.append(1, np.array([1.0, 2.0]))
    s.set_metadata(name="a.b", metadata={"element_names": "p,q"})
    db.flush()
    Database(path)  # first reopen (rewrites nothing)
    db3 = Database(path)  # second reopen
    s3 = db3.components[0x77]
    assert s3.name == "a.b" and s3.metadata["element_names"] == "p,q"


def test_cli_prune_and_fix_timestamps(tmp_path):
    """DB surgery subcommands (libs/db prune.rs + fix_timestamps.rs)."""
    import subprocess
    import sys as _s

    import numpy as np

    from elodin_tpu.db.storage import Database

    path = str(tmp_path / "db")
    db = Database(path)
    wall = db.get_or_create(0x1, "f64", (), "good.sensor")
    t_wall = 1_700_000_000_000_000
    for i in range(5):
        wall.append(t_wall + i * 1000, np.array([float(i)]))
    mono = db.get_or_create(0x2, "f64", (), "boot.sensor")
    for i in range(5):
        mono.append(10_000_000 + i * 1000, np.array([float(i)]))  # boot time
    db.get_or_create(0x3, "f64", (), "empty.sensor")  # zero rows
    db.flush()
    del db, wall, mono

    def run(*argv):
        return subprocess.run(
            [_s.executable, "-m", "elodin_tpu.db", *argv],
            capture_output=True, text=True,
        )

    out = run("prune", path, "--dry-run")
    assert "empty.sensor" in out.stdout and "dry run" in out.stdout
    out = run("prune", path, "--yes")
    assert out.returncode == 0, out.stderr
    out = run("fix-timestamps", path)
    assert out.returncode == 0, out.stderr

    db2 = Database(path)
    assert 0x3 not in db2.components  # pruned
    fixed = db2.components[0x2]
    # last sample aligned to the wall-clock reference's last sample
    assert int(fixed.timestamps[fixed.len - 1]) == t_wall + 4000
    assert int(fixed.timestamps[0]) == t_wall  # relative spacing kept


def test_eql_spatial_formulas():
    """cast/direction/rotate/translate formulas (libs/db/eql/src/formulas)."""
    from elodin_tpu.db.eql import eql
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.vtable import component_id_of

    db = Database()
    pos = db.get_or_create(
        component_id_of("b.world_pos"), "f64", (7,), "b.world_pos"
    )
    # identity attitude at (1, 0, 0), then yawed 90 deg at (0, 2, 0)
    s2 = np.sqrt(0.5)
    pos.append(0, np.array([0, 0, 0, 1, 1.0, 0.0, 0.0]))
    pos.append(1000, np.array([0, 0, s2, s2, 0.0, 2.0, 0.0]))

    # direction: body +x in world frame
    s = eql(db, "b.world_pos.direction(1, 0, 0)")
    np.testing.assert_allclose(s.values[0], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(s.values[1], [0, 1, 0], atol=1e-12)

    # translate: body-frame offset follows attitude
    s = eql(db, "b.world_pos.translate(1, 0, 0)")
    np.testing.assert_allclose(s.values[0][4:], [2, 0, 0], atol=1e-12)
    np.testing.assert_allclose(s.values[1][4:], [0, 3, 0], atol=1e-12)

    # translate_world: fixed world offset
    s = eql(db, "b.world_pos.translate_world(0, 0, 5)")
    np.testing.assert_allclose(s.values[0][4:], [1, 0, 5], atol=1e-12)

    # rotate_world_z(90): position rotates about world z, attitude composes
    s = eql(db, "b.world_pos.rotate_world_z(90)")
    np.testing.assert_allclose(s.values[0][4:], [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(
        np.abs(s.values[0][:4]), [0, 0, s2, s2], atol=1e-12
    )

    # rotate_z(90): BODY-axis yaw — attitude turns, position unchanged
    s = eql(db, "b.world_pos.rotate_z(90)")
    np.testing.assert_allclose(s.values[0][4:], [1, 0, 0], atol=1e-12)
    # body +x of the rotated identity pose now points along world +y
    from elodin_tpu.spatial import quat_rotate

    nose = np.asarray(quat_rotate(s.values[0][:4], np.array([1.0, 0, 0])))
    np.testing.assert_allclose(nose, [0, 1, 0], atol=1e-12)

    # rotate_world(0, 0, 90) == rotate_world_z(90)
    s3 = eql(db, "b.world_pos.rotate_world(0, 0, 90)")
    s4 = eql(db, "b.world_pos.rotate_world_z(90)")
    np.testing.assert_allclose(s3.values, s4.values, atol=1e-12)

    # cast
    s = eql(db, "b.world_pos[4].cast('f32')")
    assert s.values.dtype == np.float32


def test_cli_time_align(tmp_path):
    """time-align shifts first samples onto a target timestamp
    (libs/db/src/time_align.rs)."""
    import subprocess
    import sys as _s

    import numpy as np

    from elodin_tpu.db.storage import Database

    path = str(tmp_path / "db")
    db = Database(path)
    a = db.get_or_create(0x1, "f64", (), "a.x")
    b = db.get_or_create(0x2, "f64", (), "b.x")
    for i in range(4):
        a.append(1_000_000 + i * 100, np.array([float(i)]))
        b.append(5_000_000 + i * 100, np.array([float(i)]))
    db.flush()
    del db, a, b

    out = subprocess.run(
        [_s.executable, "-m", "elodin_tpu.db", "time-align", path,
         "--target", "2.0"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr

    db2 = Database(path)
    for cid in (0x1, 0x2):
        s = db2.components[cid]
        assert int(s.timestamps[0]) == 2_000_000
        assert int(s.timestamps[3]) == 2_000_300  # spacing preserved


def test_sql_join_group_by(server):
    """Multi-component JOIN + GROUP BY over the wire — the DataFusion-grade
    queries VERDICT called out (libs/db/src/arrow/mod.rs)."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"j.alt": edb.f64, "j.vel": edb.f64})
    for i in range(10):
        writer.write(
            timestamp_us=i * 1000,
            values={"j.alt": float(i), "j.vel": float(i * 2)},
        )
    time.sleep(0.3)
    alt = edb.sql_table_name("j.alt")
    vel = edb.sql_table_name("j.vel")
    t = client.sql(
        f"SELECT a.time, a.{alt}, v.{vel} FROM {alt} a "
        f"JOIN {vel} v ON a.time = v.time WHERE a.{alt} >= 5 ORDER BY a.time"
    )
    assert t.num_rows == 5
    assert t.to_pydict()[vel][0] == 10.0

    g = client.sql(
        f"SELECT COUNT(*) AS n, AVG({alt}) AS mean FROM {alt} "
        f"GROUP BY {alt} >= 5 ORDER BY mean"
    )
    assert g.to_pydict()["n"] == [5, 5]
    client.close()


def test_sql_asof_join(server):
    """a ASOF JOIN b aligns each left row with the latest b.time <= a.time."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"fast.x": edb.f64})
    for i in range(10):
        writer.write(timestamp_us=i * 100, values={"fast.x": float(i)})
    slow = client.table_writer({"slow.y": edb.f64})
    for i in range(3):
        slow.write(timestamp_us=i * 400, values={"slow.y": float(i * 10)})
    time.sleep(0.3)
    fx = edb.sql_table_name("fast.x")
    sy = edb.sql_table_name("slow.y")
    t = client.sql(
        f"SELECT {fx}.time, {fx}, {sy} FROM {fx} ASOF JOIN {sy} ORDER BY {fx}.time"
    )
    d = t.to_pydict()
    assert t.num_rows == 10
    # rows 0-3 see slow.y=0, rows 4-7 see 10, rows 8-9 see 20
    assert d[sy][0] == 0.0 and d[sy][3] == 0.0
    assert d[sy][4] == 10.0 and d[sy][7] == 10.0
    assert d[sy][8] == 20.0
    client.close()


def test_sql_fft(server):
    """fft()/fftfreq() projections (DataFusion FFT UDF parity)."""
    import numpy as np

    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"sig.v": edb.f64})
    rate = 1000.0
    for i in range(128):
        writer.write(
            timestamp_us=int(i * 1e6 / rate),
            values={"sig.v": float(np.sin(2 * np.pi * 50.0 * i / rate))},
        )
    time.sleep(0.3)
    sv = edb.sql_table_name("sig.v")
    t = client.sql(f"SELECT fft({sv}), fftfreq({sv}, 1000.0) FROM {sv} ORDER BY time")
    d = t.to_pydict()
    mags = np.asarray(d[f"fft_{sv}"])
    freqs = np.asarray(d[f"fftfreq_{sv}"])
    assert abs(freqs[int(np.argmax(mags[1:])) + 1] - 50.0) < rate / 128
    client.close()


def test_sql_injection_rejected(server):
    """The engine is read-only: DDL/DML from the wire must fail cleanly
    (the round-1 eval() WHERE was an injection vector)."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"sec.x": edb.f64})
    writer.write(timestamp_us=1, values={"sec.x": 1.0})
    time.sleep(0.3)
    sx = edb.sql_table_name("sec.x")
    for evil in (
        f"DROP TABLE {sx}",
        f"DELETE FROM {sx}",
        f"INSERT INTO {sx} VALUES (2, 2.0)",
        f"SELECT * FROM {sx}; DROP TABLE {sx}",
        "ATTACH DATABASE '/tmp/pwn.db' AS pwn",
    ):
        with pytest.raises(Exception):
            client.sql(evil)
    # table still intact
    assert client.sql(f"SELECT * FROM {sx}").num_rows == 1
    client.close()


def test_sparkline_and_plot_overview(server):
    """Editor-facing downsample queries (SparklineQuery msgs.rs:549,
    PlotOverviewQuery msgs.rs:565)."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"pl.alt": edb.f64, "pl.vec": edb.f64[3]})
    n = 5000
    for i in range(n):
        writer.write(
            timestamp_us=i * 100,
            values={"pl.alt": float(np.sin(i / 50.0)),
                    "pl.vec": [float(i), float(-i), 0.5]},
        )
    time.sleep(0.5)
    ts, vals = client.sparkline("pl.alt", 100)
    assert len(ts) == 100 and len(vals) == 100
    assert ts[0] == 0 and ts[-1] == (n - 1) * 100  # endpoints kept
    assert np.abs(vals).max() <= 1.0

    ts2, v2 = client.plot_overview("pl.vec", max_points=64, element_index=1)
    assert len(ts2) == 64
    assert v2[0] == 0.0 and v2[-1] == -(n - 1)  # element 1 = -i
    with pytest.raises(RuntimeError):
        client.plot_overview("pl.vec", max_points=64, element_index=9)
    client.close()


def test_vtable_stream_with_mean_op(server):
    """VTableStream forwards raw ingest tables; a MeanOp ext op in the
    vtable applies a server-side rolling mean (vtable_stream.rs:81)."""
    import struct

    from elodin_tpu.db.vtable import VTableBuilder

    client = edb.Client.connect(server.addr)
    # hand-build a vtable: one f64 component with a 4-sample mean stage
    b = VTableBuilder()
    comp = b.component("vs.x")
    sch = b.schema("f64", (), comp)
    ts = b.timestamp_table(0, sch)
    mean = b.mean(4, ts)
    b.field(8, 8, mean)
    vt = b.build()
    vt_id = bytes([9, 9])
    sub = client.vtable_stream(vt_id)
    time.sleep(0.2)

    raw = edb.Client.connect(server.addr)
    raw._conn.send_bytes(M.VTableMsg(vt_id, vt).packet())
    time.sleep(0.2)
    for i in range(8):
        body = struct.pack("<q", i * 1000) + struct.pack("<d", float(i))
        raw._conn.send_bytes(M.frame(M.TY_TABLE, vt_id, body))
    got = []
    for _ in range(8):
        body, fields = next(sub)
        got.append(struct.unpack("<d", bytes(body[8:16]))[0])
    # rolling mean of 0..7 over window 4: 0, .5, 1, 1.5, 2.5, 3.5, ...
    assert got[0] == 0.0 and got[1] == 0.5 and got[4] == 2.5
    sub.close()
    raw.close()
    client.close()


def test_timestamped_and_fixed_rate_msg_streams(server):
    client = edb.Client.connect(server.addr)
    sub = client.timestamped_msg_stream("tlog")
    time.sleep(0.2)
    sender = edb.Client.connect(server.addr)
    for i in range(3):
        sender.send_msg("tlog", {"i": i}, timestamp_us=1000 + i)
    out = [next(sub) for _ in range(3)]
    assert [ts for ts, _ in out] == [1000, 1001, 1002]
    sub.close()

    # fixed-rate replay from the log start
    replay = client.fixed_rate_msg_stream("tlog", frequency=200,
                                          timestep_ns=1000)
    ts0, _ = next(replay)
    assert ts0 == 1000
    replay.close()
    sender.close()
    client.close()


def test_follow_stream_history_and_live(server):
    """FollowStream (msgs.rs:760): metadata + schemas + full history, then
    live rows."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"fs.x": edb.f64})
    for i in range(5):
        writer.write(timestamp_us=i * 10, values={"fs.x": float(i)})
    client.send_msg("flog", {"k": 1}, timestamp_us=77)
    time.sleep(0.3)

    req_id = client._conn.next_req_id()
    q = client._conn.request_stream(M.FollowStream(1500).packet(req_id), req_id)
    seen_meta = seen_schema = 0
    rows = []
    msgs = []
    deadline = time.time() + 5
    vtables = {}
    while time.time() < deadline and (len(rows) < 5 or not msgs):
        pkt = q.get(timeout=5)
        if pkt.ty == M.TY_MSG and pkt.id == M.ComponentMetadata.ID:
            seen_meta += 1
        elif pkt.ty == M.TY_MSG and pkt.id == M.DumpSchemaResp.ID:
            seen_schema += 1
        elif pkt.ty == M.TY_MSG and pkt.id == M.VTableMsg.ID:
            vtm = M.VTableMsg.decode(pkt.body)
            vtables[vtm.id] = vtm.vtable
        elif pkt.ty == M.TY_TABLE and pkt.id in vtables:
            for f in vtables[pkt.id].realize_fields(pkt.body):
                rows.append((f["timestamp"], f["data"]))
        elif pkt.ty == M.TY_MSG_WITH_TIMESTAMP:
            ts = int.from_bytes(pkt.body[:8], "little", signed=True)
            msgs.append(ts)
    assert seen_meta >= 1 and seen_schema == 1
    assert len(rows) == 5
    assert msgs == [77]
    client.close()


def test_udp_ingest(server):
    """The DB accepts the data plane over UDP on the same port
    (libs/db/src/lib.rs:1649-1699)."""
    import socket
    import struct

    vt = build_table_vtable([("udp.x", "f64", (), 8, 8)], timestamp_offset=0)
    vt_id = bytes([7, 7])
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    addr = ("127.0.0.1", server.port)
    sock.sendto(M.VTableMsg(vt_id, vt).packet(), addr)
    time.sleep(0.2)
    for i in range(4):
        body = struct.pack("<q", i * 100) + struct.pack("<d", float(i) * 2)
        sock.sendto(M.frame(M.TY_TABLE, vt_id, body), addr)
    # and a timestamped message
    sock.sendto(
        M.frame(M.TY_MSG_WITH_TIMESTAMP, msg_id("ulog"),
                struct.pack("<q", 55) + b"\x05"),
        addr,
    )
    time.sleep(0.4)
    client = edb.Client.connect(server.addr)
    ts, vals = client.time_series("udp.x")
    assert list(ts) == [0, 100, 200, 300]
    assert list(vals) == [0.0, 2.0, 4.0, 6.0]
    batch = client.get_msgs("ulog")
    assert batch == [(55, "\x05")]
    sock.close()
    client.close()


def test_new_msg_wire_roundtrips():
    """Encode/decode round-trips for the editor-surface messages."""
    for msg in [
        M.VTableStream(bytes([1, 2])),
        M.SparklineQuery("craft_alt", 256),
        M.PlotOverviewQuery(bytes([0, 3]), 12345, -10, 10**15, 512, 2),
        M.FixedRateMsgStream(bytes([9, 1]), M.FixedRateOp(7, M.FixedRateBehavior("latest", 10**6, 100))),
        M.TimestampedMsgStream(bytes([4, 4])),
        M.FollowStream(9000),
        M.MeanOp(16),
        M.NewConnection(),
        M.ConnectionSettings(True),
        M.GetMsgMetadata(bytes([1, 9])),
        M.UdpVTableStream(bytes([2, 2]), "127.0.0.1:9000"),
    ]:
        cls = type(msg)
        assert cls.ID in M.MSG_TYPES
        decoded = cls.decode(msg.encode())
        assert decoded == msg, (msg, decoded)


def test_query_cli_bool_alternating_golden(tmp_path):
    """Replicates the reference golden
    (libs/db/tests_query/query_cli_goldie.rs
    query_cli_bool_alternating_pattern + its .golden file): a bool
    component queried through the query CLI renders the exact table."""
    import subprocess
    import sys

    from elodin_tpu.db.storage import Database

    db = Database(str(tmp_path / "db"))
    cid = component_id_of("goldie.bool_alternating")
    store = db.get_or_create(cid, "bool", (), "bool_alternating")
    for i, byte in enumerate([1, 0, 1, 0]):
        store.append(1000 * (i + 1), bytes([byte]))
    db.flush()

    proc = subprocess.run(
        [sys.executable, "-m", "elodin_tpu.db", "query",
         "--sql", "SELECT * FROM bool_alternating",
         "--precision", "full", str(tmp_path / "db")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    golden = (
        "╭──────────┬──────────────────╮\n"
        "│ time (s) │ bool_alternating │\n"
        "├──────────┼──────────────────┤\n"
        "│ 0.001    │ true             │\n"
        "│ 0.002    │ false            │\n"
        "│ 0.003    │ true             │\n"
        "│ 0.004    │ false            │\n"
        "╰──────────┴──────────────────╯\n"
    )
    assert proc.stdout == golden, proc.stdout


def test_csv_export_flatten_and_edge_floats(tmp_path):
    """Semantic parity with the reference csv-export goldens
    (libs/db/tests_query/csv_export_goldie.rs): element_names metadata
    drives flattened column suffixes, and NaN/inf/tiny floats survive
    export."""
    import csv as _csv
    import math

    from elodin_tpu.db.export import save_archive
    from elodin_tpu.db.storage import Database

    db = Database(str(tmp_path / "db"))
    cid = component_id_of("edge_floats")
    store = db.get_or_create(cid, "f64", (4,), "edge_floats")
    store.set_metadata(metadata={"element_names": "nan,pinf,ninf,tiny"})
    for i in range(3):
        vals = np.array([np.nan, np.inf, -np.inf, (i + 1) * 1e-7])
        store.append(1_700_000_000_000_000 + i * 1_000_000, vals.tobytes())
    db.flush()

    out = tmp_path / "export"
    save_archive(db, str(out), "csv")
    files = list(out.glob("*.csv"))
    assert files, "no csv exported"
    with open(files[0]) as f:
        rows = list(_csv.reader(f))
    header = rows[0]
    # flattened per-element columns named by element_names
    for suffix in ("nan", "pinf", "ninf", "tiny"):
        assert any(suffix in h for h in header), header
    body = rows[1]
    vals = body[-4:]
    assert math.isnan(float(vals[0]))
    assert float(vals[1]) == math.inf and float(vals[2]) == -math.inf
    assert abs(float(vals[3]) - 1e-7) < 1e-20


def test_concurrent_writers_readers_stress(server):
    """Aux-subsystem race coverage (SURVEY §5): multiple writer
    connections, SQL readers, time-series readers, and a live stream all
    hammering one Database concurrently — row counts and monotonic
    timestamps must come out exact."""
    import threading

    N_WRITERS, ROWS = 4, 200
    errors: list[str] = []

    def writer_task(w: int):
        try:
            client = edb.Client.connect(server.addr)
            writer = client.table_writer({f"st{w}.x": edb.f64})
            for i in range(ROWS):
                writer.write(timestamp_us=i, values={f"st{w}.x": float(i)})
            writer.close()
            client.close()
        except Exception as e:  # noqa: BLE001
            errors.append(f"writer{w}: {e}")

    stop = threading.Event()

    def reader_task():
        try:
            client = edb.Client.connect(server.addr)
            while not stop.is_set():
                try:
                    client.sql("SELECT COUNT(*) AS n FROM st0_x")
                except Exception:
                    pass  # table may not exist yet
            client.close()
        except Exception as e:  # noqa: BLE001
            errors.append(f"reader: {e}")

    threads = [threading.Thread(target=writer_task, args=(w,))
               for w in range(N_WRITERS)]
    threads += [threading.Thread(target=reader_task) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads[:N_WRITERS]:
        t.join(timeout=60)
    stop.set()
    for t in threads[N_WRITERS:]:
        t.join(timeout=10)
    assert not errors, errors

    time.sleep(0.5)
    client = edb.Client.connect(server.addr)
    for w in range(N_WRITERS):
        ts, vals = client.time_series(f"st{w}.x")
        assert len(ts) == ROWS, f"writer {w}: {len(ts)} rows"
        assert (np.diff(ts) > 0).all()
        np.testing.assert_allclose(vals, np.arange(ROWS, dtype=float))
    client.close()


def test_eql_compiles_to_sql(server):
    """EQL -> SQL compilation (eql/src/lib.rs:23-47 architecture): the
    compiled query over the sqlite engine matches the numpy evaluator."""
    from elodin_tpu.db.eql import eql, eql_sql, to_sql

    client = edb.Client.connect(server.addr)
    writer = client.table_writer(
        {"veh.pos": edb.f64[3].labeled("x", "y", "z"), "veh.mass": edb.f64}
    )
    for i in range(20):
        writer.write(
            timestamp_us=i * 100,
            values={"veh.pos": [i, 2.0 * i, -i], "veh.mass": 10.0 + i},
        )
    time.sleep(0.3)
    db = server.db

    sql = to_sql(db, "veh.pos.norm() / veh.mass")
    assert "JOIN" in sql and "sqrt" in sql
    t = eql_sql(db, "veh.pos.norm() / veh.mass")
    got = np.asarray(t["value"].to_pylist())
    want = eql(db, "veh.pos.norm() / veh.mass").values
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # element selection + arithmetic + clip
    t2 = eql_sql(db, "veh.pos.y.clip(3.0, 30.0) + 1.0")
    got2 = np.asarray(t2["value"].to_pylist())
    want2 = np.clip(2.0 * np.arange(20), 3.0, 30.0) + 1.0
    np.testing.assert_allclose(got2, want2)

    # non-SQL formulas still raise cleanly
    with pytest.raises(ValueError):
        to_sql(db, "veh.pos.fft()")
    client.close()


def test_vtable_misaligned_field_rejected(server):
    """Misaligned vtable fields are rejected at registration
    (libs/db/tests/src/lib.rs test_vtable_misaligned_field_rejected)."""
    client = edb.Client.connect(server.addr)
    # f64 field at offset 9: not 8-byte aligned
    vt = build_table_vtable([("mis.x", "f64", (), 9, 8)], timestamp_offset=0)
    req_id = client._conn.next_req_id()
    [pkt] = client._conn.request(
        M.VTableMsg(bytes([8, 1]), vt).packet(req_id), req_id
    )
    assert pkt.id == M.ErrorResponse.ID
    assert "misaligned" in M.ErrorResponse.decode(pkt.body).description
    # an aligned one registers silently (no reply) and accepts tables
    import struct

    vt_ok = build_table_vtable([("mis.x", "f64", (), 8, 8)], timestamp_offset=0)
    client._conn.send_bytes(M.VTableMsg(bytes([8, 2]), vt_ok).packet())
    time.sleep(0.2)
    client._conn.send_bytes(
        M.frame(M.TY_TABLE, bytes([8, 2]),
                struct.pack("<q", 5) + struct.pack("<d", 2.5))
    )
    time.sleep(0.3)
    ts, vals = client.time_series("mis.x")
    assert list(ts) == [5] and list(vals) == [2.5]
    client.close()


def test_http_healthz_and_metrics(server):
    """/healthz and /metrics on the assets HTTP port (production serving
    surface next to assets_http.rs)."""
    import urllib.request

    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"hm.x": edb.f64})
    for i in range(7):
        writer.write(timestamp_us=i, values={"hm.x": float(i)})
    time.sleep(0.3)
    port = server._server.assets_http.port
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
        assert r.read() == b"ok"
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
        text = r.read().decode()
    assert "elodin_db_components 1" in text
    assert "elodin_db_rows_total 7" in text
    client.close()


def test_external_control_over_wire(tmp_path):
    """copy_db_to_world (impeller2_server.rs:320): a component marked
    external_control and written by a TCP client re-enters the attached
    sim's device state before the next batch."""
    import typing as ty

    import jax
    from dataclasses import dataclass, field as dc_field

    import elodin as el
    from elodin_tpu.db.server import serve_exec

    Thrust = ty.Annotated[
        jax.Array,
        el.Component(
            "wire_thrust",
            el.ComponentType(el.PrimitiveType.F64, ()),
            metadata={"external_control": "true"},
        ),
    ]
    Vel = ty.Annotated[
        jax.Array, el.Component("wire_vel", el.ComponentType(el.PrimitiveType.F64, ()))
    ]

    @dataclass
    class Craft(el.Archetype):
        wire_thrust: Thrust = dc_field(default_factory=lambda: np.float64(0.0))
        wire_vel: Vel = dc_field(default_factory=lambda: np.float64(0.0))

    @el.system
    def integrate(q: el.Query[Thrust, Vel]) -> el.Query[Vel]:
        return q.map(Vel, lambda t, v: v + t)

    w = el.World()
    w.spawn(Craft(), "craft")
    exec_ = w.build(integrate, db_path=str(tmp_path / "db"))
    srv = serve_exec(exec_, "127.0.0.1:0")
    try:
        exec_.run(3)
        assert float(exec_.read_component("craft.wire_vel")[0]) == 0.0

        client = edb.Client.connect(f"127.0.0.1:{srv.port}")
        writer = client.table_writer({"craft.wire_thrust": edb.f64})
        writer.write(timestamp_us=10, values={"craft.wire_thrust": 2.5})
        time.sleep(0.4)
        exec_.run(4)
        # commanded thrust applied from the wire: vel += 2.5 per tick
        assert float(exec_.read_component("craft.wire_vel")[0]) == 10.0
        writer.close()
        client.close()
    finally:
        srv.stop()


def test_table_writer_write_batch(server):
    """Vectorized bulk ingest path: N rows in one buffer, byte-compatible
    with the per-row path."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"blk.v": edb.f64[2]})
    n = 500
    writer.write_batch(
        np.arange(n) * 10,
        {"blk.v": np.stack([np.arange(n), -np.arange(n)], axis=1)},
    )
    time.sleep(0.4)
    ts, vals = client.time_series("blk.v")
    assert len(ts) == n
    assert ts[-1] == (n - 1) * 10
    np.testing.assert_allclose(vals[-1], [n - 1, -(n - 1)])
    client.close()


def test_resume_from_db(tmp_path):
    """The DB is the checkpoint: serve, stop, re-serve with resume=True and
    the sim continues from the stored tail instead of tick 0."""
    import typing as ty

    import jax
    from dataclasses import dataclass, field as dc_field

    import elodin as el
    from elodin_tpu.db.server import serve_exec

    V = ty.Annotated[
        jax.Array, el.Component("res_v", el.ComponentType(el.PrimitiveType.F64, ()))
    ]

    @dataclass
    class T(el.Archetype):
        res_v: V = dc_field(default_factory=lambda: np.float64(0.0))

    @el.system
    def bump(q: el.Query[V]) -> el.Query[V]:
        return q.map(V, lambda v: v + 1.0)

    def build():
        w = el.World()
        w.spawn(T(), "t")
        return w.build(bump, db_path=str(tmp_path / "db"))

    ex1 = build()
    srv1 = serve_exec(ex1, "127.0.0.1:0")
    ex1.run(10)
    ex1.flush_telemetry()
    srv1.stop()
    assert float(ex1.read_component("t.res_v")[0]) == 10.0

    ex2 = build()
    srv2 = serve_exec(ex2, "127.0.0.1:0", resume=True)
    try:
        assert float(ex2.read_component("t.res_v")[0]) == 10.0
        assert ex2.tick() == 10
        ex2.run(5)
        assert float(ex2.read_component("t.res_v")[0]) == 15.0
    finally:
        srv2.stop()


def test_db_survives_sim_sigkill(tmp_path):
    """Crash consistency: SIGKILL a serving sim mid-run; the on-disk DB
    must reopen with intact, monotonic rows (the reference's mmap store
    makes the same guarantee)."""
    import signal
    import subprocess
    import sys
    import textwrap

    sim = tmp_path / "sim.py"
    sim.write_text(textwrap.dedent("""
        import typing as ty
        from dataclasses import dataclass, field
        import jax, numpy as np
        import elodin as el

        V = ty.Annotated[jax.Array, el.Component(
            "kv", el.ComponentType(el.PrimitiveType.F64, ()))]

        @dataclass
        class T(el.Archetype):
            kv: V = field(default_factory=lambda: np.float64(0.0))

        @el.system
        def bump(q: el.Query[V]) -> el.Query[V]:
            return q.map(V, lambda v: v + 1.0)

        w = el.World()
        w.spawn(T(), "t")
        w.run(bump, simulation_rate=120.0, generate_real_time=True)
    """))
    import os

    env = dict(os.environ)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["ELODIN_DB_PATH"] = str(tmp_path / "db")
    proc = subprocess.Popen(
        [sys.executable, str(sim), "run", "127.0.0.1:0"],
        env=env, cwd=str(tmp_path),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 60
    db_dir = tmp_path / "db"
    # wait until rows are flowing to disk, then SIGKILL mid-run
    while time.time() < deadline:
        if db_dir.exists() and any(db_dir.rglob("data.bin")):
            time.sleep(1.0)
            break
        time.sleep(0.2)
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=10)

    from elodin_tpu.db.storage import Database

    db = Database(str(db_dir))
    stores = [s for s in db.components.values() if s.name == "t.kv"]
    assert stores, "kv component not persisted"
    s = stores[0]
    assert s.len >= 1
    ts = s.timestamps[: s.len]
    assert (np.diff(ts) > 0).all(), "timestamps not monotonic after crash"
    vals = s.values[: s.len, 0]
    assert np.isfinite(vals).all()


def test_export_skips_private_components(tmp_path):
    """Components with metadata private=true are excluded from exports
    unless include_private (src/export.rs:752-855 and the
    csv_export_private goldens)."""
    from elodin_tpu.db.export import save_archive
    from elodin_tpu.db.storage import Database

    db = Database(str(tmp_path / "db"))
    pub = db.get_or_create(component_id_of("pub.x"), "f64", (), "pub.x")
    sec = db.get_or_create(component_id_of("sec.x"), "f64", (), "sec.x")
    sec.set_metadata(metadata={"private": "true"})
    pub.append(1, np.float64(1.0).tobytes())
    sec.append(1, np.float64(2.0).tobytes())

    out = tmp_path / "exp"
    save_archive(db, str(out), "csv")
    names = {p.name for p in out.glob("*.csv")}
    assert "pub.x.csv" in names and "sec.x.csv" not in names

    out2 = tmp_path / "exp2"
    save_archive(db, str(out2), "csv", include_private=True)
    names2 = {p.name for p in out2.glob("*.csv")}
    assert "sec.x.csv" in names2


def test_follower_mirrors_history_and_names(tmp_path):
    """Upgraded follow: a follower attaching AFTER rows exist mirrors the
    full history plus names, then stays live (unified FollowStream,
    follow.rs)."""
    from elodin_tpu.db.follow import follow

    leader = edb.Server.start(str(tmp_path / "leader"))
    try:
        client = edb.Client.connect(leader.addr)
        writer = client.table_writer({"h.x": edb.f64})
        for i in range(6):
            writer.write(timestamp_us=i * 10, values={"h.x": float(i)})
        time.sleep(0.4)

        f = follow(leader.addr, str(tmp_path / "follower"))
        deadline = time.time() + 10
        while time.time() < deadline and f.rows_mirrored < 6:
            time.sleep(0.1)
        store = f.db.by_name("h.x")
        assert store is not None and store.len == 6  # history mirrored
        np.testing.assert_allclose(store.values[:6, 0], np.arange(6.0))

        # still live: new rows keep flowing
        for i in range(6, 9):
            writer.write(timestamp_us=i * 10, values={"h.x": float(i)})
        deadline = time.time() + 10
        while time.time() < deadline and store.len < 9:
            time.sleep(0.1)
        assert store.len == 9
        assert (np.diff(store.timestamps[:9]) > 0).all()
        f.stop()
        writer.close()
        client.close()
    finally:
        leader.stop()


def test_export_flags_pattern_noflatten_ns(tmp_path):
    """Export option knobs behind the reference goldens: --pattern name
    glob, --no-flatten array columns, --mono-ns nanosecond timestamps."""
    import csv as _csv

    from elodin_tpu.db.export import save_archive
    from elodin_tpu.db.storage import Database

    db = Database(str(tmp_path / "db"))
    a = db.get_or_create(component_id_of("vec.a"), "f64", (2,), "vec.a")
    b = db.get_or_create(component_id_of("other.b"), "f64", (), "other.b")
    a.append(5, np.array([1.5, -2.5]).tobytes())
    b.append(5, np.float64(9.0).tobytes())

    out = tmp_path / "e1"
    save_archive(db, str(out), "csv", pattern="vec.*", flatten=False,
                 mono_ns=True)
    files = sorted(p.name for p in out.glob("*.csv"))
    assert files == ["vec.a.csv"]  # pattern filtered other.b out
    with open(out / "vec.a.csv") as f:
        rows = list(_csv.reader(f))
    assert rows[0] == ["time_ns", "vec.a"]
    assert rows[1][0] == "5000"  # us -> ns
    assert rows[1][1] == "[1.5, -2.5]"  # unflattened array column


def test_cli_truncate_drop_info(tmp_path):
    """truncate/drop/info surgery subcommands (libs/db/src/truncate.rs,
    drop.rs, main.rs Info)."""
    import subprocess
    import sys as _s

    import numpy as np

    from elodin_tpu.db.storage import Database

    path = str(tmp_path / "db")
    db = Database(path)
    a = db.get_or_create(0x1, "f64", (3,), "ball.world_pos")
    b = db.get_or_create(0x2, "f64", (), "ball.mass")
    c = db.get_or_create(0x3, "f64", (), "rocket.thrust")
    for i in range(5):
        a.append(1000 + i, np.arange(3.0) + i)
        b.append(1000 + i, np.array([1.0]))
        c.append(1000 + i, np.array([2.0]))
    db.msg_log(b"\x12\x34").append(1000, b"hello")
    db.flush()
    del db, a, b, c

    def run(*argv):
        return subprocess.run(
            [_s.executable, "-m", "elodin_tpu.db", *argv],
            capture_output=True, text=True,
        )

    out = run("info", path)
    assert out.returncode == 0, out.stderr
    assert "components:   3 (15 rows)" in out.stdout
    assert "msg logs:     1 (1 entries)" in out.stdout

    # drop: glob pattern removes both ball.* components, keeps rocket
    out = run("drop", path, "--pattern", "ball.*", "--dry-run")
    assert "would drop ball.world_pos" in out.stdout
    db2 = Database(path)
    assert len(db2.components) == 3  # dry run changed nothing
    del db2
    out = run("drop", path, "--pattern", "ball.*")
    assert out.returncode == 0, out.stderr
    db2 = Database(path)
    assert set(db2.components) == {0x3}
    del db2

    # drop: fuzzy name match
    out = run("drop", path, "thrust")
    assert out.returncode == 0 and "dropped 1 components" in out.stdout
    assert len(Database(path).components) == 0

    # truncate refuses without --yes
    db3 = Database(path)
    s0 = db3.get_or_create(0x8, "f64", (), "keep.me")
    s0.append(1, np.array([1.0]))
    db3.flush()
    del db3, s0
    out = run("truncate", path)
    assert "refusing" in out.stdout
    assert Database(path).components[0x8].len == 1  # nothing cleared

    # truncate: clears rows + msg entries, keeps schemas
    db3 = Database(path)
    s = db3.get_or_create(0x9, "f64", (), "x.y")
    s.set_metadata(metadata={"element_names": "v"})
    s.append(1, np.array([3.0]))
    db3.flush()
    del db3, s
    out = run("truncate", path, "--yes")
    assert out.returncode == 0, out.stderr
    db4 = Database(path)
    s4 = db4.components[0x9]
    assert s4.len == 0 and s4.name == "x.y"
    assert s4.metadata["element_names"] == "v"  # schema survived
    assert sum(len(m.entries) for m in db4.msg_logs.values()) == 0


def _golomb_sps(width_mbs=40, height_mbs=30, fps=30):
    """Hand-assembled baseline SPS (independent encoder for round-trip
    testing of elodin_tpu.db.video.parse_sps)."""
    bits = []

    def u(v, n):
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    def ue(v):
        k = v + 1
        n = k.bit_length()
        u(0, n - 1)
        u(k, n)

    u(66, 8)        # profile_idc baseline
    u(0, 8)         # constraint flags
    u(30, 8)        # level_idc
    ue(0)           # sps_id
    ue(0)           # log2_max_frame_num_minus4
    ue(2)           # pic_order_cnt_type
    ue(0)           # max_num_ref_frames
    u(0, 1)         # gaps_in_frame_num
    ue(width_mbs - 1)
    ue(height_mbs - 1)
    u(1, 1)         # frame_mbs_only
    u(0, 1)         # direct_8x8
    u(0, 1)         # frame_cropping
    u(1, 1)         # vui_present
    u(0, 1)         # aspect_ratio_info
    u(0, 1)         # overscan
    u(0, 1)         # video_signal_type
    u(0, 1)         # chroma_loc
    u(1, 1)         # timing_info_present
    u(1, 32)        # num_units_in_tick
    u(2 * fps, 32)  # time_scale
    u(1, 1)         # rbsp stop bit
    while len(bits) % 8:
        bits.append(0)
    rbsp = bytes(
        int("".join(map(str, bits[i:i + 8])), 2) for i in range(0, len(bits), 8)
    )
    # emulation prevention: 00 00 {00,01,02,03} -> 00 00 03 xx
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return b"\x67" + bytes(out)


def _walk_boxes(data, offset=0, end=None):
    """Independent ISO-BMFF box walker: {fourcc: (payload_offset, size)}."""
    import struct as st

    end = len(data) if end is None else end
    boxes = []
    while offset + 8 <= end:
        size, fourcc = st.unpack_from(">I4s", data, offset)
        assert size >= 8, f"bad box size {size} at {offset}"
        boxes.append((fourcc, offset + 8, offset + size))
        offset += size
    assert offset == end, "box sizes don't tile the file"
    return boxes


def test_export_videos_mp4(tmp_path):
    """export-videos muxes an Annex-B H.264 msg log into a structurally
    valid MP4 (libs/db/src/export_videos.rs equivalent)."""
    import struct as st
    import subprocess
    import sys as _s

    from elodin_tpu.db import msgs as M
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.video import parse_sps

    sps = _golomb_sps()  # 640x480 @ 30fps
    info = parse_sps(sps)
    assert (info.width, info.height, info.fps) == (640, 480, 30.0)

    pps = b"\x68\xce\x38\x80"
    sc = b"\x00\x00\x00\x01"
    idr = b"\x65" + bytes(range(1, 40))
    p_frame = b"\x41" + bytes(range(1, 24))

    path = str(tmp_path / "db")
    db = Database(path)
    log = db.msg_log(b"\xab\xcd")
    log.set_metadata(M.MsgMetadata(0xABCD, "video.cam0", {}))
    t0 = 1_000_000
    frame_us = 33_333
    n = 12
    for i in range(n):
        if i % 6 == 0:
            payload = sc + sps + sc + pps + sc + idr
        else:
            payload = sc + p_frame
        log.append(t0 + i * frame_us, payload)
    db.flush()
    del db, log

    out = subprocess.run(
        [_s.executable, "-m", "elodin_tpu.db", "export-videos", path,
         "-o", str(tmp_path / "vids"), "--pattern", "video.*"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert "640x480" in out.stdout and "exported 1 video logs" in out.stdout

    mp4 = (tmp_path / "vids" / "video.cam0.mp4").read_bytes()
    top = _walk_boxes(mp4)
    assert [f for f, _, _ in top] == [b"ftyp", b"mdat", b"moov"]
    moov = next(b for b in top if b[0] == b"moov")
    moov_kids = _walk_boxes(mp4, moov[1], moov[2])
    trak = next(b for b in moov_kids if b[0] == b"trak")
    mdia = next(b for b in _walk_boxes(mp4, trak[1], trak[2])
                if b[0] == b"mdia")
    mdia_kids = _walk_boxes(mp4, mdia[1], mdia[2])
    mdhd = next(b for b in mdia_kids if b[0] == b"mdhd")
    timescale = st.unpack_from(">I", mp4, mdhd[1] + 12)[0]
    assert timescale == 90_000
    minf = next(b for b in mdia_kids if b[0] == b"minf")
    stbl = next(b for b in _walk_boxes(mp4, minf[1], minf[2])
                if b[0] == b"stbl")
    stbl_kids = {f: (s, e) for f, s, e in _walk_boxes(mp4, stbl[1], stbl[2])}
    assert set(stbl_kids) == {b"stsd", b"stts", b"stss", b"stsc", b"stsz",
                              b"stco"}
    # stsz: 12 samples
    szs, szn = st.unpack_from(">II", mp4, stbl_kids[b"stsz"][0] + 4)
    assert (szs, szn) == (0, n)
    # stss: keyframes at samples 1 and 7 (i = 0 and 6)
    kf_count = st.unpack_from(">I", mp4, stbl_kids[b"stss"][0] + 4)[0]
    kfs = st.unpack_from(f">{kf_count}I", mp4, stbl_kids[b"stss"][0] + 8)
    assert list(kfs) == [1, 7]
    # stco points at the first sample; its first NAL length is len(idr)
    chunk_off = st.unpack_from(">I", mp4, stbl_kids[b"stco"][0] + 8)[0]
    first_len = st.unpack_from(">I", mp4, chunk_off)[0]
    assert first_len == len(idr)
    assert mp4[chunk_off + 4] == 0x65  # IDR NAL header
    # avcC embeds the exact SPS bytes (SPS/PPS lifted out of samples)
    assert sps in mp4[stbl_kids[b"stsd"][0]:stbl_kids[b"stsd"][1]]
    # metadata round-trip: name survived reopen via meta.json
    db2 = Database(path)
    assert db2.msg_logs[b"\xab\xcd"].metadata.name == "video.cam0"


def test_cli_run_follows(tmp_path):
    """`elodin-db run --follows ADDR` replicates a leader
    (libs/db/src/main.rs RunArgs.follows)."""
    import subprocess
    import sys as _s
    import time as _t

    import numpy as np

    from elodin_tpu.db import Client, Server

    leader = Server.start(str(tmp_path / "leader"))
    try:
        c = Client.connect(leader.addr)
        c.send("lead.x", np.array([7.0]), timestamp_us=1_000_000)
        _t.sleep(0.2)
        proc = subprocess.Popen(
            [_s.executable, "-m", "elodin_tpu.db", "run",
             str(tmp_path / "mirror"), "--addr", "127.0.0.1:0",
             "--follows", leader.addr],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        try:
            c.send("lead.x", np.array([8.0]), timestamp_us=2_000_000)
            deadline = _t.time() + 15
            seen = False
            from elodin_tpu.db.storage import Database
            from elodin_tpu.db.vtable import component_id_of

            while _t.time() < deadline and not seen:
                _t.sleep(0.5)
                db = Database(str(tmp_path / "mirror"))
                s = db.components.get(component_id_of("lead.x"))
                seen = s is not None and s.len >= 1
            assert seen, "mirror never replicated lead.x"
        finally:
            proc.terminate()
            proc.wait(timeout=10)
        c.close()
    finally:
        leader.stop()


def test_stream_seek_twice_keeps_replaying(server):
    """Regression: the replay loop used state.pop("timestamp"), so the tick
    after a SetStreamState seek raised KeyError and silently killed the
    stream task — a second seek (or just continued playback) never arrived."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"sk.x": edb.f64})
    for i in range(100):
        writer.write(timestamp_us=i * 1000, values={"sk.x": float(i)})
    time.sleep(0.3)

    req_id = client._conn.next_req_id()
    behavior = M.FixedRateBehavior("earliest", int(1e9 // 200), 200)
    q = client._conn.request_stream(
        M.Stream(behavior, id=req_id).packet(req_id), req_id
    )

    def drain_ts(n, timeout=5.0):
        out = []
        deadline = time.time() + timeout
        while len(out) < n and time.time() < deadline:
            try:
                pkt = q.get(timeout=1)
            except Exception:
                continue
            if pkt.ty == M.TY_MSG and pkt.id == M.StreamTimestamp.ID:
                out.append(M.StreamTimestamp.decode(pkt.body).timestamp)
        return out

    assert len(drain_ts(3)) == 3
    for seek in range(2):
        client._conn.send_bytes(
            M.SetStreamState(id=req_id, timestamp=0).packet()
        )
        got = drain_ts(3)
        assert len(got) == 3, f"stream dead after seek #{seek + 1}: {got}"
    writer.close()
    client.close()


def test_two_realtime_streams_one_connection(server):
    """Regression: both real-time stream loops on one connection shared a
    single notification queue, so each stole roughly half the wake-ups and
    the final row of a burst could permanently miss one stream."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"tw.x": edb.f64})
    writer.write(timestamp_us=1, values={"tw.x": 0.0})
    time.sleep(0.2)

    queues = []
    for _ in range(2):
        rid = client._conn.next_req_id()
        queues.append(client._conn.request_stream(
            M.Stream("real-time", id=rid).packet(rid), rid
        ))
    time.sleep(0.3)
    for i in range(10):
        writer.write(timestamp_us=1000 + i, values={"tw.x": float(i)})

    def saw_value(q, want, timeout=5.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                pkt = q.get(timeout=1)
            except Exception:
                continue
            if pkt.ty == M.TY_TABLE and len(pkt.body) >= 16:
                if float(np.frombuffer(pkt.body[-8:], dtype="<f8")[0]) == want:
                    return True
        return False

    assert saw_value(queues[0], 9.0), "stream 1 missed the final row"
    assert saw_value(queues[1], 9.0), "stream 2 missed the final row"
    writer.close()
    client.close()


def test_eql_unary_minus():
    from elodin_tpu.db.eql import eql
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.vtable import component_id_of

    db = Database()
    x = db.get_or_create(component_id_of("u.x"), "f64", (), "u.x")
    x.metadata["element_names"] = ""
    for i in range(10):
        x.append(i * 1000, np.float64(i))
    np.testing.assert_allclose(eql(db, "-u.x").values[5], -5.0)
    np.testing.assert_allclose(eql(db, "u.x * -2").values[3], -6.0)
    np.testing.assert_allclose(eql(db, "u.x.clip(-1, 1)").values[9], 1.0)
    np.testing.assert_allclose(eql(db, "--u.x").values[4], 4.0)


def test_torn_tail_load_python_fallback(tmp_path, monkeypatch):
    """Crash between the ts and data appends leaves a short data.bin; the
    buffered-file store must load the intact prefix (and repair the files)
    instead of the whole Database failing to open."""
    import elodin_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "available", lambda: False)
    from elodin_tpu.db.storage import ComponentStore

    path = tmp_path / "comp"
    store = ComponentStore(123, "f64", (3,), "tt.v", path)
    for i in range(20):
        store.append(i * 100, np.array([i, i, i], dtype=np.float64))
    store.flush()
    del store

    import os as _os

    data_bin = path / "data.bin"
    full = _os.path.getsize(data_bin)
    with open(data_bin, "r+b") as f:
        f.truncate(full - 10)  # torn final row

    store2 = ComponentStore.load(path)
    assert store2.len == 19  # last (torn) row dropped, rest intact
    np.testing.assert_allclose(store2.values[18], [18, 18, 18])
    # appends after the repair stay aligned
    store2.append(5000, np.array([99.0, 98.0, 97.0]))
    store2.flush()
    store3 = ComponentStore.load(path)
    assert store3.len == 20
    np.testing.assert_allclose(store3.values[19], [99.0, 98.0, 97.0])


def test_torn_tail_native_header_clamp(tmp_path):
    """Native mmap engine: a crash between the ts-log commit and the
    data-log commit leaves the two headers disagreeing — store_open must
    clamp to the complete rows."""
    from elodin_tpu import native as native_mod

    if not native_mod.available():
        pytest.skip("native store unavailable")
    import struct as _struct

    ts_p = str(tmp_path / "timestamps.bin")
    da_p = str(tmp_path / "data.bin")
    s = native_mod.NativeStore(ts_p, da_p, 24)
    ts = np.arange(20, dtype="<i8")
    rows = np.repeat(np.arange(20, dtype="<f8")[:, None], 3, axis=1)
    s.append(ts, rows)
    s.flush()
    del s

    # simulate ts committed one row ahead of data
    with open(ts_p, "r+b") as f:
        f.seek(8)
        committed = _struct.unpack("<Q", f.read(8))[0]
        f.seek(8)
        f.write(_struct.pack("<Q", committed + 8))

    s2 = native_mod.NativeStore(ts_p, da_p, 24)
    assert len(s2) == 20  # clamped back to the data log's complete rows
    np.testing.assert_allclose(
        s2.rows(np.dtype("<f8"), 3)[-1], [19.0, 19.0, 19.0]
    )


def test_write_batch_ns_writer_unit_consistency(server):
    """Regression: write_batch on a timestamp='ns' writer scaled us->ns
    while write() stored us — a 1000x mismatch on the same writer."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"un.x": edb.f64}, timestamp="ns")
    writer.write(timestamp_us=1000, values={"un.x": 1.0})
    writer.write_batch(np.array([2000]), {"un.x": np.array([2.0])})
    time.sleep(0.3)
    ts, vals = client.time_series("un.x")
    assert list(ts) == [1000, 2000], ts
    writer.close()
    client.close()


def test_sql_error_surfaces_quickly(server):
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"se.x": edb.f64})
    writer.write(timestamp_us=1, values={"se.x": 1.0})
    time.sleep(0.3)
    t0 = time.time()
    with pytest.raises(RuntimeError):
        client.sql("SELECT definitely_bogus FROM nowhere")
    assert time.time() - t0 < 5.0  # used to hang 10 s then queue.Empty
    writer.close()
    client.close()


def test_stream_close_wakes_blocked_reader(server):
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"cw.x": edb.f64})
    writer.write(timestamp_us=1, values={"cw.x": 1.0})
    time.sleep(0.2)
    s = client.stream(["cw.x"])  # real-time: no data coming
    got = []

    def reader():
        try:
            for _row in s:
                pass
        except Exception:
            pass
        got.append("done")

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    time.sleep(0.3)
    s.close()
    t.join(timeout=5)
    assert got == ["done"], "blocked __next__ never woke after close()"
    # the released req id is reusable without colliding
    assert float(client.latest("cw.x").values) == 1.0
    writer.close()
    client.close()


def test_cobs_zero_after_full_window():
    """Regression: a 0x00 immediately after a 254-byte zero-free run was
    silently dropped (the window-capped 0xFF group consumed it)."""
    from elodin_tpu.db.framing import cobs_decode, cobs_encode

    import random

    cases = [
        b"\x01" * 254 + b"\x00" + b"BB",
        b"\x01" * 254,
        b"\x01" * 255,
        b"\x01" * 508 + b"\x00\x00\x01",
    ]
    rng = random.Random(0)
    for _ in range(500):
        cases.append(bytes(rng.randrange(256) for _ in range(rng.randrange(600))))
    for c in cases:
        enc = cobs_encode(c)
        assert b"\x00" not in enc[:-1]
        assert cobs_decode(enc) == c


def test_vtable_cycle_rejected_and_server_survives(server):
    """Regression: a client-supplied vtable whose op-DAG cycles hung
    static_layout forever (remote DoS); now it errors and the connection
    keeps serving."""
    from elodin_tpu.db.vtable import Field, Op, OP_SCHEMA, OP_TIMESTAMP, VTable

    vt = VTable(
        ops=[Op(OP_TIMESTAMP, source=0, arg=0)],  # self-cycle
        fields=[Field(0, 8, 0)],
        data=bytearray(),
    )
    with pytest.raises((ValueError, IndexError)):
        vt.static_layout()

    client = edb.Client.connect(server.addr)
    # send the evil vtable + a table packet for it over the wire
    client._conn.send_bytes(M.VTableMsg(b"\x66\x66", vt).packet())
    client._conn.send_bytes(M.frame(M.TY_TABLE, b"\x66\x66", b"\x00" * 16))
    time.sleep(0.3)
    # connection (and server) still alive and serving
    writer = client.table_writer({"alive.x": edb.f64})
    writer.write(timestamp_us=7, values={"alive.x": 1.0})
    time.sleep(0.3)
    assert float(client.latest("alive.x").values) == 1.0
    writer.close()
    client.close()


def test_kdl_roundtrip_hostile_values():
    from elodin_tpu.kdl import Node, parse, serialize

    vals = ["dir\\name x", "42", "//x", "1.5", "q\"t", "a b", "nl\nend",
            "path/to/x.glb", "", True, None, 3, 2.5]
    n = parse(serialize([Node("n", args=vals, props={"s p": 2, "k": "v/w"})]))
    assert n[0].args == vals
    assert n[0].props == {"s p": 2, "k": "v/w"}
    with pytest.raises(ValueError):
        parse("a b=")


def test_merge_overlapping_sources_sorted(tmp_path):
    """Regression: merging databases whose recordings overlap in time left
    unsorted timestamps on disk, silently corrupting every range query."""
    from elodin_tpu.db.__main__ import main as db_main
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.vtable import component_id_of

    cid = component_id_of("m.x")
    a = Database(str(tmp_path / "a"))
    sa = a.get_or_create(cid, "f64", (), "m.x")
    for t in (0, 200, 400):
        sa.append(t, np.float64(t))
    a.flush()
    b = Database(str(tmp_path / "b"))
    sb = b.get_or_create(cid, "f64", (), "m.x")
    for t in (100, 300, 500):
        sb.append(t, np.float64(t))
    b.flush()

    dst = str(tmp_path / "dst")
    db_main(["merge", dst, str(tmp_path / "a"), str(tmp_path / "b")])

    merged = Database(dst)
    store = merged.components[cid]
    ts = np.asarray(store.timestamps[: store.len])
    assert list(ts) == [0, 100, 200, 300, 400, 500]
    # values rode along with their timestamps
    np.testing.assert_allclose(
        store.values[: store.len, 0], [0, 100, 200, 300, 400, 500]
    )
    # range query behaves on the merged result
    rts, rv = store.range(150, 450)
    assert list(rts) == [200, 300, 400]


def test_sql_asof_explicit_on_duplicates_and_nulls():
    """Regression bundle for the SQL layer: DataFusion-style ASOF ON
    clauses, duplicate join column names, NULL times from the LEFT JOIN,
    aliased fft projections, no-result statements, and the read-only
    allow-list."""
    from elodin_tpu.db.sql import run_sql
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.vtable import component_id_of

    db = Database()
    a = db.get_or_create(component_id_of("a.x"), "f64", (), "a_x")
    b = db.get_or_create(component_id_of("b.x"), "f64", (), "b_x")
    for t in (0, 100, 200):
        a.append(t, np.float64(t))
    for t in (150, 250):
        b.append(t, np.float64(t * 10))

    # explicit ON clause (the docstring form) used to emit two ON clauses
    t1 = run_sql(db, "SELECT a_x.time, a_x.a_x, b_x.b_x FROM a_x "
                     "ASOF JOIN b_x ON a_x.time >= b_x.time")
    assert t1.num_rows == 3
    # rows before any b row carry NULL (used to TypeError on None->int64)
    t2 = run_sql(db, "SELECT a_x.time, b_x.time, b_x.b_x FROM a_x ASOF JOIN b_x")
    assert t2.column_names == ["time", "time_2", "b_x"]  # no silent collapse
    assert t2["time_2"].to_pylist()[0] is None
    # aliased fft projection
    t3 = run_sql(db, "SELECT fft(a_x) AS spectrum FROM a_x")
    assert t3.column_names == ["spectrum"]
    # statements without result sets / writes are rejected up front
    for evil in ("BEGIN", "ATTACH DATABASE '/tmp/x.db' AS pwn", "PRAGMA foo"):
        with pytest.raises(ValueError):
            run_sql(db, evil)


def test_eql_sql_parity_and_fallback():
    from elodin_tpu.db.eql import eql, eql_sql
    from elodin_tpu.db.storage import Database
    from elodin_tpu.db.vtable import component_id_of

    db = Database()
    v = db.get_or_create(component_id_of("veh.pos"), "f64", (3,), "veh.pos")
    v.metadata["element_names"] = "x,y,z"
    for t in range(10):
        v.append(t * 1000, np.array([t, -2.0 * t, 0.5]))

    # norm() of a selected element is |x|, matching the numpy path
    tb = eql_sql(db, "veh.pos.y.norm()")
    col = [c for c in tb.column_names if c != "time"][0]
    np.testing.assert_allclose(tb[col].to_pylist(),
                               np.asarray(eql(db, "veh.pos.y.norm()").values))
    # non-SQL formulas fall back to the numpy evaluator (docstring contract)
    assert eql_sql(db, "veh.pos.x.fft()").num_rows > 0
    assert eql_sql(db, "(veh.pos.x + veh.pos.y).norm()").num_rows == 10
    # trailing garbage is a parse error, not a silent partial parse
    with pytest.raises(ValueError):
        eql(db, "veh.pos.x 2")


def test_postcard_reader_truncated_bytes_raises():
    r = Reader(b"\x05ab")  # declares 5 bytes, 2 remain
    with pytest.raises(ValueError):
        r.bytes_()


def test_runt_frame_does_not_kill_connection(server):
    """Regression: a frame whose length prefix is smaller than the packet
    header crashed parse_packet OUTSIDE the per-packet guard, tearing down
    the connection and all its streams."""
    client = edb.Client.connect(server.addr)
    writer = client.table_writer({"rn.x": edb.f64})
    writer.write(timestamp_us=1, values={"rn.x": 1.0})
    time.sleep(0.2)
    # runt frames: length 0 and length 2 (< header size)
    client._conn.send_bytes((0).to_bytes(4, "little"))
    client._conn.send_bytes((2).to_bytes(4, "little") + b"\x00\x01")
    time.sleep(0.2)
    # connection still serves requests
    writer.write(timestamp_us=2, values={"rn.x": 2.0})
    time.sleep(0.2)
    assert float(client.latest("rn.x").values) == 2.0
    writer.close()
    client.close()


def test_stream_states_isolated_per_connection(server):
    """Regression: replay stream states were keyed server-globally by the
    client-chosen id, so one connection's SetStreamState seeked another
    connection's replay."""
    ca = edb.Client.connect(server.addr)
    wa = ca.table_writer({"iso.x": edb.f64})
    for i in range(50):
        wa.write(timestamp_us=i * 1000, values={"iso.x": float(i)})
    time.sleep(0.3)

    def open_replay(client):
        rid = client._conn.next_req_id()
        behavior = M.FixedRateBehavior("earliest", int(1e9 // 100), 100)
        q = client._conn.request_stream(
            M.Stream(behavior, id=rid).packet(rid), rid
        )
        return rid, q

    cb = edb.Client.connect(server.addr)
    rid_a, qa = open_replay(ca)
    rid_b, qb = open_replay(cb)
    assert rid_a == rid_b  # same client-chosen id on both connections

    def next_ts(q, timeout=5.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                pkt = q.get(timeout=1)
            except Exception:
                continue
            if pkt.ty == M.TY_MSG and pkt.id == M.StreamTimestamp.ID:
                return M.StreamTimestamp.decode(pkt.body).timestamp
        raise AssertionError("no stream timestamp")

    next_ts(qa), next_ts(qb)
    # pause ONLY connection A's stream; B must keep advancing
    ca._conn.send_bytes(M.SetStreamState(id=rid_a, playing=False).packet())
    time.sleep(0.3)
    t1 = next_ts(qb)
    t2 = next_ts(qb)
    assert t2 > t1, "connection B's replay was paused by A's SetStreamState"
    wa.close()
    ca.close()
    cb.close()
