"""FSW host framework tests (parity model: fsw/roci typed worlds + rate
drivers + the fsw/mekf service wiring sim -> DB -> estimator)."""

import typing as ty
from dataclasses import dataclass, field

import jax
import numpy as np
import pytest

import elodin as el
import elodin_tpu.db as edb
from elodin_tpu import fsw

GyroOmega = ty.Annotated[
    jax.Array, el.Component("gyro_omega", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
MagBody = ty.Annotated[
    jax.Array, el.Component("mag_body", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
MagRef = ty.Annotated[
    jax.Array, el.Component("mag_ref", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
SunBody = ty.Annotated[
    jax.Array, el.Component("sun_body", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
SunRef = ty.Annotated[
    jax.Array, el.Component("sun_ref", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
AttEst = ty.Annotated[
    jax.Array, el.Component("att_est", el.ComponentType(el.PrimitiveType.F64, (4,)))
]


@dataclass
class AdcsWorld:
    gyro_omega: GyroOmega = field(default_factory=lambda: np.zeros(3))
    mag_body: MagBody = field(default_factory=lambda: np.zeros(3))
    mag_ref: MagRef = field(default_factory=lambda: np.array([1.0, 0, 0]))
    sun_body: SunBody = field(default_factory=lambda: np.zeros(3))
    sun_ref: SunRef = field(default_factory=lambda: np.array([0.0, 0, 1.0]))
    att_est: AttEst = field(default_factory=lambda: np.array([0.0, 0, 0, 1.0]))


def test_world_components():
    comps = fsw.world_components(AdcsWorld)
    assert comps["gyro_omega"].name == "gyro_omega"
    assert comps["att_est"].ty.shape == (4,)


def test_hz_driver_rate_and_pipe():
    calls = []

    def sys_a(world):
        calls.append("a")

    def sys_b(world):
        calls.append("b")

    driver = fsw.HzDriver(
        500.0, fsw.as_fsw_system(sys_a).pipe(fsw.as_fsw_system(sys_b)),
        AdcsWorld(),
    )
    import time

    t0 = time.perf_counter()
    driver.run(max_ticks=50)
    wall = time.perf_counter() - t0
    assert calls[:4] == ["a", "b", "a", "b"]
    assert driver.ticks == 50
    assert wall >= 0.08  # paced, not free-running


def test_mekf_service_against_live_db(tmp_path):
    """End-to-end FSW loop: a 'sensor' writes observations into the DB, the
    MEKF service subscribes, estimates, and publishes attitude back."""
    from elodin_tpu.spatial import quat_from_axis_angle, quat_inverse, quat_rotate

    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        q_true = np.asarray(quat_from_axis_angle(np.array([0.0, 0.0, 1.0]), 0.6))
        qi = quat_inverse(q_true)
        mag_ref = np.array([1.0, 0.0, 0.0])
        sun_ref = np.array([0.0, 0.0, 1.0])
        mag_body = np.asarray(quat_rotate(qi, mag_ref))
        sun_body = np.asarray(quat_rotate(qi, sun_ref))

        sensor = edb.Client.connect(srv.addr)
        writer = sensor.table_writer(
            {
                "gyro_omega": edb.f64[3],
                "mag_body": edb.f64[3],
                "sun_body": edb.f64[3],
            }
        )
        import time as _t

        writer.write(
            timestamp_us=1,
            values={
                "gyro_omega": np.zeros(3),
                "mag_body": mag_body,
                "sun_body": sun_body,
            },
        )
        _t.sleep(0.3)

        dt = 1.0 / 50.0
        system = fsw.mekf_system(
            sigma_g=[0.01] * 3, sigma_b=[0.01] * 3, dt=dt,
            refs_fields=["mag_ref", "sun_ref"],
            body_fields=["mag_body", "sun_body"],
            sigmas=[0.03, 0.03],
        )
        driver = fsw.HzDriver(
            200.0, system, AdcsWorld(),
            db_addr=srv.addr,
            subscribe=["gyro_omega", "mag_body", "sun_body"],
            publish=["att_est"],
        )
        driver.run(max_ticks=150)
        driver.close()

        est = sensor.latest("att_est")
        assert est is not None
        dot = abs(float(np.dot(est.values, q_true)))
        assert dot > 0.999, f"FSW MEKF did not converge: {dot}"
        writer.close()
        sensor.close()
    finally:
        srv.stop()


def test_s10_supervisor_restart_policies(tmp_path):
    """Restart policies (libs/s10 run loop): on-failure restarts a crashing
    process, never leaves it dead, always restarts clean exits too."""
    import sys
    import time

    from elodin_tpu.s10 import ProcessRecipe, Supervisor

    marker = tmp_path / "runs.txt"
    crash = ProcessRecipe(
        name="crasher",
        cmd=sys.executable,
        args=["-c", f"open(r'{marker}', 'a').write('x'); raise SystemExit(3)"],
        restart_policy="on-failure",
    )
    clean_never = ProcessRecipe(
        name="oneshot",
        cmd=sys.executable,
        args=["-c", "pass"],
        restart_policy="never",
    )
    def count(path, ch):
        try:
            return path.read_text().count(ch)
        except FileNotFoundError:
            return 0

    sup = Supervisor()
    sup.start([crash, clean_never])
    deadline = time.time() + 30.0
    while time.time() < deadline:
        sup.tick()
        if count(marker, "x") >= 2:
            break
        time.sleep(0.1)
    sup.stop_all()
    assert count(marker, "x") >= 2  # restarted after crash

    # 'always' restarts even a clean exit
    marker2 = tmp_path / "always.txt"
    always = ProcessRecipe(
        name="always",
        cmd=sys.executable,
        args=["-c", f"open(r'{marker2}', 'a').write('y')"],
        restart_policy="always",
    )
    sup2 = Supervisor()
    sup2.start([always])
    deadline = time.time() + 30.0
    while time.time() < deadline:
        sup2.tick()
        if count(marker2, "y") >= 2:
            break
        time.sleep(0.1)
    sup2.stop_all()
    assert count(marker2, "y") >= 2


def test_s10_liveness_kill(tmp_path):
    """A hung sim (stale liveness beacon) is killed by the supervisor
    within the timeout (libs/s10/src/liveness.rs, probe-driven kill)."""
    import sys
    import time as _time

    from elodin_tpu.s10 import ProcessRecipe, Supervisor

    child = tmp_path / "hang.py"
    child.write_text(
        "import json, socket, sys, time\n"
        "port = int(sys.argv[sys.argv.index('--liveness-port')+1])\n"
        "s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)\n"
        "for _ in range(3):\n"
        "    s.sendto(json.dumps({'age_s': 0}).encode(), ('127.0.0.1', port))\n"
        "    time.sleep(0.1)\n"
        "time.sleep(60)  # hang: no more beacons\n"
    )
    recipe = ProcessRecipe(
        name="hang", cmd=sys.executable, args=[str(child)],
        liveness_timeout=1.0,
    )
    sup = Supervisor()
    sup.start([recipe])
    rp = sup.running[0]
    deadline = _time.monotonic() + 6.0
    while _time.monotonic() < deadline and rp.poll() is None:
        sup.tick()
        _time.sleep(0.2)
    assert rp.poll() is not None, "hung child was not killed"
    sup.stop_all()


def test_s10_ready_probe_and_watch(tmp_path):
    import sys
    import time as _time

    from elodin_tpu.s10 import ProcessRecipe, ReadyProbe, Supervisor

    marker = tmp_path / "ready.marker"
    src = tmp_path / "watched.txt"
    src.write_text("v1")
    child = tmp_path / "serve.py"
    child.write_text(
        f"import pathlib, time\n"
        f"pathlib.Path({str(marker)!r}).write_text('up')\n"
        f"time.sleep(60)\n"
    )
    recipe = ProcessRecipe(
        name="probe", cmd=sys.executable, args=[str(child)],
        ready=ReadyProbe(type="file", path=str(marker)),
        watch=[str(src)],
    )
    sup = Supervisor()
    sup.start([recipe])
    assert sup.wait_ready(timeout=10.0)
    pid0 = sup.running[0].proc.pid
    _time.sleep(0.05)
    src.write_text("v2")  # source change -> watch restart
    import os
    os.utime(src, (os.stat(src).st_atime, os.stat(src).st_mtime + 5))
    sup.tick()
    assert sup.running[0].proc.pid != pid0, "watch did not restart child"
    sup.stop_all()


def test_serial_bridge_pty_to_db(tmp_path):
    """UART->DB bridge (fsw/serial-bridge equivalent): COBS-framed
    impeller2 packets written to a pty end up in the database."""
    import os
    import struct
    import time

    import elodin_tpu.db as edb
    from elodin_tpu.db import msgs as M
    from elodin_tpu.db.vtable import build_table_vtable
    from elodin_tpu.fsw_services import SerialBridge, frame_packet_cobs

    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        master, slave = os.openpty()
        bridge = SerialBridge(slave, srv.addr)

        vt = build_table_vtable([("uart.imu", "f64", (3,), 8, 24)],
                                timestamp_offset=0)
        vt_id = bytes([6, 1])
        os.write(master, frame_packet_cobs(M.VTableMsg(vt_id, vt).packet()))
        from elodin_tpu.db.vtable import component_id_of
        os.write(master, frame_packet_cobs(M.SetComponentMetadata(
            component_id_of("uart.imu"), "uart.imu", {}).packet()))
        time.sleep(0.3)
        for i in range(5):
            body = struct.pack("<q", i * 10) + struct.pack(
                "<3d", float(i), 0.5, -float(i)
            )
            os.write(master, frame_packet_cobs(
                M.frame(M.TY_TABLE, vt_id, body)))
        time.sleep(0.5)

        client = edb.Client.connect(srv.addr)
        ts, vals = client.time_series("uart.imu")
        assert list(ts) == [0, 10, 20, 30, 40]
        np.testing.assert_allclose(vals[-1], [4.0, 0.5, -4.0])
        assert bridge.frames_forwarded == 7
        client.close()
        bridge.stop()
        os.close(master)
    finally:
        srv.stop()


def test_blackbox_decode(tmp_path):
    """Blackbox log decode (fsw/blackbox equivalent): a file of COBS
    frames replays into a Database."""
    import struct

    from elodin_tpu.db import msgs as M
    from elodin_tpu.db.postcard import msg_id
    from elodin_tpu.db.vtable import build_table_vtable, component_id_of
    from elodin_tpu.fsw_services import decode_blackbox, frame_packet_cobs

    vt = build_table_vtable([("bb.alt", "f64", (), 8, 8)], timestamp_offset=0)
    vt_id = bytes([6, 2])
    log = tmp_path / "blackbox.bin"
    with open(log, "wb") as f:
        f.write(frame_packet_cobs(M.VTableMsg(vt_id, vt).packet()))
        for i in range(10):
            body = struct.pack("<q", i * 1000) + struct.pack("<d", i * 1.5)
            f.write(frame_packet_cobs(M.frame(M.TY_TABLE, vt_id, body)))
        f.write(frame_packet_cobs(M.frame(
            M.TY_MSG_WITH_TIMESTAMP, msg_id("bb_event"),
            struct.pack("<q", 5000) + b"apogee")))

    db = decode_blackbox(str(log))
    store = db.components[component_id_of("bb.alt")]
    assert store.len == 10
    assert store.values[9, 0] == 13.5
    entries = db.msg_log(msg_id("bb_event")).entries
    assert entries == [(5000, b"apogee")]


def test_host_telemetry_bridge(tmp_path):
    """tegrastats-bridge equivalent: host cpu/mem/load published into the
    DB at a fixed rate."""
    import time

    import elodin_tpu.db as edb
    from elodin_tpu.fsw_services import HostTelemetryBridge

    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        bridge = HostTelemetryBridge(srv.addr, prefix="soc", rate_hz=20.0)
        deadline = time.time() + 10
        while time.time() < deadline and bridge.samples < 5:
            time.sleep(0.1)
        bridge.stop()
        client = edb.Client.connect(srv.addr)
        ts, cpu = client.time_series("soc.cpu")
        _, mem = client.time_series("soc.mem")
        assert len(ts) >= 5
        assert (cpu >= 0.0).all() and (cpu <= 1.0).all()
        assert (mem[:, 1] > 0).all() and (mem[:, 0] <= mem[:, 1]).all()
        client.close()
    finally:
        srv.stop()


def test_lqr_service_against_live_db(tmp_path):
    """fsw/lqr service equivalent: subscribes to attitude estimate + rates,
    publishes Yang-LQR control torque; torque must oppose the attitude
    error and vanish at the goal."""
    import time as _t

    from elodin_tpu.spatial import quat_from_axis_angle

    Goal = ty.Annotated[
        jax.Array,
        el.Component("att_goal", el.ComponentType(el.PrimitiveType.F64, (4,))),
    ]
    Torque = ty.Annotated[
        jax.Array,
        el.Component(
            "control_torque", el.ComponentType(el.PrimitiveType.F64, (3,))
        ),
    ]

    @dataclass
    class LqrWorld:
        gyro_omega: GyroOmega = field(default_factory=lambda: np.zeros(3))
        att_est: AttEst = field(default_factory=lambda: np.array([0.0, 0, 0, 1.0]))
        att_goal: Goal = field(default_factory=lambda: np.array([0.0, 0, 0, 1.0]))
        control_torque: Torque = field(default_factory=lambda: np.zeros(3))

    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        sensor = edb.Client.connect(srv.addr)
        writer = sensor.table_writer(
            {"att_est": edb.f64[4], "gyro_omega": edb.f64[3],
             "att_goal": edb.f64[4]}
        )
        # attitude 0.4 rad off goal about +z, no body rates
        q = np.asarray(quat_from_axis_angle(np.array([0.0, 0.0, 1.0]), 0.4))
        writer.write(
            timestamp_us=1,
            values={"att_est": q, "gyro_omega": np.zeros(3),
                    "att_goal": np.array([0.0, 0, 0, 1.0])},
        )
        _t.sleep(0.3)

        system = fsw.lqr_system(
            j=[1.0, 1.0, 1.0], q_ang_vel=[1.0] * 3, q_pos=[1.0] * 3,
            r=[1.0] * 3,
        )
        driver = fsw.HzDriver(
            200.0, system, LqrWorld(),
            db_addr=srv.addr,
            subscribe=["att_est", "gyro_omega", "att_goal"],
            publish=["control_torque"],
        )
        driver.run(max_ticks=60)
        driver.close()

        t = sensor.latest("control_torque")
        assert t is not None
        # error rotation is +0.4 rad about z -> restoring torque about -z
        assert t.values[2] < -0.05, t.values
        assert abs(t.values[0]) < 1e-9 and abs(t.values[1]) < 1e-9

        # at the goal the torque vanishes
        writer.write(
            timestamp_us=2_000_000,
            values={"att_est": np.array([0.0, 0, 0, 1.0]),
                    "gyro_omega": np.zeros(3),
                    "att_goal": np.array([0.0, 0, 0, 1.0])},
        )
        _t.sleep(0.3)
        driver2 = fsw.HzDriver(
            200.0, system, LqrWorld(),
            db_addr=srv.addr,
            subscribe=["att_est", "gyro_omega", "att_goal"],
            publish=["control_torque"],
        )
        driver2.run(max_ticks=30)
        driver2.close()
        t2 = sensor.latest("control_torque")
        np.testing.assert_allclose(t2.values, 0.0, atol=1e-12)
        writer.close()
        sensor.close()
    finally:
        srv.stop()


def test_s10_admission_budget(tmp_path):
    """S10_MAX_INFLIGHT (libs/s10/src/admission.rs): at most N recipes run
    concurrently; the rest queue until a slot frees."""
    import sys
    import time as _time

    from elodin_tpu.s10 import ProcessRecipe, Supervisor

    marker = tmp_path / "order.txt"
    recipes = [
        ProcessRecipe(
            name=f"r{i}", cmd=sys.executable,
            args=["-c",
                  f"import time; open(r'{marker}', 'a').write('{i}');"
                  " time.sleep(0.4)"],
        )
        for i in range(4)
    ]
    sup = Supervisor(max_inflight=2)
    sup.start(recipes)
    assert sum(1 for rp in sup.running if rp.poll() is None) <= 2
    assert len(sup.queued) == 2
    deadline = _time.monotonic() + 20
    while _time.monotonic() < deadline:
        sup.tick()
        if (
            not sup.queued
            and all(rp.poll() is not None for rp in sup.running)
        ):
            break
        _time.sleep(0.1)
    sup.stop_all()
    assert sorted(marker.read_text()) == ["0", "1", "2", "3"]


def test_status_banner(tmp_path):
    """aleph-status equivalent: banner sections + live DB rows
    (fsw/aleph-status/src/main.rs)."""
    import subprocess
    import sys as _s
    import time

    import numpy as np

    from elodin_tpu.db import Client, Server

    srv = Server.start(str(tmp_path / "db"))
    try:
        c = Client.connect(srv.addr)
        c.send("imu.accel", np.array([0.1, 0.2, 9.81]), timestamp_us=1_000_000)
        time.sleep(0.3)
        out = subprocess.run(
            [_s.executable, "-m", "elodin_tpu.status",
             "--db-addr", srv.addr],
            capture_output=True, text=True, timeout=120,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
                 "NO_COLOR": "1"},
        )
        assert out.returncode == 0, out.stderr
        for section in ("OS Info", "HW Info", "Accelerators", "Telemetry DB"):
            assert section in out.stdout, out.stdout
        assert "imu.accel" in out.stdout
        assert "9.81" in out.stdout
        c.close()
    finally:
        srv.stop()
