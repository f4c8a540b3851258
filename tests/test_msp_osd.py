"""MSP DisplayPort OSD service tests (fsw/msp-osd parity)."""

import io
import math

import numpy as np


def _parse_msp(stream: bytes):
    """Independent MSP v1/v2 frame parser for validating emitted bytes."""
    frames = []
    i = 0
    while i < len(stream):
        assert stream[i] == ord("$")
        if stream[i + 1] == ord("M"):
            size = stream[i + 3]
            cmd = stream[i + 4]
            payload = stream[i + 5 : i + 5 + size]
            cksum = stream[i + 5 + size]
            x = size ^ cmd
            for b in payload:
                x ^= b
            assert x == cksum, "MSPv1 checksum mismatch"
            frames.append(("v1", cmd, bytes(payload)))
            i += 6 + size
        else:
            assert stream[i + 1] == ord("X")
            cmd = int.from_bytes(stream[i + 4 : i + 6], "little")
            size = int.from_bytes(stream[i + 6 : i + 8], "little")
            payload = stream[i + 8 : i + 8 + size]
            frames.append(("v2", cmd, bytes(payload)))
            i += 9 + size
    return frames


def test_crc8_dvb_s2_check_value():
    from elodin_tpu.msp_osd import crc8_dvb_s2

    # published CRC-8/DVB-S2 check value
    assert crc8_dvb_s2(b"123456789") == 0xBC
    assert crc8_dvb_s2(b"") == 0


def test_msp_frame_encoding():
    from elodin_tpu.msp_osd import (
        MSP2_COMMON_SET_RECORDING,
        MSP_DISPLAYPORT,
        crc8_dvb_s2,
        encode_msp_v1,
        encode_msp_v2,
    )

    f = encode_msp_v1(MSP_DISPLAYPORT, b"\x03\x02\x05\x00hi\x00")
    assert f[:3] == b"$M>"
    [(ver, cmd, payload)] = _parse_msp(f)
    assert (ver, cmd, payload) == ("v1", 182, b"\x03\x02\x05\x00hi\x00")

    f2 = encode_msp_v2(MSP2_COMMON_SET_RECORDING, b"\x01")
    assert f2[:3] == b"$X<"
    assert f2[-1] == crc8_dvb_s2(f2[3:-1])
    [(ver, cmd, payload)] = _parse_msp(f2)
    assert (ver, cmd, payload) == ("v2", 0x3005, b"\x01")


def test_osd_grid():
    from elodin_tpu.msp_osd import OsdGrid

    g = OsdGrid(4, 10)
    g.write_text(1, 2, "hello")
    assert g.line(1) == "  hello   "
    g.write_centered(2, "ab")
    assert g.line(2) == "    ab    "
    g.write_right_aligned(3, "xy")
    assert g.line(3) == "        xy"
    g.write_text(0, 8, "clip-me")      # clipped at the right edge
    assert g.line(0) == "        cl"
    g.write_text(9, 0, "off")          # off-grid row ignored
    assert [r for r, _ in g.non_empty_lines()] == [0, 1, 2, 3]
    g.clear()
    assert list(g.non_empty_lines()) == []


def test_telemetry_derivations():
    from elodin_tpu.msp_osd import TelemetryState

    s = TelemetryState()
    # 30-degree yaw about z, position (1, 2, 120)
    half = math.radians(15)
    s.update_world_pos(np.array(
        [0.0, 0.0, math.sin(half), math.cos(half), 1.0, 2.0, 120.0]
    ))
    s.update_world_vel(np.array([0.0, 0.0, 0.0, 3.0, 4.0, 0.0]))
    assert s.altitude_m() == 120.0
    assert abs(s.speed_ms() - 5.0) < 1e-12
    roll, pitch, yaw = s.euler_deg()
    assert abs(roll) < 1e-9 and abs(pitch) < 1e-9
    assert abs(yaw - 30.0) < 1e-9
    # moving: heading follows course over ground, not yaw
    assert abs(s.heading_deg() - math.degrees(math.atan2(4, 3))) < 1e-9
    s.update_world_vel(np.zeros(6))
    assert abs(s.heading_deg() - 30.0) < 1e-9


def test_osd_service_live_db(tmp_path):
    """End-to-end: live DB -> MSP DisplayPort byte stream
    (main.rs + db_client.rs loop)."""
    from elodin_tpu.db import Client, Server
    from elodin_tpu.msp_osd import (
        MSP_DP_CLEAR_SCREEN,
        MSP_DP_DRAW_SCREEN,
        MSP_DP_HEARTBEAT,
        MSP_DP_OPTIONS,
        MSP_DP_WRITE_STRING,
        DisplayPortBackend,
        MspOsdService,
    )

    srv = Server.start(str(tmp_path / "db"))
    try:
        c = Client.connect(srv.addr)
        c.send("drone.world_pos",
               np.array([0.0, 0.0, 0.0, 1.0, 10.0, 20.0, 55.5]),
               timestamp_us=1_000_000)
        c.send("drone.world_vel",
               np.array([0.0, 0.0, 0.0, 6.0, 8.0, 0.0]),
               timestamp_us=1_000_000)
        c.send("tgt.world_pos",
               np.array([0.0, 0.0, 0.0, 1.0, 100.0, 20.0, 55.5]),
               timestamp_us=1_000_000)
        import time
        time.sleep(0.3)

        buf = io.BytesIO()
        svc = MspOsdService(srv.addr, "drone", DisplayPortBackend(buf),
                            target_entity="tgt", rate_hz=50.0)
        frames_rendered = svc.run(max_frames=2)
        assert frames_rendered == 2
        c.close()
    finally:
        srv.stop()

    frames = _parse_msp(buf.getvalue())
    subcmds = [p[0] for v, cmd, p in frames if (v, cmd) == ("v1", 182)]
    # init: options + heartbeat; then per frame: clear, writes, draw
    assert subcmds[0] == MSP_DP_OPTIONS
    assert subcmds[1] == MSP_DP_HEARTBEAT
    assert subcmds.count(MSP_DP_CLEAR_SCREEN) == 3  # 2 frames + cleanup
    assert subcmds.count(MSP_DP_DRAW_SCREEN) == 3
    writes = [p for v, cmd, p in frames
              if (v, cmd) == ("v1", 182) and p[0] == MSP_DP_WRITE_STRING]
    texts = [w[4:-1].decode() for w in writes]
    assert any("ALT    55.5" in t for t in texts), texts
    assert any("SPD   10.0" in t for t in texts), texts
    assert any(t.startswith("TGT") for t in texts), texts
    assert any("RDY DB" in t for t in texts), texts
    # row/col bytes in range
    for w in writes:
        assert w[1] < 18 and w[2] < 50
