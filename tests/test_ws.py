"""WebSocket transport for the DB wire protocol (elodin_tpu/db/ws.py) —
the impeller2 ws transport equivalent (libs/db/src/lib.rs ws route):
GET /ws on the assets HTTP port upgrades and relays the FULL packet
protocol to the TCP server."""

import numpy as np

import elodin_tpu.db as edb
from elodin_tpu.db import msgs as M
from elodin_tpu.db.ws import WsClient


def _read_packets(ws, want_ty, count=1, max_msgs=50):
    """Reassemble length-framed packets from WS byte-stream messages."""
    buf = bytearray()
    out = []
    for _ in range(max_msgs):
        buf += ws.recv_bytes()
        while len(buf) >= 4:
            n = int.from_bytes(buf[:4], "little")
            if len(buf) - 4 < n:
                break
            pkt = M.parse_packet(bytes(buf[4:4 + n]))
            del buf[:4 + n]
            if pkt.ty == want_ty:
                out.append(pkt)
                if len(out) >= count:
                    return out
    raise AssertionError(f"wanted {count} packets of ty={want_ty}, got {out}")


def test_ws_bridge_speaks_the_wire_protocol(tmp_path):
    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        c = edb.Client.connect(srv.addr)
        spec = edb.f64[3].labeled("x", "y", "z")
        with c.table_writer({"ball.world_pos": spec}) as w:
            w.write(1_000_000, {"ball.world_pos": np.array([1.0, 2.0, 3.0])})

        ws = WsClient("127.0.0.1", srv.port + 1)
        try:
            # control plane: DumpMetadata over WS == over TCP
            ws.send_bytes(M.DumpMetadata().packet(7))
            (pkt,) = _read_packets(ws, M.TY_MSG)
            resp = M.DumpMetadataResp.decode(pkt.body)
            names = {m.name for m in resp.component_metadata}
            assert "ball.world_pos" in names

            # chunked send: a packet split across two WS messages must
            # reassemble (byte-stream semantics)
            raw = M.DumpMetadata().packet(9)
            ws.send_bytes(raw[:5])
            ws.send_bytes(raw[5:])
            (pkt2,) = _read_packets(ws, M.TY_MSG)
            assert M.DumpMetadataResp.decode(pkt2.body) is not None
        finally:
            ws.close()
    finally:
        srv.stop()


def test_ws_upgrade_refused_without_headers(tmp_path):
    import urllib.error
    import urllib.request

    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port + 1}/ws", timeout = 5)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()
