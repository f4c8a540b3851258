"""FSW service equivalents: serial-bridge and blackbox.

The reference runs these as standalone Rust binaries on the flight computer
(fsw/serial-bridge/src/main.rs: UART -> COBS-framed impeller2 packets ->
DB; fsw/blackbox: decode SD-card logs into the DB).  Here they are Python
services over the same wire formats (COBS framing from db/framing.py,
packets from db/msgs.py), testable against a pty / log file.
"""

from __future__ import annotations

import os
import threading

from .db import msgs as M
from .db.framing import CobsStream, cobs_encode
from .db.storage import Database, now_timestamp_us
from .db.vtable import VTable


class SerialBridge:
    """Bridge a COBS-framed serial byte stream into an elodin-db server
    (fsw/serial-bridge/src/main.rs).

    Each COBS frame carries one impeller2 packet WITHOUT the 4-byte length
    prefix (the frame boundary is the length).  Table packets are realized
    against vtables previously registered on the stream; msg packets are
    appended to the DB's msg logs.
    """

    def __init__(self, fd: int, db_addr: str):
        from .db.client import _Conn

        self.fd = fd
        if os.isatty(fd):
            # serial/pty endpoints must be raw: canonical mode cooks the
            # binary stream (CR/LF translation, echo, EOF chars)
            import tty

            tty.setraw(fd)
        self.conn = _Conn(db_addr)
        self.stream = CobsStream()
        self.frames_forwarded = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._pump, daemon=True,
                                        name="serial-bridge")
        self._thread.start()

    def _pump(self) -> None:
        while not self._stop.is_set():
            try:
                chunk = os.read(self.fd, 4096)
            except OSError:
                break
            if not chunk:
                break
            for frame in self.stream.feed(chunk):
                if len(frame) < M.PACKET_HEADER_LEN:
                    continue
                # re-frame with the TCP length prefix and forward verbatim
                self.conn.send_bytes(
                    len(frame).to_bytes(4, "little") + frame
                )
                self.frames_forwarded += 1

    def stop(self) -> None:
        self._stop.set()
        try:
            os.close(self.fd)
        except OSError:
            pass
        self._thread.join(timeout=2)
        self.conn.close()


def frame_packet_cobs(pkt_with_len: bytes) -> bytes:
    """Encode one length-prefixed packet as a COBS frame (strip the TCP
    length prefix; the frame boundary carries it)."""
    return cobs_encode(pkt_with_len[4:]) + b"\x00"


class BlackboxDecoder:
    """Decode a COBS-framed packet log (the blackbox SD format:
    back-to-back zero-terminated COBS frames of impeller2 packets) into a
    Database (fsw/blackbox equivalent)."""

    def __init__(self, db: Database):
        self.db = db
        self.vtables: dict[bytes, VTable] = {}
        self.rows = 0
        self.msgs = 0

    def feed_file(self, path: str) -> "BlackboxDecoder":
        stream = CobsStream()
        with open(path, "rb") as f:
            while True:
                chunk = f.read(1 << 16)
                if not chunk:
                    break
                for frame in stream.feed(chunk):
                    self._handle(frame)
        return self

    def _handle(self, frame: bytes) -> None:
        if len(frame) < M.PACKET_HEADER_LEN:
            return
        pkt = M.parse_packet(frame)
        if pkt.ty == M.TY_MSG and pkt.id == M.VTableMsg.ID:
            vtm = M.VTableMsg.decode(pkt.body)
            self.vtables[vtm.id] = vtm.vtable
            self.db.vtables[vtm.id] = vtm.vtable
        elif pkt.ty == M.TY_TABLE:
            vt = self.vtables.get(pkt.id)
            if vt is None:
                return
            default_ts = now_timestamp_us()
            for f in vt.realize_fields(pkt.body):
                cid = f["component_id"]
                if cid is None or f["ty"] is None:
                    continue
                store = self.db.get_or_create(cid, f["ty"], f["shape"])
                ts = f["timestamp"] if f["timestamp"] is not None else default_ts
                store.append(ts, f["data"])
                self.rows += 1
        elif pkt.ty == M.TY_MSG_WITH_TIMESTAMP:
            ts = int.from_bytes(pkt.body[:8], "little", signed=True)
            self.db.msg_log(pkt.id).append(ts, pkt.body[8:])
            self.msgs += 1
        elif pkt.ty == M.TY_MSG:
            self.db.msg_log(pkt.id).append(now_timestamp_us(), pkt.body)
            self.msgs += 1


def decode_blackbox(log_path: str, db_path: str | None = None) -> Database:
    """CLI-style one-shot: decode a blackbox log into a (new) Database."""
    db = Database(db_path)
    BlackboxDecoder(db).feed_file(log_path)
    return db
