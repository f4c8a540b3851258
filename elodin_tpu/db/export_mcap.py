"""MCAP archive export (parity: libs/db/src/export_mcap.rs).

The reference exports the whole database to a single ``.mcap`` file with one
JSON-encoded channel per component (topic ``/<component.name>``), jsonschema
channel schemas, and message ``log_time`` taken from the stored telemetry
timestamps.  This module reimplements that surface with a minimal,
dependency-free MCAP writer: non-chunked, uncompressed, no summary section —
all optional per the public MCAP spec, and accepted by standard readers.

Out of scope (editor-only in the reference): Foxglove /tf and /scene channels
derived from KDL schematics, and video attachment channels.

Record layout used (MCAP spec):
    magic   = 0x89 'M' 'C' 'A' 'P' '0' '\\r' '\\n'
    record  = opcode u8, length u64le, payload
    Header(0x01)  profile:str library:str
    Schema(0x03)  id:u16 name:str encoding:str data:u32-prefixed bytes
    Channel(0x04) id:u16 schema_id:u16 topic:str message_encoding:str
                  metadata:map<str,str>
    Message(0x05) channel_id:u16 sequence:u32 log_time:u64 publish_time:u64
                  data:rest
    DataEnd(0x0f) data_section_crc:u32 (0 = not computed)
    Footer(0x02)  summary_start:u64 summary_offset_start:u64 summary_crc:u32
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

MAGIC = b"\x89MCAP0\r\n"

OP_HEADER = 0x01
OP_FOOTER = 0x02
OP_SCHEMA = 0x03
OP_CHANNEL = 0x04
OP_MESSAGE = 0x05
OP_DATA_END = 0x0F


def _s(text: str) -> bytes:
    raw = text.encode()
    return struct.pack("<I", len(raw)) + raw


def _record(op: int, payload: bytes) -> bytes:
    return struct.pack("<BQ", op, len(payload)) + payload


def _kv_map(d: dict[str, str]) -> bytes:
    body = b"".join(_s(k) + _s(v) for k, v in d.items())
    return struct.pack("<I", len(body)) + body


class McapWriter:
    """Append-only MCAP stream writer (data section only)."""

    def __init__(self, fh, profile: str = "", library: str = "elodin-tpu"):
        self._fh = fh
        self._next_schema = 1
        self._next_channel = 0
        self._sequences: dict[int, int] = {}
        fh.write(MAGIC)
        fh.write(_record(OP_HEADER, _s(profile) + _s(library)))

    def add_schema(self, name: str, encoding: str, data: bytes) -> int:
        sid = self._next_schema
        self._next_schema += 1
        payload = struct.pack("<H", sid) + _s(name) + _s(encoding)
        payload += struct.pack("<I", len(data)) + data
        self._fh.write(_record(OP_SCHEMA, payload))
        return sid

    def add_channel(self, topic: str, schema_id: int,
                    message_encoding: str = "json",
                    metadata: dict[str, str] | None = None) -> int:
        cid = self._next_channel
        self._next_channel += 1
        payload = (
            struct.pack("<H", cid)
            + struct.pack("<H", schema_id)
            + _s(topic)
            + _s(message_encoding)
            + _kv_map(metadata or {})
        )
        self._fh.write(_record(OP_CHANNEL, payload))
        self._sequences[cid] = 0
        return cid

    def write_message(self, channel_id: int, log_time_ns: int,
                      data: bytes) -> None:
        seq = self._sequences[channel_id]
        self._sequences[channel_id] = seq + 1
        # MCAP log_time is uint64 ns; stored timestamps are signed i64 —
        # clamp pre-epoch times to 0 rather than struct.error-ing out
        # mid-export and leaving a truncated file
        log_time_ns = max(0, int(log_time_ns))
        payload = struct.pack(
            "<HIQQ", channel_id, seq, log_time_ns, log_time_ns
        ) + data
        self._fh.write(_record(OP_MESSAGE, payload))

    def finish(self) -> None:
        self._fh.write(_record(OP_DATA_END, struct.pack("<I", 0)))
        self._fh.write(_record(OP_FOOTER, struct.pack("<QQI", 0, 0, 0)))
        self._fh.write(MAGIC)


def _topic_for(name: str) -> str:
    """Component name -> topic path (export_mcap.rs:120 topic_for_component:
    dots become path separators)."""
    return "/" + name.replace(".", "/")


def _component_schema_json(store) -> bytes:
    """jsonschema for one component channel: timestamp + element fields
    (export_mcap.rs:177 component_json_schema)."""
    num = {"type": "number"}
    props: dict = {"timestamp": num}
    labels = _element_labels(store)
    for label in labels:
        props[label if label != "timestamp" else "timestamp_el"] = num
    return json.dumps(
        {"type": "object", "properties": props}, separators=(",", ":")
    ).encode()


def _element_labels(store) -> list[str]:
    labels = (store.metadata.get("element_names") or "").split(",")
    out = []
    for i in range(store.elem_count):
        if i < len(labels) and labels[i]:
            out.append(labels[i])
        elif store.elem_count == 1:
            out.append("value")
        else:
            out.append(str(i))
    return out


def export_mcap(db, path: str, include_private: bool = False) -> int:
    """Write every non-empty component series to ``path`` as one MCAP file
    with a JSON channel per component; returns the message count.
    Components flagged private are skipped unless include_private
    (export_mcap.rs:49-50,2337)."""
    from .export import _is_private

    out = Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    written = 0
    with open(out, "wb") as fh:
        w = McapWriter(fh)
        stores = sorted(
            (s for s in db.components.values()
             if s.len > 0 and (include_private or not _is_private(s))),
            key=lambda s: s.name or f"{s.component_id:016x}",
        )
        for store in stores:
            name = store.name or f"{store.component_id:016x}"
            sid = w.add_schema(name, "jsonschema", _component_schema_json(store))
            cid = w.add_channel(
                _topic_for(name), sid, "json",
                {"component_id": f"{store.component_id:016x}"},
            )
            labels = _element_labels(store)
            n = store.len
            ts = store.timestamps[:n]
            vals = store.values[:n]
            for i in range(n):
                t_us = int(ts[i])
                row = {"timestamp": t_us / 1e6}
                for j, label in enumerate(labels):
                    # an element label literally named "timestamp" must not
                    # clobber the time field
                    key = label if label != "timestamp" else "timestamp_el"
                    row[key] = float(vals[i, j])
                w.write_message(
                    cid, t_us * 1000,
                    json.dumps(row, separators=(",", ":")).encode(),
                )
                written += 1
        w.finish()
    return written


# -- reader (round-trip validation + tooling without the mcap package) -------


def read_mcap(path: str):
    """Parse an MCAP file's data section; returns (channels, messages) where
    channels is {id: {topic, schema_name, encoding, metadata}} and messages is
    a list of (channel_id, log_time_ns, payload_bytes)."""
    raw = Path(path).read_bytes()
    if raw[:8] != MAGIC or raw[-8:] != MAGIC:
        raise ValueError("not an MCAP file (bad magic)")
    pos = 8
    schemas: dict[int, dict] = {}
    channels: dict[int, dict] = {}
    messages: list[tuple[int, int, bytes]] = []

    def rd_str(buf, p):
        (ln,) = struct.unpack_from("<I", buf, p)
        return buf[p + 4 : p + 4 + ln].decode(), p + 4 + ln

    while pos < len(raw) - 8:
        op, ln = struct.unpack_from("<BQ", raw, pos)
        body = raw[pos + 9 : pos + 9 + ln]
        pos += 9 + ln
        if op == OP_SCHEMA:
            (sid,) = struct.unpack_from("<H", body, 0)
            name, p = rd_str(body, 2)
            enc, p = rd_str(body, p)
            (dlen,) = struct.unpack_from("<I", body, p)
            schemas[sid] = {
                "name": name, "encoding": enc,
                "data": body[p + 4 : p + 4 + dlen],
            }
        elif op == OP_CHANNEL:
            cid, sid = struct.unpack_from("<HH", body, 0)
            topic, p = rd_str(body, 4)
            enc, p = rd_str(body, p)
            (mlen,) = struct.unpack_from("<I", body, p)
            meta: dict[str, str] = {}
            q, end = p + 4, p + 4 + mlen
            while q < end:
                k, q = rd_str(body, q)
                v, q = rd_str(body, q)
                meta[k] = v
            channels[cid] = {
                "topic": topic,
                "schema": schemas.get(sid),
                "encoding": enc,
                "metadata": meta,
            }
        elif op == OP_MESSAGE:
            cid, _seq, log_t, _pub = struct.unpack_from("<HIQQ", body, 0)
            messages.append((cid, log_t, bytes(body[22:])))
        elif op in (OP_DATA_END, OP_FOOTER):
            break
    return channels, messages
