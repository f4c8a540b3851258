"""RTSP ingest tests (libs/rtsp-ingest / fsw/rtsp-streamer parity)."""


# ---------------------------------------------------------------------------
# rtsp ingest (libs/rtsp-ingest + fsw/rtsp-streamer equivalents)
# ---------------------------------------------------------------------------


def test_rtsp_clock_mapper():
    """PTS→DB timestamp mapping (rtsp-ingest/src/clock.rs semantics)."""
    from elodin_tpu.rtsp import ClockMapper

    c = ClockMapper(1_000_000)
    assert c.map(50_000) == 1_000_000          # first frame lands on base
    assert c.map(83_333) == 1_033_333          # pts delta added
    assert c.map(83_333) == 1_033_334          # strict monotonicity bump
    assert c.map(10_000) == 1_033_335          # backwards pts clamps forward
    c.reanchor(2_000_000)
    assert c.map(5_000) == 2_000_000           # fresh origin on new base
    c2 = ClockMapper(100)
    ts = c2.peek(0)
    assert c2.peek(0) == ts                    # peek is pure
    c2.commit(0, ts)
    assert c2.peek(0) == ts + 1


def test_rtsp_annexb_converter():
    """AVCC→Annex-B with SPS/PPS injection (rtsp-ingest/src/annexb.rs)."""
    import pytest

    from elodin_tpu.rtsp import AnnexBConverter, ParameterSets, split_avc_nals

    sps, pps = b"\x67sps", b"\x68pps"
    idr, p = b"\x65pic", b"\x41pic"

    def au(*nals):
        return b"".join(len(n).to_bytes(4, "big") + n for n in nals)

    conv = AnnexBConverter(ParameterSets(sps, pps))
    sc = b"\x00\x00\x00\x01"
    # IDR without in-band SPS: params injected ahead
    assert conv.convert(au(idr)) == sc + sps + sc + pps + sc + idr
    # non-IDR passes through untouched
    assert conv.convert(au(p)) == sc + p
    # in-band SPS suppresses injection
    assert conv.convert(au(sps, pps, idr)) == sc + sps + sc + pps + sc + idr
    # missing params + IDR = error
    with pytest.raises(ValueError, match="no SPS/PPS"):
        AnnexBConverter(ParameterSets()).convert(au(idr))
    # 2-byte length prefixes
    conv2 = AnnexBConverter(ParameterSets(sps, pps), nal_length_size=2)
    assert conv2.convert(len(p).to_bytes(2, "big") + p) == sc + p
    # truncated prefix rejected
    with pytest.raises(ValueError, match="truncated"):
        split_avc_nals(b"\x00\x00\x00\x09ab")


def _rtp(seq, ts, payload, marker=False, pt=96):
    import struct as st

    return st.pack(">BBHII", 0x80, (0x80 if marker else 0) | pt, seq, ts, 0x1234) + payload


def test_rtsp_ingest_loopback(tmp_path):
    """Full RTSP session against a canned loopback server: DESCRIBE/SETUP/
    PLAY, FU-A + single-NAL depacketization, SPS/PPS injection, monotonic
    DB timestamps (fsw/rtsp-streamer behavior)."""
    import base64
    import socket
    import struct as st
    import threading

    from elodin_tpu.db.postcard import msg_id
    from elodin_tpu.db.storage import Database
    from elodin_tpu.rtsp import ingest

    sps = b"\x67\x42\x00\x1e\x01"
    pps = b"\x68\xce\x38\x80"
    sprop = (base64.b64encode(sps).decode()
             + "," + base64.b64encode(pps).decode())
    sdp = (
        "v=0\r\n"
        "o=- 0 0 IN IP4 127.0.0.1\r\n"
        "s=cam\r\n"
        "m=video 0 RTP/AVP 96\r\n"
        "a=rtpmap:96 H264/90000\r\n"
        f"a=fmtp:96 packetization-mode=1;sprop-parameter-sets={sprop}\r\n"
        "a=control:track1\r\n"
    ).encode()

    idr_body = bytes(range(10, 60))          # IDR slice payload, fragmented
    p_nal = b"\x41" + bytes(range(5, 25))    # complete non-IDR NAL

    def fu_a(frag, start, end):
        indicator = (0x65 & 0xE0) | 28
        header = (0x80 if start else 0) | (0x40 if end else 0) | (0x65 & 0x1F)
        return bytes([indicator, header]) + frag

    rtp_packets = [
        _rtp(1, 0, fu_a(idr_body[:20], True, False)),
        _rtp(2, 0, fu_a(idr_body[20:40], False, False)),
        _rtp(3, 0, fu_a(idr_body[40:], False, True), marker=True),
        _rtp(4, 3000, p_nal, marker=True),   # 3000 ticks @90kHz = 33.3ms
    ]

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        buf = b""
        session = "12345678"

        def reply(cseq, extra="", body=b""):
            head = (
                "RTSP/1.0 200 OK\r\n"
                f"CSeq: {cseq}\r\n" + extra
                + (f"Content-Length: {len(body)}\r\n" if body else "")
                + "\r\n"
            )
            conn.sendall(head.encode() + body)

        played = False
        while not played:
            while b"\r\n\r\n" not in buf:
                d = conn.recv(4096)
                if not d:
                    conn.close()
                    return
                buf += d
            req, _, buf = buf.partition(b"\r\n\r\n")
            lines = req.decode().split("\r\n")
            method = lines[0].split()[0]
            cseq = next(l.split(":")[1].strip() for l in lines
                        if l.lower().startswith("cseq"))
            if method == "DESCRIBE":
                reply(cseq, "Content-Type: application/sdp\r\n", sdp)
            elif method == "SETUP":
                assert "interleaved=0-1" in req.decode()
                reply(cseq, f"Session: {session}\r\n"
                      "Transport: RTP/AVP/TCP;unicast;interleaved=0-1\r\n")
            elif method == "PLAY":
                reply(cseq, f"Session: {session}\r\n")
                played = True
            else:
                reply(cseq)
        for pkt in rtp_packets:
            conn.sendall(b"$" + st.pack(">BH", 0, len(pkt)) + pkt)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    db = Database(str(tmp_path / "db"))
    n = ingest(f"rtsp://127.0.0.1:{port}/cam", db, "video.rtsp",
               max_aus=2, base_us=5_000_000)
    t.join(timeout=5)
    srv.close()
    assert n == 2

    log = db.msg_logs[msg_id("video.rtsp")]
    assert log.metadata.name == "video.rtsp"
    assert len(log.entries) == 2
    sc = b"\x00\x00\x00\x01"
    ts0, au0 = log.entries[0]
    ts1, au1 = log.entries[1]
    # IDR AU: injected SPS+PPS, then the reassembled IDR NAL
    assert au0 == sc + sps + sc + pps + sc + b"\x65" + idr_body
    assert au1 == sc + p_nal
    assert ts0 == 5_000_000                  # anchored to base
    assert ts1 == 5_000_000 + 3000 * 1_000_000 // 90_000
    # the ingested log round-trips through export-videos' keyframe detector
    from elodin_tpu.db.video import is_keyframe

    assert is_keyframe(au0) and not is_keyframe(au1)


def test_rtp_timestamp_unwrap_and_runt_tolerance(tmp_path):
    """32-bit RTP timestamp wraparound unwraps; malformed packets are
    skipped without killing the session."""
    import socket
    import struct as st
    import threading

    from elodin_tpu.db.postcard import msg_id
    from elodin_tpu.db.storage import Database
    from elodin_tpu.rtsp import ingest

    sps = b"\x67\x42\x00\x1e\x01"
    pps = b"\x68\xce\x38\x80"
    import base64
    sprop = (base64.b64encode(sps).decode() + ","
             + base64.b64encode(pps).decode())
    sdp = (
        "v=0\r\nm=video 0 RTP/AVP 96\r\n"
        f"a=fmtp:96 sprop-parameter-sets={sprop}\r\n"
        "a=control:track1\r\n"
    ).encode()
    idr = b"\x65" + bytes(20)
    p_nal = b"\x41" + bytes(10)
    near_wrap = (1 << 32) - 3000
    pkts = [
        _rtp(1, near_wrap, idr, marker=True),
        _rtp(2, near_wrap, b"\x7c", marker=True),  # 1-byte FU-A runt: skipped
        _rtp(3, 1500, p_nal, marker=True),  # wrapped: 4500 ticks later
    ]

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        buf = b""
        played = False
        while not played:
            while b"\r\n\r\n" not in buf:
                d = conn.recv(4096)
                if not d:
                    return
                buf += d
            req, _, buf = buf.partition(b"\r\n\r\n")
            lines = req.decode().split("\r\n")
            cseq = next(l.split(":")[1].strip() for l in lines
                        if l.lower().startswith("cseq"))
            method = lines[0].split()[0]
            body = sdp if method == "DESCRIBE" else b""
            head = (f"RTSP/1.0 200 OK\r\nCSeq: {cseq}\r\nSession: 1\r\n"
                    + (f"Content-Length: {len(body)}\r\n" if body else "")
                    + "\r\n")
            conn.sendall(head.encode() + body)
            played = method == "PLAY"
        for p in pkts:
            conn.sendall(b"$" + st.pack(">BH", 0, len(p)) + p)
        conn.close()

    threading.Thread(target=serve, daemon=True).start()
    db = Database(str(tmp_path / "db"))
    n = ingest(f"rtsp://127.0.0.1:{port}/c", db, "v", max_aus=2,
               base_us=0)
    srv.close()
    assert n == 2
    log = db.msg_logs[msg_id("v")]
    ts0, ts1 = log.entries[0][0], log.entries[1][0]
    # 4500 ticks @ 90 kHz = 50 ms forward, NOT a wrap to tiny deltas
    assert ts1 - ts0 == 4500 * 1_000_000 // 90_000
