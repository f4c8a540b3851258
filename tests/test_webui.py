"""Web viewer API tests (editor-lite: elodin_tpu/db/webui.py)."""

import json
import time
import urllib.request

import numpy as np


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get_content_type(), r.read()


def test_webui_api_and_page(tmp_path):
    from elodin_tpu.db import Client, Server

    srv = Server.start(str(tmp_path / "db"))
    try:
        base = f"http://127.0.0.1:{srv.port + 1}"
        c = Client.connect(srv.addr)
        from elodin_tpu.db import f64

        spec = f64[3].labeled("x", "y", "z")
        with c.table_writer({"ball.world_pos": spec}) as w:
            for i in range(100):
                w.write(1_000_000 + i * 1000,
                        {"ball.world_pos": np.array([i, 2.0 * i, -i])})
        time.sleep(0.4)

        status, ctype, body = _get(base + "/api/info")
        info = json.loads(body)
        assert status == 200 and info["components"] == 1
        assert info["rows"] == 100

        status, _, body = _get(base + "/api/components")
        comps = json.loads(body)
        assert comps[0]["name"] == "ball.world_pos"
        assert comps[0]["shape"] == [3]
        assert comps[0]["metadata"]["element_names"] == "x,y,z"

        # series: downsampled to max_points, labels carried
        status, _, body = _get(
            base + "/api/series?name=ball.world_pos&max_points=20")
        s = json.loads(body)
        assert status == 200
        assert 16 <= len(s["t"]) <= 20
        assert s["element_names"] == ["x", "y", "z"]
        assert s["t"][0] == 1_000_000 and s["t"][-1] == 1_099_000
        assert s["v"][-1] == [99.0, 198.0, -99.0]

        # time-window query
        status, _, body = _get(
            base + "/api/series?name=ball.world_pos"
            "&start_us=1050000&stop_us=1060000")
        s = json.loads(body)
        assert all(1_050_000 <= t < 1_060_000 for t in s["t"])

        status, _, body = _get(base + "/api/latest?name=ball.world_pos")
        latest = json.loads(body)
        assert latest["v"] == [99.0, 198.0, -99.0]

        # unknown component -> 404
        try:
            _get(base + "/api/series?name=nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # the viewer page serves, and older routes still work
        status, ctype, body = _get(base + "/")
        assert status == 200 and ctype == "text/html"
        html = body.decode()
        assert "elodin-db viewer" in html
        # the page logic is the static artifact, not an embedded string
        assert 'src="/static/viewer.js"' in html
        _, _, js_body = _get(base + "/static/viewer.js")
        js = js_body.decode()
        # untrusted names must go through textContent, never innerHTML
        assert "innerHTML" not in js and "innerHTML" not in html
        assert "textContent" in js
        status, _, body = _get(base + "/healthz")
        assert status == 200 and body == b"ok"
        c.close()
    finally:
        srv.stop()


def test_webui_scene_endpoint(tmp_path):
    """/api/scene serves the MCAP exporter's SceneUpdate entities live."""
    from elodin_tpu.db import Client, Server

    srv = Server.start(str(tmp_path / "db"))
    try:
        base = f"http://127.0.0.1:{srv.port + 1}"
        c = Client.connect(srv.addr)
        c.send("sat.world_pos", np.array([0, 0, 0, 1, 1.0, 2.0, 3.0]),
               timestamp_us=1_000_000)
        c.send("sat.world_pos", np.array([0, 0, 0, 1, 1.5, 2.0, 3.0]),
               timestamp_us=1_010_000)
        time.sleep(0.3)
        srv.db.assets.put("schematic.kdl", b"""
line_3d sat.world_pos color=yellow
object_3d sat.world_pos {
    sphere radius=0.5 { material base_color=red }
}
""")
        s = json.loads(_get(base + "/api/scene")[2])
        assert s.get("error") is None, s
        topics = {e["topic"] for e in s["entities"]}
        assert any(t.endswith("-line") for t in topics), topics
        assert s["follow_entity"] == "sat"
        line = next(e for e in s["entities"] if e["topic"].endswith("-line"))
        pts = line["lines"][0]["points"]
        assert pts[0] == {"x": 1.0, "y": 2.0, "z": 3.0}

        # live frame transform baked in (frame-locked entities would
        # otherwise render at identity in a JSON consumer)
        tf = s["transforms"]["sat"]
        assert tf["position"] == {"x": 1.5, "y": 2.0, "z": 3.0}
        assert tf["orientation"]["w"] == 1.0

        # scrubbed scene: ?ts_us renders the pose at/before that time
        s0 = json.loads(_get(base + "/api/scene?ts_us=1000000")[2])
        assert s0["transforms"]["sat"]["position"]["x"] == 1.0
        c.close()
    finally:
        srv.stop()


def test_webui_schematic_sql_msgs(tmp_path):
    """Schematic, SQL console, and msg-log endpoints (editor parity)."""
    import urllib.error

    from elodin_tpu.db import Client, Server
    from elodin_tpu.db import msgs as M
    from elodin_tpu.db.postcard import msg_id

    srv = Server.start(str(tmp_path / "db"))
    try:
        base = f"http://127.0.0.1:{srv.port + 1}"
        c = Client.connect(srv.addr)
        c.send("ball.world_pos", np.arange(7.0), timestamp_us=1_000_000)
        c.send("ball.mass", np.array([2.5]), timestamp_us=1_000_000)
        time.sleep(0.3)

        # schematic: none yet -> empty; then stored as asset
        s = json.loads(_get(base + "/api/schematic")[2])
        assert s["components"] == []
        srv.db.assets.put("schematic.kdl", b'''
vsplit {
    graph "ball.world_pos"
    graph "ball.mass"
}
''')
        s = json.loads(_get(base + "/api/schematic")[2])
        assert s["components"] == ["ball.world_pos", "ball.mass"]

        # the persisted active schematic (set_active_schematic flow, as the
        # MCAP exporter uses) takes precedence over the legacy fixed key
        srv.db.assets.put(
            "schematics/alt.kdl", b'vsplit {\n graph "ball.mass"\n}\n'
        )
        srv.db.set_active_schematic("schematics/alt.kdl")
        s = json.loads(_get(base + "/api/schematic")[2])
        assert s["components"] == ["ball.mass"]
        srv.db.set_active_schematic(None)

        # malformed KDL syntax (unclosed brace -> ValueError from kdl.parse)
        # surfaces as a structured error payload, not an HTTP 500
        srv.db.assets.put("schematic.kdl", b"vsplit {\n  graph \"x\"\n")
        s = json.loads(_get(base + "/api/schematic")[2])
        assert s["components"] == [] and s["error"]
        srv.db.assets.put("schematic.kdl", b'''
vsplit {
    graph "ball.world_pos"
    graph "ball.mass"
}
''')

        # sql over http
        from elodin_tpu.db import sql_table_name

        t = sql_table_name("ball.mass")
        _, _, body = _get(base + "/api/sql?q=" +
                          urllib.request.quote(f"select * from {t}"))
        res = json.loads(body)
        assert res["total_rows"] == 1
        assert 2.5 in res["rows"][0]
        # bad sql -> error status, not a hang
        try:
            _get(base + "/api/sql?q=drop%20table%20x")
            assert False, "expected error"
        except urllib.error.HTTPError as e:
            assert e.code in (400, 500)

        # msg logs
        mid = msg_id("sim.log")
        log = srv.db.msg_log(mid)
        log.set_metadata(M.MsgMetadata(1, "sim.log", {}))
        log.append(1_000_000, b"hello from the sim")
        log.append(2_000_000, bytes([0, 1, 2, 254, 255]))
        logs = json.loads(_get(base + "/api/msg-logs")[2])
        assert logs[0]["name"] == "sim.log" and logs[0]["entries"] == 2
        msgs = json.loads(_get(base + f"/api/msgs?id={mid.hex()}")[2])
        assert msgs[0]["text"] == "hello from the sim"
        assert msgs[1]["text"].startswith("000102")  # binary -> hex preview
        c.close()
    finally:
        srv.stop()


def test_webui_series_with_nan_parses(tmp_path):
    """Regression: NaN samples made json.dumps emit bare NaN tokens, which
    browser JSON.parse rejects — the plot never rendered. Non-finite floats
    must serialize as null."""
    from elodin_tpu.db import Client, Server, f64

    srv = Server.start(str(tmp_path / "db"))
    try:
        base = f"http://127.0.0.1:{srv.port + 1}"
        c = Client.connect(srv.addr)
        with c.table_writer({"nan.x": f64}) as w:
            w.write(1_000_000, {"nan.x": 1.0})
            w.write(1_001_000, {"nan.x": float("nan")})
            w.write(1_002_000, {"nan.x": float("inf")})
            w.write(1_003_000, {"nan.x": 3.0})
        time.sleep(0.4)
        _, _, body = _get(base + "/api/series?name=nan.x")
        s = json.loads(body)  # strict JSON: would fail on bare NaN
        flat = [v[0] for v in s["v"]]
        assert flat == [1.0, None, None, 3.0]
        _, _, body = _get(base + "/api/latest?name=nan.x")
        assert json.loads(body)["v"] == [3.0]
        c.close()
    finally:
        srv.stop()


def test_viewer_js_served_and_endpoint_contract(tmp_path):
    """The viewer logic is a static artifact (/static/viewer.js).  Contract
    checks that run without a JS engine (none exists in this image):
    every endpoint the JS fetches must be a registered route, the page must
    reference the script, and the poll3d stale-panel guard (regression
    b6008dd: a close/reopen mid-fetch must not write a stale trajectory
    batch into the new panel) must re-check panel identity after the await."""
    import re

    from elodin_tpu.db import Server
    from elodin_tpu.db.webui import VIEWER_HTML, viewer_js

    srv = Server.start(str(tmp_path / "db"))
    try:
        base = f"http://127.0.0.1:{srv.port + 1}"
        status, ctype, body = _get(base + "/static/viewer.js")
        assert status == 200 and "javascript" in ctype
        js = body.decode()
        assert '"use strict";' in js

        status, _, page = _get(base + "/")
        assert b'src="/static/viewer.js"' in page
        assert "<script>" not in VIEWER_HTML  # no embedded JS remains

        # endpoint contract: every fetch()ed /api path exists in the routes
        from elodin_tpu.db.webui import register_routes

        routes = {}

        class _FakeDb:  # register_routes only stores closures
            pass

        register_routes(routes, _FakeDb())
        fetched = set(re.findall(r'fetch\(["`]((?:/api|/static)[^"`?]*)', js))
        assert fetched, "viewer.js fetches nothing? extraction broke"
        for url in fetched:
            assert url in routes, f"viewer.js fetches unregistered {url}"

        # poll3d stale-panel guard: identity re-checked after the await
        poll3d = js[js.index("async function poll3d"):]
        poll3d = poll3d[:poll3d.index("\nfunction")]
        awaits = poll3d.index("await")
        assert "view3d === me" in poll3d[awaits:], (
            "poll3d lost its post-await panel-identity re-check (b6008dd)"
        )
    finally:
        srv.stop()


def test_webui_video_endpoints(tmp_path):
    """/api/videos lists H.264 msg logs and /api/video muxes one to MP4 on
    demand (browser-side decode replaces the reference's editor
    video-toolbox decoder; mux path shared with export-videos)."""
    from test_db import _golomb_sps, _walk_boxes

    from elodin_tpu.db import Server, msgs as M
    from elodin_tpu.db.storage import Database

    path = str(tmp_path / "db")
    db = Database(path)
    sc = b"\x00\x00\x00\x01"
    sps = _golomb_sps()
    pps = b"\x68\xce\x38\x80"
    idr = b"\x65" + bytes(range(1, 40))
    log = db.msg_log(b"\xab\xcd")
    log.set_metadata(M.MsgMetadata(0xABCD, "video.cam0", {}))
    for i in range(8):
        payload = (sc + sps + sc + pps + sc + idr) if i % 4 == 0 \
            else (sc + b"\x41" + bytes(range(1, 24)))
        log.append(1_000_000 + i * 33_333, payload)
    # a non-video log must NOT appear in /api/videos
    txt = db.msg_log(b"\x01\x02")
    txt.set_metadata(M.MsgMetadata(0x0102, "log.text", {}))
    txt.append(1_000_000, b"hello")
    db.flush()
    del db, log, txt

    srv = Server.start(path)
    try:
        base = f"http://127.0.0.1:{srv.port + 1}"
        status, _, body = _get(base + "/api/videos")
        vids = json.loads(body)
        assert status == 200
        assert [v["name"] for v in vids] == ["video.cam0"]
        assert vids[0]["frames"] == 8

        status, ctype, mp4 = _get(base + f"/api/video?id={vids[0]['id']}")
        assert status == 200 and ctype == "video/mp4"
        boxes = {f: (a, b) for f, a, b in _walk_boxes(mp4)}
        assert set(boxes) == {b"ftyp", b"mdat", b"moov"}
        # second fetch serves the cached mux byte-identically
        _, _, mp4b = _get(base + f"/api/video?id={vids[0]['id']}")
        assert mp4b == mp4

        import urllib.error
        try:
            _get(base + "/api/video?id=dead")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_scene3d_js_served_and_contract(tmp_path):
    """The WebGL scene viewer (/static/scene3d.js).  Contract checks that
    run without a JS engine: served, referenced by the page, every fetched
    endpoint registered, the pure S3D math/parse section touches no DOM/GL,
    and the poll loop re-checks panel identity after its await (the same
    stale-write hazard regression-tested for viewer.js's poll3d)."""
    import re

    from elodin_tpu.db import Server
    from elodin_tpu.db.webui import register_routes, scene3d_js

    srv = Server.start(str(tmp_path / "db"))
    try:
        base = f"http://127.0.0.1:{srv.port + 1}"
        status, ctype, body = _get(base + "/static/scene3d.js")
        assert status == 200 and "javascript" in ctype
        js = body.decode()
        assert js == scene3d_js().decode()
        assert '"use strict";' in js
        assert "innerHTML" not in js

        status, _, page = _get(base + "/")
        assert b'src="/static/scene3d.js"' in page
        assert b'id="scenebtn"' in page

        routes = {}

        class _FakeDb:
            pass

        register_routes(routes, _FakeDb())
        fetched = set(re.findall(r'fetch\(["`]((?:/api|/static)[^"`?]*)', js))
        # the scene logic executes server-side (db/scenemath.py,
        # tests/test_scenemath.py); the client fetches pre-digested results
        assert {"/api/drawlist", "/api/geoms", "/api/glb"} <= fetched
        for url in fetched:
            assert url in routes, f"scene3d.js fetches unregistered {url}"
        # no client-side GLB parsing / draw-list assembly remains
        for gone in ("parseGLB", "buildDrawList", "frameScene", "geomCube"):
            assert gone not in js, f"client still carries {gone}"

        # pure section boundary: no DOM/WebGL below the banner until the
        # renderer section starts
        pure = js[: js.index("// Renderer + poll loop")]
        for token in ("document.", "window.", "getContext", "gl."):
            assert token not in pure, f"S3D pure section uses {token}"

        # poll loop stale-guard after the await
        poll = js[js.index("async function pollScene3d"):]
        poll = poll[: poll.index("\nfunction")]
        assert "sceneView !== me" in poll[poll.index("await"):]
    finally:
        srv.stop()


def test_webui_drawlist_glb_geoms_endpoints(tmp_path):
    """The scene3d data plane: /api/drawlist (scene pre-digested by
    scenemath, scrubbable), /api/glb (server-parsed GLB primitives), and
    /api/geoms (unit geometry) — the client renders these verbatim."""
    import base64

    from elodin_tpu.db import Client, Server
    from tests.test_scenemath import tri_glb

    srv = Server.start(str(tmp_path / "db"))
    try:
        base = f"http://127.0.0.1:{srv.port + 1}"
        c = Client.connect(srv.addr)
        c.send("sat.world_pos", np.array([0, 0, 0, 1, 1.0, 2.0, 3.0]),
               timestamp_us=1_000_000)
        c.send("sat.world_pos", np.array([0, 0, 0, 1, 1.5, 2.0, 3.0]),
               timestamp_us=1_010_000)
        time.sleep(0.3)
        srv.db.assets.put("m.glb", tri_glb())
        srv.db.assets.put("schematic.kdl", b"""
line_3d sat.world_pos color=yellow
object_3d sat.world_pos {
    sphere radius=0.5 { material base_color=red }
}
object_3d sat.world_pos {
    glb path="m.glb"
}
""")
        dl = json.loads(_get(base + "/api/drawlist")[2])
        assert dl.get("error") is None, dl
        kinds = [s["kind"] for s in dl["solids"]]
        assert "sphere" in kinds
        assert dl["lines"] and dl["lines"][0]["pts"][:3] == [1.0, 2.0, 3.0]
        # live frame transform premultiplied into the solid's matrix
        sph = next(s for s in dl["solids"] if s["kind"] == "sphere")
        assert sph["mat"][12] == 1.5
        assert dl["follow"] == [1.5, 2.0, 3.0]
        assert dl["frame"]["radius"] > 0

        # scrubbed: ?ts_us poses the drawlist at/before that time
        dl0 = json.loads(_get(base + "/api/drawlist?ts_us=1000000")[2])
        sph0 = next(s for s in dl0["solids"] if s["kind"] == "sphere")
        assert sph0["mat"][12] == 1.0

        # the model reference resolves through /api/glb (parsed server-side)
        glb_url = dl["glbs"][0]["url"]
        status, ctype, body = _get(base + "/api/glb?url=" + glb_url)
        assert status == 200 and "json" in ctype
        prims = json.loads(body)["prims"]
        pos = np.frombuffer(base64.b64decode(prims[0]["pos_b64"]), "<f4")
        np.testing.assert_array_equal(pos, [0, 0, 0, 1, 0, 0, 0, 1, 0])
        assert prims[0]["color"] == [1, 0, 0, 1]
        # cache path + error paths (urlopen raises on non-2xx)
        import urllib.error

        def code_of(url):
            try:
                return _get(url)[0]
            except urllib.error.HTTPError as e:
                return e.code

        assert code_of(base + "/api/glb?url=" + glb_url) == 200
        assert code_of(base + "/api/glb?url=/assets/missing.glb") == 404
        assert code_of(base + "/api/glb?url=/etc/passwd") == 404
        srv.db.assets.put("bad.glb", b"not a glb at all")
        assert code_of(base + "/api/glb?url=/assets/bad.glb") == 415

        status, _, gb = _get(base + "/api/geoms")
        assert status == 200
        geoms = json.loads(gb)
        assert set(geoms) == {"cube", "sphere", "cylinder", "cone"}
        c.close()
    finally:
        srv.stop()
