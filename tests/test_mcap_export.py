"""Foxglove MCAP export parity tests, ported from the reference's
integration suite (/root/reference/libs/db/tests_query/mcap_export.rs):
build a small database (pose + scalar + vector + msg log + schematic +
GLB asset), export it, and re-read the MCAP verifying channels, schemas,
message ordering, scene entities, attachments, metadata records, and the
generated Foxglove layout."""

import json
import math
import struct

import numpy as np
import pytest

from elodin_tpu.db import msgs as M
from elodin_tpu.db.export_mcap import export_mcap, read_mcap_full
from elodin_tpu.db.storage import Database
from elodin_tpu.db.vtable import component_id_of

TS_BASE = 1_700_000_000_000_000  # µs epoch
TS_STEP = 10_000  # 100 Hz
NUM_ROWS = 25

SCHEMATIC = """tabs {
    hsplit name=Viewport {
        viewport name=Viewport pos="drone.world_pos + (0,0,0,0, 2,2,2)" look_at=drone.world_pos show_grid=#true active=#true
        vsplit share=0.4 {
            graph drone.gyro name=Gyro
            graph "drone.world_pos.q0, drone.thrust"
        }
    }
    vsplit name="Monitors" {
        component_monitor component_name=drone.gyro
    }
}
vector_arrow "(1, 0, 0)" origin=drone.world_pos name="Drone X" body_frame=#true {
    color white
}
vector_arrow "drone.world_vel[3],drone.world_vel[4],drone.world_vel[5]" origin=drone.world_pos scale=1.0 name="Velocity" {
    color white
}
object_3d drone.world_pos {
    glb path=db:drone.glb
}"""


def _glb_bytes() -> bytes:
    # tiny valid-enough GLB payload (magic + version + length header only)
    return b"glTF" + struct.pack("<II", 2, 12)


def _spec_components(db: Database):
    specs = [
        ("drone.world_pos", "f64", (7,), "q0,q1,q2,q3,x,y,z"),
        ("drone.world_vel", "f64", (6,), "wx,wy,wz,vx,vy,vz"),
        ("drone.gyro", "f64", (3,), "x,y,z"),
        ("drone.thrust", "f64", (), None),
        ("Globals.tick", "u64", (), None),
    ]
    out = {}
    for name, prim, shape, element_names in specs:
        store = db.get_or_create(component_id_of(name), prim, shape, name)
        if element_names:
            store.set_metadata(metadata={"element_names": element_names})
        out[name] = store
    return out


def build_fixture(path) -> Database:
    db = Database(str(path))
    stores = _spec_components(db)
    for step in range(NUM_ROWS):
        ts = TS_BASE + TS_STEP * step
        t = float(step)
        stores["drone.world_pos"].append(
            ts, np.array([0.0, 0.0, 0.0, 1.0, t * 0.1, t * 0.2, 2.0])
        )
        # angular part deliberately huge: if the exporter reads elements
        # 0..3 instead of [3],[4],[5], the arrow length blows up
        stores["drone.world_vel"].append(
            ts, np.array([9.0, 9.0, 9.0, 2.0, 0.0, 0.0])
        )
        stores["drone.gyro"].append(ts, np.array([t, -t, 0.5 * t]))
        stores["drone.thrust"].append(ts, np.array([t * 0.25]))
        stores["Globals.tick"].append(
            ts, np.array([step], dtype=np.uint64)
        )

    log = db.msg_log(b"\x10\x20")
    log.set_metadata(M.MsgMetadata(
        msg_id=0x2010, name="fsw.log", metadata={"schema": "LogEntry"},
    ))
    for step in range(3):
        log.append(
            TS_BASE + TS_STEP * step,
            json.dumps({"level": 2, "message": f"log line {step}"}).encode(),
        )

    db.assets.put("drone.glb", _glb_bytes())
    db.assets.put("schematics/main.kdl", SCHEMATIC.encode())
    db.set_active_schematic("schematics/main.kdl")
    db.flush()
    return db


def _export(db, tmp_path, **opts):
    out = tmp_path / "out"
    out.mkdir(exist_ok=True)
    mcap_path = out / "db.mcap"
    export_mcap(db, str(mcap_path), **opts)
    return mcap_path, out / "db.foxglove-layout.json"


def test_mcap_export_roundtrip(tmp_path):
    db = build_fixture(tmp_path / "db")
    mcap_path, layout_path = _export(db, tmp_path)
    f = read_mcap_full(str(mcap_path))

    # --- channels --------------------------------------------------------
    topics = {c["topic"] for c in f.channels.values()}
    for expected in [
        "/drone/world_pos", "/drone/gyro", "/drone/thrust", "/Globals/tick",
        "/tf", "/scene/drone-model", "/scene/drone-arrows",
        "/scene_dynamic/Velocity", "/log/fsw.log",
    ]:
        assert expected in topics, f"missing topic {expected}: {topics}"

    by_topic = {c["topic"]: (cid, c) for cid, c in f.channels.items()}
    tf_channel = by_topic["/tf"][1]
    assert tf_channel["schema"]["name"] == "foxglove.FrameTransforms"
    assert tf_channel["encoding"] == "json"

    # SceneUpdate must carry the FULL official foxglove schema: Foxglove only
    # base64-decodes bytes fields the schema declares with contentEncoding
    scene_channel = by_topic["/scene/drone-model"][1]
    scene_schema = json.loads(scene_channel["schema"]["data"])
    assert (
        scene_schema["properties"]["entities"]["items"]["properties"]
        ["models"]["items"]["properties"]["data"]["contentEncoding"]
        == "base64"
    )
    assert by_topic["/log/fsw.log"][1]["schema"]["name"] == "foxglove.Log"

    # --- messages: counts, monotonic log_time, JSON content --------------
    counts: dict[str, int] = {}
    last_log_time = 0
    first: dict[str, dict] = {}
    for cid, log_time, data in f.messages:
        topic = f.channels[cid]["topic"]
        assert log_time >= last_log_time, f"log_time went backwards on {topic}"
        last_log_time = log_time
        counts[topic] = counts.get(topic, 0) + 1
        if topic not in first:
            first[topic] = json.loads(data)
    assert counts["/drone/world_pos"] == NUM_ROWS
    assert counts["/tf"] == NUM_ROWS
    assert counts["/drone/thrust"] == NUM_ROWS
    assert counts["/log/fsw.log"] == 3
    # per-entity scene topics: exactly one message each
    assert counts["/scene/drone-model"] == 1
    assert counts["/scene/drone-arrows"] == 1

    world_pos = first["/drone/world_pos"]
    assert world_pos["q3"] == 1.0 and world_pos["z"] == 2.0
    tf = first["/tf"]["transforms"][0]
    assert tf["child_frame_id"] == "drone"
    assert tf["translation"]["z"] == 2.0
    assert tf["rotation"]["w"] == 1.0

    # foxglove.Log requires file/line alongside timestamp/level/message/name
    log = first["/log/fsw.log"]
    assert log["message"] == "log line 0"
    assert log["file"] == "" and log["line"] == 0

    # scene entities carry every schema-required primitive array
    scene_entity = first["/scene/drone-model"]["entities"][0]
    for key in ("metadata", "arrows", "cubes", "spheres", "cylinders",
                "lines", "triangles", "texts", "models"):
        assert isinstance(scene_entity[key], list), f"missing array {key}"
    model = scene_entity["models"][0]
    import base64 as b64
    assert b64.b64decode(model["data"]) == _glb_bytes()

    # the dynamic arrow reads the schematic's [3],[4],[5] elements (linear
    # velocity (2,0,0)), not 0..3 (angular, (9,9,9)); world-frame arrows use
    # frame_id=world with absolute origin so attitude can't rotate them
    arrow_entity = first["/scene_dynamic/Velocity"]["entities"][0]
    assert arrow_entity["frame_id"] == "world"
    arrow = arrow_entity["arrows"][0]
    assert arrow["pose"]["position"]["z"] == 2.0
    assert abs(arrow["shaft_length"] - 2.0 * 0.8) < 1e-9, (
        "shaft_length should come from |(2,0,0)| * scale 1.0 * 0.8"
    )
    # direction +X -> identity quaternion
    assert abs(arrow["pose"]["orientation"]["w"] - 1.0) < 1e-9

    # the body-frame arrow rides the drone TF at the entity origin
    body_arrow = first["/scene/drone-arrows"]["entities"][0]
    assert body_arrow["frame_id"] == "drone"
    assert body_arrow["arrows"][0]["pose"]["position"]["x"] == 0.0

    # --- attachments: schematic + referenced GLB -------------------------
    attachment_names = [a["name"] for a in f.attachments]
    assert "schematics/main.kdl" in attachment_names
    assert "drone.glb" in attachment_names
    index_names = [a["name"] for a in f.attachment_indexes]
    assert "schematics/main.kdl" in index_names
    assert "drone.glb" in index_names

    # --- metadata records ------------------------------------------------
    metadata_names = [m["name"] for m in f.metadata]
    assert "elodin.db_state" in metadata_names
    assert "elodin.components" in metadata_names
    assert [m["name"] for m in f.metadata_indexes] == metadata_names

    # --- statistics (summary section) ------------------------------------
    assert f.statistics is not None
    assert f.statistics["message_count"] == len(f.messages)
    assert f.statistics["attachment_count"] == len(f.attachments)

    # --- layout ----------------------------------------------------------
    layout = json.loads(layout_path.read_text())
    config_by_id = layout["configById"]
    root = layout["layout"]
    assert root.startswith("Tab!")
    tabs = config_by_id[root]["tabs"]
    assert [t["title"] for t in tabs] == ["Viewport", "Monitors"]

    # a 3D panel following the drone, with every scene topic enabled
    three_d = next(v for v in config_by_id.values() if "followTf" in v)
    assert three_d["followTf"] == "drone"
    assert three_d["topics"]["/scene/drone-model"]["visible"] is True
    assert three_d["topics"]["/scene/drone-arrows"]["visible"] is True
    # camera from the viewport pos offset (2,2,2), in DEGREES — Foxglove's
    # 3D panel reads phi/thetaOffset/fovy as degrees
    camera = three_d["cameraState"]
    assert abs(camera["distance"] - math.sqrt(12.0)) < 1e-6
    assert abs(camera["phi"] - 54.7356) < 1e-3
    assert abs(camera["thetaOffset"] - 45.0) < 1e-6
    assert camera["fovy"] == 45.0

    # plot series resolved from EQL, including explicit element access
    plots = [v for v in config_by_id.values() if "paths" in v]
    assert len(plots) == 2
    all_paths = [
        s["value"] for p in plots for s in p["paths"]
    ]
    assert "/drone/gyro.x" in all_paths
    assert "/drone/world_pos.q0" in all_paths
    assert "/drone/thrust.value" in all_paths

    # raw messages panel on the monitored component
    raw = next(v for v in config_by_id.values() if "topicPath" in v)
    assert raw["topicPath"] == "/drone/gyro"


def test_mcap_export_pattern_filters_components(tmp_path):
    db = build_fixture(tmp_path / "db")
    # uppercase on purpose: matching is case-insensitive
    mcap_path, _ = _export(db, tmp_path, pattern="Drone.*")
    f = read_mcap_full(str(mcap_path))
    topics = [c["topic"] for c in f.channels.values()]
    assert "/drone/gyro" in topics
    assert "/Globals/tick" not in topics


def _alt_only_db(path, timestamps):
    db = Database(str(path))
    store = db.get_or_create(component_id_of("sat.alt"), "f64", (), "sat.alt")
    for i, ts in enumerate(timestamps):
        store.append(ts, np.array([float(i) * 100.0]))
    db.flush()
    return db


def test_mcap_export_epoch_offset_auto(tmp_path):
    db = _alt_only_db(
        tmp_path / "db", [-100_000 + i * 10_000 for i in range(10)]
    )
    mcap_path, _ = _export(db, tmp_path)
    f = read_mcap_full(str(mcap_path))
    assert min(t for _, t, _ in f.messages) == 0, (
        "auto-rebased earliest should be 0 ns"
    )
    assert any(m["name"] == "elodin.db_state" for m in f.metadata)


def test_mcap_export_epoch_offset_zero_still_rebases_pre1970(tmp_path):
    # explicit --epoch-offset-us 0 must not clamp every pre-1970 sample to
    # log_time 0 (destroying playback ordering for Apollo-style DBs)
    db = _alt_only_db(
        tmp_path / "db", [-100_000 + i * 10_000 for i in range(5)]
    )
    mcap_path, _ = _export(db, tmp_path, epoch_offset_us=0)
    f = read_mcap_full(str(mcap_path))
    by_topic = {c["topic"]: cid for cid, c in f.channels.items()}
    log_times = [
        t for cid, t, _ in f.messages if cid == by_topic["/sat/alt"]
    ]
    assert len(log_times) == 5
    assert log_times[0] == 0, "earliest should rebase to 0"
    for a, b in zip(log_times, log_times[1:]):
        assert b > a, f"log_time must stay strictly increasing: {log_times}"
    assert log_times[1] - log_times[0] == 10_000 * 1000


def test_mcap_export_epoch_offset_manual(tmp_path):
    db = _alt_only_db(tmp_path / "db", [1000 + i * 1000 for i in range(5)])
    manual = 500_000
    mcap_path, _ = _export(db, tmp_path, epoch_offset_us=manual)
    f = read_mcap_full(str(mcap_path))
    assert f.messages[0][1] == (1000 + manual) * 1000
    # the offset is recorded in the db_state metadata for provenance
    db_state = next(
        m for m in f.metadata if m["name"] == "elodin.db_state"
    )
    assert db_state["metadata"]["elodin.time_offset_us"] == str(manual)


def test_mcap_export_oversized_glb_attached_not_embedded(tmp_path):
    """A GLB over the embed limit is attached to the MCAP but omitted from
    SceneUpdate entirely — no empty-data model primitive
    (export_mcap.rs:3414 oversized_glb_omits_model_not_empty_data)."""
    db = build_fixture(tmp_path / "db")
    # make the mesh entity NOT the follow target by removing its follow
    # force: shrink the embed cap below the GLB size on a non-followed obj
    db.assets.put("big.glb", b"glTF" + struct.pack("<II", 2, 12) + b"x" * 64)
    sch = SCHEMATIC + '\nobject_3d "(0,0,0,1, 5,5,5)" {\n    glb path=db:big.glb\n}'
    db.assets.put("schematics/main.kdl", sch.encode())
    mcap_path, _ = _export(db, tmp_path, max_embed_mb=0)
    f = read_mcap_full(str(mcap_path))
    # drone-model still embedded (follow entity forces embed)
    topics = [c["topic"] for c in f.channels.values()]
    assert "/scene/drone-model" in topics
    # the literal-pose model is attached but not in the scene
    assert "big.glb" in [a["name"] for a in f.attachments]
    assert not any("literal" in t for t in topics)


def test_mcap_cli_export(tmp_path):
    """`python -m elodin_tpu.db export --format mcap` writes
    <dbname>.mcap + layout."""
    import subprocess
    import sys

    build_fixture(tmp_path / "mydb")
    out = tmp_path / "exported"
    r = subprocess.run(
        [sys.executable, "-m", "elodin_tpu.db", "export",
         str(tmp_path / "mydb"), "--output", str(out), "--format", "mcap"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert (out / "mydb.mcap").is_file()
    assert (out / "mydb.foxglove-layout.json").is_file()
    f = read_mcap_full(str(out / "mydb.mcap"))
    assert len(f.messages) > 0


def test_mcap_export_leaf_nested_name_collision(tmp_path):
    """element_names mixing a leaf and a nested path under the same key
    ("q,q.w") must not abort the export (regression: KeyError in
    _component_json_schema)."""
    db = build_fixture(tmp_path / "db")
    store = db.get_or_create(
        component_id_of("drone.weird"), "f64", (2,), "drone.weird"
    )
    store.set_metadata(metadata={"element_names": "q,q.w"})
    store.append(TS_BASE, np.array([1.0, 2.0]))
    db.flush()
    mcap_path, _ = _export(db, tmp_path)
    f = read_mcap_full(str(mcap_path))
    assert any(c["topic"].endswith("drone/weird")
               for c in f.channels.values())


def test_config_json_non_dict_tolerated(tmp_path):
    """A config.json holding valid-but-non-dict JSON must not brick
    Database open (regression: AttributeError on cfg.get)."""
    p = tmp_path / "db"
    build_fixture(p)
    (p / "config.json").write_text("null")
    db2 = Database(str(p))
    assert db2.active_schematic is None


def test_schematic_frame_props_accepted():
    """viewport frame= and line_3d frame= are part of the vocabulary the
    exporter consumes; the typed layer must accept them at load time."""
    from elodin_tpu import schematic as S

    sch = S.load(
        'tabs {\n viewport name=V frame=NED\n}\n'
        'line_3d drone.world_pos frame=ENU color=red'
    )
    assert sch.lines[0].props.get("frame") == "ENU"


def test_mcap_duplicate_line_topics_across_window_schematics(tmp_path):
    """The same line entity in the primary AND a window schematic must get
    distinct /scene topics (the uniquifier counts across schematics)."""
    db = build_fixture(tmp_path / "db")
    db.assets.put(
        "schematics/main.kdl",
        (SCHEMATIC
         + '\nline_3d drone.world_pos color=red'
         + '\nwindow path="schematics/win.kdl"').encode(),
    )
    db.assets.put(
        "schematics/win.kdl",
        b'tabs {\n viewport name=W\n}\nline_3d drone.world_pos color=blue',
    )
    mcap_path, _ = _export(db, tmp_path)
    f = read_mcap_full(str(mcap_path))
    line_topics = [c["topic"] for c in f.channels.values()
                   if "-line" in c["topic"]]
    assert len(line_topics) == len(set(line_topics)) == 2, line_topics


def test_mcap_duplicate_line_topics_uniquified(tmp_path):
    """Two line_3d nodes resolving to the same entity get distinct
    /scene topics (Foxglove backfills one message per topic)."""
    db = build_fixture(tmp_path / "db")
    sch = SCHEMATIC + (
        '\nline_3d drone.world_pos color=red'
        '\nline_3d drone.world_pos color=blue'
    )
    db.assets.put("schematics/main.kdl", sch.encode())
    mcap_path, _ = _export(db, tmp_path)
    f = read_mcap_full(str(mcap_path))
    line_topics = [c["topic"] for c in f.channels.values()
                   if "-line" in c["topic"]]
    assert len(line_topics) == len(set(line_topics)) == 2


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
