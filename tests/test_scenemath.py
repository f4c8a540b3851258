"""Scene-viewer logic (db/scenemath.py) — EXECUTED, not grepped.

This module is the server-side single implementation of what scene3d.js
used to compute client-side (round-4 VERDICT W5): GLB parsing, unit
geometry, scene -> draw-list assembly, camera framing.  These tests run
the logic the browser actually renders from, including the regressions
that used to be grep-only contract checks.
"""

import base64
import json
import math
import struct

import numpy as np
import pytest

from elodin_tpu.db import scenemath as sm


# -- GLB construction helper --------------------------------------------------


def make_glb(gltf: dict, bin_chunk: bytes) -> bytes:
    js = json.dumps(gltf).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    bn = bin_chunk + b"\0" * ((4 - len(bin_chunk) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(bn)
    out = struct.pack("<III", sm.GLB_MAGIC, 2, total)
    out += struct.pack("<II", len(js), sm.CH_JSON) + js
    out += struct.pack("<II", len(bn), sm.CH_BIN) + bn
    return out


def tri_glb(**node_extra) -> bytes:
    """One triangle in the z=0 plane, uint16 indices, red material."""
    pos = np.asarray([0, 0, 0, 1, 0, 0, 0, 1, 0], "<f4")
    idx = np.asarray([0, 1, 2], "<u2")
    bin_chunk = pos.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [dict({"mesh": 0}, **node_extra)],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1, "material": 0}
        ]}],
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorFactor": [1, 0, 0, 1]}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    return make_glb(gltf, bin_chunk)


# -- parser -------------------------------------------------------------------


def test_parse_glb_triangle_with_material_and_flat_normals():
    prims = sm.parse_glb(tri_glb())
    assert len(prims) == 1
    p = prims[0]
    np.testing.assert_array_equal(
        p["pos"], np.asarray([0, 0, 0, 1, 0, 0, 0, 1, 0], np.float32))
    np.testing.assert_array_equal(p["idx"], [0, 1, 2])
    assert p["color"] == [1, 0, 0, 1]
    assert p["matrix"] == sm.m4ident()
    # flat normals: +z face normal accumulated at every vertex (normalized
    # in the shader, so direction is what's pinned)
    norm = p["norm"].reshape(3, 3)
    assert (norm[:, 2] > 0).all() and np.allclose(norm[:, :2], 0)


def test_parse_glb_rejects_non_glb():
    with pytest.raises(ValueError, match="not a GLB"):
        sm.parse_glb(b"\0" * 32)
    with pytest.raises(ValueError, match="no JSON chunk"):
        sm.parse_glb(struct.pack("<III", sm.GLB_MAGIC, 2, 12))


def test_parse_glb_node_trs_and_hierarchy():
    """Node matrices compose parent-to-child; TRS converts per glTF."""
    pos = np.asarray([0, 0, 0, 1, 0, 0, 0, 1, 0], "<f4")
    bin_chunk = pos.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"children": [1], "translation": [10, 0, 0]},
            {"mesh": 0, "scale": [2, 2, 2], "translation": [0, 5, 0]},
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "accessors": [{"bufferView": 0, "componentType": 5126, "count": 3,
                       "type": "VEC3"}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 36}],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    prims = sm.parse_glb(make_glb(gltf, bin_chunk))
    assert len(prims) == 1
    m = prims[0]["matrix"]
    # world = T(10,0,0) * (T(0,5,0) S(2)): translation column = (10, 5, 0)
    assert m[12] == 10 and m[13] == 5 and m[14] == 0
    assert m[0] == 2 and m[5] == 2 and m[10] == 2
    # explicit matrix field wins over TRS
    gltf["nodes"][1] = {"mesh": 0,
                        "matrix": [1, 0, 0, 0, 0, 1, 0, 0,
                                   0, 0, 1, 0, 7, 8, 9, 1]}
    prims = sm.parse_glb(make_glb(gltf, bin_chunk))
    m = prims[0]["matrix"]
    assert (m[12], m[13], m[14]) == (17, 8, 9)


def test_parse_glb_interleaved_accessor():
    """byteStride-interleaved POSITION/NORMAL gather element-by-element."""
    # layout per vertex: pos(3f) norm(3f), stride 24
    inter = np.zeros((3, 6), "<f4")
    inter[:, :3] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    inter[:, 3:] = [[0, 0, 1]] * 3
    bin_chunk = inter.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "NORMAL": 1}}
        ]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "byteOffset": 0},
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "byteOffset": 12},
        ],
        "bufferViews": [{"buffer": 0, "byteOffset": 0,
                         "byteLength": len(bin_chunk), "byteStride": 24}],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    prims = sm.parse_glb(make_glb(gltf, bin_chunk))
    np.testing.assert_array_equal(
        prims[0]["pos"].reshape(3, 3), inter[:, :3])
    np.testing.assert_array_equal(
        prims[0]["norm"].reshape(3, 3), inter[:, 3:])


def test_parse_glb_uint8_indices_widened():
    """Non-u16/u32 index component types widen to uint32 (WebGL upload)."""
    pos = np.asarray([0, 0, 0, 1, 0, 0, 0, 1, 0], "<f4")
    idx = np.asarray([0, 1, 2], "u1")
    bin_chunk = pos.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1}
        ]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5121, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 3},
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    prims = sm.parse_glb(make_glb(gltf, bin_chunk))
    assert prims[0]["idx"].dtype == np.uint32


def test_glb_to_json_b64_roundtrip():
    out = sm.glb_to_json(tri_glb())
    p = out["prims"][0]
    pos = np.frombuffer(base64.b64decode(p["pos_b64"]), "<f4")
    np.testing.assert_array_equal(pos, [0, 0, 0, 1, 0, 0, 0, 1, 0])
    idx = np.frombuffer(base64.b64decode(p["idx_b64"]),
                        "<u4" if p["idx_u32"] else "<u2")
    np.testing.assert_array_equal(idx, [0, 1, 2])
    json.dumps(out)  # JSON-serializable end to end


# -- matrix math --------------------------------------------------------------


def test_m4_quat_pos_scale_matches_numpy():
    rng = np.random.default_rng(7)
    v = rng.normal(size=4)
    v /= np.linalg.norm(v)
    q = {"x": v[0], "y": v[1], "z": v[2], "w": v[3]}
    m = np.asarray(sm.m4_from_quat_pos_scale(q, [1, 2, 3], [2, 2, 2]))
    m = m.reshape(4, 4).T  # column-major -> row-major
    # rotation part must be 2*orthonormal, translation exact
    r = m[:3, :3] / 2.0
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3])
    assert abs(np.linalg.det(r) - 1) < 1e-12


def test_m4mul_matches_numpy():
    rng = np.random.default_rng(3)
    a, b = rng.normal(size=16).tolist(), rng.normal(size=16).tolist()
    got = np.asarray(sm.m4mul(a, b)).reshape(4, 4, order="F")
    want = (np.asarray(a).reshape(4, 4, order="F")
            @ np.asarray(b).reshape(4, 4, order="F"))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_arrow_mats_layout():
    shaft, head = sm.arrow_mats({"shaft_length": 2.0, "shaft_diameter": 0.2,
                                 "head_length": 0.5, "head_diameter": 0.4})
    # shaft: unit cylinder (z axis) rotated to +x, centered at x = sl/2
    assert (shaft[12], shaft[13], shaft[14]) == (1.0, 0.0, 0.0)
    sh = np.asarray(shaft).reshape(4, 4, order="F")[:3, :3]
    # local z (third column) maps to +/-x with length sl
    np.testing.assert_allclose(np.abs(sh[:, 2]), [2, 0, 0], atol=1e-12)
    # head cone starts at the shaft tip
    assert (head[12], head[13], head[14]) == (2.0, 0.0, 0.0)
    hd = np.asarray(head).reshape(4, 4, order="F")[:3, :3]
    np.testing.assert_allclose(np.diag(hd), [0.5, 0.2, 0.2], atol=1e-12)


# -- draw list + framing -------------------------------------------------------


def _pose(x=0.0, y=0.0, z=0.0):
    return {"position": {"x": x, "y": y, "z": z},
            "orientation": {"x": 0, "y": 0, "z": 0, "w": 1}}


def test_build_draw_list_kinds_and_frame_transform():
    red = {"r": 1, "g": 0, "b": 0, "a": 1}
    scene = {
        "transforms": {"sat": _pose(10, 0, 0)},
        "entities": [
            {"frame_id": "sat", "spheres": [
                {"pose": _pose(1, 0, 0), "color": red,
                 "size": {"x": 2, "y": 2, "z": 2}}],
             "arrows": [
                {"pose": _pose(), "color": red, "shaft_length": 1.0,
                 "shaft_diameter": 0.1, "head_length": 0.2,
                 "head_diameter": 0.2}]},
            {"frame_id": "free", "cubes": [
                {"pose": _pose(0, 5, 0), "color": red,
                 "size": {"x": 1, "y": 1, "z": 1}}],
             "lines": [
                {"color": red,
                 "points": [{"x": 0, "y": 0, "z": 0},
                            {"x": 1, "y": 1, "z": 1}]}],
             "models": [
                {"pose": _pose(3, 0, 0), "url": "/assets/m.glb",
                 "override_color": True, "color": red,
                 "scale": {"x": 1, "y": 1, "z": 1}}]},
        ],
    }
    dl = sm.build_draw_list(scene)
    # arrow expands to cylinder + cone; sphere radius = size/2
    kinds = [s["kind"] for s in dl["solids"]]
    assert kinds == ["sphere", "cylinder", "cone", "cube"]
    sph = dl["solids"][0]
    # frame-locked: sat transform (x=10) premultiplies the local x=1 pose
    assert sph["mat"][12] == 11 and sph["mat"][0] == 1.0
    # entity without a registered transform renders at its own pose
    assert dl["solids"][3]["mat"][13] == 5
    assert dl["lines"][0]["pts"] == [0, 0, 0, 1, 1, 1]
    assert dl["glbs"][0]["color"] == red  # override_color passes through
    assert dl["glbs"][0]["url"] == "/assets/m.glb"

    # no override -> color None (client uses the GLB material)
    scene["entities"][1]["models"][0]["override_color"] = False
    assert sm.build_draw_list(scene)["glbs"][0]["color"] is None


def test_frame_scene_center_radius_and_empty():
    dl = {"solids": [{"mat": sm.m4_from_quat_pos_scale(
        {"x": 0, "y": 0, "z": 0, "w": 1}, [10, 0, 0], [1, 1, 1])}],
        "glbs": [], "lines": [{"pts": [-10, 0, 0]}]}
    fr = sm.frame_scene(dl)
    np.testing.assert_allclose(fr["center"], [0, 0, 0], atol=1e-12)
    assert abs(fr["radius"] - 10) < 1e-9
    assert sm.frame_scene({"solids": [], "glbs": [], "lines": []}) == {
        "center": [0.0, 0.0, 0.0], "radius": 10.0}


# -- unit geometry -------------------------------------------------------------


@pytest.mark.parametrize("name,geom", [
    ("cube", sm.geom_cube()),
    ("sphere", sm.geom_sphere(18, 28)),
    ("cylinder", sm.geom_cylinder(24)),
    ("cone", sm.geom_cone(24)),
])
def test_geom_invariants(name, geom):
    pos = geom["pos"].reshape(-1, 3)
    norm = geom["norm"].reshape(-1, 3)
    idx = geom["idx"]
    assert len(pos) == len(norm)
    assert idx.max() < len(pos) and idx.min() >= 0
    assert len(idx) % 3 == 0
    # winding: every face normal must agree with the vertex normals
    tri = idx.reshape(-1, 3).astype(int)
    fn = np.cross(pos[tri[:, 1]] - pos[tri[:, 0]],
                  pos[tri[:, 2]] - pos[tri[:, 0]])
    ok = (fn * norm[tri[:, 0]]).sum(axis=1) >= -1e-6
    assert ok.all(), f"{name}: {int((~ok).sum())} backwards faces"


def test_geom_shapes():
    cube = sm.geom_cube()["pos"].reshape(-1, 3)
    assert np.abs(cube).max() == 0.5
    sph = sm.geom_sphere(6, 8)
    np.testing.assert_allclose(
        np.linalg.norm(sph["pos"].reshape(-1, 3), axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(sph["pos"], sph["norm"], atol=1e-6)
    cyl = sm.geom_cylinder(8)["pos"].reshape(-1, 3)
    assert cyl[:, 2].min() == -0.5 and cyl[:, 2].max() == 0.5
    cone = sm.geom_cone(8)["pos"].reshape(-1, 3)
    assert cone[:, 0].min() == 0 and cone[:, 0].max() == 1


def test_geoms_to_json_decodable():
    gj = sm.geoms_to_json()
    assert set(gj) == {"cube", "sphere", "cylinder", "cone"}
    for g in gj.values():
        pos = np.frombuffer(base64.b64decode(g["pos_b64"]), "<f4")
        idx = np.frombuffer(base64.b64decode(g["idx_b64"]), "<u2")
        assert idx.max() < len(pos) // 3
    json.dumps(gj)
