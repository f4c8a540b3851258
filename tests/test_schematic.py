"""Typed KDL schematic layer: load-time validation + round-trip fidelity
against reference-authored schematics (parity:
libs/impeller2/kdl/src/de.rs + ser.rs over wkt/src/gui.rs)."""

import pytest

import elodin  # noqa: F401
from elodin_tpu import schematic
from elodin_tpu.schematic import SchematicError

# Reference-authored fixtures (harvested from /root/reference/examples:
# three-body/main.py, drone/motor-panel.kdl, rocket/main.py) — input DATA
# for round-trip parity, per the reference's own goldie pattern.
THREE_BODY = """
coordinate frame=ECEF
hsplit {
    tabs share=0.2 {
        hierarchy
        schematic_tree
    }
    tabs share=0.6 {
        viewport name=Viewport pos="(0,0,0,0,0,0,3)" look_at="(0,0,0,0,0,0,0)" hdr=#true
        graph "a.world_pos" name=Graph
    }
    tabs share=0.2 {
        inspector
    }
}
object_3d a.world_pos {
    sphere radius=0.2 emissivity=1.0 {
        color yellow
    }
}
line_3d b.world_pos line_width=10.0 perspective=#false
"""

MOTOR_PANEL = """
tabs {
    hsplit name="Motor Panel" {
        vsplit share=0.4 {
            graph "drone.motor_input"
            graph "drone.motor_pwm"
            graph "drone.motor_rpm"
        }
        graph "drone.thrust"
    }
}
"""

ROCKET_VIEW = """
viewport name=Viewport pos="rocket.world_pos + (0.0,0.0,0.0,0.0, 5.0, 0.0, 1.0)" look_at="rocket.world_pos" hdr=#true
vsplit {
    graph "rocket.fin_control_trim" name="Trim Control"
    graph "rocket.fin_deflect" name="Fin Deflection"
    graph "rocket.aero_coefs" name="Aero Coefficients"
}
vector_arrow "(1, 0, 0)" origin="rocket.world_pos" scale=1.0 name="Rocket X" body_frame=#true
"""


@pytest.mark.parametrize(
    "fixture", [THREE_BODY, MOTOR_PANEL, ROCKET_VIEW], ids=["3body", "motor", "rocket"]
)
def test_reference_schematics_load_and_round_trip(fixture):
    sch = schematic.load(fixture)
    assert not sch.warnings
    out = schematic.dump(sch)
    sch2 = schematic.load(out)
    # structural round trip: same panel tree, objects, components
    assert [p.kind for p in sch.all_panels()] == [p.kind for p in sch2.all_panels()]
    assert sch.eql_components() == sch2.eql_components()
    assert len(sch.objects) == len(sch2.objects)
    assert len(sch.arrows) == len(sch2.arrows)
    # serialize is a fixpoint after one normalization pass
    assert schematic.dump(sch2) == out


def test_three_body_typed_content():
    sch = schematic.load(THREE_BODY)
    assert sch.coordinate.frame == "ECEF"
    root = sch.panels[0]
    assert root.kind == "hsplit" and len(root.children) == 3
    assert root.children[0].props["share"] == 0.2
    vp = next(p for p in sch.all_panels() if p.kind == "viewport")
    assert vp.props["hdr"] is True
    assert "a.world_pos" in sch.eql_components()
    assert sch.objects[0].mesh.name == "sphere"
    assert sch.lines[0].props["line_width"] == 10.0


def test_unknown_node_rejected_at_load_time():
    with pytest.raises(SchematicError, match="unknown schematic node 'vieport'"):
        schematic.load("vieport name=V")
    with pytest.raises(SchematicError, match="unknown child node"):
        schematic.load("hsplit { wibble }")
    with pytest.raises(SchematicError, match="viewport: unknown property 'lookat'"):
        schematic.load('viewport lookat="a.world_pos"')
    with pytest.raises(SchematicError, match="graph: missing the EQL"):
        schematic.load("graph name=G")


def test_non_strict_collects_warnings_and_preserves_extras():
    sch = schematic.load("wibble a=1\nviewport name=V zorp=2", strict=False)
    assert len(sch.warnings) == 2
    assert sch.extras and sch.extras[0].name == "wibble"
    out = schematic.dump(sch)
    assert "wibble" in out and "viewport" in out


def test_layout_json_shape():
    js = schematic.to_layout_json(schematic.load(THREE_BODY))
    assert js["panels"][0]["kind"] == "hsplit"
    assert js["coordinate"]["frame"] == "ECEF"
    assert "a.world_pos" in js["components"]


def test_repo_example_schematics_validate():
    """Every schematic shipped by the repo's examples must pass strict
    load-time validation."""
    import os
    import re

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
    n_checked = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".py"):
                continue
            text = open(os.path.join(dirpath, f)).read()
            for m in re.finditer(r"\.schematic\(\s*(?:\"\"\"|''')(.*?)(?:\"\"\"|''')", text, re.S):
                schematic.load(m.group(1))
                n_checked += 1
    assert n_checked >= 5, n_checked
