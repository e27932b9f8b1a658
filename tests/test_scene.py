import os
import textwrap

import numpy as np
import pytest

from metalpathtracer_tpu.scene import (
    HostScene,
    Material,
    PRIM_NONE,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    ObjError,
    SceneParseError,
    load_obj,
    load_scene_xml,
)
from metalpathtracer_tpu.scene import presets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNNY = os.path.join(REPO, "assets", "bunny.obj")


def test_obj_loader_bunny_counts():
    # Must match the counts the reference prints at SceneLoader.cpp:72:
    # 2503 vertices, 4968 triangles.
    verts, faces = load_obj(BUNNY)
    assert verts.shape == (2503, 3)
    assert faces.shape == (4968, 3)
    assert faces.min() >= 0 and faces.max() < 2503


def test_obj_loader_quads_fan_triangulated(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        textwrap.dedent(
            """
            v 0 0 0
            v 1 0 0
            v 1 1 0
            v 0 1 0
            f 1 2 3 4
            f -4//1 -3/2/1 -2
            """
        )
    )
    verts, faces = load_obj(str(p))
    assert verts.shape == (4, 3)
    assert faces.shape == (3, 3)  # quad → 2 tris, tri → 1
    np.testing.assert_array_equal(faces[0], [0, 1, 2])
    np.testing.assert_array_equal(faces[1], [0, 2, 3])
    np.testing.assert_array_equal(faces[2], [0, 1, 2])


def test_obj_loader_errors(tmp_path):
    with pytest.raises(ObjError):
        load_obj(str(tmp_path / "missing.obj"))
    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nf 1 2 9\n")
    with pytest.raises(ObjError):
        load_obj(str(bad))


def test_xml_reference_scene_counts():
    s = load_scene_xml(os.path.join(REPO, "scenes", "reference.xml"))
    assert s.primitive_count == 3 + 4968
    assert s.triangle_count == 4968


def test_xml_defaults_and_attributes(tmp_path):
    p = tmp_path / "s.xml"
    p.write_text('<Scene><Sphere position="1,2,3" albedo="0.5,0.5,0.5"/></Scene>')
    s = load_scene_xml(str(p))
    assert s.primitive_count == 1
    np.testing.assert_array_equal(s.p0[0], [1, 2, 3])
    assert s.p1[0][0] == 1.0  # default radius
    m = s.materials[0]
    assert m.material_type == 0.0 and m.emission_power == 0.0 and m.fuzz == 0.0


def test_xml_relative_mesh_path(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    p = tmp_path / "s.xml"
    p.write_text(
        '<Scene><Mesh file="tri.obj" position="1,0,0" scale="2"'
        ' albedo="0.9,0.5,0.3"/></Scene>'
    )
    s = load_scene_xml(str(p))
    assert s.triangle_count == 1
    # baked world coords: pos + scale * v (reference SceneLoader.cpp:124-127)
    np.testing.assert_array_equal(s.p0[0], [1, 0, 0])
    np.testing.assert_array_equal(s.p1[0], [3, 0, 0])
    np.testing.assert_array_equal(s.p2[0], [1, 2, 0])


def test_xml_errors(tmp_path):
    with pytest.raises(SceneParseError):
        load_scene_xml(str(tmp_path / "missing.xml"))
    bad = tmp_path / "bad.xml"
    bad.write_text("<NotAScene/>")
    with pytest.raises(SceneParseError):
        load_scene_xml(str(bad))
    trunc = tmp_path / "trunc.xml"
    trunc.write_text("<Scene><Sphere")
    with pytest.raises(SceneParseError):
        load_scene_xml(str(trunc))
    nomesh = tmp_path / "nomesh.xml"
    nomesh.write_text("<Scene><Mesh position='0,0,0'/></Scene>")
    with pytest.raises(SceneParseError):
        load_scene_xml(str(nomesh))


def test_pack_pads_and_preserves():
    s = presets.cornell_spheres()
    packed = s.pack()
    assert packed.num_real == s.primitive_count
    assert packed.num_padded % 8 == 0
    assert np.all(packed.prim_type[packed.num_real :] == PRIM_NONE)
    assert np.all(packed.prim_type[: packed.num_real] == PRIM_SPHERE)
    assert packed.albedo.dtype == np.float32


def test_pack_empty_scene_raises():
    with pytest.raises(ValueError):
        HostScene().pack()


def test_aabbs():
    s = HostScene()
    s.add_sphere((1, 2, 3), 2.0, Material())
    s.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 5), Material())
    packed = s.pack()
    lo, hi = packed.aabbs()
    np.testing.assert_array_equal(lo[0], [-1, 0, 1])
    np.testing.assert_array_equal(hi[0], [3, 4, 5])
    np.testing.assert_array_equal(lo[1], [0, 0, 0])
    np.testing.assert_array_equal(hi[1], [1, 1, 5])
    # padding lanes are empty boxes
    assert np.all(np.isinf(lo[packed.num_real :]))


def test_reference_preset_matches_xml():
    s_xml = load_scene_xml(os.path.join(REPO, "scenes", "reference.xml"))
    s_py = presets.reference_default(BUNNY)
    assert s_xml.primitive_count == s_py.primitive_count
    np.testing.assert_allclose(
        np.stack(s_xml.p0), np.stack(s_py.p0), rtol=1e-6
    )
