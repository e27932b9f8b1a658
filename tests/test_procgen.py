import numpy as np

from metalpathtracer_tpu.scene import load_obj
from metalpathtracer_tpu.scene.procgen import cube, icosphere, plane, write_obj


def test_cube_topology():
    v, f = cube(2.0)
    assert v.shape == (8, 3) and f.shape == (12, 3)
    assert np.allclose(np.abs(v), 1.0)


def test_icosphere_counts_and_radius():
    for sub, tris in [(0, 20), (1, 80), (2, 320)]:
        v, f = icosphere(sub, radius=2.0)
        assert f.shape == (tris, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 2.0, rtol=1e-5)


def test_plane():
    v, f = plane(4.0, divisions=3)
    assert v.shape == (16, 3) and f.shape == (18, 3)
    assert np.all(v[:, 1] == 0)


def test_obj_roundtrip(tmp_path):
    v, f = icosphere(1)
    p = str(tmp_path / "ico.obj")
    write_obj(p, v, f)
    v2, f2 = load_obj(p)
    assert v2.shape == v.shape and f2.shape == f.shape
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_meshes_are_watertight_orientable():
    # every edge of a closed mesh must appear exactly twice, once per direction
    for v, f in [cube(), icosphere(1)]:
        edges = {}
        for a, b, c in f:
            for e in [(a, b), (b, c), (c, a)]:
                edges[e] = edges.get(e, 0) + 1
        for (a, b), count in edges.items():
            assert count == 1, "duplicate directed edge"
            assert (b, a) in edges, "boundary edge in closed mesh"
