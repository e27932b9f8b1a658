import jax.numpy as jnp
import numpy as np

from metalpathtracer_tpu.render import upload_scene
from metalpathtracer_tpu.render.intersect import (
    closest_hit_bruteforce,
    ray_aabb,
    ray_sphere,
    ray_triangle,
    surface_interaction,
)
from metalpathtracer_tpu.scene import HostScene, Material


def test_ray_sphere_basic():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = ray_sphere(o, d, jnp.array([[0.0, 0.0, -5.0]]), jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(t), [4.0], rtol=1e-6)
    # miss
    t = ray_sphere(o, d, jnp.array([[10.0, 0.0, -5.0]]), jnp.array([1.0]))
    assert np.isinf(np.asarray(t))[0]
    # behind the origin
    t = ray_sphere(o, d, jnp.array([[0.0, 0.0, 5.0]]), jnp.array([1.0]))
    assert np.isinf(np.asarray(t))[0]


def test_ray_sphere_inside_uses_far_root():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = ray_sphere(o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([2.0]))
    np.testing.assert_allclose(np.asarray(t), [2.0], rtol=1e-6)
    # reference's inline near-root-only behavior
    t = ray_sphere(
        o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([2.0]), both_roots=False
    )
    assert np.isinf(np.asarray(t))[0]


def test_ray_triangle_hit_miss_parallel():
    o = jnp.array([[0.25, 0.25, 1.0]] * 3)
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    v0 = jnp.array([[0.0, 0.0, 0.0]] * 3)
    v1 = jnp.array([[1.0, 0.0, 0.0]] * 3)
    v2 = jnp.array([[0.0, 1.0, 0.0]] * 3)
    t = np.asarray(ray_triangle(o, d, v0, v1, v2))
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)  # hit
    assert np.isinf(t[1])  # points away
    assert np.isinf(t[2])  # parallel to plane


def test_ray_triangle_edge_containment():
    # outside the triangle
    o = jnp.array([[0.9, 0.9, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = ray_triangle(
        o, d,
        jnp.array([[0.0, 0.0, 0.0]]),
        jnp.array([[1.0, 0.0, 0.0]]),
        jnp.array([[0.0, 1.0, 0.0]]),
    )
    assert np.isinf(np.asarray(t))[0]


def test_ray_aabb():
    o = jnp.array([[0.0, 0.0, 0.0]])
    inv_d = 1.0 / jnp.array([[0.0, 0.0, -1.0]])  # inf components exercise slabs
    hit = ray_aabb(o, inv_d, jnp.array([[-1.0, -1.0, -3.0]]),
                   jnp.array([[1.0, 1.0, -2.0]]), 1e-4, jnp.array([jnp.inf]))
    assert bool(hit[0])
    # box behind
    hit = ray_aabb(o, inv_d, jnp.array([[-1.0, -1.0, 2.0]]),
                   jnp.array([[1.0, 1.0, 3.0]]), 1e-4, jnp.array([jnp.inf]))
    assert not bool(hit[0])
    # t_max culling: box farther than current best
    hit = ray_aabb(o, inv_d, jnp.array([[-1.0, -1.0, -3.0]]),
                   jnp.array([[1.0, 1.0, -2.0]]), 1e-4, jnp.array([1.0]))
    assert not bool(hit[0])


def _two_prim_scene():
    s = HostScene()
    s.add_sphere((0, 0, -5), 1.0, Material())
    s.add_triangle((-1, -1, -3), (1, -1, -3), (0, 1, -3), Material())
    return upload_scene(s)


def test_bruteforce_closest_and_interaction():
    scene = _two_prim_scene()
    # ray 0 hits the triangle (t=3) before the sphere (t=4); ray 1 starts
    # past the triangle plane and hits only the sphere (t=0.5).
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -3.5]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, idx = closest_hit_bruteforce(scene, o, d)
    np.testing.assert_allclose(np.asarray(t), [3.0, 0.5], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), [1, 0])
    point, normal, front = surface_interaction(scene, o, d, t, idx)
    np.testing.assert_allclose(np.asarray(point)[0], [0, 0, -3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(normal)[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(point)[1], [0, 0, -4], atol=1e-5)
    np.testing.assert_allclose(np.asarray(normal)[1], [0, 0, 1], atol=1e-5)
    assert bool(np.asarray(front)[0]) and bool(np.asarray(front)[1])


def test_bruteforce_miss_returns_minus_one():
    scene = _two_prim_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    t, idx = closest_hit_bruteforce(scene, o, d)
    assert np.isinf(np.asarray(t))[0] and int(idx[0]) == -1


def test_bruteforce_padding_never_hits():
    # padded PRIM_NONE lanes must not produce hits even for rays that point
    # at the origin where padding vertices live (all-zero triangles).
    s = HostScene()
    s.add_sphere((5, 5, 5), 0.5, Material())  # pads scene to 8 prims
    scene = upload_scene(s)
    o = jnp.array([[1.0, 1.0, 1.0]])
    d = jnp.array([[-0.577, -0.577, -0.577]])
    t, idx = closest_hit_bruteforce(scene, o, d)
    assert int(idx[0]) == -1


def test_ray_sphere_no_false_far_root_on_giant_sphere():
    # Rays leaving the surface of an r=10000 sphere must NOT re-hit it via a
    # spurious far root (f32 cancellation in |oc|^2 - r^2 once silently
    # re-absorbed ~half of all ground-scattered rays).
    import numpy as np

    r = np.random.default_rng(0)
    n = 4096
    # points 1e-4 above the reference ground sphere, rays upward-hemisphere
    x = r.uniform(-3, 3, n).astype(np.float32)
    z = r.uniform(-3, 3, n).astype(np.float32)
    y = (-10000.0 + np.sqrt(1e8 - x * x - z * z) + 1e-4).astype(np.float32)
    o = jnp.asarray(np.stack([x, y, z], 1))
    d = r.standard_normal((n, 3)).astype(np.float32)
    d[:, 1] = np.abs(d[:, 1]) + 0.05
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = ray_sphere(o, jnp.asarray(d), jnp.array([[0.0, -10000.0, 0.0]]),
                   jnp.array([10000.0]))
    assert np.isinf(np.asarray(t)).all(), "false self-intersections"


def test_ray_sphere_far_root_still_works_inside():
    # genuine interior origin (dielectric transmission) must still exit
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = ray_sphere(o, d, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([2.0]))
    np.testing.assert_allclose(np.asarray(t), [2.0], rtol=1e-6)
