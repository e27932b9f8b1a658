import jax.numpy as jnp
import numpy as np

from metalpathtracer_tpu.core import vecmath as vm


def rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_dot_cross_vs_numpy():
    a, b = rand((64, 3), 1), rand((64, 3), 2)
    np.testing.assert_allclose(vm.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(vm.cross(a, b), np.cross(a, b), rtol=1e-4, atol=1e-5)


def test_normalize_unit_and_zero_safe():
    a = rand((128, 3), 3)
    n = np.asarray(vm.normalize(a))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
    z = np.asarray(vm.normalize(jnp.zeros((4, 3))))
    assert np.all(np.isfinite(z)) and np.all(z == 0)


def test_reflect_matches_glsl():
    d = np.asarray(vm.normalize(rand((32, 3), 4)))
    n = np.asarray(vm.normalize(rand((32, 3), 5)))
    r = np.asarray(vm.reflect(d, n))
    expected = d - 2 * np.sum(d * n, -1, keepdims=True) * n
    np.testing.assert_allclose(r, expected, rtol=1e-5, atol=1e-6)
    # reflection preserves length for unit normals
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, rtol=1e-4)


def test_refract_snells_law():
    # ray at 45 degrees entering eta=1/1.5 medium
    d = np.array([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    eta = np.array([1.0 / 1.5], np.float32)
    t = np.asarray(vm.refract(d, n, eta))
    sin_in = np.sqrt(0.5)
    sin_out = np.abs(t[0, 0]) / np.linalg.norm(t[0])
    np.testing.assert_allclose(sin_out, sin_in * eta[0], rtol=1e-5)


def test_refract_total_internal_reflection_is_zero():
    d = np.array([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    eta = np.array([1.6], np.float32)  # 1.6 * sin45 > 1 → TIR
    t = np.asarray(vm.refract(d, n, eta))
    assert np.all(t == 0)


def test_schlick_limits():
    # normal incidence → r0; grazing → 1
    r = np.asarray(vm.schlick_reflectance(jnp.float32(1.0), jnp.float32(1.5)))
    np.testing.assert_allclose(r, ((1 - 1.5) / (1 + 1.5)) ** 2, rtol=1e-5)
    g = np.asarray(vm.schlick_reflectance(jnp.float32(0.0), jnp.float32(1.5)))
    np.testing.assert_allclose(g, 1.0, rtol=1e-5)
