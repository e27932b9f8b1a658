import jax.numpy as jnp
import numpy as np

from metalpathtracer_tpu.core import rng


def test_threefry_matches_jax_reference():
    # Our vectorized threefry2x32 must agree with JAX's own implementation.
    from jax._src.prng import threefry_2x32

    k = np.array([0x13198A2E, 0x03707344], np.uint32)
    c = np.arange(64, dtype=np.uint32)
    expected = np.asarray(threefry_2x32(k, c)).reshape(2, 32)
    got0, got1 = rng.threefry2x32(k[0], k[1], c[:32], c[32:])
    np.testing.assert_array_equal(np.asarray(got0), expected[0])
    np.testing.assert_array_equal(np.asarray(got1), expected[1])


def test_threefry_known_answer_zero():
    from jax._src.prng import threefry_2x32

    k = np.zeros(2, np.uint32)
    c = np.zeros(2, np.uint32)
    expected = np.asarray(threefry_2x32(k, c))
    g0, g1 = rng.threefry2x32(0, 0, np.uint32(0), np.uint32(0))
    assert np.uint32(g0) == expected[0] and np.uint32(g1) == expected[1]


def test_uniform_range_and_mean():
    pix = jnp.arange(1 << 16, dtype=jnp.uint32)
    u0, u1 = rng.uniform2(42, pix, 0, 0, rng.PURPOSE_LOBE)
    for u in (np.asarray(u0), np.asarray(u1)):
        assert u.min() >= 0.0 and u.max() < 1.0
        np.testing.assert_allclose(u.mean(), 0.5, atol=0.005)
        np.testing.assert_allclose(u.var(), 1 / 12, atol=0.005)


def test_streams_are_decorrelated():
    pix = jnp.arange(4096, dtype=jnp.uint32)
    a = np.asarray(rng.uniform1(1, pix, 0, 0, rng.PURPOSE_LOBE))
    b = np.asarray(rng.uniform1(1, pix, 1, 0, rng.PURPOSE_LOBE))  # next sample
    c = np.asarray(rng.uniform1(1, pix, 0, 1, rng.PURPOSE_LOBE))  # next bounce
    d = np.asarray(rng.uniform1(1, pix, 0, 0, rng.PURPOSE_FRESNEL))
    for other in (b, c, d):
        corr = np.corrcoef(a, other)[0, 1]
        assert abs(corr) < 0.05


def test_uniform3_third_differs():
    pix = jnp.arange(1024, dtype=jnp.uint32)
    u0, u1, u2 = rng.uniform3(7, pix, 3, 2, rng.PURPOSE_LOBE)
    assert not np.array_equal(np.asarray(u0), np.asarray(u2))
    assert abs(np.corrcoef(np.asarray(u0), np.asarray(u2))[0, 1]) < 0.06


def test_deterministic_and_position_based():
    # Identical (seed, pixel, sample, bounce) → identical draws, regardless of
    # where in the batch the pixel sits (reshard invariance).
    full = np.asarray(rng.uniform1(9, jnp.arange(256, dtype=jnp.uint32), 5, 2, 1))
    half = np.asarray(rng.uniform1(9, jnp.arange(128, 256, dtype=jnp.uint32), 5, 2, 1))
    np.testing.assert_array_equal(full[128:], half)


def test_random_unit_vector_is_uniform_sphere():
    pix = jnp.arange(1 << 16, dtype=jnp.uint32)
    v = np.asarray(rng.random_unit_vector(3, pix, 0, 0))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # each coordinate of a uniform sphere point has mean 0, var 1/3
    np.testing.assert_allclose(v.mean(0), 0.0, atol=0.01)
    np.testing.assert_allclose(v.var(0), 1 / 3, atol=0.01)
    # z and angle must be independent (the reference's appendix-1 defect made
    # them perfectly correlated)
    z = v[:, 2]
    t = np.arctan2(v[:, 1], v[:, 0])
    assert abs(np.corrcoef(z, t)[0, 1]) < 0.02


def test_uniformity_across_sample_axis_chi_square():
    # the progressive-accumulation axis: fixed pixel, varying sample id.
    # This is the stream whose quality determines whether spp converges
    # (a correlated stream here once masked an estimator bug).
    samples = jnp.arange(1 << 14, dtype=jnp.uint32)
    u1, u2 = rng.uniform2(5, jnp.uint32(777), samples, 0, rng.PURPOSE_LOBE)
    for u in (np.asarray(u1), np.asarray(u2)):
        counts, _ = np.histogram(u, bins=64, range=(0.0, 1.0))
        expected = len(u) / 64
        chi2 = ((counts - expected) ** 2 / expected).sum()
        # chi2(63 dof): mean 63, std ~11.2; 5-sigma bound
        assert chi2 < 63 + 5 * 11.3, chi2
    # pairwise independence of (u1, u2) via 2-D occupancy
    h2, _, _ = np.histogram2d(np.asarray(u1), np.asarray(u2), bins=16,
                              range=[[0, 1], [0, 1]])
    expected = len(np.asarray(u1)) / 256
    chi2 = ((h2 - expected) ** 2 / expected).sum()
    assert chi2 < 255 + 5 * np.sqrt(2 * 255), chi2
