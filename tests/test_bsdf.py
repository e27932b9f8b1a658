"""Validation of the analytic glossy (fuzzy-mirror) lobe pdf.

The glossy NEE+MIS extension (VERDICT r3 weak #3) rests on `bsdf.glossy_pdf`
being the true solid-angle density of the sampler in `bsdf.sample_bsdf`
(`normalize(reflect + fuzz * uniform_sphere)`); these tests pin it two ways:
quadrature normalization and a Monte-Carlo histogram of the actual sampler.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metalpathtracer_tpu.render import bsdf


@pytest.mark.parametrize("fuzz", [0.1, 0.3, 0.7, 0.95])
def test_glossy_pdf_normalizes(fuzz):
    # integrate p(theta) * 2 pi sin(theta) over the cone sin(theta) < fuzz
    # (midpoint rule; the integrand's inverse-sqrt edge singularity at
    # theta_max is integrable, so midpoint converges)
    theta_max = np.arcsin(fuzz)
    n = 200_000
    th = (np.arange(n) + 0.5) / n * theta_max
    c = np.stack([np.zeros(n), np.zeros(n), np.ones(n)], axis=1)
    w = np.stack([np.sin(th), np.zeros(n), np.cos(th)], axis=1)
    p = np.asarray(bsdf.glossy_pdf(jnp.asarray(c, jnp.float32),
                                   jnp.float32(fuzz),
                                   jnp.asarray(w, jnp.float32)))
    total = float(np.sum(p * 2.0 * np.pi * np.sin(th)) * (theta_max / n))
    assert abs(total - 1.0) < 2e-3


@pytest.mark.parametrize("fuzz", [0.3, 0.8])
def test_glossy_pdf_matches_sampler_histogram(fuzz):
    # histogram cos(theta) of x = c + fuzz*s (s uniform on S^2), compare
    # against the analytic marginal integrated over each bin
    rng = np.random.default_rng(0)
    n = 400_000
    s = rng.normal(size=(n, 3))
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    x = np.array([0.0, 0.0, 1.0]) + fuzz * s
    cos_t = (x[:, 2] / np.linalg.norm(x, axis=1)).astype(np.float64)

    cos_min = np.cos(np.arcsin(fuzz))
    bins = np.linspace(cos_min, 1.0, 25)
    hist, _ = np.histogram(cos_t, bins=bins)
    frac = hist / n

    # analytic mass per bin: the integrand p * 2 pi d(cos theta) =
    # (2u^2 - 1 + r^2) / (r sqrt(u^2 - cos_min^2)) du has an integrable
    # 1/sqrt singularity at the cone edge u = cos_min; substituting
    # v = sqrt(u^2 - cos_min^2) makes it smooth:
    # integrand dv = (u^2 + v^2) / (r u) dv with u = sqrt(v^2 + cos_min^2)
    for k in range(len(bins) - 1):
        v0 = np.sqrt(max(bins[k] ** 2 - cos_min**2, 0.0))
        v1 = np.sqrt(bins[k + 1] ** 2 - cos_min**2)
        v = np.linspace(v0, v1, 400)
        u = np.sqrt(v * v + cos_min**2)
        mass = float(np.trapezoid((u * u + v * v) / (fuzz * u), v))
        assert frac[k] == pytest.approx(mass, rel=0.08, abs=2e-4)


def test_glossy_pdf_zero_outside_cone_and_degenerate():
    c = jnp.asarray([[0.0, 0.0, 1.0]] * 4, jnp.float32)
    w = jnp.asarray(
        [
            [np.sin(0.9), 0.0, np.cos(0.9)],  # outside cone for fuzz=0.5
            [0.0, 0.0, -1.0],  # behind
            [0.0, 0.0, 1.0],  # center, fuzz=0 (delta lobe -> 0)
            [0.0, 0.0, 1.0],  # center, fuzz=1.2 (out of supported range)
        ],
        jnp.float32,
    )
    fuzz = jnp.asarray([0.5, 0.5, 0.0, 1.2], jnp.float32)
    p = np.asarray(bsdf.glossy_pdf(c, fuzz, w))
    assert (p == 0.0).all()
