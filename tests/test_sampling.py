"""Sampling warp / PDF self-consistency tests.

Monte-Carlo checks in the spirit of SURVEY.md §4: every warp's samples must
integrate 1/pdf to the measure of its support, and pdfs must match the
analytic forms of reference Sampling.h:29-69.
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.sampling import rng as rtrng
from raytracingrenderer_tpu.sampling import warps

N = 200_000


def uv(seed, n=N):
    k = jax.random.PRNGKey(seed)
    u = jax.random.uniform(k, (2, n))
    return u[0], u[1]


class TestWarps:
    def test_uniform_hemisphere(self):
        r1, r2 = uv(0)
        w = warps.uniform_hemisphere(r1, r2)
        np.testing.assert_allclose(w.length(), 1.0, atol=1e-5)
        assert float(w.z.min()) >= -1e-6
        pdf = warps.uniform_hemisphere_pdf(w)
        # integral of 1 over hemisphere = 2pi
        est = float(jnp.mean(1.0 / pdf))
        assert abs(est - 2 * np.pi) < 0.05

    def test_cosine_hemisphere(self):
        r1, r2 = uv(1)
        w = warps.cosine_hemisphere(r1, r2)
        pdf = warps.cosine_hemisphere_pdf(w)
        est = float(jnp.mean(1.0 / jnp.maximum(pdf, 1e-9)))
        assert abs(est - 2 * np.pi) < 0.2
        # E[cos theta] under cosine sampling = 2/3
        assert abs(float(jnp.mean(w.z)) - 2.0 / 3.0) < 0.01

    def test_uniform_sphere(self):
        r1, r2 = uv(2)
        w = warps.uniform_sphere(r1, r2)
        pdf = warps.uniform_sphere_pdf(w)
        est = float(jnp.mean(1.0 / pdf))
        assert abs(est - 4 * np.pi) < 0.05
        assert abs(float(jnp.mean(w.z))) < 0.01

    def test_uniform_triangle_barycentric(self):
        r1, r2 = uv(3)
        a, b, g = warps.uniform_triangle(r1, r2)
        np.testing.assert_allclose(a + b + g, 1.0, atol=1e-5)
        assert float(jnp.min(jnp.stack([a, b, g]))) >= -1e-6
        # uniform => E[alpha] = 1/3
        assert abs(float(jnp.mean(a)) - 1 / 3) < 0.01

    def test_ggx_d_normalization(self):
        """Integral of D(h) cos(h) over hemisphere must be 1."""
        for alpha in (0.1, 0.5, 1.0):
            r1, r2 = uv(4)
            # integrate with uniform hemisphere sampling
            h = warps.uniform_hemisphere(r1, r2)
            d = warps.ggx_d(h, alpha)
            est = float(jnp.mean(d * h.z / warps.uniform_hemisphere_pdf(h)))
            assert abs(est - 1.0) < 0.05, (alpha, est)

    def test_ggx_sample_matches_pdf(self):
        """E[f(h)] under ggx warp == integral f * pdf via uniform sampling."""
        alpha = 0.3
        r1, r2 = uv(5)
        h = warps.ggx_sample_half(r1, r2, alpha)
        np.testing.assert_allclose(h.length(), 1.0, atol=1e-4)
        est_warp = float(jnp.mean(h.z))
        hu = warps.uniform_hemisphere(*uv(6))
        est_int = float(jnp.mean(
            hu.z * warps.ggx_half_pdf(hu, alpha)
            / warps.uniform_hemisphere_pdf(hu)))
        assert abs(est_warp - est_int) < 0.02

    def test_ggx_g_bounds(self):
        r1, r2 = uv(7, 1000)
        wi = warps.uniform_hemisphere(r1, r2)
        wo = warps.uniform_hemisphere(r2, r1)
        g = warps.ggx_g(wi, wo, 0.5)
        assert float(g.min()) >= 0.0 and float(g.max()) <= 1.0


class TestRng:
    def test_decision_streams_independent(self):
        k = rtrng.spp_key(jax.random.PRNGKey(7), 3)
        a = rtrng.uniform(k, 0, rtrng.BSDF_U, (1000,))
        b = rtrng.uniform(k, 0, rtrng.BSDF_V, (1000,))
        c = rtrng.uniform(k, 1, rtrng.BSDF_U, (1000,))
        assert abs(float(jnp.corrcoef(jnp.stack([a, b]))[0, 1])) < 0.1
        assert abs(float(jnp.corrcoef(jnp.stack([a, c]))[0, 1])) < 0.1

    def test_deterministic(self):
        k = rtrng.spp_key(jax.random.PRNGKey(7), 3)
        a = rtrng.uniform(k, 2, rtrng.RR, (64,))
        b = rtrng.uniform(k, 2, rtrng.RR, (64,))
        np.testing.assert_array_equal(a, b)
