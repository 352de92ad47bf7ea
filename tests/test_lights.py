"""Light tests: env-map CDF importance sampling correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import ref_path
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.io.hdr import read_hdr
from raytracingrenderer_tpu.lights import envmap as em

N = 100_000


@pytest.fixture(scope="module")
def env():
    img = read_hdr(ref_path("1.hdr"))
    # downsample for test speed
    img = img.reshape(128, 8, 128, 8, 3).mean(axis=(1, 3))
    return em.build_envmap(img)


def uv(seed, n=N):
    k = jax.random.PRNGKey(seed)
    u = jax.random.uniform(k, (2, n))
    return u[0], u[1]


class TestEnvmap:
    def test_uv_dir_roundtrip(self):
        r1, r2 = uv(0, 1000)
        d = em.uv_to_dir(r1, r2)
        np.testing.assert_allclose(np.asarray(d.length()), 1.0, atol=1e-5)
        u, v = em.dir_to_uv(d)
        np.testing.assert_allclose(np.asarray(u), np.asarray(r1), atol=1e-3)
        np.testing.assert_allclose(np.asarray(v), np.asarray(r2), atol=1e-3)

    def test_sample_pdf_consistency(self, env):
        """1/pdf under importance sampling integrates to 4pi."""
        r1, r2 = uv(1)
        wi, pdf = em.sample(env, r1, r2)
        est = float(jnp.mean(1.0 / jnp.maximum(pdf, 1e-12)))
        assert est == pytest.approx(4 * np.pi, rel=0.03)

    def test_sample_matches_pdf_fn(self, env):
        """pdf() evaluated at sampled directions equals the sampling pdf."""
        r1, r2 = uv(2)
        wi, pdf_s = em.sample(env, r1, r2)
        pdf_q = em.pdf(env, wi)
        ratio = np.asarray(pdf_q / jnp.maximum(pdf_s, 1e-12))
        assert np.median(np.abs(ratio - 1.0)) < 0.02

    def test_importance_estimates_power(self, env):
        """E[L/pdf] under importance sampling == the analytic texel-sum
        integral of the map's luminance."""
        img = np.asarray(env.data)
        h, w = img.shape[:2]
        lum = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
               + 0.0722 * img[..., 2])
        st = np.sin((np.arange(h) + 0.5) / h * np.pi)
        analytic = 2 * np.pi ** 2 / (w * h) * (lum * st[:, None]).sum()
        r1, r2 = uv(3)
        wi, pdf = em.sample(env, r1, r2)
        li = em.evaluate(env, wi).lum()
        est_imp = float(jnp.mean(li / jnp.maximum(pdf, 1e-12)))
        assert est_imp == pytest.approx(float(analytic), rel=0.03)

    def test_variance_reduction(self, env):
        """The importance estimator's dispersion must be far below the
        worst-case: its 99th percentile stays within a few x of its mean
        (pdf tracks the bilinear signal; point-pdf would spike 100x)."""
        r1, r2 = uv(4)
        wi, pdf = em.sample(env, r1, r2)
        x = np.asarray(em.evaluate(env, wi).lum()
                       / jnp.maximum(pdf, 1e-12))
        assert np.percentile(x, 99) < 5.0 * x.mean()

    def test_evaluate_matches_reference_mapping(self, env):
        """+y maps to v=0 (zenith row), per Lights.h:150-157."""
        up = V3.of(jnp.asarray([0.0]), jnp.asarray([1.0]),
                   jnp.asarray([0.0]))
        u, v = em.dir_to_uv(V3(jnp.zeros(1), jnp.ones(1), jnp.zeros(1)))
        assert float(v[0]) == pytest.approx(0.0, abs=1e-5)
        u, v = em.dir_to_uv(V3(jnp.zeros(1), -jnp.ones(1), jnp.zeros(1)))
        assert float(v[0]) == pytest.approx(1.0, abs=1e-5)
