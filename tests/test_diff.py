"""Differentiability tests: gradients vs finite differences.

The BASELINE.json north star requires pixel-gradients validated against
a finite-difference oracle on cornell-box.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import ref_path
from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.diff import param_grads, render_loss, train_step
from raytracingrenderer_tpu.render import sample_image
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.scene.types import Camera


@pytest.fixture(scope="module")
def scene():
    sc = load_scene(ref_path("cornell-box"))
    c = sc.camera
    return sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                     c.world_to_cam, 24, 24, c.origin,
                                     c.a_film))


# rr=False: Russian roulette's discrete survival decisions make the
# common-random-numbers FD oracle invalid (indicator flips + 1/p).
CFG = RenderConfig(max_depth=2, mis=False, jitter=False, rr=False)


def loss_with_emission_scale(scene, s, key):
    """Scalar reparameterization: scale light emission by s."""
    lights = scene.lights._replace(le=scene.lights.le * s)
    mats = scene.materials._replace(emission=scene.materials.emission * s)
    sc = scene._replace(lights=lights, materials=mats)
    img = sample_image(sc, key, CFG)
    return jnp.mean(img)


class TestGradients:
    def test_emission_grad_matches_fd(self, scene):
        key = jax.random.PRNGKey(0)
        f = lambda s: loss_with_emission_scale(scene, s, key)  # noqa: E731
        g = jax.grad(f)(1.0)
        eps = 1e-2
        fd = (f(1.0 + eps) - f(1.0 - eps)) / (2 * eps)
        # same RNG key => same paths => FD is exact up to nonlinearity
        assert float(g) == pytest.approx(float(fd), rel=0.05)
        assert float(g) > 0  # brighter light -> brighter image

    def test_albedo_grad_matches_fd(self, scene):
        key = jax.random.PRNGKey(1)

        def f(s):
            mats = scene.materials._replace(
                albedo=scene.materials.albedo * s)
            img = sample_image(scene._replace(materials=mats), key, CFG)
            return jnp.mean(img)

        g = jax.grad(f)(1.0)
        eps = 1e-2
        fd = (f(1.0 + eps) - f(1.0 - eps)) / (2 * eps)
        assert float(g) == pytest.approx(float(fd), rel=0.05)
        assert float(g) > 0

    def test_param_grads_structure(self, scene):
        key = jax.random.PRNGKey(2)
        target = jnp.zeros((24, 24, 3))
        grads = param_grads(scene, target, key, CFG)
        assert set(grads.keys()) == {"albedo", "emission", "alpha",
                                     "light_le", "tri_p0"}
        for leaf in jax.tree_util.tree_leaves(grads):
            assert bool(jnp.isfinite(leaf).all())
        # a black target pulls emission down
        assert float(grads["light_le"].x.sum()) > 0
        # geometry gradients are live (interior reparameterization)
        assert float(jnp.abs(grads["tri_p0"].stacked()).sum()) > 0

    def test_geometry_grad_matches_fd(self, scene):
        """Vertex-position gradients (BASELINE.json: 'geometry
        parameters') via the straight-through hit reparameterization:
        translate (a) the area light and (b) the floor along y; the
        analytic gradient of an interior-crop loss must match central
        differences.  Interior term only by design — the crop avoids
        silhouette/shadow boundary pixels, whose edge integral is the
        documented descope (diff.py)."""
        import dataclasses
        cfg = dataclasses.replace(CFG, geom_grads=True)
        key = jax.random.PRNGKey(4)
        tris = scene.triangles
        gn_y = np.asarray(tris.gn.y)
        p0y = np.asarray(tris.p0.y)
        em = np.asarray(scene.materials.is_emissive)[
            np.asarray(tris.mat_id)]
        floor = jnp.asarray((np.abs(gn_y - 1) < 1e-3) & (p0y < 0.1) & ~em)
        light = jnp.asarray(em)

        def f(delta, mask):
            p0 = tris.p0
            p0 = type(p0)(p0.x, p0.y + jnp.where(mask, delta, 0.0), p0.z)
            sc2 = scene._replace(triangles=tris._replace(p0=p0))
            img = sample_image(sc2, key, cfg)
            return jnp.mean(img[4:20, 4:20])

        eps = 1e-3
        for mask in (light, floor):
            g = jax.grad(f)(0.0, mask)
            fd = (f(eps, mask) - f(-eps, mask)) / (2 * eps)
            assert float(g) == pytest.approx(float(fd), rel=0.02)
            assert abs(float(g)) > 1e-4  # the surface actually moved

    def test_geometry_grad_mis_matches_fd(self, scene):
        """Same reparameterization under MIS: the light-strategy pdf
        (geometry-dependent d²/cosθ) and the balance weight join the
        autodiff graph — this leg pins the NaN-free transpose of the
        masked divisions (balance_heuristic, sample_one pdf_solid)."""
        import dataclasses
        cfg = dataclasses.replace(CFG, geom_grads=True, mis=True)
        key = jax.random.PRNGKey(4)
        tris = scene.triangles
        em = np.asarray(scene.materials.is_emissive)[
            np.asarray(tris.mat_id)]
        light = jnp.asarray(em)

        def f(delta):
            p0 = tris.p0
            p0 = type(p0)(p0.x, p0.y + jnp.where(light, delta, 0.0),
                          p0.z)
            sc2 = scene._replace(triangles=tris._replace(p0=p0))
            img = sample_image(sc2, key, cfg)
            return jnp.mean(img[4:20, 4:20])

        eps = 1e-3
        g = jax.grad(f)(0.0)
        fd = (f(eps) - f(-eps)) / (2 * eps)
        assert np.isfinite(float(g))
        assert float(g) == pytest.approx(float(fd), rel=0.02)
        assert abs(float(g)) > 1e-4

    def test_train_step_descends(self, scene):
        key = jax.random.PRNGKey(3)
        target = jnp.zeros((24, 24, 3))
        sc, loss0 = train_step(scene, target, key, CFG, lr=0.5)
        sc, loss1 = train_step(sc, target, key, CFG, lr=0.5)
        assert float(loss1) < float(loss0)


@pytest.fixture(scope="module")
def env_scene():
    """materialball: envmap-lit with plastic (GGX) materials — the
    scene class that exercises the widened parameter surface."""
    sc = load_scene(ref_path("materialball"))
    c = sc.camera
    return sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                     c.world_to_cam, 16, 16, c.origin,
                                     c.a_film))


ENV_CFG = RenderConfig(max_depth=2, mis=True, jitter=False, rr=False)


class TestWidenedSurface:
    def test_envmap_texel_grad_matches_fd(self, env_scene):
        from raytracingrenderer_tpu.scene.types import make_background
        key = jax.random.PRNGKey(5)

        def f(s):
            from raytracingrenderer_tpu.lights.envmap import with_data
            bg = env_scene.background
            env = with_data(bg.envmap, bg.envmap.data * s)
            sc = env_scene._replace(background=make_background(
                bg.kind, bg.colour, env))
            return jnp.mean(sample_image(sc, key, ENV_CFG))

        g = jax.grad(f)(1.0)
        eps = 1e-2
        fd = (f(1.0 + eps) - f(1.0 - eps)) / (2 * eps)
        # alias/pdf tables are detached, so scaling radiance is linear
        assert float(g) == pytest.approx(float(fd), rel=0.05)
        assert float(g) > 0

    def test_roughness_grad_matches_fd(self, env_scene):
        key = jax.random.PRNGKey(6)

        def f(s):
            mats = env_scene.materials._replace(
                alpha=env_scene.materials.alpha * s)
            sc = env_scene._replace(materials=mats)
            return jnp.mean(sample_image(sc, key, ENV_CFG))

        g = jax.grad(f)(1.0)
        eps = 3e-2
        fd = (f(1.0 + eps) - f(1.0 - eps)) / (2 * eps)
        # reparameterized GGX: wi is smooth in alpha, FD with common
        # random numbers tracks the analytic grad up to curvature
        assert np.isfinite(float(g))
        assert float(g) == pytest.approx(float(fd), rel=0.2, abs=1e-4)

    def test_param_grads_include_new_surface(self, env_scene):
        from raytracingrenderer_tpu.diff import param_grads
        key = jax.random.PRNGKey(7)
        target = jnp.zeros((16, 16, 3))
        grads = param_grads(env_scene, target, key, ENV_CFG)
        assert {"albedo", "emission", "alpha", "light_le",
                "env_data"} <= set(grads.keys())
        for leaf in jax.tree_util.tree_leaves(grads):
            assert bool(jnp.isfinite(leaf).all())
        assert float(jnp.abs(grads["env_data"]).sum()) > 0
