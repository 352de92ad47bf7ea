"""Plane/sphere/AABB primitive tests — ports of the reference's own unit
tests (RTtest/RTtest.cpp:22-103) plus filter kernels and fly camera."""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import primitives as prim
from raytracingrenderer_tpu.imaging import filters


def v(*xs):
    a = np.asarray(xs, np.float32).reshape(-1, 3)
    return V3.from_stacked(jnp.asarray(a))


class TestPlane:
    def test_hit_and_miss(self):
        # RTtest.cpp:22-49: plane y=0, ray from (0,1,0) down hits at t=1;
        # ray pointing away misses.
        n = v([0, 1, 0], [0, 1, 0])
        o = v([0, 1, 0], [0, 1, 0])
        d = v([0, -1, 0], [0, 1, 0])
        t, hit = prim.ray_plane(o, d, n, 0.0)
        assert bool(hit[0]) and float(t[0]) == pytest.approx(1.0)
        assert not bool(hit[1])


class TestSphere:
    def test_outside_hit(self):
        # RTtest.cpp:62-103 spirit: unit sphere at origin, ray from z=3
        o = v([0, 0, 3])
        d = v([0, 0, -1])
        t, hit = prim.ray_sphere(o, d, v([0, 0, 0]), 1.0)
        assert bool(hit[0]) and float(t[0]) == pytest.approx(2.0, abs=1e-4)

    def test_inside_hit(self):
        o = v([0, 0, 0])
        d = v([0, 0, 1])
        t, hit = prim.ray_sphere(o, d, v([0, 0, 0]), 1.0)
        assert bool(hit[0]) and float(t[0]) == pytest.approx(1.0, abs=1e-4)

    def test_miss(self):
        o = v([0, 3, 3])
        d = v([0, 0, -1])
        t, hit = prim.ray_sphere(o, d, v([0, 0, 0]), 1.0)
        assert not bool(hit[0])


class TestAabb:
    def test_hit_miss(self):
        # RTtest.cpp:50-61 spirit
        o = v([0, 0, -5], [5, 5, -5])
        d = v([0, 0, 1], [0, 0, 1])
        inv = V3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
        lo = v([-1, -1, -1], [-1, -1, -1])
        hi = v([1, 1, 1], [1, 1, 1])
        tmin, tmax, hit = prim.ray_aabb(o, inv, lo, hi)
        assert bool(hit[0]) and float(tmin[0]) == pytest.approx(4.0)
        assert not bool(hit[1])


class TestFilters:
    def test_box_zero_is_delta(self):
        w = filters.box(jnp.asarray([0.3]), jnp.asarray([0.4]), 0)
        assert float(w[0]) == 1.0

    def test_mitchell_properties(self):
        # peak at 0, negative lobes, zero outside support
        assert float(filters.mitchell(jnp.asarray([0.0]),
                                      jnp.asarray([0.0]), 1)[0]) > 0.7
        assert float(filters.mitchell(jnp.asarray([0.7]),
                                      jnp.asarray([0.0]), 1)[0]) < 0.0
        assert float(filters.mitchell(jnp.asarray([2.5]),
                                      jnp.asarray([0.0]), 1)[0]) == 0.0

    def test_gaussian_monotone(self):
        w0 = float(filters.gaussian(jnp.asarray([0.0]),
                                    jnp.asarray([0.0]), 2)[0])
        w1 = float(filters.gaussian(jnp.asarray([1.0]),
                                    jnp.asarray([0.0]), 2)[0])
        assert w0 > w1 > 0.0


class TestFlyCamera:
    def test_moves_match_reference_semantics(self):
        from raytracingrenderer_tpu.core import matrix
        from raytracingrenderer_tpu.scene.controls import FlyCamera
        P = matrix.perspective(0.001, 10000.0, 1.0, 45.0)
        fc = FlyCamera([0, 1, 6.8], [0, 1, 5.8], [0, 1, 0], P, 64, 64,
                       movespeed=0.5)
        fc.key("w")
        np.testing.assert_allclose(fc.from_p, [0, 1, 6.3], atol=1e-6)
        fc.key("d")
        assert fc.from_p[0] != 0.0
        before = fc.to_p - fc.from_p
        fc.key("left")
        after = fc.to_p - fc.from_p
        # yaw preserves length, changes direction
        np.testing.assert_allclose(np.linalg.norm(after),
                                   np.linalg.norm(before), rtol=1e-6)
        assert not np.allclose(after, before)
        cam = fc.camera()
        assert cam.width == 64
