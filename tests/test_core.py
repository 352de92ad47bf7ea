"""Core math tests (reference parity: RTBase/Core.h semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingrenderer_tpu.core import V3, Frame, matrix
from raytracingrenderer_tpu.core.spherical import (spherical_to_world,
                                                   world_to_phi,
                                                   world_to_theta)


def rand_v3(rng, n):
    a = rng.standard_normal((n, 3)).astype(np.float32)
    return V3.from_stacked(jnp.asarray(a)), a


class TestV3:
    def test_ops(self):
        rng = np.random.default_rng(0)
        a, an = rand_v3(rng, 64)
        b, bn = rand_v3(rng, 64)
        np.testing.assert_allclose((a + b).stacked(), an + bn, rtol=1e-6)
        np.testing.assert_allclose((a - b).stacked(), an - bn, rtol=1e-6)
        np.testing.assert_allclose((a * 2.0).stacked(), an * 2.0, rtol=1e-6)
        np.testing.assert_allclose(a.dot(b), (an * bn).sum(-1), rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(a.cross(b).stacked(), np.cross(an, bn),
                                   rtol=1e-4, atol=1e-5)

    def test_normalize(self):
        rng = np.random.default_rng(1)
        a, _ = rand_v3(rng, 64)
        n = a.normalize()
        np.testing.assert_allclose(n.length(), 1.0, atol=1e-5)

    def test_lum_rec709(self):
        c = V3.of(1.0, 1.0, 1.0)
        assert float(c.lum()) == pytest.approx(1.0, abs=1e-6)
        c = V3.of(1.0, 0.0, 0.0)
        assert float(c.lum()) == pytest.approx(0.2126, abs=1e-6)


class TestFrame:
    def test_orthonormal(self):
        rng = np.random.default_rng(2)
        n, _ = rand_v3(rng, 256)
        n = n.normalize()
        f = Frame.from_normal(n)
        np.testing.assert_allclose(f.t.dot(f.b), 0.0, atol=1e-5)
        np.testing.assert_allclose(f.t.dot(f.n), 0.0, atol=1e-5)
        np.testing.assert_allclose(f.b.dot(f.n), 0.0, atol=1e-5)
        np.testing.assert_allclose(f.t.length(), 1.0, atol=1e-5)
        # right-handed: t x b = n
        np.testing.assert_allclose(f.t.cross(f.b).stacked(), f.n.stacked(),
                                   atol=1e-5)

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        n, _ = rand_v3(rng, 128)
        n = n.normalize()
        f = Frame.from_normal(n)
        w, _ = rand_v3(rng, 128)
        back = f.to_world(f.to_local(w))
        np.testing.assert_allclose(back.stacked(), w.stacked(), atol=1e-4)

    def test_normal_maps_to_z(self):
        rng = np.random.default_rng(4)
        n, _ = rand_v3(rng, 128)
        n = n.normalize()
        f = Frame.from_normal(n)
        local = f.to_local(n)
        np.testing.assert_allclose(local.z, 1.0, atol=1e-5)
        np.testing.assert_allclose(local.x, 0.0, atol=1e-5)


class TestSpherical:
    def test_roundtrip(self):
        rng = np.random.default_rng(5)
        theta = jnp.asarray(rng.uniform(0.01, np.pi - 0.01, 64),
                            jnp.float32)
        phi = jnp.asarray(rng.uniform(0, 2 * np.pi, 64), jnp.float32)
        v = spherical_to_world(theta, phi)
        np.testing.assert_allclose(v.length(), 1.0, atol=1e-5)
        np.testing.assert_allclose(world_to_theta(v), theta, atol=1e-4)
        np.testing.assert_allclose(world_to_phi(v), phi, atol=1e-3)


class TestMatrix:
    def test_perspective_matches_reference_form(self):
        # reference Core.h:460-472: P[1][1]=1/tan(fov/2), DX z in [0,1]
        P = matrix.perspective(0.001, 10000.0, 1.0, 90.0)
        assert P[1, 1] == pytest.approx(1.0, abs=1e-5)
        assert P[3, 2] == -1.0

    def test_lookat_maps_eye_to_origin(self):
        V = matrix.look_at([1, 2, 3], [0, 0, 0], [0, 1, 0])
        p = matrix.mul_point_np(V, [1, 2, 3])
        np.testing.assert_allclose(p, 0.0, atol=1e-5)

    def test_invert_roundtrip(self):
        V = matrix.look_at([1, 2, 3], [0, 1, 0], [0, 1, 0])
        I = matrix.mul(V, matrix.invert(V))
        np.testing.assert_allclose(I, np.eye(4), atol=1e-5)

    def test_batched_apply_matches_numpy(self):
        V = matrix.look_at([1, 2, 3], [0, 1, 0], [0, 1, 0])
        rng = np.random.default_rng(6)
        pts = rng.standard_normal((32, 3)).astype(np.float32)
        got = matrix.apply_point(V, V3.from_stacked(jnp.asarray(pts)))
        want = np.stack([matrix.mul_point_np(V, p) for p in pts])
        np.testing.assert_allclose(got.stacked(), want, atol=1e-4)
