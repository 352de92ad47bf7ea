"""Pallas kernel tests (interpret mode on the CPU backend)."""
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import ref_path
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.ops.mt_kernel import closest_hit_pallas
from raytracingrenderer_tpu.scene.loader import load_scene


class TestMtKernel:
    def test_matches_brute_cornell(self):
        sc = load_scene(ref_path("cornell-box"), build_bvh=False)
        rng = np.random.default_rng(0)
        n = 2048
        o = V3.from_stacked(jnp.asarray(
            (rng.uniform(-1, 1, (n, 3)) * 0.5 + [0, 1, 2])
            .astype(np.float32)))
        d = V3.from_stacked(jnp.asarray(
            rng.standard_normal((n, 3)).astype(np.float32))).normalize()
        hb = intersect.closest_hit_brute(sc.triangles, o, d)
        hp = closest_hit_pallas(sc.triangles, o, d, interpret=True)
        np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hp.t),
                                   rtol=1e-4, atol=1e-4)
        assert (np.asarray(hb.tri) == np.asarray(hp.tri)).mean() > 0.999

    def test_nonmultiple_ray_count(self):
        sc = load_scene(ref_path("cornell-box"), build_bvh=False)
        rng = np.random.default_rng(1)
        n = 777  # not a multiple of the ray block
        o = V3.from_stacked(jnp.asarray(
            (rng.uniform(-1, 1, (n, 3)) * 0.5 + [0, 1, 2])
            .astype(np.float32)))
        d = V3.from_stacked(jnp.asarray(
            rng.standard_normal((n, 3)).astype(np.float32))).normalize()
        hb = intersect.closest_hit_brute(sc.triangles, o, d)
        hp = closest_hit_pallas(sc.triangles, o, d, interpret=True)
        np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hp.t),
                                   rtol=1e-4, atol=1e-4)
