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


class TestPacketKernel:
    """Packet BVH traversal kernel vs the brute-force oracle.

    Runs in interpret mode on the CPU backend; the compiled path is the
    TPU dispatch in geometry.intersect (bench/verify exercise it on
    hardware).  Covers reference BVHNode::traverse/traverseVisible
    (Geometry.h:399-462)."""

    def _rays(self, sc, n, seed=0):
        rng = np.random.default_rng(seed)
        c = np.asarray([sc.bounds.centre.x, sc.bounds.centre.y,
                        sc.bounds.centre.z], np.float32)
        r = float(sc.bounds.radius)
        o = c + rng.normal(size=(n, 3)).astype(np.float32) * r * 0.6
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return (V3.from_stacked(jnp.asarray(o)),
                V3.from_stacked(jnp.asarray(d)), r)

    @pytest.mark.parametrize("scene_name", ["cornell-box", "materialball"])
    def test_closest_matches_brute(self, scene_name):
        from raytracingrenderer_tpu.ops import bvh_kernel
        sc = load_scene(ref_path(scene_name))
        o, d, _ = self._rays(sc, 512)
        hb = intersect.closest_hit_brute(sc.triangles, o, d)
        hp = bvh_kernel.closest_hit_packet(sc.bvh, sc.triangles, o, d,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hp.t),
                                   rtol=1e-4, atol=1e-4)
        # triangle ids may differ only where two primitives tie on t
        same = np.asarray(hb.tri) == np.asarray(hp.tri)
        assert same.mean() > 0.99

    @pytest.mark.parametrize("scene_name", ["cornell-box", "materialball"])
    def test_anyhit_matches_brute(self, scene_name):
        from raytracingrenderer_tpu.ops import bvh_kernel
        sc = load_scene(ref_path(scene_name))
        o, d, r = self._rays(sc, 512, seed=1)
        max_t = jnp.full(512, r * 0.5)
        ob = intersect.any_hit_brute(sc.triangles, o, d, max_t)
        op = bvh_kernel.any_hit_packet(sc.bvh, sc.triangles, o, d, max_t,
                                       interpret=True)
        np.testing.assert_array_equal(np.asarray(ob), np.asarray(op))

    def test_inactive_rays_skip(self):
        from raytracingrenderer_tpu.ops import bvh_kernel
        sc = load_scene(ref_path("cornell-box"))
        o, d, _ = self._rays(sc, 256)
        t0 = jnp.full(256, -1.0)  # all lanes inactive
        h = bvh_kernel.traverse_packet(sc.bvh, sc.triangles, o, d, t0,
                                       interpret=True)
        assert not bool((h.tri >= 0).any())

    def test_sorted_dispatch_matches_unsorted(self):
        """intersect.closest_hit's sort wrapper must be a pure permutation
        round-trip (same hits in pixel order)."""
        sc = load_scene(ref_path("materialball"))
        o, d, _ = self._rays(sc, 512, seed=2)
        active = jnp.arange(512) % 3 != 0
        h_plain = intersect.closest_hit_bvh(sc.bvh, sc.triangles, o, d)
        h_sorted = intersect._sorted_call(
            sc, o, d, active, (jnp.where(active, intersect.BIG_T, -1.0),),
            lambda so, sd, st: intersect._traverse_stackless(
                sc.bvh, sc.triangles, so, sd, st, False, sc.bvh.leaf_max))
        act = np.asarray(active)
        np.testing.assert_allclose(np.asarray(h_plain.t)[act],
                                   np.asarray(h_sorted.t)[act],
                                   rtol=1e-4, atol=1e-4)
        assert not (np.asarray(h_sorted.tri)[~act] >= 0).any()
