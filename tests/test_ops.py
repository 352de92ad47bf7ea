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


class TestTreelet:
    """Ray-major MXU pair-testing path (ops/treelet.py): exact vs the
    brute-force oracle, including the candidate-overflow fallback.
    Default-OFF in production (the packet kernel wins on-chip —
    docs/MXU_AB_r5.md); kept exact and tested as the committed A/B
    artifact."""

    def _soup(self, t, seed=0):
        import numpy as np
        from raytracingrenderer_tpu.geometry.bvh import build
        from raytracingrenderer_tpu.ops import treelet
        rng = np.random.default_rng(seed)
        p0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
        e = rng.uniform(-0.1, 0.1, (t, 2, 3)).astype(np.float32)
        tp = np.stack([p0, p0 + e[:, 0], p0 + e[:, 1]], axis=1)
        bvh, order = build(tp)
        tp = tp[order]
        bvh = treelet.attach_treelets(bvh, t_max=32, g_child=6)
        v3 = lambda a: V3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                          jnp.asarray(a[:, 2]))

        class Tr:
            pass

        tris = Tr()
        tris.p0 = v3(tp[:, 0])
        tris.e1 = v3(tp[:, 1] - tp[:, 0])
        tris.e2 = v3(tp[:, 2] - tp[:, 0])
        Tr.count = property(lambda self: t)
        return bvh, tris

    def _rays(self, n, seed=1):
        import numpy as np
        rng = np.random.default_rng(seed)
        o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        mk = lambda a: V3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                          jnp.asarray(a[:, 2]))
        return mk(o), mk(d)

    def test_cut_covers_all_triangles(self):
        import numpy as np
        bvh, _ = self._soup(900)
        assert int(jnp.sum(bvh.tl_count)) == 900
        s = np.asarray(bvh.tl_start)
        c = np.asarray(bvh.tl_count)
        o_ = np.argsort(s)
        assert (s[o_][1:] == (s[o_] + c[o_])[:-1]).all()
        assert int(jnp.sum(bvh.tc_count)) == bvh.tl_nodes.shape[0]

    @pytest.mark.slow
    def test_matches_brute_force(self):
        import numpy as np
        from raytracingrenderer_tpu.geometry import intersect
        from raytracingrenderer_tpu.ops import treelet
        bvh, tris = self._soup(1500)
        o, d = self._rays(512)
        ref = intersect.closest_hit_brute(tris, o, d)
        for seed in (jnp.full(512, intersect.BIG_T),
                     jnp.minimum(ref.t, 1e30)):  # overflow + ideal
            h = treelet.traverse_treelet(bvh, tris, o, d, seed,
                                         interpret=True)
            assert bool(jnp.all(h.tri == ref.tri))
            np.testing.assert_allclose(
                np.minimum(np.asarray(h.t), 1e30),
                np.minimum(np.asarray(ref.t), 1e30), rtol=1e-4)

    @pytest.mark.slow
    def test_any_hit_matches_brute_force(self):
        from raytracingrenderer_tpu.geometry import intersect
        from raytracingrenderer_tpu.ops import treelet
        bvh, tris = self._soup(1500)
        o, d = self._rays(512, seed=2)
        mt = jnp.full(512, 2.0)
        occ_ref = intersect.any_hit_brute(tris, o, d, mt)
        occ = treelet.any_hit_treelet(bvh, tris, o, d, mt,
                                      interpret=True)
        assert bool(jnp.all(occ == occ_ref))
