"""Scene loader tests: per-scene counts vs SURVEY.md §2.8, camera parity."""
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import ref_path
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.scene import camera as cam_mod
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.scene.types import (BG_ENVMAP, MAT_CONDUCTOR,
                                                MAT_DIFFUSE, MAT_GLASS,
                                                MAT_MIRROR, MAT_OREN_NAYAR,
                                                MAT_PLASTIC)


@pytest.fixture(scope="module")
def cornell():
    return load_scene(ref_path("cornell-box"))


class TestCornell:
    def test_counts(self, cornell):
        assert cornell.triangles.count == 36       # SURVEY §2.8
        assert cornell.materials.count == 8
        assert cornell.num_lights == 2             # light quad = 2 tris
        assert cornell.camera.width == 1024

    def test_light_table(self, cornell):
        le = np.asarray(cornell.lights.le.stacked())
        np.testing.assert_allclose(le, [[17, 12, 4]] * 2)
        assert np.asarray(cornell.lights.area).sum() == pytest.approx(
            0.1786, abs=1e-3)

    def test_gn_agrees_with_vertex_normals(self, cornell):
        t = cornell.triangles
        dot = np.asarray(t.gn.dot(t.n0))
        assert (dot >= 0).all()  # Triangle::gNormal canonicalization

    def test_materials_all_diffuse(self, cornell):
        assert (np.asarray(cornell.materials.mtype) == MAT_DIFFUSE).all()
        alb = np.asarray(cornell.materials.albedo.stacked())
        # wall colours from the constant PNGs
        assert np.isclose(alb, [0.7215686, 0.7098039, 0.6784314],
                          atol=1e-3).all(axis=1).any()
        assert np.isclose(alb, [0.63, 0.065, 0.05], atol=0.01).all(
            axis=1).any()  # red wall

    def test_camera_ray_center_hits_scene(self, cornell):
        o, d = cam_mod.generate_rays(
            cornell.camera, jnp.asarray([512.0]), jnp.asarray([512.0]))
        # camera at (0,1,6.8) looking toward -z
        assert float(o.z[0]) == pytest.approx(6.8)
        assert float(d.z[0]) < -0.99

    def test_project_roundtrip(self, cornell):
        cam = cornell.camera
        px = jnp.asarray([100.5, 512.0, 900.0])
        py = jnp.asarray([200.5, 512.0, 100.0])
        o, d = cam_mod.generate_rays(cam, px, py)
        p = o + d * 3.0
        x, y, ok = cam_mod.project_onto_camera(cam, p)
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(x), np.asarray(px), atol=0.1)
        np.testing.assert_allclose(np.asarray(y), np.asarray(py), atol=0.1)

    def test_point_behind_camera_invalid(self, cornell):
        p = V3(jnp.asarray([0.0]), jnp.asarray([1.0]), jnp.asarray([20.0]))
        _, _, ok = cam_mod.project_onto_camera(cornell.camera, p)
        assert not bool(ok[0])


class TestOtherScenes:
    def test_materials_scene(self):
        sc = load_scene(ref_path("MaterialsScene"), build_bvh=False)
        assert 5000 < sc.triangles.count < 7000    # SURVEY: ~5.8k
        mt = set(np.asarray(sc.materials.mtype).tolist())
        assert {MAT_CONDUCTOR, MAT_OREN_NAYAR, MAT_GLASS, MAT_MIRROR,
                MAT_PLASTIC, MAT_DIFFUSE} <= mt
        assert sc.background.kind == BG_ENVMAP  # missing envmap file ->
        # white fallback envmap still registers as a light
        assert sc.num_lights == 0

    def test_materialball(self):
        sc = load_scene(ref_path("materialball"), build_bvh=False)
        assert 15000 < sc.triangles.count < 20000  # SURVEY: ~17.5k
        assert sc.background.kind == BG_ENVMAP
        assert sc.background.envmap.data.shape[-1] == 3

    def test_coffee(self):
        sc = load_scene(ref_path("coffee"), build_bvh=False)
        assert 90000 < sc.triangles.count < 110000  # SURVEY: ~99k
        assert sc.num_lights > 0                    # 3 emissive materials
        assert sc.camera.width == 800 and sc.camera.height == 1000

    @pytest.mark.slow
    def test_bathroom(self):
        sc = load_scene(ref_path("bathroom"), build_bvh=False)
        assert 300000 < sc.triangles.count < 360000  # SURVEY: ~331k
        assert sc.materials.count > 800              # 856 instances
        assert sc.textures.data.shape[0] >= 1        # real texture atlas
