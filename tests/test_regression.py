"""Image regression vs the reference's committed ground-truth renders.

result_144.hdr is a 1024^2 cornell-box render from the reference's own
binary (Main.cpp:132-137 auto-save).  SURVEY.md §4: image regression
against result_*.hdr is the de-facto integration test of the reference.
Marked slow: renders 1024^2 on the CPU test backend.
"""
import numpy as np
import pytest

from conftest import ref_path
from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.imaging import film as film_mod
from raytracingrenderer_tpu.io.hdr import read_hdr
from raytracingrenderer_tpu.render import render
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.scene.types import Camera


@pytest.mark.slow
class TestCornellRegression:
    def test_matches_result_144(self):
        sc = load_scene(ref_path("cornell-box"))
        c = sc.camera
        res = 128  # downsampled comparison keeps CPU cost sane
        sc = sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                       c.world_to_cam, res, res, c.origin,
                                       c.a_film))
        cfg = RenderConfig(mis=True, jitter=True, max_depth=4)
        f = render(sc, cfg, spp=48)
        ours = np.asarray(film_mod.to_hdr(f))

        ref = read_hdr(ref_path("result_144.hdr"))
        k = 1024 // res
        ref_ds = ref.reshape(res, k, res, k, 3).mean(axis=(1, 3))

        # exclude emitter pixels (extreme values dominate otherwise)
        mask = ref_ds.mean(-1) < 1.0
        ours_l = ours.mean(-1)[mask]
        ref_l = ref_ds.mean(-1)[mask]
        ratio = np.median(ours_l / np.maximum(ref_l, 1e-6))
        corr = np.corrcoef(ours_l, ref_l)[0, 1]
        assert 0.93 < ratio < 1.07, ratio
        # 48 spp of jittered MIS vs the 144-spp centre-sampled reference,
        # both box-downsampled: residual MC noise caps the correlation.
        assert corr > 0.96, corr


@pytest.mark.slow
class TestRegressionBreadth:
    """The rest of the reference's committed artifacts.

    Findings from reading the artifacts themselves (all verifiable with
    io.hdr.read_hdr):
    - result_1/3/4.hdr (1024^2) are cornell-box-class renders (mean
      0.1184 == result_144's converged mean), NOT bathroom-class as
      their spp-at-10s naming might suggest -> regressed here.
    - result_44/47/50.hdr (1280x720) are MaterialsScene renders made
      with `qwantani_mid_morning_4k.hdr`, which is ABSENT from the repo
      (scene.json names it; SURVEY §2.8).  Rendering the shipped scene
      (reference-parity white 1x1 fallback) correlates at 0.004 with
      them — the asset, not the renderer, is missing, so exact
      regression is impossible; MaterialsScene is covered by an e2e
      behavioral test instead.
    - GI.hdr is all zeros (a default-named empty output, not ground
      truth); asserted below so the gap is documented, not overlooked.
    """

    def test_matches_result_1_3_4(self):
        sc = load_scene(ref_path("cornell-box"))
        c = sc.camera
        res = 128
        sc = sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                       c.world_to_cam, res, res, c.origin,
                                       c.a_film))
        cfg = RenderConfig(mis=True, jitter=True, max_depth=4)
        f = render(sc, cfg, spp=32)
        ours = np.asarray(film_mod.to_hdr(f))
        k = 1024 // res
        for name in ("result_1", "result_3", "result_4"):
            ref = read_hdr(ref_path(f"{name}.hdr"))
            ref_ds = ref.reshape(res, k, res, k, 3).mean(axis=(1, 3))
            mask = ref_ds.mean(-1) < 1.0
            ratio = np.median(ours.mean(-1)[mask]
                              / np.maximum(ref_ds.mean(-1)[mask], 1e-6))
            corr = np.corrcoef(ours.mean(-1)[mask],
                               ref_ds.mean(-1)[mask])[0, 1]
            assert 0.9 < ratio < 1.1, (name, ratio)
            assert corr > 0.93, (name, corr)

    def test_materials_scene_end_to_end(self):
        """All six shipped material classes render finite and lit under
        the reference's missing-texture fallback (Imaging.h:24-31)."""
        sc = load_scene(ref_path("MaterialsScene"))
        from raytracingrenderer_tpu.scene.types import (
            MAT_CONDUCTOR, MAT_DIFFUSE, MAT_GLASS, MAT_MIRROR,
            MAT_OREN_NAYAR, MAT_PLASTIC)
        kinds = set(np.asarray(sc.materials.mtype).tolist())
        assert {MAT_CONDUCTOR, MAT_OREN_NAYAR, MAT_GLASS, MAT_MIRROR,
                MAT_PLASTIC, MAT_DIFFUSE} <= kinds
        c = sc.camera
        sc = sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                       c.world_to_cam, 160, 90, c.origin,
                                       c.a_film))
        cfg = RenderConfig(mis=True, jitter=True, max_depth=3)
        f = render(sc, cfg, spp=4)
        img = np.asarray(film_mod.to_hdr(f))
        assert np.isfinite(img).all()
        assert 0.05 < img.mean() < 10.0

    def test_gi_hdr_is_empty_artifact(self):
        img = read_hdr(ref_path("GI.hdr"))
        assert float(np.abs(img).max()) == 0.0

    def test_materialball_matches_committed_golden(self):
        """Self-regression for the envmap+GGX path (VERDICT r2 weak #7):
        the reference's MaterialsScene artifacts are unusable (its envmap
        asset is absent from the repo), so this committed self-render is
        the only guard against the alias-table sampler or GGX lobes
        silently drifting.  Regenerate with scripts/make_goldens.py after
        intentional estimator changes."""
        import os
        gpath = os.path.join(os.path.dirname(__file__), "golden",
                             "materialball_96x54_12spp.npy")
        gold = np.load(gpath)
        sc = load_scene(ref_path("materialball"))
        c = sc.camera
        sc = sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                       c.world_to_cam, 96, 54, c.origin,
                                       c.a_film))
        cfg = RenderConfig(mis=True, jitter=True, max_depth=3, seed=2)
        img = np.asarray(film_mod.to_hdr(render(sc, cfg, spp=12)))
        # same code + same keys => deterministic up to XLA:CPU codegen
        # differences across machine feature sets
        np.testing.assert_allclose(img, gold, rtol=2e-3, atol=2e-4)
