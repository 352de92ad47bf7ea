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
