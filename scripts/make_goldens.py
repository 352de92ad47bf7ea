"""Generate committed self-render goldens (tests/golden/).

Run on the CPU backend so the goldens match what the test suite
computes.  Regenerate after any INTENTIONAL estimator or RNG-stream
change — the paired tests exist precisely to make unintentional drift
loud (VERDICT r2: the envmap+GGX path had no golden because the
reference's MaterialsScene artifacts are unusable).
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from raytracingrenderer_tpu.config import RenderConfig  # noqa: E402
from raytracingrenderer_tpu.imaging import film as film_mod  # noqa: E402
from raytracingrenderer_tpu.render import render  # noqa: E402
from raytracingrenderer_tpu.scene.loader import load_scene  # noqa: E402
from raytracingrenderer_tpu.scene.types import Camera  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def materialball_golden():
    """Envmap alias-table importance sampling + GGX plastic lobes —
    the exact path with no reference ground truth."""
    sc = load_scene("/root/reference/RTBase/materialball")
    c = sc.camera
    sc = sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                   c.world_to_cam, 96, 54, c.origin,
                                   c.a_film))
    cfg = RenderConfig(mis=True, jitter=True, max_depth=3, seed=2)
    f = render(sc, cfg, spp=12)
    img = np.asarray(film_mod.to_hdr(f)).astype(np.float32)
    path = os.path.join(OUT, "materialball_96x54_12spp.npy")
    np.save(path, img)
    print("wrote", path, "mean", img.mean())


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    materialball_golden()
