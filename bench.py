"""Benchmark: rays/sec on cornell-box forward path tracing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's implied throughput on its
author's CPU for the cornell-box-class scene is ~15 M pixel-paths/s
(result_144.hdr: 1024^2 @ 144 spp in ~10 s).  vs_baseline is our
pixel-paths/s divided by that.
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_PPS = 15e6  # pixel-paths/s, reference cornell-box class


def main():
    from raytracingrenderer_tpu.config import RenderConfig
    from raytracingrenderer_tpu.imaging import film as film_mod
    from raytracingrenderer_tpu.render import render
    from raytracingrenderer_tpu.scene.loader import load_scene

    scene = load_scene("/root/reference/RTBase/cornell-box")
    cfg = RenderConfig(mis=True, jitter=True, max_depth=4)
    h, w = scene.camera.height, scene.camera.width

    # warmup (compile)
    film = render(scene, cfg, spp=1)
    jax.block_until_ready(film.buffer)

    spp = 64
    t0 = time.perf_counter()
    film = render(scene, cfg, spp=spp, film=film)
    jax.block_until_ready(film.buffer)
    dt = time.perf_counter() - t0

    pps = h * w * spp / dt
    img = np.asarray(film_mod.to_hdr(film))
    assert np.isfinite(img).all()
    print(json.dumps({
        "metric": "cornell-box_1024sq_pixel_paths_per_sec",
        "value": round(pps, 1),
        "unit": "pixel-paths/s",
        "vs_baseline": round(pps / BASELINE_PPS, 3),
    }))


if __name__ == "__main__":
    main()
