"""Phase-level TPU profiling of the cornell-box hot path.

Times each stage of the bounce loop as an isolated jitted dispatch over a
1M-ray batch, then the full bounce scan, so we can see where the
pixel-paths/s budget actually goes (VERDICT r1 item 1: profile first).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.integrators import common, path as path_mod
from raytracingrenderer_tpu.materials import bsdf as bsdf_mod
from raytracingrenderer_tpu.render import (pixel_grid, sample_image,
                                           specialize_config)
from raytracingrenderer_tpu.sampling import rng
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt


def main():
    print("backend:", jax.default_backend())
    scene = load_scene("/root/reference/RTBase/cornell-box")
    cfg = specialize_config(RenderConfig(mis=True, jitter=True,
                                         max_depth=4), scene)
    cam = scene.camera
    n = cam.height * cam.width
    print(f"rays: {n}")
    xs, ys = pixel_grid(cam.height, cam.width)
    key = jax.random.PRNGKey(0)
    o, d = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))()
    jax.block_until_ready(o.x)

    f_ray = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))
    timeit("raygen", f_ray)

    f_hit = jax.jit(lambda o, d: intersect.closest_hit(scene, o, d))
    hit = f_hit(o, d)
    timeit("closest_hit (36 tris)", f_hit, o, d)

    f_occ = jax.jit(lambda o, d: intersect.occluded(
        scene, o, d, jnp.full(n, 10.0)))
    timeit("any_hit/occluded", f_occ, o, d)

    f_sh = jax.jit(lambda hit, o, d: common.shading_data(scene, hit, o, d))
    sh = f_sh(hit, o, d)
    timeit("shading_data", f_sh, hit, o, d)

    r1 = jax.random.uniform(key, (n,))
    r2 = jax.random.uniform(key, (n,))
    rl = jax.random.uniform(key, (n,))
    f_bsdf = jax.jit(lambda sh, r1, r2, rl: bsdf_mod.sample(
        sh.mp, sh.wo_local, r1, r2, rl, cfg.mat_types))
    timeit("bsdf.sample", f_bsdf, sh, r1, r2, rl)

    active = jnp.ones(n, bool)
    f_dir = jax.jit(lambda sh, r1, r2, rl: common.compute_direct(
        scene, sh, active, rl, r1, r2, cfg.mis, cfg.mat_types))
    timeit("compute_direct (incl shadow)", f_dir, sh, r1, r2, rl)

    f_rng = jax.jit(lambda: [rng.uniform(key, 0, i, (n,))
                             for i in range(8)])
    timeit("rng x8 draws", f_rng)

    f_full = jax.jit(lambda key: sample_image(scene, key, cfg))
    dt = timeit("full sample_image (6 bounces)", f_full, key, reps=5)
    print(f"=> {n / dt / 1e6:.2f} M pixel-paths/s single-pass")

    from raytracingrenderer_tpu import render as render_mod
    from raytracingrenderer_tpu.imaging import film as film_mod
    film = film_mod.new_film(cam.height, cam.width)
    base = jax.random.PRNGKey(0)
    f_chunk = lambda: render_mod._render_chunk(
        scene, film, base, jnp.int32(0), cfg, 8)
    dt = timeit("8-spp chunk (scan)", f_chunk, reps=3) / 8
    print(f"=> {n / dt / 1e6:.2f} M pixel-paths/s chunked")


if __name__ == "__main__":
    main()
