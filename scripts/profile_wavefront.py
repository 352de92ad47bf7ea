"""Per-bounce wavefront profile on bathroom: width, sort time, bounce
time — shows where the compaction saves and what the sort costs."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.integrators import path as path_mod
from raytracingrenderer_tpu.integrators import wavefront as wf
from raytracingrenderer_tpu.render import (pixel_grid, sample_image,
                                           specialize_config)
from raytracingrenderer_tpu.sampling import rng
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

scene = load_scene("/root/reference/RTBase/bathroom")
cfg = specialize_config(RenderConfig(mis=True, jitter=True, max_depth=4),
                        scene)
cam = scene.camera
key = jax.random.PRNGKey(0)
n = cam.height * cam.width

for rep in range(2):
    xs, ys = pixel_grid(cam.height, cam.width)
    jx = rng.uniform(key, 0, rng.PIXEL_JITTER_X, xs.shape)
    jy = rng.uniform(key, 0, rng.PIXEL_JITTER_Y, ys.shape)
    o, d = generate_rays(cam, xs + jx, ys + jy)
    state = path_mod.init_state(o, d)
    img = jnp.zeros((n, 3), jnp.float32)
    w = n
    t_total = time.perf_counter()
    for depth in range(cfg.max_depth + 2):
        t0 = time.perf_counter()
        img, state, n_live = wf._sort_flush(scene, img, state)
        n_live_i = int(n_live)
        t_sort = time.perf_counter() - t0
        w2 = wf._bucket(n_live_i, n)
        if n_live_i == 0:
            break
        if w2 < w:
            state = jax.tree_util.tree_map(lambda a: a[:w2], state)
            w = w2
        t0 = time.perf_counter()
        state = wf._bounce(scene, state, jnp.int32(depth), key, cfg)
        jax.block_until_ready(state["o"].x)
        t_b = time.perf_counter() - t0
        if rep:
            print(f"depth {depth}: live {n_live_i:8d} width {w:8d} "
                  f"sort {t_sort*1e3:7.1f} ms  bounce {t_b*1e3:7.1f} ms",
                  flush=True)
    img = wf._final_flush(img, state)
    jax.block_until_ready(img)
    if rep:
        print(f"total {time.perf_counter()-t_total:.2f}s", flush=True)

# scan-mode single pass for comparison (warmed)
f = jax.jit(lambda k: sample_image(scene, k, cfg))
r = f(key)
jax.block_until_ready(r)
t0 = time.perf_counter()
r = f(key)
jax.block_until_ready(r)
print(f"scan single pass {time.perf_counter()-t0:.2f}s", flush=True)
