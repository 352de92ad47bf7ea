"""Bathroom full-frame: wavefront (compacting) vs scan integrator."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.imaging import film as film_mod
from raytracingrenderer_tpu.render import render, specialize_config
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

scene = load_scene("/root/reference/RTBase/bathroom")
h, w = scene.camera.height, scene.camera.width
for mode in (False, True):
    cfg = RenderConfig(mis=True, jitter=True, max_depth=4, wavefront=mode)
    t0 = time.perf_counter()
    f = render(scene, cfg, spp=1)
    jax.block_until_ready(f.buffer)
    print(f"wavefront={mode} compile+1spp {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    f = render(scene, cfg, spp=2, film=f)
    jax.block_until_ready(f.buffer)
    dt = time.perf_counter() - t0
    img = np.asarray(film_mod.to_hdr(f))
    print(f"wavefront={mode} 2spp {dt:.2f}s = {h*w*2/dt/1e3:.0f} kpps  "
          f"mean={img.mean():.4f} finite={np.isfinite(img).all()}",
          flush=True)
