"""Decompose ONE bathroom bounce at 1M rays into its ops (all jitted
separately, warmed, block_until_ready): where do ~950 ms/bounce go?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.integrators import common
from raytracingrenderer_tpu.lights import lights as lights_mod
from raytracingrenderer_tpu.materials import bsdf as bsdf_mod
from raytracingrenderer_tpu.render import pixel_grid, specialize_config
from raytracingrenderer_tpu.sampling import rng
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
    return out, dt


scene = load_scene("/root/reference/RTBase/bathroom")
cfg = specialize_config(RenderConfig(mis=True, jitter=True, max_depth=4),
                        scene)
cam = scene.camera
n = cam.height * cam.width
key = jax.random.PRNGKey(0)
xs, ys = pixel_grid(cam.height, cam.width)
o, d = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))()
jax.block_until_ready(o.x)

# one real bounce of state: primary hits -> bounce rays (realistic mix)
from raytracingrenderer_tpu.integrators import path as path_mod
state0 = path_mod.init_state(o, d)
state1 = jax.jit(lambda s: path_mod.bounce_step(
    scene, s, jnp.int32(0), key, cfg))(state0)
jax.block_until_ready(state1["o"].x)
o1, d1, alive1 = state1["o"], state1["d"], state1["alive"]
ids = state1["ids"]
print("alive after b0:", int(alive1.sum()), flush=True)

# --- intersection
hit, _ = timeit("closest_hit (sorted dispatch)",
                jax.jit(lambda o, d, a: intersect.closest_hit(
                    scene, o, d, a)), o1, d1, alive1)

# --- shading data
sh, _ = timeit("shading_data (38-col gather)",
               jax.jit(lambda h, o, d: common.shading_data(scene, h, o,
                                                           d)), hit, o1, d1)

# --- rng draws (8 per bounce, by pixel id)
timeit("rng uniform_ids x8",
       jax.jit(lambda k: [rng.uniform_ids(k, 1, i, ids)
                          for i in range(8)]), key)

r1 = rng.uniform_ids(key, 1, rng.BSDF_U, ids)
r2 = rng.uniform_ids(key, 1, rng.BSDF_V, ids)
rl = rng.uniform_ids(key, 1, rng.BSDF_LOBE, ids)

# --- light sampling alone (no shadow ray)
timeit("lights.sample_one",
       jax.jit(lambda sh, a, b, c: lights_mod.sample_one(
           scene, sh.x, sh.sn, a, b, c)), sh, rl, r1, r2)

# --- bsdf eval + pdf (NEE integrand)
wi = sh.frame.to_local(V3(-d1.x, -d1.y, -d1.z))
timeit("bsdf.evaluate",
       jax.jit(lambda sh, wi: bsdf_mod.evaluate(sh.mp, sh.wo_local, wi,
                                                cfg.mat_types)), sh, wi)
timeit("bsdf.pdf",
       jax.jit(lambda sh, wi: bsdf_mod.pdf_fn(sh.mp, sh.wo_local, wi,
                                              cfg.mat_types)), sh, wi)
timeit("bsdf.sample",
       jax.jit(lambda sh, r1, r2, rl: bsdf_mod.sample(
           sh.mp, sh.wo_local, r1, r2, rl, cfg.mat_types)), sh, r1, r2, rl)

# --- full NEE (light sample + eval/pdf + shadow ray)
act = hit.valid & alive1
timeit("compute_direct (full NEE)",
       jax.jit(lambda sh, a, b, c, d_: common.compute_direct(
           scene, sh, act, a, b, c, cfg.mis, cfg.mat_types, r3=d_)),
       sh, rl, r1, r2, r2)

# --- shadow ray alone at realistic directions (toward the one light)
ls = jax.jit(lambda sh, a, b, c: lights_mod.sample_one(
    scene, sh.x, sh.sn, a, b, c))(sh, rl, r1, r2)
from raytracingrenderer_tpu.config import EPSILON
shadow_o = sh.x + ls.wi * EPSILON
max_t = jnp.where(act, ls.dist - 2 * EPSILON, -1.0)
timeit("occluded (sorted, real NEE rays)",
       jax.jit(lambda o, d, t: intersect.occluded(scene, o, d, t)),
       shadow_o, ls.wi, max_t)

# --- one full bounce for reference
timeit("bounce_step (everything)",
       jax.jit(lambda s: path_mod.bounce_step(scene, s, jnp.int32(1),
                                              key, cfg)), state1, reps=3)
