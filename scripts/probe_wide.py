"""Probe: 4-wide kernel and block-size sweep on REAL bounce rays.

The r4 A/B evidence says the packet kernel is latency-bound per visit
(leaf16's -35% vector ops bought nothing; sub=8 vs 32 nearly flat), so
fewer-but-fatter visits (wide kernel, bigger sub) should pay where the
r3 coherent/proxy measurements said otherwise.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.integrators import path as path_mod
from raytracingrenderer_tpu.ops import bvh_kernel
from raytracingrenderer_tpu.render import pixel_grid, specialize_config
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
    print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
    return out, dt


scene = load_scene("/root/reference/RTBase/bathroom")
scene = scene._replace(bvh=bvh_kernel.widen(scene.bvh))
cfg = specialize_config(RenderConfig(mis=True, jitter=True, max_depth=4),
                        scene)
cam = scene.camera
key = jax.random.PRNGKey(0)
xs, ys = pixel_grid(cam.height, cam.width)
o, d = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))()
state0 = path_mod.init_state(o, d)
state1 = jax.jit(lambda s: path_mod.bounce_step(
    scene, s, jnp.int32(0), key, cfg))(state0)
jax.block_until_ready(state1["o"].x)
o1, d1, alive1 = state1["o"], state1["d"], state1["alive"]
t_init = jnp.where(alive1, intersect.BIG_T, -1.0)


def sorted_traverse(sub, wide):
    def go(o, d, t_init, alive):
        k = intersect._sort_key(scene, o, d, alive)
        args = jax.lax.sort(
            (k, o.x, o.y, o.z, d.x, d.y, d.z, t_init), num_keys=1)
        return bvh_kernel.traverse_packet(
            scene.bvh, scene.triangles,
            V3(args[1], args[2], args[3]), V3(args[4], args[5], args[6]),
            args[7], ray_sub=sub, wide=wide)
    return jax.jit(go)


ref_hit = None
for wide in (False, True):
    for sub in ((32, 64) if not wide else (16, 32, 64)):
        try:
            f = sorted_traverse(sub, wide)
            h, _ = timeit(f"closest real  wide={int(wide)} sub={sub}", f,
                          o1, d1, t_init, alive1)
            if ref_hit is None:
                ref_hit = h
            else:
                a = np.minimum(np.asarray(ref_hit.t), 1e30)
                b = np.minimum(np.asarray(h.t), 1e30)
                bad = (np.abs(a - b) > 1e-3 * np.maximum(a, 1.0)).mean()
                print(f"   mismatch vs ref: {bad:.2e}", flush=True)
        except Exception as e:
            print(f"wide={wide} sub={sub} FAIL {str(e)[:120]}", flush=True)
