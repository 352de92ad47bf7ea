"""Phase-level TPU profiling of the bathroom hot path (the BVH north
star, VERDICT r2 item 1: tune the packet kernel on-chip).

Times, as isolated jitted dispatches over the real 1M-ray primary batch
and a shuffled incoherent batch:
  - packet closest-hit at several ray_sub settings
  - the coherence sort itself (lax.sort with 8 payload arrays)
  - packet any-hit (shadow rays)
  - shading_data + compute_direct
  - full sample_image and the 2-spp chunk
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.integrators import common
from raytracingrenderer_tpu.ops import bvh_kernel
from raytracingrenderer_tpu.render import (pixel_grid, sample_image,
                                           specialize_config)
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene("/root/reference/RTBase/bathroom")
    cfg = specialize_config(RenderConfig(mis=True, jitter=True,
                                         max_depth=4), scene)
    cam = scene.camera
    n = cam.height * cam.width
    print(f"rays: {n}  tris: {scene.triangles.count} "
          f"nodes: {scene.bvh.right.shape[0]} leaf_max: {scene.bvh.leaf_max}",
          flush=True)
    xs, ys = pixel_grid(cam.height, cam.width)
    key = jax.random.PRNGKey(0)
    o, d = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))()
    jax.block_until_ready(o.x)

    # incoherent batch: shuffle primary rays + random directions (proxy
    # for bounce rays)
    rng = np.random.default_rng(1)
    perm = rng.permutation(n)
    oi = V3(o.x[perm], o.y[perm], o.z[perm])
    dn = rng.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    di = V3(jnp.asarray(dn[:, 0]), jnp.asarray(dn[:, 1]),
            jnp.asarray(dn[:, 2]))

    tris = scene.triangles
    t_init = jnp.full(n, intersect.BIG_T, jnp.float32)

    for sub in (8, 16, 32, 64):
        f = jax.jit(lambda o, d, s=sub: bvh_kernel.traverse_packet(
            scene.bvh, tris, o, d, t_init, ray_sub=s))
        try:
            dt_p = timeit(f"packet closest primary   sub={sub}", f, o, d)
            dt_i = timeit(f"packet closest incoherent sub={sub}", f, oi, di)
            print(f"   -> primary {n/dt_p/1e6:6.1f} Mray/s   "
                  f"incoherent {n/dt_i/1e6:6.1f} Mray/s", flush=True)
        except Exception as e:
            print(f"   sub={sub} FAIL {str(e)[:100]}", flush=True)

    # sorted dispatch (what closest_hit actually does)
    act = jnp.ones(n, bool)
    f_disp = jax.jit(lambda o, d: intersect.closest_hit(scene, o, d, act))
    hit = f_disp(o, d)
    timeit("closest_hit dispatch (sorted) primary", f_disp, o, d)
    timeit("closest_hit dispatch (sorted) incoher", f_disp, oi, di)

    # the sort alone
    def just_sort(o, d):
        return intersect._sorted_call(
            scene, o, d, act, (t_init,),
            lambda so, sd, st: intersect.Hit(st, jnp.zeros(n, jnp.int32),
                                             st, st))
    timeit("coherence sort alone (8 arrays)", jax.jit(just_sort), o, d)

    # any-hit with realistic shadow rays: from primary hit points to light
    f_occ = jax.jit(lambda o, d: intersect.occluded(
        scene, o, d, jnp.full(n, 10.0)))
    timeit("occluded (shadow, primary origins)", f_occ, o, d)

    f_sh = jax.jit(lambda hit, o, d: common.shading_data(scene, hit, o, d))
    sh = f_sh(hit, o, d)
    timeit("shading_data", f_sh, hit, o, d)

    r1 = jax.random.uniform(key, (n,))
    r2 = jax.random.uniform(key, (n,))
    rl = jax.random.uniform(key, (n,))
    f_dir = jax.jit(lambda sh, r1, r2, rl: common.compute_direct(
        scene, sh, act, rl, r1, r2, cfg.mis, cfg.mat_types))
    timeit("compute_direct (incl shadow)", f_dir, sh, r1, r2, rl)

    f_full = jax.jit(lambda key: sample_image(scene, key, cfg))
    dt = timeit("full sample_image (6 bounces)", f_full, key, reps=2)
    print(f"=> {n / dt / 1e6:.3f} M pixel-paths/s single-pass", flush=True)


if __name__ == "__main__":
    main()
