"""Time each phase of the treelet pipeline separately on the real
bathroom depth-0 batch: proxy, candidates, sort, feats gather, pair
kernel, scatter resolve, fallback packet."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.ops import bvh_kernel, treelet
from raytracingrenderer_tpu.render import pixel_grid, specialize_config
from raytracingrenderer_tpu.sampling import rng
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {np.median(ts)*1e3:9.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene("/root/reference/RTBase/bathroom")
    cam = scene.camera
    key = jax.random.PRNGKey(0)
    tris, bvh = scene.triangles, scene.bvh
    xs, ys = pixel_grid(cam.height, cam.width)
    jx = rng.uniform(key, 0, rng.PIXEL_JITTER_X, xs.shape)
    jy = rng.uniform(key, 0, rng.PIXEL_JITTER_Y, ys.shape)
    o, d = generate_rays(cam, xs + jx, ys + jy)
    n = o.x.shape[0]
    t0a = jnp.full(n, intersect.BIG_T)

    pre = timeit("proxy", jax.jit(lambda o, d: intersect._proxy_prepass(
        tris, o, d, t0a).t), o, d)
    seed = jnp.minimum(pre, 1e30)

    cand = timeit("candidates", jax.jit(
        lambda o, d, s: treelet.candidates(bvh, o, d, s)), o, d, seed)
    slots, overflow = cand
    print("  overflow frac:", float(jnp.mean(overflow)),
          " mean slots:", float(jnp.mean(jnp.sum(slots >= 0, 1))),
          flush=True)

    m = treelet.M_SLOTS
    tid = jnp.where(slots >= 0, slots, treelet.SENTINEL).astype(jnp.int32)
    ray = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                           (n, m))

    def dosort(tid, ray):
        return jax.lax.sort((tid.reshape(-1), ray.reshape(-1)),
                            num_keys=1)
    tid_s, ray_s = timeit("pair sort", jax.jit(dosort), tid, ray)
    pad = (-tid_s.shape[0]) % treelet.PAIR_TILE
    tid_s = jnp.pad(tid_s, (0, pad), constant_values=treelet.SENTINEL)
    ray_s = jnp.pad(ray_s, (0, pad))

    feats = treelet._feats(o, d, seed * 1.0001 + 1e-5)
    fp = timeit("feats gather", jax.jit(lambda f, r: f[r]), feats, ray_s)
    consts = jax.jit(lambda: treelet.pack_constants(bvh, tris))()
    jax.block_until_ready(consts)

    tp, cp = timeit("pair kernel", jax.jit(
        lambda c, f, t: treelet._pair_test(
            c, f, t, bvh.tl_nodes.shape[0])), consts, fp, tid_s)

    def backsort(pidx_s, t_pair, code):
        return jax.lax.sort((pidx_s, t_pair, code), num_keys=1)
    pidx_s = jnp.arange(tid_s.shape[0], dtype=jnp.int32)  # shape proxy
    timeit("back-sort resolve", jax.jit(backsort), pidx_s, tp,
           cp.astype(jnp.int32))

    fb_t = jnp.where(overflow, seed, -1.0)
    timeit("fallback packet (overflow only)", jax.jit(
        lambda o, d, t: bvh_kernel.traverse_packet(bvh, tris, o, d, t)),
        o, d, fb_t)
    timeit("WHOLE treelet closest", jax.jit(
        lambda o, d, s: treelet.closest_hit_treelet(bvh, tris, o, d, s)),
        o, d, seed)


if __name__ == "__main__":
    main()
