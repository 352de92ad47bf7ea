"""A/B the ray-major MXU treelet path against the packet kernel on the
real bathroom batches (primaries + real depth-1/2 bounce rays + shadow
rays), plus a correctness tether vs the stackless traversal."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.integrators import path as path_mod
from raytracingrenderer_tpu.integrators import wavefront as wf
from raytracingrenderer_tpu.ops import bvh_kernel, treelet
from raytracingrenderer_tpu.render import pixel_grid, specialize_config
from raytracingrenderer_tpu.sampling import rng
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt, out


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene("/root/reference/RTBase/bathroom")
    print("treelets:", scene.bvh.tl_nodes.shape[0],
          "coarse:", scene.bvh.tc_nodes.shape[0], flush=True)
    cfg = specialize_config(RenderConfig(mis=True, jitter=True,
                                         max_depth=4), scene)
    cam = scene.camera
    key = jax.random.PRNGKey(0)
    n = cam.height * cam.width
    tris = scene.triangles
    bvh = scene.bvh

    # real sorted wavefront batches at depth 0..2
    xs, ys = pixel_grid(cam.height, cam.width)
    jx = rng.uniform(key, 0, rng.PIXEL_JITTER_X, xs.shape)
    jy = rng.uniform(key, 0, rng.PIXEL_JITTER_Y, ys.shape)
    o, d = generate_rays(cam, xs + jx, ys + jy)
    state = path_mod.init_state(o, d)
    img = jnp.zeros((n, 3), jnp.float32)
    w = n
    batches = {}
    for depth in range(3):
        if depth > 0:
            img, state, n_live = wf._sort_flush(scene, img, state)
            w2 = wf._bucket(int(n_live), n)
            if w2 < w:
                state = jax.tree_util.tree_map(lambda a: a[:w2], state)
                w = w2
        batches[f"depth{depth}"] = (state["o"], state["d"],
                                    state["alive"])
        state = path_mod.bounce_step(scene, state, jnp.int32(depth), key,
                                     cfg, presorted=True)
        jax.block_until_ready(state["o"].x)

    pkt = jax.jit(lambda o, d, t: bvh_kernel.traverse_packet(
        bvh, tris, o, d, t))

    def tre(o, d, t):
        pre = intersect._proxy_prepass(tris, o, d, t)
        return treelet.closest_hit_treelet(bvh, tris, o, d,
                                           jnp.minimum(pre.t, t))

    trj = jax.jit(tre)

    for name, (bo, bd, alive) in batches.items():
        m = bo.x.shape[0]
        t0 = jnp.where(alive, jnp.full(m, intersect.BIG_T), -1.0)
        d1, hp = timeit(f"{name} packet closest ({m})", pkt, bo, bd, t0)
        d2, ht = timeit(f"{name} treelet closest ({m})", trj, bo, bd, t0)
        tp_ = np.minimum(np.asarray(hp.t), 1e30)
        tt_ = np.minimum(np.asarray(ht.t), 1e30)
        al = np.asarray(alive)
        bad = (np.abs(tp_ - tt_) > 1e-3 * np.maximum(tp_, 1.0)) & al
        print(f"   mismatch {bad.mean():.2e}  speedup {d1/d2:.2f}x",
              flush=True)

    # shadow any-hit on the depth1 batch (reversed-from-light style not
    # reproduced here; plain surface->light segments)
    bo, bd, alive = batches["depth1"]
    m = bo.x.shape[0]
    mt = jnp.where(alive, 2.0, -1.0)
    pk_any = jax.jit(lambda o, d, t: bvh_kernel.traverse_packet(
        bvh, tris, o, d, t, any_hit=True).tri >= 0)
    tr_any = jax.jit(lambda o, d, t: treelet.any_hit_treelet(
        bvh, tris, o, d, t))
    d1, oa = timeit(f"depth1 packet any-hit ({m})", pk_any, bo, bd, mt)
    d2, ob = timeit(f"depth1 treelet any-hit ({m})", tr_any, bo, bd, mt)
    al = np.asarray(alive)
    print(f"   mismatch {(np.asarray(oa) != np.asarray(ob))[al].mean():.2e}"
          f"  speedup {d1/d2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
