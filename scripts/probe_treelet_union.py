"""Round-5 probe #4: treelet-union statistics on REAL bathroom rays.

The MXU leaf-test path's cost is  sum_blocks U(block) * R_blk * T_leaf
pair-tests (each ~12 bytes of VMEM traffic), where U = number of
treelets in the union of the block's rays' candidate sets.  The packet
kernel's r4 profile implies ~10.5k pair-tests/ray equivalent; the MXU
path wins iff U(R_blk) * T_leaf is well below that.  Measure U on the
real sorted wavefront batches (depth 0/1/2 closest-hit rays and the
reversed shadow rays), with per-ray pruning radius from the actual
closest hit (ideal) and from the proxy pre-pass bound (realistic seed).

Run ON TPU (ray extraction) — the analysis itself is host numpy.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.integrators import path as path_mod
from raytracingrenderer_tpu.integrators import wavefront as wf
from raytracingrenderer_tpu.render import pixel_grid, specialize_config
from raytracingrenderer_tpu.sampling import rng
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def treelet_cut(bvh, t_max):
    """Subtree roots with <= t_max triangles (host numpy).
    Returns (node ids, tri_start, tri_count, lo, hi)."""
    right = np.asarray(bvh.right)
    start = np.asarray(bvh.start)
    count = np.asarray(bvh.count)
    b = right.shape[0]
    cnt = np.zeros(b, np.int64)
    st = np.zeros(b, np.int64)
    for i in range(b - 1, -1, -1):
        if right[i] < 0:
            cnt[i] = count[i]
            st[i] = start[i]
        else:
            cnt[i] = cnt[i + 1] + cnt[right[i]]
            st[i] = min(st[i + 1], st[right[i]])
    roots = []
    stack = [0]
    while stack:
        i = stack.pop()
        if right[i] < 0 or cnt[i] <= t_max:
            roots.append(i)
        else:
            stack.append(right[i])
            stack.append(i + 1)
    roots = np.array(roots)
    return (roots, st[roots], cnt[roots],
            np.asarray(bvh.lo)[roots], np.asarray(bvh.hi)[roots])


def slab_counts(o, d, t_prune, lo, hi, t_leaf, label):
    """o,d,t_prune: (N,3),(N,3),(N,) host arrays (rays SORTED in their
    dispatch order).  One slab pass; union stats for several block
    sizes derived from the same hit matrix."""
    n = o.shape[0]
    k = lo.shape[0]
    n = (n // 4096) * 4096
    inv = 1.0 / np.where(np.abs(d[:n]) < 1e-20, 1e-20, d[:n])
    hit_rows = []
    for b0 in range(0, n, 8192):
        sl = slice(b0, b0 + 8192)
        t0 = (lo[None, :, :] - o[sl, None, :]) * inv[sl, None, :]
        t1 = (hi[None, :, :] - o[sl, None, :]) * inv[sl, None, :]
        tmin = np.minimum(t0, t1).max(-1)
        tmax = np.maximum(t0, t1).min(-1)
        te = np.maximum(tmin, 0.0)
        hit_rows.append((tmax >= te) & (te < t_prune[sl, None]))
    hitm = np.concatenate(hit_rows)                      # (n, K)
    pr = hitm.sum(-1)
    for r_blk in (1024, 4096):
        ub = hitm.reshape(-1, r_blk, k).any(1)           # (blocks, K)
        u = ub.sum(-1)
        print(f"  {label:26s} R={r_blk:5d}: U mean {u.mean():7.1f} "
              f"p50 {np.percentile(u,50):6.0f} "
              f"p90 {np.percentile(u,90):6.0f} "
              f"| per-ray boxes mean {pr.mean():5.1f} p90 "
              f"{np.percentile(pr,90):4.0f} | union-tests/ray "
              f"{u.mean()*t_leaf:8.0f}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene("/root/reference/RTBase/bathroom")
    cfg = specialize_config(RenderConfig(mis=True, jitter=True,
                                         max_depth=4), scene)
    cam = scene.camera
    key = jax.random.PRNGKey(0)
    n = cam.height * cam.width

    # --- real sorted wavefront batches -> host dumps ----------------------
    xs, ys = pixel_grid(cam.height, cam.width)
    jx = rng.uniform(key, 0, rng.PIXEL_JITTER_X, xs.shape)
    jy = rng.uniform(key, 0, rng.PIXEL_JITTER_Y, ys.shape)
    o, d = generate_rays(cam, xs + jx, ys + jy)
    state = path_mod.init_state(o, d)
    img = jnp.zeros((n, 3), jnp.float32)
    w = n
    closest = jax.jit(lambda o, d: intersect.closest_hit(
        scene, o, d, presorted=True))
    proxy = jax.jit(lambda o, d: intersect._proxy_prepass(
        scene.triangles, o, d,
        jnp.full(o.x.shape[0], intersect.BIG_T)).t)
    dumps = {}
    for depth in range(3):
        if depth > 0:
            img, state, n_live = wf._sort_flush(scene, img, state)
            w2 = wf._bucket(int(n_live), n)
            if w2 < w:
                state = jax.tree_util.tree_map(lambda a: a[:w2], state)
                w = w2
        so, sd = state["o"], state["d"]
        hit = closest(so, sd)
        tp = proxy(so, sd)
        dumps[f"depth{depth}"] = (
            np.stack([np.asarray(so.x), np.asarray(so.y),
                      np.asarray(so.z)], -1),
            np.stack([np.asarray(sd.x), np.asarray(sd.y),
                      np.asarray(sd.z)], -1),
            np.minimum(np.asarray(hit.t), 1e30),
            np.minimum(np.asarray(tp), 1e30),
            np.asarray(state["alive"]))
        state = path_mod.bounce_step(scene, state, jnp.int32(depth), key,
                                     cfg, presorted=True)
        jax.block_until_ready(state["o"].x)
    np.savez("/tmp/bathroom_rays.npz",
             **{k: np.concatenate([a.reshape(a.shape[0], -1)
                                   for a in v], axis=1)
                for k, v in dumps.items()})

    # --- treelet cuts and union stats ------------------------------------
    for t_max in (128, 256):
        roots, tst, tcnt, lo, hi = treelet_cut(scene.bvh, t_max)
        print(f"T_leaf={t_max}: {len(roots)} treelets, "
              f"fill mean {tcnt.mean():.0f} "
              f"p10 {np.percentile(tcnt,10):.0f}", flush=True)
        for dk, (o_, d_, tc, tp_, al) in dumps.items():
            # use live rays only, capped for host time
            m = al.nonzero()[0][:64 * 1024]
            slab_counts(o_[m], d_[m], tc[m], lo, hi, t_max,
                        f"{dk} ideal-prune")
            slab_counts(o_[m], d_[m], tp_[m], lo, hi, t_max,
                        f"{dk} proxy-prune")


if __name__ == "__main__":
    main()
