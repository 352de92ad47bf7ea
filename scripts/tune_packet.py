"""Sweep (leaf size, ray block sublanes) for the packet BVH kernel."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import bvh_native
from raytracingrenderer_tpu.ops import bvh_kernel
from raytracingrenderer_tpu.render import pixel_grid
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

scene_name = sys.argv[1] if len(sys.argv) > 1 else "materialball"
sc = load_scene(f"/root/reference/RTBase/{scene_name}", build_bvh=False)
tris = sc.triangles
tp = np.stack([
    np.stack([tris.p0.x, tris.p0.y, tris.p0.z], -1),
    np.stack([tris.p0.x + tris.e1.x, tris.p0.y + tris.e1.y,
              tris.p0.z + tris.e1.z], -1),
    np.stack([tris.p0.x + tris.e2.x, tris.p0.y + tris.e2.y,
              tris.p0.z + tris.e2.z], -1)], axis=1).astype(np.float32)

cam = sc.camera
xs, ys = pixel_grid(cam.height, cam.width)
o, d = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))()
jax.block_until_ready(o.x)
n = o.x.shape[0]
rng = np.random.default_rng(1)
c = np.asarray([sc.bounds.centre.x, sc.bounds.centre.y,
                sc.bounds.centre.z], np.float32)
r = float(sc.bounds.radius)
oi = c + rng.normal(size=(n, 3)).astype(np.float32) * r * 0.4
di = rng.normal(size=(n, 3)).astype(np.float32)
di /= np.linalg.norm(di, axis=1, keepdims=True)
o2 = V3(*[jnp.asarray(oi[:, i]) for i in range(3)])
d2 = V3(*[jnp.asarray(di[:, i]) for i in range(3)])

print(f"{scene_name}: {tris.count} tris, {n} rays")
for leaf in (4, 8):
    bvh, order = bvh_native.build(tp, max_leaf=leaf)
    from raytracingrenderer_tpu.scene.loader import _reorder
    tr = _reorder(tris, order)
    for sub in (32, 64, 128):
        def make(b, t, s):
            def go(o, d):
                return bvh_kernel.traverse_packet(
                    b, t, o, d,
                    jnp.full(o.x.shape[0], bvh_kernel.BIG_T, jnp.float32),
                    ray_sub=s)
            return jax.jit(go)
        f = make(bvh, tr, sub)
        try:
            h = f(o, d)
            jax.block_until_ready(h.t)
        except Exception as e:
            print(f"leaf={leaf:3d} sub={sub:3d} FAIL {str(e)[:80]}")
            continue
        t0 = time.perf_counter()
        h = f(o, d)
        jax.block_until_ready(h.t)
        dt_p = time.perf_counter() - t0
        h2 = f(o2, d2)
        jax.block_until_ready(h2.t)
        t0 = time.perf_counter()
        h2 = f(o2, d2)
        jax.block_until_ready(h2.t)
        dt_i = time.perf_counter() - t0
        print(f"leaf={leaf:3d} sub={sub:3d} nodes={bvh.right.shape[0]:7d} "
              f"primary {n/dt_p/1e6:6.1f} Mray/s  "
              f"incoherent {n/dt_i/1e6:6.1f} Mray/s")
