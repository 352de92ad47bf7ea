"""Sweep (leaf size, ray_sub) for the packet kernel on bathroom, with
both coherent primary rays and shuffled incoherent rays (the bounce-ray
proxy that dominates the frame, scripts/profile_bathroom.py)."""
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
from raytracingrenderer_tpu.scene.loader import load_scene, _reorder

sc = load_scene("/root/reference/RTBase/bathroom", build_bvh=False)
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
perm = rng.permutation(n)
oi = V3(o.x[perm], o.y[perm], o.z[perm])
dn = rng.normal(size=(n, 3)).astype(np.float32)
dn /= np.linalg.norm(dn, axis=1, keepdims=True)
di = V3(jnp.asarray(dn[:, 0]), jnp.asarray(dn[:, 1]),
        jnp.asarray(dn[:, 2]))

print(f"bathroom: {tris.count} tris, {n} rays", flush=True)
for leaf in (4, 7, 14):
    bvh, order = bvh_native.build(tp, max_leaf=leaf)
    tr = _reorder(tris, order)
    for sub in (16, 32):
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
            print(f"leaf={leaf:3d} sub={sub:3d} FAIL {str(e)[:80]}",
                  flush=True)
            continue
        t0 = time.perf_counter()
        h = f(o, d)
        jax.block_until_ready(h.t)
        dt_p = time.perf_counter() - t0
        h2 = f(oi, di)
        jax.block_until_ready(h2.t)
        t0 = time.perf_counter()
        h2 = f(oi, di)
        jax.block_until_ready(h2.t)
        dt_i = time.perf_counter() - t0
        print(f"leaf={leaf:3d} sub={sub:3d} nodes={bvh.right.shape[0]:7d} "
              f"depth={bvh.depth:3d} "
              f"primary {n/dt_p/1e6:6.1f} Mray/s  "
              f"incoherent {n/dt_i/1e6:6.1f} Mray/s", flush=True)
