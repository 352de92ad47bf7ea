"""Wide vs binary packet kernel on bathroom (primary + incoherent)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.ops import bvh_kernel
from raytracingrenderer_tpu.render import pixel_grid
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

sc = load_scene("/root/reference/RTBase/bathroom")
bvh, tris = sc.bvh, sc.triangles
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
print(f"bathroom {tris.count} tris depth={bvh.depth} "
      f"W={bvh.wsel.shape[0]}", flush=True)

ref_t = None
for wide in (False, True):
    for sub in (16, 32, 64):
        f = jax.jit(lambda o, d, s=sub, w=wide: bvh_kernel.traverse_packet(
            bvh, tris, o, d, jnp.full(n, bvh_kernel.BIG_T, jnp.float32),
            ray_sub=s, wide=w))
        h = f(o, d)
        jax.block_until_ready(h.t)
        if ref_t is None:
            ref_t = np.asarray(h.t)
        else:
            bad = (np.abs(np.minimum(np.asarray(h.t), 1e30)
                          - np.minimum(ref_t, 1e30)) > 1e-3).mean()
            assert bad < 1e-3, f"wide={wide} sub={sub} mismatch {bad}"
        t0 = time.perf_counter()
        for _ in range(3):
            h = f(o, d)
        jax.block_until_ready(h.t)
        dt_p = (time.perf_counter() - t0) / 3
        h2 = f(oi, di)
        jax.block_until_ready(h2.t)
        t0 = time.perf_counter()
        for _ in range(3):
            h2 = f(oi, di)
        jax.block_until_ready(h2.t)
        dt_i = (time.perf_counter() - t0) / 3
        print(f"wide={int(wide)} sub={sub:3d} "
              f"primary {n/dt_p/1e6:6.1f} Mray/s  "
              f"incoherent {n/dt_i/1e6:6.1f} Mray/s", flush=True)
