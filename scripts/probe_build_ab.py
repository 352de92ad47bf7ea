"""On-chip A/B: packet-kernel traversal time, baseline build (16 bins,
largest axis) vs round-5 quality build (all-axes sweep, 64 bins), on
bathroom primaries (coherent) and shuffled rays (incoherent bounce
proxy, as in scripts/tune_bathroom.py)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import bvh as B
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
print(f"bathroom: {tris.count} tris, {n} rays, "
      f"backend={jax.devices()[0].platform}", flush=True)


def bench(label, bvh, order):
    bvh = bvh_kernel.widen(bvh)
    tr = _reorder(tris, order)

    def go(o, d):
        return bvh_kernel.traverse_packet(
            bvh, tr, o, d,
            jnp.full(o.x.shape[0], bvh_kernel.BIG_T, jnp.float32))
    f = jax.jit(go)
    out = []
    for name, (ro, rd) in (("coherent", (o, d)), ("shuffled", (oi, di))):
        h = f(ro, rd)
        jax.block_until_ready(h.t)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            h = f(ro, rd)
            jax.block_until_ready(h.t)
            ts.append(time.perf_counter() - t0)
        out.append((name, 1e3 * float(np.median(ts))))
    print(f"{label:34s} sah={B.sah_cost(bvh):7.2f} "
          + "  ".join(f"{nm}={ms:7.1f}ms" for nm, ms in out), flush=True)
    return f(o, d)


import sys

if "--variants" in sys.argv:
    bench("quality 64b all-axes leaf14",
          *bvh_native.build(tp, max_leaf=14, bins=64, all_axes=True))
    bench("quality 64b all-axes leaf10",
          *bvh_native.build(tp, max_leaf=10, bins=64, all_axes=True))
    bench("quality 64b all-axes leaf12",
          *bvh_native.build(tp, max_leaf=12, bins=64, all_axes=True))
    refs = B.presplit(tp, area_factor=0.5, max_ratio=1.3)
    bench("presplit(0.5,1.3) 64b all-axes",
          *B.build(tp, max_leaf=14, bins=64, all_axes=True, refs=refs))
    raise SystemExit(0)

h0 = bench("baseline 16b largest-axis",
           *bvh_native.build(tp, max_leaf=14))
h1 = bench("quality 64b all-axes",
           *B.build(tp, max_leaf=14, bins=64, all_axes=True))
# same surfaces -> same t's (tri ids may differ under reorder)
dt = np.abs(np.asarray(h0.t) - np.asarray(h1.t))
rel = dt / np.maximum(np.abs(np.asarray(h0.t)), 1e-6)
print("t mismatch: max rel %.2e  frac>1e-3: %.2e"
      % (rel.max(), float((rel > 1e-3).mean())), flush=True)
