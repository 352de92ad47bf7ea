"""A/B the round-5 BVH build-quality knobs (all-axes SAH, bin count,
pre-split references) on bathroom, host-side: global SAH cost + build
time.  On-chip confirmation: scripts/probe_build_ab.py.
"""
import sys
import time

import numpy as np

from raytracingrenderer_tpu.geometry import bvh as B
from raytracingrenderer_tpu.geometry import bvh_native
from raytracingrenderer_tpu.scene.loader import load_scene

scene = sys.argv[1] if len(sys.argv) > 1 else "bathroom"
sc = load_scene(f"/root/reference/RTBase/{scene}", build_bvh=False)
tris = sc.triangles
tp = np.stack([
    np.stack([tris.p0.x, tris.p0.y, tris.p0.z], -1),
    np.stack([tris.p0.x + tris.e1.x, tris.p0.y + tris.e1.y,
              tris.p0.z + tris.e1.z], -1),
    np.stack([tris.p0.x + tris.e2.x, tris.p0.y + tris.e2.y,
              tris.p0.z + tris.e2.z], -1)], axis=1).astype(np.float32)
print(f"{scene}: {len(tp)} tris", flush=True)

d = tp.max(1) - tp.min(1)
area = 2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])
print("tri-AABB area: mean %.4g p99 %.4g max %.4g  (max/mean %.0fx)"
      % (area.mean(), np.percentile(area, 99), area.max(),
         area.max() / max(area.mean(), 1e-30)), flush=True)


def run(label, fn):
    t0 = time.perf_counter()
    bvh, order = fn()
    dt = time.perf_counter() - t0
    print(f"{label:42s} nodes={bvh.right.shape[0]:7d} refs={len(order):7d} "
          f"sah={B.sah_cost(bvh):9.2f} build={dt:6.2f}s", flush=True)
    return bvh, order


run("native C++ (16 bins, largest axis)",
    lambda: bvh_native.build(tp, max_leaf=14))
run("py 16 bins, largest axis",
    lambda: B.build(tp, max_leaf=14))
run("py 32 bins, all axes",
    lambda: B.build(tp, max_leaf=14, bins=32, all_axes=True))
for af, mr in ((0.5, 1.3), (0.25, 1.4), (0.1, 1.6)):
    refs = B.presplit(tp, area_factor=af, max_ratio=mr)
    run(f"py 32b all-ax presplit af={af} mr={mr}",
        lambda: B.build(tp, max_leaf=14, bins=32, all_axes=True, refs=refs))
