"""Isolate the shading_data cost on bathroom (profile_bathroom.py showed
98 ms per 1M rays — ~2.6 GB/s effective on a 152 B row gather, far off
HBM speed).  Times each piece: the raw row gather at several widths, a
two-level split (per-tri geometric attrs + small material table), the
texture path, and the interpolation math.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.integrators import common
from raytracingrenderer_tpu.geometry.intersect import closest_hit
from raytracingrenderer_tpu.render import pixel_grid
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene("/root/reference/RTBase/bathroom")
    cam = scene.camera
    n = cam.height * cam.width
    xs, ys = pixel_grid(cam.height, cam.width)
    o, d = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))()
    act = jnp.ones(n, bool)
    hit = jax.jit(lambda o, d: closest_hit(scene, o, d, act))(o, d)
    jax.block_until_ready(hit.t)
    tri = jnp.maximum(hit.tri, 0)

    table = jax.jit(lambda: common.pack_attrs(scene.triangles,
                                              scene.materials))()
    jax.block_until_ready(table)
    t_rows, k_cols = table.shape
    print(f"attr table: ({t_rows}, {k_cols})", flush=True)

    timeit("pack_attrs (build table)",
           jax.jit(lambda: common.pack_attrs(scene.triangles,
                                             scene.materials)))
    timeit("row gather (T,38)[1M]",
           jax.jit(lambda t, i: t[i]), table, tri)
    for k in (8, 16, 32):
        timeit(f"row gather (T,{k})[1M]",
               jax.jit(lambda t, i, k=k: t[:, :k][i]), table, tri)
    # column-wise: 38 separate 1-D gathers
    timeit("38 column gathers",
           jax.jit(lambda t, i: jnp.stack([t[:, c][i]
                                           for c in range(k_cols)], -1)),
           table, tri)
    # sorted-by-tri gather + unsort
    def sorted_gather(t, i):
        order = jnp.argsort(i)
        rows = t[i[order]]
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype))
        return rows[inv]
    timeit("argsort(tri) + gather + unsort", jax.jit(sorted_gather),
           table, tri)
    # two-level: geometric attrs by tri (20 cols incl mat_id),
    # material cols by mat_id (m rows)
    geo = table[:, :19]
    mat_id = scene.triangles.mat_id
    m = int(np.asarray(scene.materials.albedo.x).shape[0])
    print(f"materials: {m}", flush=True)
    matcols = jnp.zeros((m, 19), jnp.float32)

    def two_level(geo, matcols, mat_id, i):
        g = geo[i]
        mid = mat_id[i]
        mrow = matcols[mid]
        return jnp.concatenate([g, mrow], -1)
    timeit("two-level (geo[1M] + mat[1M] of (856,19))",
           jax.jit(two_level), geo, matcols, mat_id, tri)

    # full shading_data for reference
    timeit("shading_data (full)",
           jax.jit(lambda h, o, d: common.shading_data(scene, h, o, d)),
           hit, o, d)


if __name__ == "__main__":
    main()
