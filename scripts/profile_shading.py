"""Micro-profile shading_data internals on TPU."""
import time

import jax
import jax.numpy as jnp

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.core.frame import Frame
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.integrators import common
from raytracingrenderer_tpu.ops.gather import gather_rows
from raytracingrenderer_tpu.render import pixel_grid
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.imaging import texture as tex_mod


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt


def main():
    scene = load_scene("/root/reference/RTBase/cornell-box")
    cam = scene.camera
    n = cam.height * cam.width
    xs, ys = pixel_grid(cam.height, cam.width)
    o, d = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))()
    hit = jax.jit(lambda o, d: intersect.closest_hit(scene, o, d))(o, d)
    jax.block_until_ready(hit.t)
    tri = jnp.maximum(hit.tri, 0)

    table = jax.jit(lambda: common.pack_attrs(scene.triangles, scene.materials))()
    jax.block_until_ready(table)
    print("table shape:", table.shape)

    timeit("gather_rows onehot (36,38)", jax.jit(
        lambda t, i: gather_rows(t, i)), table, tri)
    timeit("native table[idx]", jax.jit(lambda t, i: t[i]), table, tri)
    timeit("take axis0", jax.jit(
        lambda t, i: jnp.take(t, i, axis=0)), table, tri)

    u = jnp.zeros(n); v = jnp.zeros(n)
    tid = jnp.full(n, -1, jnp.int32)
    timeit("texture sample", jax.jit(
        lambda tid, u, v: tex_mod.sample(scene.textures, tid, u, v)),
        tid, u, v)

    nrm = V3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    timeit("Frame.from_normal+to_local", jax.jit(
        lambda s: Frame.from_normal(s).to_local(s)), nrm)

    timeit("shading_data full", jax.jit(
        lambda h, o, d: common.shading_data(scene, h, o, d)), hit, o, d)


if __name__ == "__main__":
    main()
