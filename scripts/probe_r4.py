"""Round-4 on-chip probes for the bathroom traversal whale: real
depth-1 bounce rays (not proxies), testing
  (a) packet ray_sub block size on real incoherent rays,
  (b) coherence sort key variants (octant-major vs morton-major, finer
      cells),
  (c) reversed shadow rays (trace from the light) vs surface-out.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import EPSILON, RenderConfig
from raytracingrenderer_tpu.core.vec import V3
from raytracingrenderer_tpu.geometry import intersect
from raytracingrenderer_tpu.integrators import common, path as path_mod
from raytracingrenderer_tpu.lights import lights as lights_mod
from raytracingrenderer_tpu.ops import bvh_kernel
from raytracingrenderer_tpu.render import pixel_grid, specialize_config
from raytracingrenderer_tpu.sampling import rng
from raytracingrenderer_tpu.scene.camera import generate_rays
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
    return out, dt


scene = load_scene("/root/reference/RTBase/bathroom")
cfg = specialize_config(RenderConfig(mis=True, jitter=True, max_depth=4),
                        scene)
cam = scene.camera
n = cam.height * cam.width
key = jax.random.PRNGKey(0)
xs, ys = pixel_grid(cam.height, cam.width)
o, d = jax.jit(lambda: generate_rays(cam, xs + 0.5, ys + 0.5))()

state0 = path_mod.init_state(o, d)
state1 = jax.jit(lambda s: path_mod.bounce_step(
    scene, s, jnp.int32(0), key, cfg))(state0)
jax.block_until_ready(state1["o"].x)
o1, d1, alive1 = state1["o"], state1["d"], state1["alive"]
print("alive after b0:", int(alive1.sum()), flush=True)

t_init = jnp.where(alive1, intersect.BIG_T, -1.0)


# ---- (b) sort key variants, each feeding the same packet kernel -----
def key_current(o, d, active):
    return intersect._sort_key(scene, o, d, active)


def make_key(o, d, active, bits, octant_major):
    """uint32 key: 3*bits-bit Morton of the origin + 3-bit octant
    (octant-major or morton-major); bits<=9 keeps everything in 32."""
    c = scene.bounds.centre
    r = jnp.maximum(scene.bounds.radius, 1e-6)

    def cell(x, cx):
        q = jnp.clip((x - cx) / (2.0 * r) + 0.5, 0.0, 0.999)
        return (q * (1 << bits)).astype(jnp.uint32)

    def spread3(v):  # classic 10-bit spread
        v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
        v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
        v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
        v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
        return v

    morton = (spread3(cell(o.x, c.x)) | (spread3(cell(o.y, c.y)) << 1)
              | (spread3(cell(o.z, c.z)) << 2))
    octant = ((d.x > 0).astype(jnp.uint32)
              | ((d.y > 0).astype(jnp.uint32) << 1)
              | ((d.z > 0).astype(jnp.uint32) << 2))
    if octant_major:
        k = (octant << (3 * bits)) | morton
    else:
        k = (morton << 3) | octant
    return jnp.where(active, k, jnp.uint32(0x7FFFFFFF))


def sorted_traverse(keyfn, sub):
    def go(o, d, t_init, alive):
        k = keyfn(o, d, alive)
        args = jax.lax.sort(
            (k, o.x, o.y, o.z, d.x, d.y, d.z, t_init), num_keys=1)
        so = V3(args[1], args[2], args[3])
        sd = V3(args[4], args[5], args[6])
        return bvh_kernel.traverse_packet(scene.bvh, scene.triangles,
                                          so, sd, args[7], ray_sub=sub)
    return jax.jit(go)


# (a) block size on real bounce rays, current key
for sub in (16, 32):
    f = sorted_traverse(key_current, sub)
    timeit(f"closest real-bounce (cur key)       sub={sub}", f,
           o1, d1, t_init, alive1)

# (b) key variants
for bits, om, tag in ((6, False, "m6|oct (morton major)"),
                      (8, True, "oct|m8 (finer cells)"),
                      (8, False, "m8|oct"),
                      (9, False, "m9|oct")):
    f = sorted_traverse(lambda o, d, a, b=bits, m=om: make_key(o, d, a,
                                                               b, m), 32)
    timeit(f"closest real-bounce key={tag:22s} sub=32", f,
           o1, d1, t_init, alive1)

# ---- (c) reversed shadow rays --------------------------------------
hit = jax.jit(lambda o, d, a: intersect.closest_hit(scene, o, d, a))(
    o1, d1, alive1)
sh = jax.jit(lambda h, o, d: common.shading_data(scene, h, o, d))(
    hit, o1, d1)
act = hit.valid & alive1
rl = rng.uniform_ids(key, 1, rng.LIGHT_PICK, state1["ids"])
r1 = rng.uniform_ids(key, 1, rng.LIGHT_POS_U, state1["ids"])
r2 = rng.uniform_ids(key, 1, rng.LIGHT_POS_V, state1["ids"])
ls = jax.jit(lambda sh, a, b, c: lights_mod.sample_one(
    scene, sh.x, sh.sn, a, b, c))(sh, rl, r1, r2)

fin = ls.dist < lights_mod.INF_DIST
max_t = jnp.where(act, jnp.where(fin, ls.dist - 2 * EPSILON, 1e30), -1.0)

fwd_o = sh.x + ls.wi * EPSILON
f_fwd = jax.jit(lambda o, d, t: intersect.occluded(scene, o, d, t))
occ_f, _ = timeit("occluded surface-out (old)", f_fwd, fwd_o, ls.wi,
                  max_t)

rev_o = V3(*(jnp.where(fin, a, b) for a, b in
             zip(sh.x + ls.wi * (ls.dist - EPSILON), fwd_o)))
rev_d = V3(*(jnp.where(fin, -a, a) for a in ls.wi))
occ_r, _ = timeit("occluded from-light (reversed)", f_fwd, rev_o, rev_d,
                  max_t)
agree = float(jnp.mean((occ_f == occ_r).astype(jnp.float32)))
print(f"occlusion agreement fwd vs reversed: {agree:.6f}", flush=True)


# reversed rays sorted by DIRECTION morton (same-origin rays form
# narrow cones per block, instead of whole octants)
def dir_key(d, active, bits=8):
    def cell(x):
        q = jnp.clip(x * 0.5 + 0.5, 0.0, 0.999)
        return (q * (1 << bits)).astype(jnp.uint32)

    def spread3(v):
        v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
        v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
        v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
        v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
        return v

    k = (spread3(cell(d.x)) | (spread3(cell(d.y)) << 1)
         | (spread3(cell(d.z)) << 2))
    return jnp.where(active, k, jnp.uint32(0x7FFFFFFF))


def occ_dir_sorted(o, d, max_t):
    k = dir_key(d, max_t > 0.0)
    args = jax.lax.sort((k, o.x, o.y, o.z, d.x, d.y, d.z, max_t),
                        num_keys=1)
    so = V3(args[1], args[2], args[3])
    sd = V3(args[4], args[5], args[6])
    return bvh_kernel.traverse_packet(scene.bvh, scene.triangles, so, sd,
                                      args[7], any_hit=True)


f_dir = jax.jit(occ_dir_sorted)
timeit("occluded reversed + DIRECTION sort", f_dir, rev_o, rev_d,
       jnp.where(act, jnp.where(fin, ls.dist - 2 * EPSILON, 1e30), -1.0))

# closest-hit with origin|direction combined key (bounce rays)
def od_key(o, d, active, ob=6, db=3):
    c = scene.bounds.centre
    r = jnp.maximum(scene.bounds.radius, 1e-6)

    def cell(x, cx, bits):
        q = jnp.clip((x - cx) / (2.0 * r) + 0.5, 0.0, 0.999)
        return (q * (1 << bits)).astype(jnp.uint32)

    def dcell(x, bits):
        q = jnp.clip(x * 0.5 + 0.5, 0.0, 0.999)
        return (q * (1 << bits)).astype(jnp.uint32)

    def spread3(v):
        v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
        v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
        v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
        v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
        return v

    om = (spread3(cell(o.x, c.x, ob)) | (spread3(cell(o.y, c.y, ob)) << 1)
          | (spread3(cell(o.z, c.z, ob)) << 2))
    dm = (spread3(dcell(d.x, db)) | (spread3(dcell(d.y, db)) << 1)
          | (spread3(dcell(d.z, db)) << 2))
    k = (dm << (3 * ob)) | om     # direction-major, finer than octant
    return jnp.where(active, k, jnp.uint32(0x7FFFFFFF))


for ob, db, tag in ((6, 3, "d3|o6"), (5, 4, "d4|o5"), (4, 3, "d3|o4")):
    f = sorted_traverse(lambda o, d, a, x=ob, y=db: od_key(o, d, a, x, y),
                        32)
    timeit(f"closest real-bounce key={tag:22s} sub=32", f,
           o1, d1, t_init, alive1)
