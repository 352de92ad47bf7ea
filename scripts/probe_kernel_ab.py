"""A/B the packet kernel after kernel changes: closest + any-hit on the
REAL depth-1 bounce state (the frame-dominant shapes), plus a
correctness tether vs the stackless traversal."""
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

# correctness tether: packet vs BRUTE FORCE on 8k of the real bounce
# rays.  (The stackless lockstep traversal is NOT a safe oracle for
# incoherent rays on the tunneled backend: its while_loop runs until
# the LAST ray finishes — ~1e5 gather iterations on bounce rays — and
# trips the device watchdog, crashing the TPU worker.)
sl = slice(0, 8192)
os_ = V3(o1.x[sl], o1.y[sl], o1.z[sl])
ds_ = V3(d1.x[sl], d1.y[sl], d1.z[sl])
hp = jax.jit(lambda o, d: bvh_kernel.traverse_packet(
    scene.bvh, scene.triangles, o, d,
    jnp.full(o.x.shape[0], intersect.BIG_T)))(os_, ds_)
hb = jax.jit(lambda o, d: intersect.closest_hit_brute(
    scene.triangles, o, d))(os_, ds_)
tp_ = np.minimum(np.asarray(hp.t), 1e30)
ts_ = np.minimum(np.asarray(hb.t), 1e30)
bad = (np.abs(tp_ - ts_) > 1e-3 * np.maximum(ts_, 1.0)).mean()
print(f"packet vs brute mismatch: {bad:.2e}", flush=True)
assert bad < 1e-3, bad

# closest-hit, real bounce rays (dispatch incl sort)
f_cl = jax.jit(lambda o, d, a: intersect.closest_hit(scene, o, d, a))
hit, _ = timeit("closest_hit real-bounce (sorted)", f_cl, o1, d1, alive1)

# shadow, real NEE rays (reversed inside compute_direct now)
sh = jax.jit(lambda h, o, d: common.shading_data(scene, h, o, d))(
    hit, o1, d1)
act = hit.valid & alive1
rl = rng.uniform_ids(key, 1, rng.LIGHT_PICK, state1["ids"])
r1 = rng.uniform_ids(key, 1, rng.LIGHT_POS_U, state1["ids"])
r2 = rng.uniform_ids(key, 1, rng.LIGHT_POS_V, state1["ids"])
f_dir = jax.jit(lambda sh, a, b, c: common.compute_direct(
    scene, sh, act, a, b, c, cfg.mis, cfg.mat_types))
timeit("compute_direct (NEE + reversed shadow)", f_dir, sh, rl, r1, r2)

# whole bounce
timeit("bounce_step (everything)",
       jax.jit(lambda s: path_mod.bounce_step(scene, s, jnp.int32(1),
                                              key, cfg)), state1, reps=3)
