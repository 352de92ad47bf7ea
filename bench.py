"""Benchmark: pixel-paths/sec on cornell-box path tracing (fwd headline)
plus the BASELINE.json north-star extras: fwd+bwd on cornell AND
bathroom, bathroom forward with the packet-BVH wavefront path, an
on-device packet-vs-stackless correctness tether, and a committed-golden
image assertion so a fast-but-wrong kernel regression cannot pass.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Baseline (BASELINE.md): the reference's implied throughput on its
author's CPU is ~15 M pixel-paths/s for the cornell-box class
(result_144.hdr) and 0.1-0.4 M pps for the bathroom class
(result_1/3/4.hdr); bathroom_vs_baseline divides by the 0.25 M midpoint.

The measurement runs in a child process under a watchdog because the
tunneled TPU backend can wedge (hang, not error); on TPU failure it
falls back to an honest CPU measurement with the metric renamed so the
numbers are never conflated.  Compilation happens in warmups with the
SAME shapes as the timed regions (the persistent compilation cache makes
repeat runs cheap), so XLA compile time is never counted as render time.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

BASELINE_PPS = 15e6      # pixel-paths/s, reference cornell-box class
BASELINE_BATHROOM = 0.25e6  # midpoint of the 0.1-0.4 M pps envelope

_CHILD = r"""
import json, time, sys, os
import jax
if os.environ.get("BENCH_FORCE_CPU"):
    # JAX_PLATFORMS in the env is overridden by the ambient TPU
    # sitecustomize; the config knob is authoritative
    jax.config.update("jax_platforms", "cpu")
import numpy as np
from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.imaging import film as film_mod
from raytracingrenderer_tpu.io.hdr import read_hdr
from raytracingrenderer_tpu.render import render, specialize_config
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.scene.types import Camera

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

on_tpu = jax.default_backend() == "tpu"
out = {"backend": jax.default_backend()}

def resize(scene, w, h):
    c = scene.camera
    return scene._replace(camera=Camera(
        c.p, c.p_inv, c.cam_to_world, c.world_to_cam, w, h,
        c.origin, c.a_film))

# ---------------- cornell-box forward (headline) ----------------------
scene = load_scene("/root/reference/RTBase/cornell-box")
cfg = RenderConfig(mis=True, jitter=True, max_depth=4)
if not on_tpu:
    scene = resize(scene, 512, 512)  # CPU fallback stays under watchdog
h, w = scene.camera.height, scene.camera.width
spp = 96 if on_tpu else 4
# Warmup compiles every chunk shape the timed region will use (the spp
# loop dispatches power-of-two chunks <= 32: warming with the same spp
# covers them all), then the timed render reuses the jit cache.
film = render(scene, cfg, spp=spp)
jax.block_until_ready(film.buffer)
t0 = time.perf_counter()
film = render(scene, cfg, spp=spp, film=film)
jax.block_until_ready(film.buffer)
dt = time.perf_counter() - t0
out["fwd_pps"] = h * w * spp / dt

# Sanity: tie the bench image to the image-regression tolerance
# (median pixel ratio vs the reference's own result_144.hdr render).
img = np.asarray(film_mod.to_hdr(film))
assert np.isfinite(img).all()
if on_tpu:
    ref = read_hdr("/root/reference/RTBase/result_144.hdr")
    mask = ref.mean(-1) < 1.0  # exclude the emitter
    ratio = np.median(img.mean(-1)[mask] / np.maximum(ref.mean(-1)[mask],
                                                      1e-6))
    assert 0.9 < ratio < 1.1, f"regression ratio {ratio}"
    out["regression_ratio_vs_result144"] = round(float(ratio), 4)

# ---------------- cornell-box fwd+bwd (north-star extra) --------------
# Scanned multi-step training (diff.train_steps): n SGD steps per
# device dispatch, matching how the forward number amortizes its
# dispatch overhead over 32-sample chunks — apples to apples.
import jax.numpy as jnp
from raytracingrenderer_tpu.diff import train_steps

bw, bh = (1024, 1024) if on_tpu else (128, 128)
sc2 = resize(scene, bw, bh)
cfg2 = RenderConfig(mis=True, jitter=True, max_depth=4)
target = jnp.zeros((bh, bw, 3), jnp.float32)
key = jax.random.PRNGKey(0)
steps = 8 if on_tpu else 1
sc2, _ = train_steps(sc2, target, key, cfg2, 0.01, steps)  # compile
jax.block_until_ready(sc2.materials.albedo.x)
t0 = time.perf_counter()
sc2, losses = train_steps(sc2, target, jax.random.PRNGKey(1), cfg2,
                          0.01, steps)
jax.block_until_ready(sc2.materials.albedo.x)
dt = time.perf_counter() - t0
out["fwdbwd_pps"] = bw * bh * steps / dt
out["fwd_over_fwdbwd"] = round(out["fwd_pps"] / out["fwdbwd_pps"], 2)

# matched-dispatch ratio (docs/TRAIN_PROFILE_r5.md): the legacy ratio
# above compares a 32-sample-chunk-amortized forward against per-step
# training; the honest physics ratio uses a single-sample forward
# dispatch.  Measured decomposition: 3.3 legacy = 2.67 matched x ~1.22
# amortization convention.
from raytracingrenderer_tpu.render import sample_image
f1 = jax.jit(lambda k: sample_image(sc2, k, cfg2))
img1 = f1(key)
jax.block_until_ready(img1)
ts = []
for i in range(5):
    t0 = time.perf_counter()
    img1 = f1(jax.random.PRNGKey(10 + i))
    jax.block_until_ready(img1)
    ts.append(time.perf_counter() - t0)
fwd1 = bw * bh / float(np.median(ts))
out["fwd_over_fwdbwd_matched"] = round(fwd1 / out["fwdbwd_pps"], 2)

# ---------------- bathroom (BVH-scene north star) ----------------------
if on_tpu:
    from raytracingrenderer_tpu.core.vec import V3
    from raytracingrenderer_tpu.geometry import intersect
    from raytracingrenderer_tpu.ops import bvh_kernel
    from raytracingrenderer_tpu.render import pixel_grid
    from raytracingrenderer_tpu.scene.camera import generate_rays

    sb = load_scene("/root/reference/RTBase/bathroom")
    cfgb = RenderConfig(mis=True, jitter=True, max_depth=4)

    # --- correctness tether 1: compiled packet kernel vs the stackless
    # jnp traversal ON DEVICE (the kernel's oracle tests run interpret
    # mode on CPU; a Mosaic miscompile would only show here)
    hb2, wb2 = sb.camera.height, sb.camera.width
    xs, ys = pixel_grid(hb2, wb2)
    o, d = jax.jit(lambda: generate_rays(sb.camera, xs + 0.5, ys + 0.5))()
    sl = slice(0, 128 * 1024)
    o = V3(o.x[sl], o.y[sl], o.z[sl])
    d = V3(d.x[sl], d.y[sl], d.z[sl])
    hp = jax.jit(lambda o, d: bvh_kernel.traverse_packet(
        sb.bvh, sb.triangles, o, d,
        jnp.full(o.x.shape[0], intersect.BIG_T)))(o, d)
    hs = jax.jit(lambda o, d: intersect._traverse_stackless(
        sb.bvh, sb.triangles, o, d,
        jnp.full(o.x.shape[0], intersect.BIG_T), False,
        sb.bvh.leaf_max))(o, d)
    tp_ = np.minimum(np.asarray(hp.t), 1e30)
    ts_ = np.minimum(np.asarray(hs.t), 1e30)
    bad = (np.abs(tp_ - ts_) > 1e-3 * np.maximum(ts_, 1.0)).mean()
    assert bad < 1e-3, f"packet kernel disagrees with stackless: {bad}"
    out["packet_vs_stackless_mismatch"] = float(bad)

    # --- timed forward (compacting wavefront path, the default for
    # BVH-scale scenes); warm with the same spp.  Median of 5: the r4
    # single-rep numbers carried ~10% run-to-run spread.
    fb = render(sb, cfgb, spp=2)
    jax.block_until_ready(fb.buffer)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fb = render(sb, cfgb, spp=2, film=fb)
        jax.block_until_ready(fb.buffer)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    out["bathroom_fwd_pps"] = hb2 * wb2 * 2 / dt
    out["bathroom_vs_baseline"] = out["bathroom_fwd_pps"] / 250e3

    # --- correctness tether 2: the bench image against the committed
    # golden (8x8-downsampled self-render) — a wrong-but-fast kernel or
    # integrator regression cannot pass this
    img_b = np.asarray(film_mod.to_hdr(fb))
    assert np.isfinite(img_b).all()
    gpath = "tests/golden/bathroom_4spp_ds8.npy"
    ds = img_b.reshape(hb2 // 8, 8, wb2 // 8, 8, 3).mean((1, 3))
    if not __import__("os").path.exists(gpath):
        np.save(gpath, ds.astype(np.float32))
        out["bathroom_golden"] = "WROTE " + gpath
    else:
        gold = np.load(gpath)
        lum_g, lum_d = gold.mean(-1).ravel(), ds.mean(-1).ravel()
        corr = float(np.corrcoef(lum_g, lum_d)[0, 1])
        ratio = float(lum_d.mean() / max(lum_g.mean(), 1e-9))
        assert corr > 0.95, f"bathroom image corr {corr}"
        assert 0.85 < ratio < 1.15, f"bathroom mean ratio {ratio}"
        out["bathroom_golden_corr"] = round(corr, 4)

    # --- bathroom fwd+bwd (BASELINE.json: fwd+bwd on BOTH scenes) via
    # the compacting wavefront backward (integrators/wavefront_diff.py:
    # per-bounce width tracking + saved-traversal replay; gradients ==
    # scan-mode, pinned by tests/test_render.py)
    from raytracingrenderer_tpu.integrators import wavefront_diff
    sb2 = resize(sb, 512, 512)
    cfgb2 = RenderConfig(mis=True, jitter=True, max_depth=4)
    tgt = jnp.zeros((512, 512, 3), jnp.float32)
    # warm with the SAME keys as the timed loop: bucket widths depend
    # on live counts, and an unseen width inside the timed region would
    # count XLA compile time as render time.  Median of 5 single-step
    # times (the r4 2-rep number carried ~10% spread).
    reps = 5
    for i in range(reps):
        loss, g = wavefront_diff.loss_and_grads(
            sb2, tgt, jax.random.PRNGKey(i), cfgb2)
    jax.block_until_ready(g)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        loss, g = wavefront_diff.loss_and_grads(sb2, tgt,
                                                jax.random.PRNGKey(i),
                                                cfgb2)
        jax.block_until_ready(g)
        ts.append(time.perf_counter() - t0)
    out["bathroom_fwdbwd_pps"] = 512 * 512 / float(np.median(ts))

print(json.dumps(out))
"""

_SCALING_CHILD = r"""
import json, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.parallel.mesh import make_mesh, render_sharded
from raytracingrenderer_tpu.render import specialize_config
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.scene.types import Camera

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
scene = load_scene("/root/reference/RTBase/cornell-box")


def with_res(sc, w, h):
    c = sc.camera
    return sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                     c.world_to_cam, w, h, c.origin,
                                     c.a_film))


def median_time(sc, mesh, reps=7):
    cfg = specialize_config(
        RenderConfig(mis=True, jitter=True, max_depth=4), sc)
    img = render_sharded(sc, jax.random.PRNGKey(0), cfg, mesh)
    jax.block_until_ready(img)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        img = render_sharded(sc, jax.random.PRNGKey(i), cfg, mesh)
        jax.block_until_ready(img)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


out = {}
# STRONG scaling: fixed 128x128 image split over N devices.  Median of
# 7 (r3's 3-rep mean was noise-prone: the r3 "2dev=0.7" anomaly).  On
# this virtual CPU mesh one XLA CPU device already multi-threads over
# all host cores, so N>1 adds partitioning overhead + thread-pool
# contention with no new silicon — ratios measure SPMD overhead on a
# host, not TPU scaling (the r3 2-dev regression reproduces ~0.5-0.7
# under contention and is a host-threading artifact: per-device thread
# pools oversubscribe the shared cores; outputs stay bit-identical).
strong = {}
for nd in (1, 2, 4, 8):
    sc = with_res(scene, 128, 128)
    strong[nd] = median_time(sc, make_mesh(nd))
for nd, t in strong.items():
    out[f"vcpu_spmd_overhead_strong_ratio_{nd}dev"] = round(strong[1] / t, 3)
# WEAK scaling: fixed rays/device (16 image rows each); ideal time is
# flat, efficiency = t_1/t_N.  This is the harness a real pod run uses
# unchanged to produce the north-star >=80% efficiency number.
weak = {}
for nd in (1, 2, 4, 8):
    sc = with_res(scene, 128, 16 * nd)
    weak[nd] = median_time(sc, make_mesh(nd))
for nd, t in weak.items():
    out[f"vcpu_spmd_overhead_weak_eff_{nd}dev"] = round(weak[1] / t, 3)
# the r4 keys were named scaling_* and read, standalone, as a scaling
# disaster; these numbers measure SPMD overhead on ONE host CPU, not
# device scaling — say so in the JSON itself
out["vcpu_spmd_note"] = (
    "virtual CPU mesh on one host: 1 XLA CPU device already uses all "
    "cores, so N>1 measures SPMD partitioning overhead + thread "
    "contention, NOT hardware scaling; real multi-chip evidence needs "
    "a pod (harness ready, bench.py weak-scaling mode)")
print(json.dumps(out))
"""


def _run(env_extra, timeout, code=None):
    env = dict(os.environ, **env_extra)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code or _CHILD], env=env,
            timeout=timeout, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def main():
    result = _run({}, timeout=2200)  # default backend (TPU when healthy)
    metric = "cornell-box_1024sq_pixel_paths_per_sec"
    if result is None or result.get("backend") != "tpu":
        cpu = _run({"BENCH_FORCE_CPU": "1"}, timeout=400)
        if result is None:
            result = cpu
            metric += "_cpu_fallback"
    if result is None:
        print(json.dumps({"metric": metric + "_failed", "value": 0.0,
                          "unit": "pixel-paths/s", "vs_baseline": 0.0}))
        return
    pps = result.pop("fwd_pps")
    backend = result.pop("backend", "unknown")
    if backend != "tpu" and not metric.endswith("fallback"):
        metric += "_" + backend
    # device-count scaling efficiency on the virtual CPU mesh (no
    # multi-chip hardware available; measures SPMD partitioning overhead)
    scaling = _run(
        {"XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
         + " --xla_force_host_platform_device_count=8"},
        timeout=600, code=_SCALING_CHILD)
    if scaling:
        result.update(scaling)
    extras = {k: round(v, 1) if isinstance(v, float) else v
              for k, v in result.items()}
    print(json.dumps({
        "metric": metric,
        "value": round(pps, 1),
        "unit": "pixel-paths/s",
        "vs_baseline": round(pps / BASELINE_PPS, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
