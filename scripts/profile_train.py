"""Decompose the cornell fwd+bwd cost (VERDICT r2 item 2: fwd:fwdbwd
ratio <= 3x).

Times, per 1-spp step at the bench's 1024x1024 shapes:
  - forward-only sample_image (the honest 1-spp fwd baseline --
    bench's headline fwd_pps amortizes raygen over 96-spp chunks, so
    the per-sample number is what fwd+bwd should be compared against)
  - value_and_grad with the full parameter surface, remat on/off
  - value_and_grad with single-param surfaces (albedo only, tri_p0
    only, ...) to expose which vjp dominates (gather transposes are
    scatter-adds, a known TPU weak spot)
"""
from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.diff import _merge_scene, _split_scene
from raytracingrenderer_tpu.render import sample_image, specialize_config
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.scene.types import Camera

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms  {1024*1024/dt/1e6:7.2f} Mpps",
          flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = load_scene("/root/reference/RTBase/cornell-box")
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((scene.camera.height, scene.camera.width, 3))

    base_cfg = specialize_config(
        RenderConfig(mis=True, jitter=True, max_depth=4), scene)

    # forward-only, 1 spp (what the backward is stacked on)
    for remat in (False, True):
        cfg = dataclasses.replace(base_cfg, remat=remat)
        f = jax.jit(lambda s, k, c=cfg: sample_image(s, k, c))
        timeit(f"fwd 1spp remat={remat}", f, scene, key)

    params_all, _ = _split_scene(scene)

    def loss_of(param_names, cfg):
        def loss(p, s, k):
            full = dict(params_all, **p)
            return jnp.mean((sample_image(_merge_scene(full, s), k, cfg)
                             - target) ** 2)
        sub = {k: params_all[k] for k in param_names}
        g = jax.jit(lambda s, k: jax.value_and_grad(loss)(sub, s, k))
        return g

    surfaces = [
        ("all params", list(params_all)),
        ("albedo only", ["albedo"]),
        ("emission+light_le", ["emission", "light_le"]),
        ("alpha only", ["alpha"]),
        ("tri_p0 only", ["tri_p0"]),
    ]
    for remat in (True, False):
        for geom in (True, False):
            cfg = dataclasses.replace(base_cfg, remat=remat,
                                      geom_grads=geom)
            for name, names in surfaces:
                if name == "tri_p0 only" and not geom:
                    continue
                try:
                    g = loss_of(names, cfg)
                    timeit(f"fwd+bwd {name} remat={remat} geom={geom}",
                           g, scene, key)
                except Exception as e:
                    print(f"{name} remat={remat} geom={geom} FAIL "
                          f"{str(e)[:120]}", flush=True)
            if not geom:
                break  # geom=False: only the all-params row is new info


if __name__ == "__main__":
    main()
