"""Evidence for SURVEY §2.11 row 6: time the explicit-SPMD train step
with per-bounce gradient psums inside the backward scan (overlapped)
against the identical step with one end-of-backward psum (barriered),
on the virtual 8-device CPU mesh.  Writes docs/OVERLAP_r4.md.

On the single-host CPU mesh, collectives are shared-memory copies, so
the schedule difference shows up as structure (psum count/placement in
the compiled HLO) more than wall clock; both are recorded.  On a real
multi-chip ICI mesh the per-bounce placement is what lets the DMA ride
under the backward compute.
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The ambient axon sitecustomize pins the TPU backend programmatically,
# overriding the env var — force CPU the way tests/conftest.py does, and
# fail loudly if the virtual mesh is missing (a 1-device mesh would make
# every psum a no-op and the "evidence" vacuous).
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.diff import _diff_cfg
from raytracingrenderer_tpu.parallel.mesh import make_mesh
from raytracingrenderer_tpu.parallel.overlap import (_sharded_step,
                                                     param_grads_sharded)
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.scene.types import Camera

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")


def main():
    sc = load_scene("/root/reference/RTBase/cornell-box")
    c = sc.camera
    h = w = 256
    sc = sc._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                   c.world_to_cam, w, h, c.origin,
                                   c.a_film))
    cfg = _diff_cfg(RenderConfig(max_depth=4, mis=True, jitter=True), sc)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((h, w, 3), jnp.float32)
    mesh = make_mesh(8)

    def psum_paths(fn, *args):
        """Count psum primitives by their nesting path in the jaxpr —
        ground truth for collective placement (the lowered HLO outlines
        scan bodies into called functions, hiding the structure)."""
        from collections import Counter
        out = []

        def walk(jaxpr, path):
            for eqn in jaxpr.eqns:
                prim = eqn.primitive.name
                if "psum" in prim:
                    out.append(tuple(path + [prim]))
                for v in eqn.params.values():
                    subs = v if isinstance(v, (list, tuple)) else [v]
                    for s in subs:
                        j = getattr(s, "jaxpr", s)
                        if hasattr(j, "eqns"):
                            walk(j, path + [prim])

        walk(jax.make_jaxpr(fn)(*args).jaxpr, [])
        return Counter(out)

    rows = []
    placement = {}
    for overlap in (False, True):
        name = "overlapped" if overlap else "barriered"
        placement[name] = psum_paths(
            lambda s, t, k: _sharded_step(s, t, k, cfg, mesh, overlap,
                                          0.0), sc, target, key)
        g, loss = param_grads_sharded(sc, target, key, cfg, mesh,
                                      overlap=overlap)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            g, loss = param_grads_sharded(sc, target,
                                          jax.random.PRNGKey(i), cfg,
                                          mesh, overlap=overlap)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / reps
        rows.append((name, dt, float(loss)))
        print(f"{name:11s} {dt*1e3:8.1f} ms/step   psum placement: "
              f"{dict(placement[name])}", flush=True)

    g_o, _ = param_grads_sharded(sc, target, key, cfg, mesh, overlap=True)
    g_b, _ = param_grads_sharded(sc, target, key, cfg, mesh,
                                 overlap=False)
    max_rel = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_o),
                    jax.tree_util.tree_leaves(g_b)):
        a, b = np.asarray(a), np.asarray(b)
        max_rel = max(max_rel, float(np.max(np.abs(a - b)
                                            / (np.abs(b) + 1e-6))))
    print(f"max grad rel-diff overlapped vs barriered: {max_rel:.2e}")

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "OVERLAP_r4.md")
    with open(out, "w") as f:
        f.write(
            "# Gradient all-reduce overlapped with the backward bounce "
            "scan (round 4)\n\n"
            "SURVEY.md §2.11 row 6 / BASELINE.json north star: parameter "
            "gradients\nall-reduced *inside* the backward bounce loop "
            "instead of one barrier at the end.\n\n"
            "Implementation: `parallel/overlap.py` — explicit `shard_map`"
            " over the `rays`\naxis; each bounce re-injects the parameter"
            " pytree through a custom-VJP identity\n(salted by the bounce"
            " counter so partial evaluation cannot hoist it out of\nthe "
            "loop) whose backward is a `psum`, so the reverse bounce scan"
            " carries one\ncollective per bounce, interleaved with the "
            "previous bounce's backward compute.\n\n"
            "## Structural evidence: psum placement in the jaxpr\n\n"
            "Counting `psum` primitives by nesting path (one count per "
            "program point; the\nin-scan point executes once per bounce "
            "at runtime):\n\n```\n")
        for name in ("barriered", "overlapped"):
            f.write(f"{name:11s} "
                    + repr({'->'.join(k): v
                            for k, v in placement[name].items()})
                    + "\n")
        f.write(
            "```\n\nBarriered: every parameter psum sits at shard_map "
            "top level — one barrier\nafter the whole backward.  "
            "Overlapped: the 13 parameter psums sit under\n"
            "`shard_map->scan->remat2` — INSIDE the backward bounce "
            "scan's per-iteration\nbody; only the loss-reporting psum "
            "remains at top level.\n\n"
            f"## Wall clock (virtual 8-device CPU mesh, cornell-box "
            f"{h}x{w}, max_depth=4,\nMIS, remat backward; 5-rep mean, "
            "compile excluded)\n\n"
            "| schedule | ms/step |\n|---|---|\n")
        for name, dt, _ in rows:
            f.write(f"| {name} | {dt*1e3:.1f} |\n")
        f.write(
            f"\nGradient agreement (overlapped vs barriered): max "
            f"relative difference {max_rel:.2e}\n(sum_k psum(partial_k) "
            "== psum(sum_k partial_k); tests/test_parallel.py pins\n"
            "this, equality with the XLA-SPMD jit path, and device-count"
            " invariance).\n\n"
            "On this single-host mesh collectives are shared-memory "
            "copies with a thread\nbarrier each, so the per-bounce "
            "schedule shows its overhead rather than its\nbenefit — "
            "there is no interconnect latency to hide.  The structure "
            "is what\nthe row requires: on a real ICI mesh the same "
            "program issues each bounce's\nall-reduce while the "
            "preceding bounce's backward compute still runs (XLA's\n"
            "TPU scheduler splits collectives into start/done pairs and "
            "hoists the waits).\n`__graft_entry__.dryrun_multichip` "
            "exercises the overlapped step on every\ndriver run.\n")
    print("wrote", os.path.normpath(out))


if __name__ == "__main__":
    main()
