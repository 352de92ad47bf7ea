"""Differentiable rendering: gradients of the path-traced estimate
w.r.t. scene parameters (materials, lights, environment).

The reference renderer is forward-only; differentiability is a
first-class goal of this framework (BASELINE.json north star).  Strategy
(SURVEY.md §7): discrete path structure — hit ids, barycentrics, RR and
lobe decisions — is stop-gradiented (detached-sampling estimator);
radiometric quantities (albedo, emission, Fresnel/GGX terms, env
radiance) carry gradients through the bounce scan.

`train_step` is the canonical "training step": render a low-spp image,
MSE against a target, SGD on material albedo + emission.  It is what
`__graft_entry__.dryrun_multichip` shards over a device mesh.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .core.vec import V3
from .render import sample_image
from .scene.types import Scene


def _split_scene(scene: Scene):
    """Split the scene into (differentiable params, static rest).

    Parameter surface: material albedo/emission/roughness, light
    radiance, vertex positions, and (when present) the environment-map
    texel radiance.  Roughness gradients flow through the
    reparameterized GGX sample (wi is a smooth function of alpha) plus
    the eval/pdf terms; envmap gradients flow through the radiance
    gather while its alias/pdf tables stay a fixed (detached) sampling
    distribution — the standard unbiased detached-light-sampling
    estimator.

    Geometry gradients (tri_p0, the per-triangle anchor vertex; edges
    e1/e2 are a rigid translation away for whole-object moves) cover
    the INTERIOR term of the rendering integral via the hit-point
    reparameterization in integrators.common.shading_data (cfg must set
    geom_grads=True — train_step/param_grads do).  Silhouette/visibility
    BOUNDARY terms: the NEE visibility boundary (the dominant class for
    area-lit scenes) is estimated by the edge-sampling injector in
    integrators/boundary.py when cfg.boundary_grads=True — validated
    to 0.4% against FD on an analytic occluder scene where the
    boundary term is the entire gradient, and an occluder-position
    optimization converges through it (tests/test_boundary.py,
    docs/BOUNDARY_r5.md).  Still-descope boundary classes (off even
    with the flag): environment-light visibility, BSDF-sampled
    indirect visibility, and the primary camera silhouette (pixels
    whose primary hit flips — ill-defined at jitter=False anyway);
    tests/test_diff.py::TestBoundaryBias keeps that residual measured.
    Interior-dominated losses match FD to ~2% (tests/test_diff.py).
    """
    params = dict(
        albedo=scene.materials.albedo,
        emission=scene.materials.emission,
        alpha=scene.materials.alpha,
        light_le=scene.lights.le,
        tri_p0=scene.triangles.p0,
    )
    env = getattr(scene.background, "envmap", None)
    if env is not None:
        params["env_data"] = env.data
    return params, scene


def _merge_scene(params, scene: Scene) -> Scene:
    mats = scene.materials._replace(albedo=params["albedo"],
                                    emission=params["emission"],
                                    alpha=params["alpha"])
    lights = scene.lights._replace(le=params["light_le"])
    tris = scene.triangles._replace(p0=params["tri_p0"])
    out = scene._replace(materials=mats, lights=lights, triangles=tris)
    if "env_data" in params:
        from .lights.envmap import with_data
        from .scene.types import make_background
        bg = scene.background
        env = with_data(bg.envmap, params["env_data"])
        out = out._replace(background=make_background(bg.kind, bg.colour,
                                                      env))
    return out


def render_loss(params, scene: Scene, target: jax.Array, key,
                cfg: RenderConfig) -> jax.Array:
    img = sample_image(_merge_scene(params, scene), key, cfg)
    return jnp.mean((img - target) ** 2)


@functools.partial(jax.jit, static_argnames=("cfg", "lr"))
def _train_step_impl(scene: Scene, target: jax.Array, key,
                     cfg: RenderConfig, lr: float
                     ) -> Tuple[Scene, jax.Array]:
    params, _ = _split_scene(scene)
    loss, grads = jax.value_and_grad(render_loss)(params, scene, target,
                                                  key, cfg)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params,
                                        grads)
    return _merge_scene(new_params, scene), loss


def _diff_cfg(cfg: RenderConfig, scene: Scene) -> RenderConfig:
    import dataclasses

    from .render import specialize_config
    return dataclasses.replace(specialize_config(cfg, scene),
                               geom_grads=True)


def train_step(scene: Scene, target: jax.Array, key, cfg: RenderConfig,
               lr: float = 0.1) -> Tuple[Scene, jax.Array]:
    """One SGD step on (albedo, emission, roughness, light Le, vertex
    positions, envmap).

    Specializes cfg.mat_types to the scene's material set before jit —
    compiling all 7 lobe families through fwd+bwd costs minutes of XLA
    time (see render.specialize_config).  Note: a step that moves
    vertex positions leaves the BVH node bounds and the light table's
    geometry copy stale — call geometry.refit.refit(scene) after each
    step (or every few steps) when optimizing geometry; it refreshes
    both over the fixed tree topology (tests/test_diff.py exercises a
    multi-step light-translation optimization with refit).

    BVH-scale scenes auto-dispatch to the compacting wavefront backward
    (integrators/wavefront_diff.py) — the same policy render() uses for
    the forward — so training on e.g. bathroom pays compacted widths
    per bounce instead of full batch width at every scan step.
    Gradients are equal either way (test-pinned); cfg.wavefront
    forces the choice.
    """
    from .render import _use_wavefront
    if _use_wavefront(scene, cfg):
        from .integrators import wavefront_diff
        return wavefront_diff.train_step(scene, target, key, cfg, lr)
    return _train_step_impl(scene, target, key, _diff_cfg(cfg, scene), lr)


@functools.partial(jax.jit, static_argnames=("cfg", "lr", "n"))
def _train_steps_impl(scene: Scene, target: jax.Array, base_key,
                      cfg: RenderConfig, lr: float, n: int):
    params, _ = _split_scene(scene)

    def step(params, i):
        key = jax.random.fold_in(base_key, i)
        loss, grads = jax.value_and_grad(render_loss)(
            params, scene, target, key, cfg)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params,
                                        grads)
        return params, loss

    params, losses = jax.lax.scan(step, params,
                                  jnp.arange(n, dtype=jnp.int32))
    return _merge_scene(params, scene), losses


def train_steps(scene: Scene, target: jax.Array, base_key,
                cfg: RenderConfig, lr: float = 0.1, n: int = 8):
    """`n` SGD steps in ONE device dispatch (lax.scan over steps, step
    i keyed by fold_in(base_key, i)) — the training analogue of
    render._render_chunk: per-dispatch overhead amortizes over the
    loop instead of taxing every step.  Equivalent to n sequential
    train_step calls with the same folded keys (tests pin this).
    Returns (scene, (n,) per-step losses).

    BVH-scale scenes run the compacting wavefront backward per step
    instead (host loop: its per-bounce dispatch widths are data-
    dependent, so it cannot sit inside one lax.scan) — per-step
    dispatch overhead is noise next to BVH traversal there."""
    from .render import _use_wavefront
    if _use_wavefront(scene, cfg):
        from .integrators import wavefront_diff
        losses = []
        for i in range(n):
            key = jax.random.fold_in(base_key, i)
            scene, loss = wavefront_diff.train_step(scene, target, key,
                                                    cfg, lr)
            losses.append(loss)
        return scene, jnp.stack(losses)
    return _train_steps_impl(scene, target, base_key,
                             _diff_cfg(cfg, scene), lr, n)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _param_grads_impl(scene: Scene, target: jax.Array, key,
                      cfg: RenderConfig):
    params, _ = _split_scene(scene)
    return jax.grad(render_loss)(params, scene, target, key, cfg)


def param_grads(scene: Scene, target: jax.Array, key, cfg: RenderConfig):
    """Gradients only (for gradient-check tests vs finite differences)."""
    return _param_grads_impl(scene, target, key, _diff_cfg(cfg, scene))
