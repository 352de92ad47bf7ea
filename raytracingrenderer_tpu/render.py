"""Render driver: progressive per-sample frames accumulated into a Film.

TPU-native replacement of the reference's mutex-guarded tile queue
(/root/reference/RTBase/Renderer.h:795-885): instead of threads popping
32x32 tiles, every sample pass renders the full pixel grid as one flat
ray batch in a single jitted dispatch (optionally sharded over a device
mesh — see parallel/).  Progressive accumulation (1 spp per pass,
Film::incrementSPP semantics) is preserved so interactive/checkpointed
use works the same way.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig
from .core.vec import V3
from .imaging import film as film_mod
from .integrators import path as path_mod
from .sampling import rng
from .scene.camera import generate_rays
from .scene.types import Scene


def pixel_grid(height: int, width: int):
    """Flat pixel index arrays (x, y) in raster order."""
    ys, xs = jnp.mgrid[0:height, 0:width]
    return (xs.reshape(-1).astype(jnp.float32),
            ys.reshape(-1).astype(jnp.float32))


def sample_image(scene: Scene, key: jax.Array, cfg: RenderConfig
                 ) -> jax.Array:
    """One radiance sample per pixel -> (H, W, 3).  jit-able; cfg static."""
    cam = scene.camera
    xs, ys = pixel_grid(cam.height, cam.width)
    if cfg.jitter:
        jx = rng.uniform(key, 0, rng.PIXEL_JITTER_X, xs.shape)
        jy = rng.uniform(key, 0, rng.PIXEL_JITTER_Y, ys.shape)
    else:
        # reference renders pixel centres only (Renderer.h:806-808)
        jx = jy = 0.5
    o, d = generate_rays(cam, xs + jx, ys + jy)
    radiance = path_mod.trace_radiance(scene, o, d, key, cfg)
    return radiance.stacked().reshape(cam.height, cam.width, 3)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_pass(scene: Scene, film: film_mod.Film, key: jax.Array,
                 cfg: RenderConfig):
    img = sample_image(scene, key, cfg)
    return film_mod.add_sample_image(film, img)


def render(scene: Scene, cfg: Optional[RenderConfig] = None,
           spp: Optional[int] = None,
           film: Optional[film_mod.Film] = None,
           on_sample: Optional[Callable] = None) -> film_mod.Film:
    """Progressive render: `spp` passes of 1 sample/pixel.

    `film` may carry a previous render's accumulation (checkpoint/resume —
    the film is the resumable unit, as in the reference where the film
    survives across frames, Imaging.h:253-261)."""
    cfg = cfg or RenderConfig()
    spp = spp if spp is not None else cfg.spp
    cam = scene.camera
    if film is None:
        film = film_mod.new_film(cam.height, cam.width)
    base = jax.random.PRNGKey(cfg.seed)
    start = int(np.asarray(film.spp))
    for s in range(start, start + spp):
        key = rng.spp_key(base, s)
        film = _render_pass(scene, film, key, cfg)
        # Bounded dispatch queue: deep async pipelines destabilize
        # tunneled single-chip backends; syncing every few samples costs
        # ~0.1 ms against ~ms-scale sample times.
        if (s - start) % 4 == 3:
            film.buffer.block_until_ready()
        if on_sample is not None:
            on_sample(s, film)
    film.buffer.block_until_ready()
    return film
