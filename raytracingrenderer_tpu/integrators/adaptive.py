"""Adaptive sampling: variance-driven sample reallocation.

The reference's two-phase scheme (/root/reference/RTBase/Renderer.h:
583-749) renders INIT_SAMPLES everywhere, computes per-32x32-tile
variance, then gives each tile spp proportional to sqrt(variance share)
— with dynamic per-tile loop counts, which XLA cannot compile.  The
TPU-native re-design keeps the same statistic but allocates *fixed-size*
ray batches: each round draws `round_rays` pixel ids from the variance
distribution (systematic resampling — static shapes, no host sync),
traces them, and scatter-adds radiance + counts.  Variance estimates
refresh from the accumulated buffers every round, so allocation adapts
progressively rather than in one phase.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import INIT_SAMPLES, TILE_SIZE, RenderConfig
from ..imaging import film as film_mod
from ..integrators import path as path_mod
from ..sampling import rng
from ..scene.camera import generate_rays
from ..scene.types import Scene


class AdaptiveState(NamedTuple):
    sum1: jax.Array    # (H, W, 3) radiance sum
    sum2: jax.Array    # (H, W) luminance-squared sum
    count: jax.Array   # (H, W) samples per pixel


def _trace_pixels(scene: Scene, px, py, key, cfg: RenderConfig):
    jx = rng.uniform(key, 0, rng.PIXEL_JITTER_X, px.shape)
    jy = rng.uniform(key, 0, rng.PIXEL_JITTER_Y, py.shape)
    o, d = generate_rays(scene.camera,
                         px.astype(jnp.float32) + jx,
                         py.astype(jnp.float32) + jy)
    return path_mod.trace_radiance(scene, o, d, key, cfg)


def _tile_variance(st: AdaptiveState) -> jax.Array:
    """Per-tile variance of per-pixel means (the reference's statistic,
    Renderer.h:621-637), tile = TILE_SIZE^2."""
    h, w = st.count.shape
    ts = TILE_SIZE
    mean = st.sum1.sum(-1) / 3.0 / jnp.maximum(st.count, 1.0)
    pad_h = (-h) % ts
    pad_w = (-w) % ts
    mean_p = jnp.pad(mean, ((0, pad_h), (0, pad_w)))
    th, tw = mean_p.shape[0] // ts, mean_p.shape[1] // ts
    tiles = mean_p.reshape(th, ts, tw, ts).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(th, tw, ts * ts)
    return tiles.var(axis=-1)


def _sample_pixels(st: AdaptiveState, key, n_rays: int,
                   height: int, width: int):
    """Systematic resampling of n_rays pixel ids proportional to tile
    variance (uniform within a tile)."""
    var = _tile_variance(st) + 1e-8
    p = (var / var.sum()).reshape(-1)
    cdf = jnp.cumsum(p)
    u = (jnp.arange(n_rays) + jax.random.uniform(key, (n_rays,))) / n_rays
    tile_id = jnp.clip(jnp.searchsorted(cdf, u), 0, p.shape[0] - 1)
    ts = TILE_SIZE
    tw = -(-width // ts)
    ty = tile_id // tw
    tx = tile_id % tw
    k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
    ox = jax.random.randint(k1, (n_rays,), 0, ts)
    oy = jax.random.randint(k2, (n_rays,), 0, ts)
    px = jnp.minimum(tx * ts + ox, width - 1)
    py = jnp.minimum(ty * ts + oy, height - 1)
    return px, py


def adaptive_render(scene: Scene, cfg: RenderConfig, total_spp: int,
                    init_spp: int = INIT_SAMPLES,
                    rounds: int = 8) -> film_mod.Film:
    """Budget = total_spp * npixels rays; init phase uniform, remainder
    variance-allocated over `rounds` fixed-size batches."""
    cam = scene.camera
    h, w = cam.height, cam.width
    base = jax.random.PRNGKey(cfg.seed)

    st = AdaptiveState(sum1=jnp.zeros((h, w, 3)), sum2=jnp.zeros((h, w)),
                       count=jnp.zeros((h, w)))

    @jax.jit
    def init_pass(st: AdaptiveState, key) -> AdaptiveState:
        from ..render import sample_image
        img = sample_image(scene, key, cfg)
        lum = img.mean(-1)
        return AdaptiveState(st.sum1 + img, st.sum2 + lum * lum,
                             st.count + 1.0)

    for s in range(init_spp):
        st = init_pass(st, rng.spp_key(base, s))

    budget = max(total_spp - init_spp, 0) * h * w
    round_rays = max(budget // max(rounds, 1), 0)
    if round_rays:
        @jax.jit
        def adapt_pass(st: AdaptiveState, key) -> AdaptiveState:
            kp, kt = jax.random.split(key)
            px, py = _sample_pixels(st, kp, round_rays, h, w)
            radiance = _trace_pixels(scene, px, py, kt, cfg)
            rgb = radiance.stacked()
            lum = rgb.mean(-1)
            return AdaptiveState(
                st.sum1.at[py, px].add(rgb),
                st.sum2.at[py, px].add(lum * lum),
                st.count.at[py, px].add(1.0))

        for r in range(rounds):
            st = adapt_pass(st, rng.spp_key(base, 10_000 + r))

    img = st.sum1 / jnp.maximum(st.count[..., None], 1.0)
    return film_mod.Film(buffer=img, spp=jnp.float32(1.0))
