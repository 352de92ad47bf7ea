"""Measure XLA CPU compile time of fwd and fwd+bwd bounce scans."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import time

import jax
import jax.numpy as jnp

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.render import sample_image, specialize_config
from raytracingrenderer_tpu.scene.loader import load_scene
from raytracingrenderer_tpu.scene.types import Camera

scene = load_scene("/root/reference/RTBase/cornell-box")
c = scene.camera
scene = scene._replace(camera=Camera(c.p, c.p_inv, c.cam_to_world,
                                     c.world_to_cam, 24, 24, c.origin,
                                     c.a_film))
CFG = RenderConfig(max_depth=2, mis=False, jitter=False, rr=False)
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
f = jax.jit(lambda s, k: sample_image(s, k, CFG))
f(scene, key).block_until_ready()
print(f"fwd compile+run: {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
albedo = scene.materials.albedo


def loss(a, k):
    sc = scene._replace(materials=scene.materials._replace(albedo=a))
    return jnp.mean(sample_image(sc, k, CFG))


g = jax.jit(jax.grad(loss, argnums=0))
out = g(albedo, key)
jax.block_until_ready(out)
print(f"fwd+bwd compile+run: {time.perf_counter()-t0:.1f}s")
