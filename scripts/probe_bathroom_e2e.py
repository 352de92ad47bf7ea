"""End-to-end bathroom forward timing exactly as bench.py measures it
(wavefront render, spp=2, native-resolution camera, median of 5), for
A/B'ing load-path changes like the round-5 quality BVH build."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracingrenderer_tpu.config import RenderConfig
from raytracingrenderer_tpu.imaging import film as film_mod
from raytracingrenderer_tpu.render import render
from raytracingrenderer_tpu.scene.loader import load_scene

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sb = load_scene("/root/reference/RTBase/bathroom")
cfgb = RenderConfig(mis=True, jitter=True, max_depth=4)
hb2, wb2 = sb.camera.height, sb.camera.width
print(f"bathroom {wb2}x{hb2}, backend={jax.devices()[0].platform}",
      flush=True)

fb = render(sb, cfgb, spp=2)
jax.block_until_ready(fb.buffer)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    fb = render(sb, cfgb, spp=2, film=fb)
    jax.block_until_ready(fb.buffer)
    ts.append(time.perf_counter() - t0)
dt = float(np.median(ts))
pps = hb2 * wb2 * 2 / dt
print(f"median frame {dt*1e3:.0f} ms  bathroom_fwd_pps={pps:,.0f} "
      f"vs_envelope_mid={pps/250e3:.2f}", flush=True)

img_b = np.asarray(film_mod.to_hdr(fb))
gold = np.load("tests/golden/bathroom_4spp_ds8.npy")
ds = img_b.reshape(hb2 // 8, 8, wb2 // 8, 8, 3).mean((1, 3))
lum_g, lum_d = gold.mean(-1).ravel(), ds.mean(-1).ravel()
corr = float(np.corrcoef(lum_g, lum_d)[0, 1])
ratio = float(lum_d.mean() / max(lum_g.mean(), 1e-9))
print(f"golden corr={corr:.4f} mean_ratio={ratio:.4f}", flush=True)
