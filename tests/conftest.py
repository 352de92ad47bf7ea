"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths (shard_map over a Mesh) are exercised without TPU
hardware via --xla_force_host_platform_device_count, mirroring the
multi-host test strategy SURVEY.md §4 calls for.
"""
import os

# Force CPU: the ambient environment may pin an experimental TPU backend
# (axon); tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax is preloaded at interpreter startup in this environment, so env
# vars alone are too late — but backends initialize lazily, so the
# config knob still forces CPU as long as no computation ran yet.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    + jax.default_backend())
assert len(jax.devices()) >= 8, "xla_force_host_platform_device_count lost"

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF = "/root/reference/RTBase"


def ref_path(*parts):
    return os.path.join(REF, *parts)
