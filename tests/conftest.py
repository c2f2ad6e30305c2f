"""Test configuration: run everything on a simulated 8-device CPU mesh.

The axon sitecustomize in this image force-registers the tunneled TPU
backend and rewrites JAX_PLATFORMS, so a plain env var is not enough — we
must also override jax_platforms via jax.config before any computation
(SURVEY.md §4: multi-device tests use JAX's simulated CPU meshes; the real
chip is reserved for bench/verification, where op-by-op dispatch over the
tunnel would make unjitted test code pathologically slow).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: repeated test runs skip re-compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
