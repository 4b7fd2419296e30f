"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-device sharding tests (mesh, collectives, ZeRO) run on these virtual devices
exactly as they would on an 8-chip TPU slice (SURVEY.md §4).
"""

import os

# NOTE: the environment presets JAX_PLATFORMS=axon (a tunneled real TPU) via a
# sitecustomize on PYTHONPATH; tests must force CPU unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sitecustomize imports jax before this file runs, so the env var alone is
# too late — force the platform through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: scan-based decoder compiles dominate test wall time.
jax.config.update("jax_compilation_cache_dir", "/tmp/visper_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
