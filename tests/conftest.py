"""Test configuration: force the CPU backend with 8 virtual devices.

Unit tests must run without TPU hardware; multi-chip sharding logic is
exercised on a virtual 8-device CPU mesh.  Note: on this image the axon TPU
plugin force-appends itself to jax_platforms, so the env var alone is not
enough — we also update the config after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: XLA-CPU compiles dominate suite time
# (~3 s per Montgomery-multiply instance); cache them across pytest runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
