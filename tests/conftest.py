"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (deterministic, no TPU needed) with 8 virtual devices so
sharding/pjit paths are exercised exactly as the driver's multi-chip dry-run
does. Note the axon TPU plugin re-applies itself over JAX_PLATFORMS, so the
platform must be forced through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: repeated suite runs skip the (expensive)
# shard_map/jacfwd cold compiles
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_cube_slam_tests")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
