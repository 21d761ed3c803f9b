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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
