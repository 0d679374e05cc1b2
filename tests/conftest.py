"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benches live in bench.py; unit tests must be hermetic and exercise
the multi-chip sharding paths via xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A pytest plugin may have imported jax before this conftest ran; the config
# route still works as long as no backend has been initialized yet.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_threefry_partitionable", True)
