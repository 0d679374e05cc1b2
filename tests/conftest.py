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

# Persistent compilation cache. Two reasons: (1) warm runs of the suite skip
# nearly all XLA:CPU compilation (minutes -> seconds of compile time);
# (2) this image's XLA:CPU JIT segfaults nondeterministically after ~10+
# minutes of accumulated in-process compilation — cached executables keep
# any single process well under that threshold once the cache is populated
# (populate with scripts/populate_jax_cache.sh, which runs one process per
# test file).
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _shed_jax_executables_between_files():
    """Drop live compiled executables after each test file: long
    single-process runs accumulate XLA:CPU JIT state until the runtime
    aborts (environment bug); the persistent cache makes re-loading
    cheap, so shedding between files costs little."""
    yield
    jax.clear_caches()
