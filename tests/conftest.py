"""Test harness setup: run everything on a virtual 8-device CPU mesh.

Note: this image's sitecustomize imports jax at interpreter start (axon TPU
tunnel), so env vars alone are captured too early — we must flip the platform
through jax.config before any backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence AOT-load logs

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is compile-heavy (scanned engine
# loops) and this box has ONE core — caching compiled executables across
# suite runs cuts repeat wall time drastically. Safe to delete the dir.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_cpu")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
