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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
