import os

# The container's sitecustomize imports jax and pins JAX_PLATFORMS=axon (TPU
# tunnel) before conftest runs, so env vars alone don't stick. Force the CPU
# backend with a virtual 8-device mesh through jax.config before any backend
# is initialized: tests need exact f32 matmuls and multi-device sharding.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
