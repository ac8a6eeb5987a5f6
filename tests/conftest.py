"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware."""

import os

# Force CPU: the driver environment pins JAX_PLATFORMS=axon (real TPU),
# but tests must exercise the virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
