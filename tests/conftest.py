"""Test configuration: run everything on an 8-device virtual CPU mesh.

Must set the env vars before jax is imported anywhere.
"""
import os

# Force CPU: the ambient environment may point JAX_PLATFORMS at a real TPU
# tunnel (axon); tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
