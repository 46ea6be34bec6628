"""Test configuration: run everything on an 8-device virtual CPU mesh.

The ambient environment pre-imports jax at interpreter startup with a
remote-TPU ("axon") platform plugin, so setting the JAX_PLATFORMS env var
here is too late — the value was already read.  `jax.config.update` works
at any point before backend initialization, which is what we use.  The
XLA_FLAGS env var is still honored lazily (the CPU client is created on
first use), so the 8-device virtual mesh flag can go through the env.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache — the suite is dominated by XLA compiles.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
