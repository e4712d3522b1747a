"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
code paths are exercised without TPU hardware."""

import os

# Force CPU regardless of the ambient TPU plugin (the driver validates the
# TPU path separately via bench.py / __graft_entry__.py).  The ambient
# sitecustomize imports jax before us, so the env var alone is not enough —
# jax.config snapshots JAX_PLATFORMS at import time.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 oracles in tests
