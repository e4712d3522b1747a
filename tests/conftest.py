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

# Persistent CPU compile cache: the suite's wall time is dominated by XLA
# compiles of large render programs; caching them across runs cuts repeat
# suite runs several-fold (fresh containers still pay the first run).
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
