"""Bare 16-src graph x1/x16 only (bisection probe). Run ALONE."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

np.asarray(jax.jit(lambda: jnp.zeros(2))())

from probe_lanescale import measure

for lanes in (1, 16):
    try:
        measure("bare", lanes)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({f"bare_x{lanes}_error": repr(e)[:200]}), flush=True)
