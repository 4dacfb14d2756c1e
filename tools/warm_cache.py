"""Warm the persistent XLA compilation cache for the bench configurations."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from papteam_opticalflow_tpu.models.coarse2fine import coarse2fine_flow_chw

CONFIGS = [
    ((135, 240), 4),
    ((270, 480), 4),
    ((540, 960), 8),
    ((1080, 1920), 15),
]

rng = np.random.default_rng(0)
for (h, w), levels in CONFIGS:
    x1 = jnp.asarray(rng.random((3, h, w)), dtype=jnp.float32)
    x2 = jnp.asarray(rng.random((3, h, w)), dtype=jnp.float32)
    t0 = time.perf_counter()
    out = jax.block_until_ready(coarse2fine_flow_chw(x1, x2, levels))
    t1 = time.perf_counter()
    out = jax.block_until_ready(coarse2fine_flow_chw(x1, x2, levels))
    t2 = time.perf_counter()
    print(
        f"{w}px P{levels}: compile+run {t1 - t0:.1f}s, steady {t2 - t1:.3f}s",
        flush=True,
    )
