"""In-situ per-level cost by pyramid-depth differencing.

``T(P)`` = best per-pair time of the FULL production program at pyramid
depth ``P`` on the same base frames.  Depths ``P`` and ``P-1`` share
identical shapes and schedules for levels ``0..P-2`` (the pyramid is
built top-down from the same base), so ``T(P) - T(P-1)`` is the real
in-situ cost of the coarsest level at depth ``P`` — including every
overhead the amplified op chains cancel (HBM streaming between
alternating ops, loop-boundary materialization, fusion breaks).

This settles where the headline-minus-op-table gap lives: if coarse
levels are as cheap as the op table claims, the gap is in-situ overhead
at the finest levels; if not, the coarse-level path needs work.

Usage:  python tools/level_profile.py [width] [maxP] [iters]
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    max_p = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import dataclasses

    from bench import load_pair
    from papteam_opticalflow_tpu.models.coarse2fine import (
        coarse2fine_flow_chw,
        to_chw,
    )
    from papteam_opticalflow_tpu.utils.params import DEFAULT_PARAMS

    a, b = load_pair(width)
    x1 = to_chw(a, dtype=jnp.float32)
    x2 = to_chw(b, dtype=jnp.float32)
    params = dataclasses.replace(DEFAULT_PARAMS, image_dtype="bfloat16")

    def timed(p):
        out = coarse2fine_flow_chw(x1, x2, p, params)
        float(jnp.sum(out[0]))  # barrier (block_until_ready unreliable here)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = coarse2fine_flow_chw(x1, x2, p, params)
            float(jnp.sum(out[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    for p in range(1, max_p + 1):
        t = timed(p)
        results[p] = t
        print(f"P{p:2d}: {t * 1e3:8.1f} ms", file=sys.stderr, flush=True)

    deltas = {
        p: round((results[p] - results[p - 1]) * 1e3, 2)
        for p in range(2, max_p + 1)
    }
    out = {
        "width": width,
        "total_ms": {p: round(t * 1e3, 2) for p, t in results.items()},
        "delta_ms_coarsest_level": deltas,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
