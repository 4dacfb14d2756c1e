"""Production-shape benchmark of the Pallas VPU warp vs the r3 tiled
serial-gather engine (1080x1920, 5 feature channels, smooth flow).

Chained-serial methodology as tools/gather_floor.py (iteration k's flow
depends on k-1's output, dispatch floor differenced out).
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from gather_floor import _smooth_flow  # noqa: E402  (tools/ sibling)


@functools.partial(jax.jit, static_argnames=("iters", "scheme"))
def _chained(im1, im2, vx, vy, iters, scheme):
    from papteam_opticalflow_tpu.ops import interp

    def body(_, carry):
        acc, vx, vy = carry
        wimg = interp.warp_bilinear(im1, im2, vx, vy)
        bump = jnp.minimum(jnp.abs(jnp.sum(wimg.astype(jnp.float32))), 0.0)
        return acc + bump, vx + bump, vy + bump

    acc, _, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), vx, vy)
    )
    return acc


def measure(h, w, c, dtype, scheme: str, amp=8.0, reps=3):
    from papteam_opticalflow_tpu.ops import interp

    rng = np.random.default_rng(2)
    im1 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype)
    im2 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype)
    vx, vy = _smooth_flow(h, w, amp=amp)
    vx, vy = jnp.asarray(vx), jnp.asarray(vy)

    prev = interp._PALLAS_WARP
    try:
        interp._PALLAS_WARP = "auto" if scheme == "pallas" else "off"

        def timed(iters):
            f = functools.partial(_chained, iters=iters, scheme=scheme)
            float(f(im1, im2, vx, vy))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(im1, im2, vx, vy))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = 2, 12
        return (timed(hi) - timed(lo)) / (hi - lo)
    finally:
        interp._PALLAS_WARP = prev


def run(h=1080, w=1920, c=5):
    out = {}
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        t_new = measure(h, w, c, dtype, "pallas")
        t_old = measure(h, w, c, dtype, "old")
        out[f"{name}_pallas_ms"] = round(t_new * 1e3, 2)
        out[f"{name}_r3_tiled_ms"] = round(t_old * 1e3, 2)
        out[f"{name}_speedup"] = round(t_old / t_new, 2)
    return out


if __name__ == "__main__":
    print(json.dumps(run(), indent=2))
