"""Empirical VPU f32 ceiling (VERDICT r2 task 5).

The SOR sweep kernels are the engine's hottest loops; r2 called them
"speed-of-light" without a measured peak to compare against.  This tool
measures, on the same chip and the same half-plane shapes the packed
kernels use (``ops/pallas/rb_pack.py``):

* ``fma`` — a pure elementwise-FMA Pallas loop: the hardest per-cycle f32
  flop rate the VPU will sustain on VMEM-resident data (2 flops/elem/FMA).
* ``mix`` — a sweep-shaped loop of 2 ``pltpu.roll``s + 7 FMAs per
  iteration, approximating the half-sweep's op mix (neighbor shifts do no
  useful flops but occupy VPU issue slots exactly like the real kernel's
  shifted neighbor sums).

``bench.py`` reports the SOR kernel's useful-work GFLOP/s as a percentage
of BOTH, replacing the adjective with a measured utilization.  Run
standalone: ``python tools/vpu_peak.py``.
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
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _loop_kernel(x_ref, a_ref, o_ref, *, iters: int, n_fma: int,
                 n_roll: int):
    x = x_ref[...]
    a = a_ref[...]
    c = x.dtype.type(1e-6)

    def body(_, x):
        for _ in range(n_roll):
            x = pltpu.roll(x, 1, 1)
        for _ in range(n_fma):
            x = a * x + c
        return x

    o_ref[...] = jax.lax.fori_loop(0, iters, body, x)


@functools.partial(
    jax.jit, static_argnames=("iters", "n_fma", "n_roll")
)
def _run_loop(x, a, iters, n_fma, n_roll):
    return pl.pallas_call(
        functools.partial(
            _loop_kernel, iters=iters, n_fma=n_fma, n_roll=n_roll
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, a)


def _timed(x, a, iters, n_fma, n_roll, reps=4) -> float:
    float(jnp.sum(_run_loop(x, a, iters, n_fma, n_roll)))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(_run_loop(x, a, iters, n_fma, n_roll)))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_iter(x, a, n_fma, n_roll, lo=2000, hi=12000) -> float:
    t_lo = _timed(x, a, lo, n_fma, n_roll)
    t_hi = _timed(x, a, hi, n_fma, n_roll)
    return max(t_hi - t_lo, 1e-12) / (hi - lo)


def run(h: int = 256, w: int = 1024, dtype=jnp.float32) -> dict:
    """Measure both ceilings on an (h, w) VMEM-resident plane — the
    packed-half-plane shape class of the production SOR kernels."""
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((h, w)), dtype)
    # Multiplier just under 1 keeps the iterate finite for any count.
    a = jnp.asarray(0.999 + 0.001 * rng.random((h, w)), dtype)

    n = h * w
    s_fma = _per_iter(x, a, n_fma=8, n_roll=0)
    fma_gflops = 2e-9 * 8 * n / s_fma
    s_mix = _per_iter(x, a, n_fma=7, n_roll=2)
    mix_gflops = 2e-9 * 7 * n / s_mix
    return {
        "shape": f"{h}x{w}",
        "dtype": jnp.dtype(dtype).name,
        "fma_peak_gflops": round(fma_gflops, 1),
        "mix_peak_gflops": round(mix_gflops, 1),
        "note": (
            "fma: pure a*x+c loop (VMEM-resident, 2 flops/elem); mix: "
            "2 rolls + 7 FMAs per iteration (sweep-shaped issue mix). "
            "Measured by iteration-count differencing (dispatch floor "
            "cancelled)."
        ),
    }


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    print(json.dumps(run(), indent=2))
