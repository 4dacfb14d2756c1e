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
                 n_roll: int, n_par: int):
    a = a_ref[...]
    c = a.dtype.type(1e-6)
    # n_par independent iterates: a SINGLE chained iterate measures FMA
    # latency, not throughput (measured: 1 chain ~2.1 TF, 4 chains ~2x
    # that) — peak needs instruction-level parallelism across chains.
    xs = [x_ref[...] * a.dtype.type(1.0 + 0.001 * i) for i in range(n_par)]

    def body(_, xs):
        out = []
        for x in xs:
            for _ in range(n_roll):
                x = pltpu.roll(x, 1, 1)
            for _ in range(n_fma):
                x = a * x + c
            out.append(x)
        return tuple(out)

    xs = jax.lax.fori_loop(0, iters, body, tuple(xs))
    acc = xs[0]
    for x in xs[1:]:
        acc = acc + x
    o_ref[...] = acc


@functools.partial(
    jax.jit, static_argnames=("iters", "n_fma", "n_roll", "n_par")
)
def _run_loop(x, a, iters, n_fma, n_roll, n_par):
    return pl.pallas_call(
        functools.partial(
            _loop_kernel, iters=iters, n_fma=n_fma, n_roll=n_roll,
            n_par=n_par,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, a)


def _timed(x, a, iters, n_fma, n_roll, n_par, reps=4) -> float:
    float(jnp.sum(_run_loop(x, a, iters, n_fma, n_roll, n_par)))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(_run_loop(x, a, iters, n_fma, n_roll, n_par)))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_iter(x, a, n_fma, n_roll, n_par, lo=1000, hi=6000) -> float:
    t_lo = _timed(x, a, lo, n_fma, n_roll, n_par)
    t_hi = _timed(x, a, hi, n_fma, n_roll, n_par)
    return max(t_hi - t_lo, 1e-12) / (hi - lo)


def run(h: int = 256, w: int = 1024, dtype=jnp.float32,
        verbose: bool = False) -> dict:
    """Measure both ceilings on an (h, w) VMEM-resident plane — the
    packed-half-plane shape class of the production SOR kernels.  The
    peak is the max over an ILP sweep (independent chains x FMAs per
    chain per iteration)."""
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((h, w)), dtype)
    # Multiplier just under 1 keeps the iterate finite for any count.
    a = jnp.asarray(0.999 + 0.001 * rng.random((h, w)), dtype)

    n = h * w
    best_fma, best_cfg = 0.0, None
    for n_par, n_fma in ((1, 4), (2, 4), (2, 8)):
        s = _per_iter(x, a, n_fma=n_fma, n_roll=0, n_par=n_par,
                      lo=10000, hi=60000)
        g = 2e-9 * n_fma * n_par * n / s
        if verbose:
            print(f"  fma n_par={n_par} n_fma={n_fma}: {g:.0f} GFLOP/s")
        if g > best_fma:
            best_fma, best_cfg = g, (n_par, n_fma)
    s_mix = _per_iter(x, a, n_fma=7, n_roll=2, n_par=2,
                      lo=10000, hi=60000)
    mix_gflops = 2e-9 * 7 * 2 * n / s_mix
    # Stream triad: ONE x = a*x + c pass per iteration -> 12 B/elem of
    # VMEM traffic (read x, read a, write x) and negligible flops.  This
    # is the VMEM bandwidth ceiling the SOR sweep (a ~12-plane-access
    # stencil pass per sweep) is actually bound by.
    s_triad = _per_iter(x, a, n_fma=1, n_roll=0, n_par=1,
                        lo=10000, hi=60000)
    triad_gbps = 12e-9 * n / s_triad
    return {
        "shape": f"{h}x{w}",
        "dtype": jnp.dtype(dtype).name,
        "fma_peak_gflops": round(best_fma, 1),
        "fma_peak_cfg": {"n_par": best_cfg[0], "n_fma": best_cfg[1]},
        "mix_peak_gflops": round(mix_gflops, 1),
        "stream_triad_gbps": round(triad_gbps, 1),
        "note": (
            "fma: max over an ILP sweep of independent fused a*x+c chains "
            "(VMEM-resident, 2 flops/elem); mix: 2 rolls + 7 FMAs per "
            "chain per iteration (sweep-shaped issue mix), 2 chains; "
            "stream_triad: one a*x+c pass per iteration = 12 B/elem VMEM "
            "traffic (the bandwidth ceiling stencil sweeps are bound by). "
            "Iteration-count differencing cancels the dispatch floor."
        ),
    }


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    print(json.dumps(run(), indent=2))
