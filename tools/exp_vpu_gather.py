"""VPU dynamic-gather throughput (Pallas/Mosaic) — the cost model for the
round-4 warp kernel.

Measures, in ONE kernel with an in-kernel serial fori_loop (iteration k's
indices depend on iteration k-1's output, so Mosaic cannot hoist):

  lane      — jnp.take_along_axis(src(R,128), idx, axis=-1) per iteration
  lane_mix  — the warp inner-loop op mix: 2 lane gathers + 2 selects +
              2 FMAs on the gathered values (one candidate (d, colblock)
              step of the planned kernel)
  sub       — sublane gather (8, W) axis=-2
  i32       — lane gather on int32 (the bf16 channel-pair carrier)

Reports ns per gathered vreg-element and effective GB/s.  Compare against
the serial XLA take floor (~2 ns/INDEX, tools/gather_floor.py) — the VPU
path pays per element-lane instead of per index.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _zero_bump(g):
    """Provably-zero int32 derived from gathered values (serializes the
    chain without changing indices)."""
    return jnp.minimum(jnp.abs(jnp.sum(g).astype(jnp.int32)), 0)


def make_lane(R, W, iters, dtype=jnp.float32, mix=False):
    def kern(src_ref, idx_ref, out_ref):
        src = src_ref[:]
        idx0 = idx_ref[:]

        def body(_, carry):
            acc, idx = carry
            g = jnp.take_along_axis(src, idx, axis=-1)
            if mix:
                g2 = jnp.take_along_axis(
                    src, jnp.minimum(idx + 1, W - 1), axis=-1
                )
                m = idx < (W // 2)
                g = jnp.where(m, g, g2)
                acc = acc + g * jnp.float32(0.25).astype(dtype) + g2 * (
                    jnp.float32(0.5).astype(dtype)
                )
            else:
                acc = acc + g
            idx = idx + _zero_bump(g)
            return acc, idx

        acc, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((R, W), dtype), idx0)
        )
        out_ref[:] = acc

    return kern


def make_sub(R, W, iters):
    def kern(src_ref, idx_ref, out_ref):
        src = src_ref[:]
        idx0 = idx_ref[:]

        def body(_, carry):
            acc, idx = carry
            g = jnp.take_along_axis(src, idx, axis=-2)
            idx = idx + _zero_bump(g)
            return acc + g, idx

        acc, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((R, W), jnp.float32), idx0)
        )
        out_ref[:] = acc

    return kern


def _timed(fn, *args, reps=3):
    r = fn(*args)
    float(jnp.sum(r.astype(jnp.float32)))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def run_lane(R=512, W=128, dtype=jnp.float32, mix=False, axis=-1):
    rng = np.random.default_rng(0)
    if dtype == jnp.int32:
        src = jnp.asarray(rng.integers(0, 1 << 20, (R, W)), jnp.int32)
    else:
        src = jnp.asarray(rng.random((R, W)), dtype)
    hi = W if axis == -1 else R
    idx = jnp.asarray(rng.integers(0, hi, (R, W)), jnp.int32)

    def call(iters):
        maker = make_sub(R, W, iters) if axis == -2 else make_lane(
            R, W, iters, dtype, mix
        )
        return pl.pallas_call(
            maker,
            out_shape=jax.ShapeDtypeStruct((R, W), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    lo, hi_i = 100, 1100
    f_lo = jax.jit(lambda s, i: call(lo)(s, i))
    f_hi = jax.jit(lambda s, i: call(hi_i)(s, i))
    t = (_timed(f_hi, src, idx) - _timed(f_lo, src, idx)) / (hi_i - lo)
    els = R * W
    return {
        "ns_per_element": round(t / els * 1e9, 4),
        "ns_per_iter_us": round(t * 1e6, 2),
        "eff_gbps": round(els * jnp.dtype(dtype).itemsize / t / 1e9, 1),
    }


def run():
    out = {}
    out["lane_f32_512x128"] = run_lane(512, 128, jnp.float32)
    out["lane_i32_512x128"] = run_lane(512, 128, jnp.int32)
    out["lane_mix_512x128"] = run_lane(512, 128, jnp.float32, mix=True)
    out["sub_8x4096"] = run_lane(8, 4096, jnp.float32, axis=-2)
    return out


if __name__ == "__main__":
    print(json.dumps(run(), indent=2))
