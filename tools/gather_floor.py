"""Warp-gather experiment (VERDICT r2 task 1): floor probe that instead
FOUND the win.

The backward warp (``ImageProcessing.h:495-520`` -> ``ops/interp.py``) was
the dominant non-SOR cost of a pair (r2: ~22 ms/call at 1080x1920, ~24
calls per 1920px P15 pair, asserted to be a ~3.8 GB/s hardware gather
floor).  This tool measures, on the SAME chip the bench runs on:

1. ``pure``   — a serialized chain of raw monolithic flat gathers at the
   production index count / slice width / table size, with warp-realistic
   smooth indices, plus uniform-random and identity index variants.
2. ``engine`` — the engine's actual ``warp_bilinear`` under the same
   serialized chain, in both schemes: the r2 full-table gather
   (``engine_fulltable_ms``) and the r3 displacement-adaptive tiled
   gather (``engine_warp_ms``, production default on TPU).
3. shape sensitivity — ns/index across slice widths and TABLE SIZES.

The table-size sweep is the decisive evidence: per-index cost scales with
the source-table FOOTPRINT (~2 ns/idx at 2.6 MB vs ~29 ns/idx at 83 MB
for identical smooth indices; random beats smooth at full size), i.e. the
r2 "floor" was a property of gathering from a big table, not of the index
stream.  That mechanism is exactly what the r3 tiled warp exploits
(``ops/interp._gather2d_tiled``: materialize a small per-tile source
window, gather locally — bit-exact, ~3x).  Emitted into bench JSON as
``gather_floor``; run standalone with ``python tools/gather_floor.py``.

Methodology notes:

* Each measurement jits ONE program containing ``iters`` chained gathers
  (each iteration's indices depend on the previous gather's values, so
  XLA cannot hoist or batch them — production warps are serially
  dependent through the SOR fixed point in exactly this way), then
  differences two iteration counts to cancel the ~25 ms dispatch floor.
* A scalar fetch is the completion barrier (block_until_ready does not
  block on the axon platform).
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
import numpy as np


def _smooth_flow(h: int, w: int, amp: float = 8.0, seed: int = 0):
    """Warp-realistic flow: smooth, bounded |v| <= amp px (traffic-scene
    flows at the finest level are a few px after coarse-level feedback)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ph = rng.uniform(0, 2 * np.pi, 6)
    vx = amp * (0.5 * np.sin(2 * np.pi * xx / w * 3 + ph[0])
                * np.cos(2 * np.pi * yy / h * 2 + ph[1])
                + 0.5 * np.sin(2 * np.pi * yy / h * 5 + ph[2]))
    vy = amp * (0.5 * np.cos(2 * np.pi * xx / w * 4 + ph[3])
                * np.sin(2 * np.pi * yy / h * 3 + ph[4])
                + 0.5 * np.cos(2 * np.pi * xx / w * 2 + ph[5]))
    return vx.astype(np.float32), vy.astype(np.float32)


def _indices(kind: str, h: int, w: int, seed: int = 0) -> np.ndarray:
    """Flat int32 row-major indices, one per output pixel."""
    if kind == "identity":
        return np.arange(h * w, dtype=np.int32)
    if kind == "random":
        rng = np.random.default_rng(seed)
        return rng.integers(0, h * w, h * w, dtype=np.int32)
    if kind == "smooth":  # warp-realistic
        vx, vy = _smooth_flow(h, w, seed=seed)
        yy, xx = np.mgrid[0:h, 0:w]
        x0 = np.clip(np.trunc(xx + vx), 0, w - 1).astype(np.int32)
        y0 = np.clip(np.trunc(yy + vy), 0, h - 1).astype(np.int32)
        return (y0 * w + x0).reshape(-1)
    raise ValueError(kind)


@functools.partial(jax.jit, static_argnames=("iters",))
def _chained_gather(flat, idx, iters):
    """``iters`` serially-dependent flat gathers of the full slice stack.

    The carry scalar is provably 0 at runtime (min(|sum|,0) of finite
    data) but the compiler cannot fold it, so every iteration's indices
    depend on the previous gather — no hoisting, no batching.
    """
    def body(_, carry):
        acc, idx = carry
        g = jnp.take(flat, idx, axis=-1)  # (C4, N)
        # Reduce over the FULL gather output: a subsampled reduction would
        # let XLA narrow the gather to the used indices.  The reduction
        # fuses into the gather's consumer (one VMEM pass, ~0.1 ms at this
        # size vs ~20 ms of gather).
        bump = jnp.minimum(jnp.abs(jnp.sum(g.astype(jnp.float32))), 0.0)
        idx = idx + bump.astype(jnp.int32)
        return acc + bump, idx

    acc, idx = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), idx)
    )
    return acc


def _timed(fn, *args, reps: int = 3) -> float:
    """Best-of wall seconds with a one-scalar fetch barrier."""
    float(jnp.sum(fn(*args)))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_iter(fn, *args, lo: int = 2, hi: int = 12, reps: int = 3) -> float:
    """Per-iteration seconds via iteration-count differencing (cancels the
    dispatch floor and the fetch)."""
    t_lo = _timed(functools.partial(fn, iters=lo), *args, reps=reps)
    t_hi = _timed(functools.partial(fn, iters=hi), *args, reps=reps)
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def measure_pure(h: int, w: int, c4: int, dtype, kind: str,
                 reps: int = 3) -> float:
    """Seconds per full-table gather (one slice per output pixel)."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(
        rng.random((c4, h * w), dtype=np.float32), dtype=dtype
    )
    idx = jnp.asarray(_indices(kind, h, w))
    return _per_iter(_chained_gather, table, idx, reps=reps)


@functools.partial(jax.jit, static_argnames=("iters", "tiled"))
def _chained_warp(im1, im2, pack, vx, vy, iters, tiled="auto"):
    """The engine's production warp under the same serialized chain.
    ``tiled`` is only a jit cache key: the interp._TILED_WARP policy is
    read at TRACE time, so each policy needs its own compiled program."""
    from papteam_opticalflow_tpu.ops.interp import warp_bilinear

    def body(_, carry):
        acc, vx, vy = carry
        wimg = warp_bilinear(im1, im2, vx, vy, im2_pack=pack)
        # Full reduction for the same no-dead-code reason as _chained_gather.
        bump = jnp.minimum(
            jnp.abs(jnp.sum(wimg.astype(jnp.float32))), 0.0
        )
        return acc + bump, vx + bump, vy + bump

    acc, _, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), vx, vy)
    )
    return acc


def measure_engine(h: int, w: int, c: int, dtype, reps: int = 3,
                   scheme: str = "pallas") -> float:
    """Seconds per production ``warp_bilinear`` call at the given shape
    (pack prebuilt once where the scheme uses one).  ``scheme``:
    "pallas" (r4 VPU kernel, production default on TPU), "tiled" (the r3
    windowed serial-gather scheme), "fulltable" (the r2 monolithic
    gather)."""
    from papteam_opticalflow_tpu.ops import interp
    from papteam_opticalflow_tpu.ops.interp import (
        pack_patch2x2,
        should_prebuild_pack,
    )

    rng = np.random.default_rng(2)
    im1 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype=dtype)
    im2 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype=dtype)
    vx, vy = _smooth_flow(h, w)
    vx, vy = jnp.asarray(vx), jnp.asarray(vy)
    prev_t, prev_p = interp._TILED_WARP, interp._PALLAS_WARP
    try:
        interp._PALLAS_WARP = "auto" if scheme == "pallas" else "off"
        interp._TILED_WARP = "off" if scheme == "fulltable" else "auto"
        pack = pack_patch2x2(im2) if should_prebuild_pack(im2) else None
        return _per_iter(
            functools.partial(_chained_warp, tiled=scheme),
            im1, im2, pack, vx, vy, reps=reps,
        )
    finally:
        interp._TILED_WARP, interp._PALLAS_WARP = prev_t, prev_p


def run(h: int = 1080, w: int = 1920, c: int = 5,
        dtype=jnp.bfloat16, full: bool = False) -> dict:
    """The committed experiment.  ``full`` adds the shape-sensitivity
    sweeps (slice widths / table sizes)."""
    c4 = 4 * c
    n_idx = h * w
    slice_bytes = c4 * jnp.dtype(dtype).itemsize
    out = {
        "config": {
            "table": f"{h}x{w}",
            "n_indices": n_idx,
            "slice_channels": c4,
            "slice_bytes": slice_bytes,
            "dtype": jnp.dtype(dtype).name,
        },
        "pure_ms": {},
    }
    for kind in ("smooth", "random", "identity"):
        s = measure_pure(h, w, c4, dtype, kind)
        out["pure_ms"][kind] = round(s * 1e3, 2)
    eng = measure_engine(h, w, c, dtype)                        # r4 pallas
    eng_tiled = measure_engine(h, w, c, dtype, scheme="tiled")  # r3 scheme
    eng_full = measure_engine(h, w, c, dtype, scheme="fulltable")  # r2
    out["engine_warp_ms"] = round(eng * 1e3, 2)
    out["engine_tiled_ms"] = round(eng_tiled * 1e3, 2)
    out["engine_fulltable_ms"] = round(eng_full * 1e3, 2)
    out["pallas_speedup_vs_tiled"] = round(eng_tiled / eng, 2)
    pure = out["pure_ms"]["smooth"] * 1e-3
    out["pure_effective_gbps"] = round(
        n_idx * slice_bytes / pure / 1e9, 2
    )
    out["pure_ns_per_index"] = round(pure / n_idx * 1e9, 2)
    out["engine_ns_per_index"] = round(eng / n_idx * 1e9, 2)
    out["note"] = (
        "pure = raw monolithic flat gather, production index count/slice/"
        "table, serialized chain, dispatch floor differenced out; "
        "engine_warp = production warp_bilinear (r4 Pallas VPU kernel); "
        "engine_tiled = the r3 adaptive windowed serial-gather scheme; "
        "engine_fulltable = the r2 monolithic gather.  The table-size "
        "sweep shows per-index cost scales with source footprint — the "
        "mechanism behind the r3 tiled win; the r4 kernel leaves the "
        "serial gather unit entirely."
    )
    if full:
        # Slice-width sweep at fixed table/indices (the should_pack_warp
        # policy boundary) and table-size sweep at fixed slice width.
        out["slice_sweep_ns_per_idx"] = {}
        for cc4, dt in ((4, jnp.bfloat16), (8, jnp.bfloat16),
                        (20, jnp.bfloat16), (20, jnp.float32),
                        (40, jnp.bfloat16), (40, jnp.float32)):
            s = measure_pure(h, w, cc4, dt, "smooth")
            key = f"{cc4}ch_{jnp.dtype(dt).name}_{cc4 * jnp.dtype(dt).itemsize}B"
            out["slice_sweep_ns_per_idx"][key] = round(s / n_idx * 1e9, 2)
        out["table_sweep_ns_per_idx"] = {}
        for th, tw in ((135, 240), (270, 480), (540, 960), (1080, 1920)):
            s = measure_pure(th, tw, c4, dtype, "smooth")
            out["table_sweep_ns_per_idx"][f"{th}x{tw}"] = round(
                s / (th * tw) * 1e9, 2
            )
    return out


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    full = "--full" in sys.argv
    print(json.dumps(run(full=full), indent=2))
