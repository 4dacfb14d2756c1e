"""Phase-level profiling.

The reference hand-rolls a two-tier wall-clock profiler (phase timers
Construction / Allocation / Phase1..6 / PostProcessing plus per-op
accumulators, ``Code/Parallel/src/OpticalFlow.cpp:39-64``) whose export is
mostly commented out.  Here ``profiled_flow`` re-exposes that API as a
``{phase: seconds}`` dict by running the pipeline in separately-fetched
stages (each stage is still fully jitted; the fetch is the completion
barrier, since ``block_until_ready`` is unreliable on the axon platform).
For kernel-level traces use ``jax.profiler.trace`` around any call.
"""

from __future__ import annotations

import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.coarse2fine import _coarse2fine_impl  # noqa: F401 (doc ref)
from ..models.pyramid import build_pyramid, clamp_ratio
from ..models.solver import smooth_flow_sor
from ..ops.bicubic import threshold01, warp_bicubic_ref
from ..ops.features import im2feature
from ..ops.interp import resize_to, warp_bilinear
from ..utils.params import DEFAULT_PARAMS, FlowParams, Interpolation


def _fetch(x):
    """Completion barrier: fetch a 1-element device-side reduction of every
    leaf.  ``block_until_ready`` does not reliably block on the axon
    platform, and fetching full arrays would bill the tunneled host link
    (~25 ms/MB) to the phase being timed; a scalar fetch costs one ~25 ms
    round trip per leaf regardless of array size."""
    for leaf in jax.tree.leaves(x):
        float(jnp.sum(leaf))


def profiled_flow(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    pyramid_levels: int,
    params: FlowParams = DEFAULT_PARAMS,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, float]]:
    """Coarse-to-fine flow with per-phase wall-clock timing.

    Returns ``(u, v, warpI2, {phase: seconds})`` with phases named after the
    reference's timers: ``Construction`` (pyramids), per-level
    ``Allocation`` (features + flow upsample + warp) and ``SmoothFlowSOR``
    aggregates, and ``PostProcessing`` (final bicubic warp).
    """
    timings: Dict[str, float] = {}
    total0 = time.perf_counter()
    ratio = clamp_ratio(params.ratio)

    t0 = time.perf_counter()
    # Honor the bf16 image path exactly as _coarse2fine_impl does, so the
    # phase profile reflects the production pipeline's dtype.
    pim1 = im1.astype(jnp.bfloat16) if params.image_dtype == "bfloat16" else im1
    pim2 = im2.astype(jnp.bfloat16) if params.image_dtype == "bfloat16" else im2
    pyr1 = jax.jit(build_pyramid, static_argnums=(1, 2))(pim1, ratio, pyramid_levels)
    pyr2 = jax.jit(build_pyramid, static_argnums=(1, 2))(pim2, ratio, pyramid_levels)
    _fetch((pyr1, pyr2))
    timings["Construction"] = time.perf_counter() - t0

    feat = jax.jit(im2feature, static_argnums=(1,))
    t = im1.dtype.type
    alloc = 0.0
    solve = 0.0
    u = v = None
    for k in range(pyramid_levels - 1, -1, -1):
        t0 = time.perf_counter()
        f1 = feat(pyr1[k], params.color_type)
        f2 = feat(pyr2[k], params.color_type)
        h, w = f1.shape[-2], f1.shape[-1]
        if k == pyramid_levels - 1:
            u = jnp.zeros((h, w), im1.dtype)
            v = jnp.zeros((h, w), im1.dtype)
            warp2 = f2
        else:
            up = jax.jit(resize_to, static_argnums=(1, 2))
            u = up(u, h, w) * t(1.0 / ratio)
            v = up(v, h, w) * t(1.0 / ratio)
            if params.interpolation == Interpolation.BILINEAR:
                warp2 = jax.jit(warp_bilinear)(f1, f2, u, v)
            else:
                warp2 = jax.jit(warp_bicubic_ref)(f1, f2, u, v)
        _fetch((u, v, warp2))
        alloc += time.perf_counter() - t0

        n_outer, n_inner, n_sor = params.level_schedule(k)
        t0 = time.perf_counter()
        solver = jax.jit(
            smooth_flow_sor, static_argnums=(5, 6, 7), static_argnames=("params",)
        )
        u, v, warp2, _ = solver(f1, f2, warp2, u, v, n_outer, n_inner, n_sor,
                                params=params)
        _fetch((u, v))
        dt = time.perf_counter() - t0
        solve += dt
        timings[f"SmoothFlowSOR_level{k}"] = dt
    timings["Allocation"] = alloc
    timings["SmoothFlowSOR_total"] = solve

    t0 = time.perf_counter()
    warp_i2 = jax.jit(warp_bicubic_ref)(im1, im2, u, v)
    warp_i2 = threshold01(warp_i2)
    _fetch(warp_i2)
    timings["PostProcessing"] = time.perf_counter() - t0
    timings["Total Device Execution"] = time.perf_counter() - total0
    return u, v, warp_i2, timings
