"""Coarse-to-fine optical-flow driver.

TPU-native re-implementation of ``OpticalFlow::Coarse2FineFlow``
(``Code/Parallel/src/OpticalFlow.cpp:823-992``): Gaussian pyramids for both
frames, per-level feature lifting, flow upsampling with ``1/ratio`` scaling,
bilinear warp feedback, the SOR solver with the ``(7+k, 1, 30+3k)`` level
schedule, and a final full-resolution Hermite-bicubic warp with ``[0, 1]``
clamping.

The ENTIRE pipeline is one ``jax.jit`` program: every pyramid level has a
static shape (precomputed host-side), level loops are unrolled at trace time,
and the fixed-point/SOR loops are ``lax.fori_loop``.  One dispatch, zero
host-device round trips.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.bicubic import threshold01, warp_bicubic_ref
from ..ops.features import im2feature
from ..ops.interp import resize_to, warp_bilinear
from ..utils.params import DEFAULT_PARAMS, FlowParams, Interpolation
from .pyramid import build_pyramid, clamp_ratio
from .solver import smooth_flow_sor


def _coarse2fine_impl(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    pyramid_levels: int,
    params: FlowParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Traced body.  ``im1``, ``im2``: ``(C, H, W)``.

    Returns ``(u, v, warp_i2)`` with ``u``/``v``: ``(H, W)`` and
    ``warp_i2``: ``(C, H, W)``.
    """
    ratio = clamp_ratio(params.ratio)
    # Optional bf16 image path: pyramid/feature/warp planes store bf16
    # (halved HBM traffic); flow fields and the SOR system stay in the
    # input float dtype (see FlowParams.image_dtype).
    if params.image_dtype == "bfloat16":
        pyr1 = build_pyramid(im1.astype(jnp.bfloat16), ratio, pyramid_levels)
        pyr2 = build_pyramid(im2.astype(jnp.bfloat16), ratio, pyramid_levels)
    else:
        pyr1 = build_pyramid(im1, ratio, pyramid_levels)
        pyr2 = build_pyramid(im2, ratio, pyramid_levels)

    t = im1.dtype.type
    # Noise-model state initialized once before the level loop
    # (OpticalFlow.cpp:856-866) and carried across levels:
    # Lap: nchannels+2 entries of 0.02; GMixture: GMPara.reset(nchannels+2).
    # For 1/3-channel inputs nchannels+2 equals the feature channel count.
    from ..utils.params import NoiseModel

    if params.noise_model == NoiseModel.GAUSSIAN_MIXTURE:
        from ..ops.gmm import init_gmixture

        lap_para = init_gmixture(im1.shape[0] + 2, im1.dtype)
    elif params.estimate_laplacian_noise:
        lap_para = jnp.full((im1.shape[0] + 2,), t(0.02))
    else:
        lap_para = None

    u = v = None
    for k in range(pyramid_levels - 1, -1, -1):
        feat1 = im2feature(pyr1[k], params.color_type)
        feat2 = im2feature(pyr2[k], params.color_type)
        h, w = feat1.shape[-2], feat1.shape[-1]
        if k == pyramid_levels - 1:
            u = jnp.zeros((h, w), im1.dtype)
            v = jnp.zeros((h, w), im1.dtype)
            warp2 = feat2
        else:
            inv_ratio = t(1.0 / ratio)
            u = resize_to(u, h, w) * inv_ratio
            v = resize_to(v, h, w) * inv_ratio
            if params.interpolation == Interpolation.BILINEAR:
                warp2 = warp_bilinear(feat1, feat2, u, v)
            else:
                warp2 = warp_bicubic_ref(feat1, feat2, u, v)
        n_outer, n_inner, n_sor = params.level_schedule(k)
        u, v, warp2, lap_para = smooth_flow_sor(
            feat1, feat2, warp2, u, v, n_outer, n_inner, n_sor, params,
            lap_para=lap_para,
        )

    # Final full-resolution warp operates on the RAW frames, not features
    # (OpticalFlow.cpp:929-932).  On the bf16 image path the gathered
    # stencil table also stores bf16 (same accuracy class as the bf16
    # pyramid planes; halves the final gather's bytes).
    table_dtype = (
        jnp.bfloat16 if params.image_dtype == "bfloat16" else None
    )
    warp_i2 = threshold01(warp_bicubic_ref(im1, im2, u, v,
                                           table_dtype=table_dtype))
    return u, v, warp_i2


@functools.partial(jax.jit, static_argnames=("pyramid_levels", "params"))
def coarse2fine_flow_chw(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    pyramid_levels: int = 4,
    params: FlowParams = DEFAULT_PARAMS,
):
    """Jitted channels-first entry point; see ``_coarse2fine_impl``."""
    return _coarse2fine_impl(im1, im2, pyramid_levels, params)


def to_chw(im: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """``(H, W)`` or ``(H, W, C)`` -> ``(C, H, W)``."""
    im = jnp.asarray(im, dtype=dtype)
    if im.ndim == 2:
        return im[None]
    return jnp.moveaxis(im, -1, 0)


def from_chw(im: jnp.ndarray) -> jnp.ndarray:
    """``(C, H, W)`` -> ``(H, W, C)``."""
    return jnp.moveaxis(im, 0, -1)
