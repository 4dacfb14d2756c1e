"""Hermite bicubic backward warp.

Reproduces ``Image<T>::warpImageBicubicRef`` (``Code/Parallel/src/Image.h:
2650-2768``) and its coefficient builder ``BicubicCoeff`` (``:2560-2593``):
derivative images from the central-difference filter ``[-0.5, 0, 0.5]``
(clamp boundary), a per-pixel 4x4 Hermite coefficient solve, and
out-of-bounds targets copied from the reference frame.  The final clamp to
``[0, 1]`` is ``Image<T>::threshold`` (``Image.h:2090-2108``).

The per-pixel coefficient solve is expressed as two constant 4x4 basis
matmuls (``a = M G M^T``) over a gathered corner tensor, which XLA lowers to
fused vector code — no scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .filters import CENTRAL_DIFF_3TAP, correlate1d
from .interp import gather2d, pack_patch2x2

# Hermite basis: coefficients a = M @ G @ M^T reproduce the 16 explicit
# expressions of BicubicCoeff (Image.h:2562-2592) with
# G = [[f00, f01, fy00, fy01], [f10, f11, fy10, fy11],
#      [fx00, fx01, fxy00, fxy01], [fx10, fx11, fxy10, fxy11]].
_HERMITE_M = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [-3.0, 3.0, -2.0, -1.0],
        [2.0, -2.0, 1.0, 1.0],
    ]
)


def warp_bicubic_ref(
    ref: jnp.ndarray,
    im2: jnp.ndarray,
    vx: jnp.ndarray,
    vy: jnp.ndarray,
    table_dtype=None,
) -> jnp.ndarray:
    """Bicubic backward warp of ``im2`` by flow ``(vx, vy)``; out-of-bounds
    targets copy ``ref`` (``Image.h:2687-2768``).

    ``ref``, ``im2``: ``(..., H, W)``; ``vx``, ``vy``: ``(H, W)``.
    ``table_dtype``: optional storage dtype for the gathered stencil table
    (e.g. bf16 halves the gather bytes on the bf16 image path; the Hermite
    evaluation stays in the image dtype).
    """
    h, w = im2.shape[-2], im2.shape[-1]
    dtype = im2.dtype

    imdx = correlate1d(im2, CENTRAL_DIFF_3TAP, axis=-1)
    imdy = correlate1d(im2, CENTRAL_DIFF_3TAP, axis=-2)
    imdxdy = correlate1d(imdx, CENTRAL_DIFF_3TAP, axis=-2)

    ftype = dtype if dtype in (jnp.float32, jnp.float64) else jnp.float32
    j = jnp.arange(w, dtype=ftype)
    i = jnp.arange(h, dtype=ftype)
    x = j[None, :] + vx.astype(ftype)
    y = i[:, None] + vy.astype(ftype)
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)

    x0 = jnp.clip(jnp.trunc(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.trunc(y).astype(jnp.int32), 0, h - 1)
    fx = (x - x0.astype(ftype)).astype(dtype)
    fy = (y - y0.astype(ftype)).astype(dtype)

    # All 16 stencil values (4 corners x {f, fx, fy, fxy}) for every channel
    # are packed into one row per pixel: TPU gather cost is per-INDEX, so a
    # single wide gather replaces 16 corner gathers (see pack_patch2x2).
    im2_, imdx_, imdy_, imdxdy_ = (
        a[None] if a.ndim == 2 else a for a in (im2, imdx, imdy, imdxdy)
    )
    c = im2_.shape[-3]
    stack4 = jnp.concatenate([im2_, imdx_, imdy_, imdxdy_], axis=-3)  # (4C,H,W)
    if table_dtype is not None:
        stack4 = stack4.astype(table_dtype)
    pack16 = pack_patch2x2(stack4)  # (16C, H, W): [p00(4C), p10, p01, p11]
    # One gather per CORNER block (4C channels each) instead of a single
    # 16C-wide gather: measured on v5e at 1080x1920x3ch f32, the corner
    # chunks let XLA fold each gather back through the pack's concat onto
    # its shifted source (4x12-ch chunks: 28 ms vs 146 ms for the single
    # 48-ch gather).  Values are identical — only the gather partitioning
    # changes.  On big tables the corner-chunked gather additionally goes
    # through the displacement-adaptive tile-windowed scheme (r3: gather
    # cost scales with source footprint — see interp._gather2d_tiled),
    # same chunking, bit-identical values.
    from .interp import _make_adaptive_gather, _use_tiled_warp

    if vx.ndim == 2 and _use_tiled_warp(
        pack16.shape, jnp.dtype(pack16.dtype).itemsize
    ):
        patch = _make_adaptive_gather(4)(pack16, y0, x0, ~oob)
    else:
        patch = jnp.concatenate(
            [gather2d(pack16[k * 4 * c:(k + 1) * 4 * c], y0, x0)
             for k in range(4)],
            axis=0,
        )  # (16C, *S)

    def part(corner, field):
        start = corner * 4 * c + field * c
        sl = patch[start : start + c]
        return sl[0] if im2.ndim == 2 else sl

    f00, f10, f01, f11 = (part(k, 0) for k in range(4))
    gx00, gx10, gx01, gx11 = (part(k, 1) for k in range(4))
    gy00, gy10, gy01, gy11 = (part(k, 2) for k in range(4))
    gxy00, gxy10, gxy01, gxy11 = (part(k, 3) for k in range(4))

    # G rows: [f(x,.), f_y(x,.)] blocks per the Hermite layout above.
    g = jnp.stack(
        [
            jnp.stack([f00, f01, gy00, gy01], axis=-1),
            jnp.stack([f10, f11, gy10, gy11], axis=-1),
            jnp.stack([gx00, gx01, gxy00, gxy01], axis=-1),
            jnp.stack([gx10, gx11, gxy10, gxy11], axis=-1),
        ],
        axis=-2,
    )
    m = jnp.asarray(_HERMITE_M, dtype=dtype)
    a = jnp.einsum("ik,...kl,jl->...ij", m, g, m)

    one = jnp.ones_like(fx)
    px = jnp.stack([one, fx, fx * fx, fx * fx * fx], axis=-1)
    py = jnp.stack([one, fy, fy * fy, fy * fy * fy], axis=-1)
    val = jnp.einsum("...i,...ij,...j->...", px, a, py)

    return jnp.where(oob, ref, val)


def threshold01(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp float image to ``[0, 1]`` (``Image.h:2090-2108``)."""
    return jnp.clip(x, 0, 1)
