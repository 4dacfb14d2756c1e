"""Hermite bicubic backward warp.

Reproduces ``Image<T>::warpImageBicubicRef`` (``Code/Parallel/src/Image.h:
2650-2768``) and its coefficient builder ``BicubicCoeff`` (``:2560-2593``):
derivative images from the central-difference filter ``[-0.5, 0, 0.5]``
(clamp boundary), a per-pixel 4x4 Hermite coefficient solve, and
out-of-bounds targets copied from the reference frame.  The final clamp to
``[0, 1]`` is ``Image<T>::threshold`` (``Image.h:2090-2108``).

Two lowerings of the same math:

* serial — the 16 stencil values pack into one gathered row per pixel
  (``pack_patch2x2``) and the coefficient solve runs as two constant 4x4
  basis matmuls (``a = M G M^T``), fused by XLA;
* Pallas VPU (round 4, TPU big levels) — ``ops/pallas/warp.py``'s
  candidate-row kernel gathers the 4 stencil planes directly (no 16C
  pack) and fuses the Hermite combine in-kernel, with the serial path as
  the displacement-adaptive violent-flow fallback.
"""

from __future__ import annotations

import jax
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


def _serial_hermite(ref, stack4, vx, vy, dtype):
    """Gather-based Hermite evaluation on 3-D operands: ``ref`` (C, H, W)
    fill frame, ``stack4`` (4C, H, W) stencil planes ``[f, fx, fy, fxy]``.
    ``dtype``: the Hermite evaluation dtype (the image dtype — the table
    may be stored narrower, see ``table_dtype``)."""
    c4, h, w = stack4.shape
    c = c4 // 4
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
        return patch[start : start + c]

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

    return jnp.where(oob, ref, val.astype(ref.dtype))


@jax.custom_batching.custom_vmap
def _bicubic_pallas_adaptive(ref, stack4, vx, vy):
    """Displacement-adaptive Hermite warp via the Pallas VPU kernel; the
    serial gather path handles flows beyond the window margin (same
    contract as ``interp._warp_pallas_adaptive``)."""
    from .interp import (
        _PALLAS_MARGIN_BICUBIC,
        _pallas_margins_for,
        _probe_wide_margin,
        _strip_dy_fields,
    )
    from .pallas.warp import spread_margin_for, warp_bicubic_pallas

    c4, h, w = stack4.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    x = jnp.arange(w, dtype=jnp.float32)[None, :] + vx
    y = jnp.arange(h, dtype=jnp.float32)[:, None] + vy
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    y0 = jnp.clip(jnp.trunc(y).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.trunc(x).astype(jnp.int32), 0, w - 1)
    zero = jnp.zeros((), jnp.int32)
    # Round 5: rebased windows — the bucket bounds each strip's
    # displacement SPREAD, not the absolute flow (see
    # interp._warp_pallas_adaptive / warp._scalar_rows).
    mn0, spread = _strip_dy_fields(oob, y0, h, w)
    # Column exactness bound of the 5-block decomposition (|x0-j|<=255),
    # independent of the row margin — see interp._warp_pallas_adaptive.
    # The bicubic window holds 4C planes, so VMEM caps its row margin:
    # rungs above 64 are probe-compile gated per static config (r5; the
    # bf16 stencil table typically admits 96/128, full-res f32 may not).
    dx = jnp.max(jnp.where(oob, zero, jnp.abs(x0 - j)))
    margins = tuple(
        m for m in _pallas_margins_for(h, cap=_PALLAS_MARGIN_BICUBIC)
        if m <= 64 or _probe_wide_margin(
            "bicubic",
            ((ref.shape, ref.dtype), (stack4.shape, stack4.dtype),
             ((h, w), jnp.float32), ((h, w), jnp.float32)),
            m,
        )
    )
    bucket = sum(
        (spread > spread_margin_for(m)).astype(jnp.int32) for m in margins
    )
    bucket = jnp.where(dx > 255, len(margins), bucket)

    def pallas_branch(m):
        def f(ref, stack4, vx, vy, mn0):
            return warp_bicubic_pallas(
                ref, stack4, vx, vy, margin=m, dymin=mn0
            )

        return f

    def serial_branch(ref, stack4, vx, vy, mn0):
        return _serial_hermite(ref, stack4, vx, vy, ref.dtype)

    return jax.lax.switch(
        bucket,
        [pallas_branch(m) for m in margins] + [serial_branch],
        ref, stack4, vx, vy, mn0,
    )


@_bicubic_pallas_adaptive.def_vmap
def _bicubic_pallas_vmap(axis_size, in_batched, ref, stack4, vx, vy):
    def at(z, batched, i):
        return z[i] if batched else z

    br, bs, bx, by = in_batched
    outs = [
        _bicubic_pallas_adaptive(
            at(ref, br, i), at(stack4, bs, i), at(vx, bx, i), at(vy, by, i)
        )
        for i in range(axis_size)
    ]
    return jnp.stack(outs), True


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
    dtype = im2.dtype

    imdx = correlate1d(im2, CENTRAL_DIFF_3TAP, axis=-1)
    imdy = correlate1d(im2, CENTRAL_DIFF_3TAP, axis=-2)
    imdxdy = correlate1d(imdx, CENTRAL_DIFF_3TAP, axis=-2)

    im2_, imdx_, imdy_, imdxdy_ = (
        a[None] if a.ndim == 2 else a for a in (im2, imdx, imdy, imdxdy)
    )
    stack4 = jnp.concatenate([im2_, imdx_, imdy_, imdxdy_], axis=-3)  # (4C,H,W)
    if table_dtype is not None:
        stack4 = stack4.astype(table_dtype)

    ref_ = ref[None] if ref.ndim == 2 else ref
    from .interp import _use_pallas_warp

    if vx.ndim == 2 and _use_pallas_warp(stack4):
        out = _bicubic_pallas_adaptive(
            ref_, stack4, vx.astype(jnp.float32), vy.astype(jnp.float32)
        )
    else:
        out = _serial_hermite(ref_, stack4, vx, vy, dtype)
    return out[0] if ref.ndim == 2 else out


def threshold01(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp float image to ``[0, 1]`` (``Image.h:2090-2108``)."""
    return jnp.clip(x, 0, 1)
