"""Bilinear sampling, exact-grid resize, and backward warping.

Reproduces, with bit-level care, the reference's

* ``ImageProcessing::BilinearInterpolate`` (``ImageProcessing.h:137-180``) —
  note it truncates the sample coordinate toward zero (C ``(int)x`` cast, NOT
  floor) and clamps the fractional part into ``[0, 1]``, then clamps the four
  corner indices into range (edge replication);
* ``ImageProcessing::ResizeImage`` (``:213-257``) — the off-spec sampling grid
  ``x = (j + 1) / ratio - 1`` with destination size ``int(src * ratio)``;
* ``ImageProcessing::warpImage`` (``:495-520``) — backward warp with
  out-of-bounds target pixels copied from frame 1.

All functions take channels-first ``(..., H, W)`` arrays and sample on the
trailing two axes; leading axes broadcast (channels, batch).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.custom_batching.custom_vmap
def gather2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """``img[..., yi, xi]`` via a flattened 1-D ``jnp.take``.

    The equivalent 2-D advanced-indexing gather lowers to a multi-dim XLA
    gather that reproducibly faults the (experimental) axon TPU runtime at
    some shapes; the flat row-major take avoids that codepath and fuses at
    least as well.  ``yi``/``xi``: equal-shaped int32 index arrays (already
    in range).  Returns ``(..., *yi.shape)``.

    A custom vmap rule keeps the same safe lowering under batching (vmap of
    ``take`` would otherwise reintroduce the faulting multi-dim gather).
    """
    h, w = img.shape[-2], img.shape[-1]
    lead = img.shape[:-2]
    flat = img.reshape(*lead, h * w)
    idx = (yi * w + xi).reshape(-1)
    out = jnp.take(flat, idx, axis=-1)
    return out.reshape(*lead, *yi.shape)


@gather2d.def_vmap
def _gather2d_vmap(axis_size, in_batched, img, yi, xi):
    img_b, yi_b, xi_b = in_batched
    b = axis_size
    if img_b and not (yi_b or xi_b):
        # Shared indices (e.g. batched resize): the unbatched flat take
        # already treats the batch axis as just another leading image dim.
        return gather2d(img, yi, xi), True
    # Per-batch indices (warps): unroll at trace time into one fast
    # (lead, H*W) take per batch element.  A single fused take over the
    # fully flattened (b*lead*h*w) buffer — the obvious vectorization —
    # lowers to XLA's slowest gather path on TPU (~3 M idx/s, measured,
    # vs ~115 M idx/s for the per-element 2-D form); the unrolled loop is
    # ~20x faster and compiles in O(b) trace time.
    def at(z, batched, i):
        return z[i] if batched else z
    outs = [
        gather2d(at(img, img_b, i), at(yi, yi_b, i), at(xi, xi_b, i))
        for i in range(b)
    ]
    return jnp.stack(outs), True


def pack_patch2x2(img: jnp.ndarray) -> jnp.ndarray:
    """Pack each pixel's 2x2 clamp-extended neighborhood into the channel
    axis: ``(C, H, W) -> (4C, H, W)`` ordered ``[p00, p10, p01, p11]`` where
    ``pmn[c, y, x] = img[c, min(y+n, H-1), min(x+m, W-1)]``.

    TPU gathers cost ~one fetch PER INDEX almost regardless of row width
    (measured: width 1-20 rows gather at the same indices/s), so fetching
    the packed patch with ONE index per output pixel is ~4x cheaper than
    four corner gathers.  The clamp-extended shifts reproduce the
    ``EnforceRange`` corner clamping exactly.
    """
    if img.ndim == 2:
        img = img[None]
    right = jnp.concatenate([img[..., :, 1:], img[..., :, -1:]], axis=-1)
    down = jnp.concatenate([img[..., 1:, :], img[..., -1:, :]], axis=-2)
    diag = jnp.concatenate([right[..., 1:, :], right[..., -1:, :]], axis=-2)
    return jnp.concatenate([img, right, down, diag], axis=-3)


def bilinear_gather_packed(
    pack: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """`bilinear_gather` reading a `pack_patch2x2` image: one gather per
    output pixel.  ``pack``: ``(4C, H, W)``; returns ``(C, *x.shape)``."""
    h, w = pack.shape[-2], pack.shape[-1]
    c4 = pack.shape[-3]
    c = c4 // 4
    dtype = pack.dtype
    xx = jnp.trunc(x)
    yy = jnp.trunc(y)
    fx = jnp.clip((x - xx).astype(dtype), 0, 1)
    fy = jnp.clip((y - yy).astype(dtype), 0, 1)
    x0 = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(yy.astype(jnp.int32), 0, h - 1)

    patch = gather2d(pack, y0, x0)  # (4C, *S)
    v00 = patch[0 * c : 1 * c]
    v10 = patch[1 * c : 2 * c]
    v01 = patch[2 * c : 3 * c]
    v11 = patch[3 * c : 4 * c]
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


def bilinear_gather(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at float coords ``(x, y)`` with the reference's
    truncation + clamp semantics (``ImageProcessing.h:137-157``).

    ``img``: ``(..., H, W)``; ``x``, ``y``: broadcastable index arrays.
    Returns ``(..., *x.shape)``.
    """
    h, w = img.shape[-2], img.shape[-1]
    dtype = img.dtype
    xx = jnp.trunc(x)
    yy = jnp.trunc(y)
    fx = jnp.clip((x - xx).astype(dtype), 0, 1)
    fy = jnp.clip((y - yy).astype(dtype), 0, 1)
    xx = xx.astype(jnp.int32)
    yy = yy.astype(jnp.int32)

    x0 = jnp.clip(xx, 0, w - 1)
    x1 = jnp.clip(xx + 1, 0, w - 1)
    y0 = jnp.clip(yy, 0, h - 1)
    y1 = jnp.clip(yy + 1, 0, h - 1)

    # Corner weights |1 - m - fx| * |1 - n - fy| for m, n in {0, 1}.
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy

    v00 = gather2d(img, y0, x0)
    v10 = gather2d(img, y0, x1)
    v01 = gather2d(img, y1, x0)
    v11 = gather2d(img, y1, x1)
    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


def bilinear_scatter(
    values: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, h: int, w: int
) -> jnp.ndarray:
    """Scatter-add adjoint of ``bilinear_gather`` — the reference's
    ``BilinearInterpolate_transpose`` (``ImageProcessing.h:186-206``), which
    deposits each input value onto its four clamped corner pixels with the
    bilinear weights.  Derived as the linear transpose of the forward gather
    so corner-clamping accumulation matches by construction.

    ``values``: ``(..., *S)`` as returned by ``bilinear_gather``; returns the
    ``(..., h, w)`` accumulated image.
    """
    lead = values.shape[: values.ndim - x.ndim]
    dtype = values.dtype
    xx = jnp.trunc(x)
    yy = jnp.trunc(y)
    fx = jnp.clip((x - xx).astype(dtype), 0, 1)
    fy = jnp.clip((y - yy).astype(dtype), 0, 1)
    xx = xx.astype(jnp.int32)
    yy = yy.astype(jnp.int32)
    out = jnp.zeros((*lead, h, w), dtype)
    for m, n, wgt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xi = jnp.clip(xx + m, 0, w - 1)
        yi = jnp.clip(yy + n, 0, h - 1)
        out = out.at[..., yi, xi].add(values * wgt)
    return out


def sample_patch(
    img: jnp.ndarray, x0, y0, wsize: int
) -> jnp.ndarray:
    """Bilinear ``(2*wsize+1)^2`` patch around ``(x0, y0)``
    (``ImageProcessing::getPatch``, ``ImageProcessing.h:474-489``): window
    positions that fall outside the image remain zero (the reference skips
    them into a pre-cleared buffer); in-bounds positions sample with the
    clamped bilinear gather.

    ``img``: ``(..., H, W)``; returns ``(..., 2*wsize+1, 2*wsize+1)``.
    """
    h, w = img.shape[-2], img.shape[-1]
    ftype = img.dtype if img.dtype in (jnp.float32, jnp.float64) else jnp.float32
    offs = jnp.arange(-wsize, wsize + 1, dtype=ftype)
    x = jnp.asarray(x0, ftype) + offs[None, :]
    y = jnp.asarray(y0, ftype) + offs[:, None]
    xg = jnp.broadcast_to(x, (2 * wsize + 1, 2 * wsize + 1))
    yg = jnp.broadcast_to(y, (2 * wsize + 1, 2 * wsize + 1))
    oob = (xg < 0) | (xg > w - 1) | (yg < 0) | (yg > h - 1)
    patch = bilinear_gather(img, xg, yg)
    return jnp.where(oob, jnp.zeros((), img.dtype), patch)


def crop_image(
    img: jnp.ndarray, left: int, top: int, dst_w: int, dst_h: int
) -> jnp.ndarray:
    """Rectangular crop (``ImageProcessing::cropImage``,
    ``ImageProcessing.h:661-679``).  ``img``: ``(..., H, W)``."""
    return img[..., top : top + dst_h, left : left + dst_w]


def warp_bilinear_flow(
    im1: jnp.ndarray, im2: jnp.ndarray, flow: jnp.ndarray
) -> jnp.ndarray:
    """``warpImageFlow`` (``ImageProcessing.h:522-546``): backward warp with
    an interleaved flow field.  ``flow``: ``(H, W, 2)`` ordered ``(vx, vy)``
    as in the reference's 2-channel layout."""
    return warp_bilinear(im1, im2, flow[..., 0], flow[..., 1])


def _warp_coords(im2, vx, vy):
    h, w = im2.shape[-2], im2.shape[-1]
    ftype = im2.dtype if im2.dtype in (jnp.float32, jnp.float64) else jnp.float32
    x = jnp.arange(w, dtype=ftype)[None, :] + vx.astype(ftype)
    y = jnp.arange(h, dtype=ftype)[:, None] + vy.astype(ftype)
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    return x, y, oob


def warp_bilinear_nofill(
    im2: jnp.ndarray, vx: jnp.ndarray, vy: jnp.ndarray
) -> jnp.ndarray:
    """3-argument ``warpImage`` overload (``ImageProcessing.h:549-568``):
    backward warp with NO frame-1 fallback — out-of-bounds targets stay
    zero (the reference memsets the output first)."""
    x, y, oob = _warp_coords(im2, vx, vy)
    sampled = bilinear_gather(im2, x, y)
    return jnp.where(oob, jnp.zeros((), im2.dtype), sampled)


def warp_bilinear_nofill_flow(im2: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-flow form of the no-fill warp
    (``ImageProcessing.h:594-612``).  ``flow``: ``(H, W, 2)`` = (vx, vy)."""
    return warp_bilinear_nofill(im2, flow[..., 0], flow[..., 1])


def warp_bilinear_transpose(
    im2: jnp.ndarray, vx: jnp.ndarray, vy: jnp.ndarray
) -> jnp.ndarray:
    """``warpImage_transpose`` (``ImageProcessing.h:571-589``): the adjoint
    scatter — every in-bounds source pixel deposits its value onto the four
    clamped corners of its warp target with the bilinear weights
    (``BilinearInterpolate_transpose``); out-of-bounds pixels deposit
    nothing (realized by scattering a zero value, which is a no-op)."""
    h, w = im2.shape[-2], im2.shape[-1]
    x, y, oob = _warp_coords(im2, vx, vy)
    values = jnp.where(oob, jnp.zeros((), im2.dtype), im2)
    return bilinear_scatter(values, x, y, h, w)


def warp_bilinear_transpose_flow(
    im2: jnp.ndarray, flow: jnp.ndarray
) -> jnp.ndarray:
    """Interleaved-flow form of the adjoint scatter
    (``ImageProcessing.h:615-632``)."""
    return warp_bilinear_transpose(im2, flow[..., 0], flow[..., 1])


def warp_bilinear_masked(
    im1: jnp.ndarray, im2: jnp.ndarray, vx: jnp.ndarray, vy: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask-emitting ``warpImage`` overload (``ImageProcessing.h:634-653``):
    the hot-path warp plus an in-bounds mask (1 where interpolated, 0 where
    the frame-1 pixel was copied)."""
    x, y, oob = _warp_coords(im2, vx, vy)
    sampled = bilinear_gather(im2, x, y)
    mask = jnp.where(oob, jnp.zeros((), im2.dtype), jnp.ones((), im2.dtype))
    return jnp.where(oob, im1, sampled), mask


def resize_shape(src_h: int, src_w: int, ratio: float) -> Tuple[int, int]:
    """Destination size of the ratio-driven resize: ``int(src * ratio)``
    with C double-multiply truncation (``ImageProcessing.h:217-218``)."""
    return int(float(src_h) * ratio), int(float(src_w) * ratio)


# Resize lowering: "matmul" lowers the (separable, static-grid) bilinear
# resize as two small dense matmuls on the MXU — no gathers at all; "gather"
# is the original exact-arithmetic path; "auto" picks matmul on TPU for
# f32/bf16 (gathers serialize per index on TPU; the f64 parity path keeps
# the gather's exact float ordering).
_RESIZE_BACKEND = "auto"


def _resize_axis_matrix(src: int, dst: int, ratio: float):
    """(dst, src) row-interpolation matrix of the reference resize grid
    ``x = (j + 1) / ratio - 1`` with C truncation + clamp
    (``ImageProcessing.h:213-257``).  Bilinear clamp interpolation is
    exactly separable per axis, so the 2-D resize is ``Ry @ img @ Rx.T``."""
    import numpy as np

    m = np.zeros((dst, src), dtype=np.float64)
    for j in range(dst):
        x = (j + 1) / ratio - 1
        xx = float(np.trunc(x))
        fx = min(max(x - xx, 0.0), 1.0)
        x0 = min(max(int(xx), 0), src - 1)
        x1 = min(max(int(xx) + 1, 0), src - 1)
        m[j, x0] += 1.0 - fx
        m[j, x1] += fx
    return m


def _resize_matmul(img: jnp.ndarray, dst_h: int, dst_w: int,
                   y_ratio: float, x_ratio: float) -> jnp.ndarray:
    src_h, src_w = img.shape[-2], img.shape[-1]
    acc = jnp.float32 if img.dtype != jnp.float64 else jnp.float64
    ry = jnp.asarray(_resize_axis_matrix(src_h, dst_h, y_ratio), acc)
    rx = jnp.asarray(_resize_axis_matrix(src_w, dst_w, x_ratio), acc)
    # Precision.HIGHEST: the default TPU matmul precision truncates f32
    # operands to bf16 on the MXU, which would silently degrade the f32
    # "bit-closest" mode and the inter-level flow upsample; the matrices
    # are tiny so the cost is negligible (ADVICE r2 medium).
    out = jnp.einsum(
        "ds,...sw->...dw", ry, img, preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.einsum(
        "...dw,xw->...dx", out, rx, preferred_element_type=acc,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(img.dtype)


def _use_matmul_resize(dtype) -> bool:
    if _RESIZE_BACKEND == "matmul":
        return True
    if _RESIZE_BACKEND == "gather":
        return False
    try:
        import jax

        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and dtype in (jnp.float32, jnp.bfloat16)


def resize_to(img: jnp.ndarray, dst_h: int, dst_w: int) -> jnp.ndarray:
    """Bilinear resize to explicit dims on the reference grid
    ``x = (j + 1) / (dst / src) - 1`` (``ImageProcessing.h:238-257``)."""
    src_h, src_w = img.shape[-2], img.shape[-1]
    x_ratio = float(dst_w) / float(src_w)
    y_ratio = float(dst_h) / float(src_h)
    if _use_matmul_resize(img.dtype):
        return _resize_matmul(img, dst_h, dst_w, y_ratio, x_ratio)
    j = jnp.arange(dst_w, dtype=jnp.float64 if img.dtype == jnp.float64 else jnp.float32)
    i = jnp.arange(dst_h, dtype=j.dtype)
    x = (j + 1) / x_ratio - 1
    y = (i + 1) / y_ratio - 1
    xg = jnp.broadcast_to(x[None, :], (dst_h, dst_w))
    yg = jnp.broadcast_to(y[:, None], (dst_h, dst_w))
    out = bilinear_gather_packed(pack_patch2x2(img), xg, yg)
    return out[0] if img.ndim == 2 else out


def resize_by_ratio(img: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """Ratio-driven resize (``ImageProcessing.h:213-236``): dst size is
    ``int(src * ratio)`` but the sampling grid uses ``ratio`` itself, not the
    realized dst/src quotient."""
    src_h, src_w = img.shape[-2], img.shape[-1]
    dst_h, dst_w = resize_shape(src_h, src_w, ratio)
    if _use_matmul_resize(img.dtype):
        return _resize_matmul(img, dst_h, dst_w, ratio, ratio)
    j = jnp.arange(dst_w, dtype=jnp.float64 if img.dtype == jnp.float64 else jnp.float32)
    i = jnp.arange(dst_h, dtype=j.dtype)
    x = (j + 1) / ratio - 1
    y = (i + 1) / ratio - 1
    xg = jnp.broadcast_to(x[None, :], (dst_h, dst_w))
    yg = jnp.broadcast_to(y[:, None], (dst_h, dst_w))
    out = bilinear_gather_packed(pack_patch2x2(img), xg, yg)
    return out[0] if img.ndim == 2 else out


# --- Tiled (footprint-bounded) warp gather -------------------------------
#
# TPU gather cost per index SCALES WITH THE SOURCE FOOTPRINT, not the
# access pattern (measured r3, tools/gather_floor.py: same smooth indices
# cost ~2 ns/idx against a 2.6 MB table but ~29 ns/idx against 83 MB;
# random beats smooth at full size).  Warp displacements are locally
# bounded, so gathering each output tile from a small materialized source
# window (contiguous dynamic_slice, HBM-bandwidth cheap) runs the same
# gather ~3x faster (tools/exp_banded_warp.py: 7.1 ms vs 21.7 ms for the
# 1080x1920 5ch bf16 warp, bit-exact).  Exactness requires every
# in-bounds sample to fall inside its tile's window; the adaptive wrapper
# measures the true displacement bound ON DEVICE and lax.switches between
# a tight-margin tiling, a wide-margin tiling, and the full-table gather,
# so arbitrary flows stay exact.

# Tile geometry: PADDING is the first-order cost — the output grid pads
# to tile multiples and every padded cell is a real gathered index.  The
# r3 fixed option lists (108|54|32 x 640|384|256) padded 1.00x at
# 1080x1920 but 1.42x at 810x1440 and 1.69x at 455x810, making pyramid
# levels 1/3 cost ~1.5x their neighbors per pixel-iteration
# (tools/level_profile.py).  Divisor-aware tiles measured on v5e
# (tools/exp_tile_plan.py, production 5ch bf16 warp):
#   1080x1920: 108x640 6.77 ms (unchanged best)
#   810x1440:  135x512/102x768  3.93-4.00 ms  vs 108x640 5.57
#   607x1080:  104x1152 (full-width) 2.29     vs 108x384 2.50
#   455x810:   57-114x896 (full-width) 1.33   vs 108x384 2.02
# Within ~1.1x padding the surface is flat (+-5-10%), so the tie-break
# order in _tile_plan (closest to 640, then smaller widths) is cosmetic;
# full-width bands, when they win on padding, are also exact for ANY
# horizontal displacement.
# Tight/wide window margins (px).  The tight tier must catch real frames:
# the recorded 1920px P15 oracle flow peaks at 19.1 px in-bounds
# displacement (tests/fixtures/oracle_1920_P15.npz), so tight = 24; wide
# covers violent flows up to 96 px before the full-table fallback.
# Window cost is flat in this range (0.9-4.4 MB windows all gather at
# ~3-4 ns/idx, tools/exp_banded_warp.py).
_TILE_MARGINS = (24, 96)


def _tile_plan(out_h: int, w: int):
    """(tile_rows, tile_cols) for an output grid of ``out_h`` rows over a
    ``w``-wide table, minimizing padded-grid waste.

    Rows: ~108-row bands by ceil division (padding < n_bands rows).
    Cols: the lane-aligned (multiple-of-128) tile width over 1-4 column
    tiles with the least padded width; ties break to the width closest
    to the measured 640 sweet spot, then to the SMALLER width (more
    column tiles) — the final ascending ``tc`` key element; measured
    flat within ~1.1x padding, so the tie direction is cosmetic
    (reproduces every per-shape winner in tools/exp_tile_plan.py:
    640@1920, 512-768@1440, 384/1152@1080, 896@810, 640@607).  Tables
    narrower than 256 use one full tile."""
    nb = max(1, round(out_h / 108))
    tb = -(-out_h // nb)
    if w < 256:
        return tb, w
    best = None
    for nc in range(1, 5):
        tc = (-(-w // nc) + 127) // 128 * 128
        if tc < 256:
            continue
        key = (nc * tc, abs(tc - 640), tc)
        if best is None or key < best[:3]:
            best = (*key, tc)
    return tb, best[3]
_TILED_WARP = "auto"  # "auto" (TPU + big tables) | "on" (tests) | "off"
# Tile-loop unroll (scan unroll=1 == lax.map).  Measured at 1920px P15:
# unroll=8 is WORSE (b=1: 393 vs 377 ms/pair; under an outer pair-batch
# lax.map: 543 vs 422) — keep the plain sequential loop.
_TILE_UNROLL = 1


def _use_tiled_warp(pack_shape, itemsize: int) -> bool:
    if _TILED_WARP == "off":
        return False
    c4, h, w = pack_shape
    # Below ~8 MB the full-table gather is already in its fast regime
    # (tools/gather_floor.py table sweep), and the geometry needs a few
    # bands to win; window extents clamp to the table so no upper-bound
    # constraints are needed.
    big = (
        c4 * h * w * itemsize >= 8 * 2**20
        and h >= 128  # >= 4 row bands at the smallest useful tile
        and w >= 256
    )
    if _TILED_WARP == "on":
        return big
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return big and backend == "tpu"


def _gather2d_tiled(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray,
                    margin: int, chunks: int = 1, row0=0) -> jnp.ndarray:
    """``gather2d`` restricted to per-tile source windows.

    ``img``: ``(C, H, W)``; ``yi``/``xi``: int32 indices already clamped
    into range, laid out on an output grid whose row ``b`` corresponds to
    source row ``row0 + b`` (``row0`` may be traced — the sharded solver
    passes its band's global base row; 0 for whole-frame warps).  EXACT
    iff every index that matters satisfies ``|yi - (row0+row)| <= margin``
    and ``|xi - col| <= margin`` (window starts clamp at the image edges,
    which only widens one-sided coverage).  Indices outside the window
    are clipped to it — callers must not consume those outputs (the
    warp's OOB pixels are overwritten).  ``chunks`` splits the take into
    channel blocks to keep per-index slices inside the fast width window
    (wide-slice dtypes, the bicubic's 16C stencil table; values
    identical, only the gather partitioning changes).
    """
    c4, h, w = img.shape
    out_h, out_w = yi.shape
    tb, tc = _tile_plan(out_h, w)
    nb, nc = -(-out_h // tb), -(-out_w // tc)
    h_pad, w_pad = nb * tb, nc * tc
    # Window extents clamp to the table: a full-width window (tc >= w)
    # covers every column and is exact for ANY horizontal displacement.
    winr = min(tb + 2 * margin, h)
    winc = min(tc + 2 * margin, w)
    cb = c4 // chunks

    pad = ((0, h_pad - out_h), (0, w_pad - out_w))
    yip = jnp.pad(yi, pad)
    xip = jnp.pad(xi, pad)

    def one_tile(t):
        bi, ci = t // nc, t % nc
        r0, c0 = bi * tb, ci * tc
        ws = jnp.clip(row0 + r0 - margin, 0, h - winr)
        cs = jnp.clip(c0 - margin, 0, w - winc)
        window = jax.lax.dynamic_slice(img, (0, ws, cs), (c4, winr, winc))
        yb = jax.lax.dynamic_slice(yip, (r0, c0), (tb, tc))
        xb = jax.lax.dynamic_slice(xip, (r0, c0), (tb, tc))
        ly = jnp.clip(yb - ws, 0, winr - 1)
        lx = jnp.clip(xb - cs, 0, winc - 1)
        flat = window.reshape(c4, winr * winc)
        idx = (ly * winc + lx).reshape(-1)
        got = jnp.concatenate(
            [
                jnp.take(flat[k * cb:(k + 1) * cb], idx, axis=-1)
                for k in range(chunks)
            ],
            axis=0,
        ) if chunks > 1 else jnp.take(flat, idx, axis=-1)
        return got.reshape(c4, tb, tc)

    # NOTE: the windowed gather loses ~20 ms/pair when nested under an
    # outer pair-batching lax.map (422 vs 377 ms/pair at 1920px P15 b=4),
    # and scan-unrolling does NOT recover it (see _TILE_UNROLL) — batch
    # pairs by sequential dispatch instead (bench default batch=1).
    _, tiles = jax.lax.scan(
        lambda _, t: (None, one_tile(t)), None,
        jnp.arange(nb * nc), unroll=_TILE_UNROLL,
    )  # (nt, C, tb, tc)
    tiles = tiles.reshape(nb, nc, c4, tb, tc)
    return jnp.moveaxis(tiles, (0, 3, 1, 4), (1, 2, 3, 4)).reshape(
        c4, h_pad, w_pad)[:, :out_h, :out_w]


def _gather2d_chunked(img, yi, xi, chunks: int):
    """Full-table gather split into channel chunks (the r2 bicubic
    partitioning: XLA folds each chunk through pack_patch2x2's concat
    onto its shifted source)."""
    if chunks == 1:
        return gather2d(img, yi, xi)
    c4 = img.shape[0]
    cb = c4 // chunks
    return jnp.concatenate(
        [gather2d(img[k * cb:(k + 1) * cb], yi, xi) for k in range(chunks)],
        axis=0,
    )


@functools.lru_cache(maxsize=None)
def _make_adaptive_gather(chunks: int):
    """Displacement-adaptive tile-windowed gather for grid-aligned warps
    (one cached custom_vmap'd function per chunking).

    ``valid``: bool (H, W) — pixels whose gathered value is consumed
    (in-bounds warp targets).  The largest valid displacement picks the
    cheapest EXACT scheme; flows larger than the wide margin fall back to
    the full-table gather, so this is an optimization, never a semantics
    change."""

    @jax.custom_batching.custom_vmap
    def adaptive(img, yi, xi, valid):
        h, w = yi.shape
        ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        zero = jnp.zeros((), jnp.int32)
        dy = jnp.max(jnp.where(valid, jnp.abs(yi - ii), zero))
        dx = jnp.max(jnp.where(valid, jnp.abs(xi - jj), zero))
        disp = jnp.maximum(dy, dx)
        m_small, m_wide = _TILE_MARGINS
        bucket = (disp > m_small).astype(jnp.int32) + (
            disp > m_wide
        ).astype(jnp.int32)
        return jax.lax.switch(
            bucket,
            [
                # Windowed branches gather UNCHUNKED (no slice-width
                # cliff at window footprint — see _tiled_chunks); only
                # the full-table fallback needs the chunk split.
                lambda a, y, x: _gather2d_tiled(a, y, x, m_small, 1),
                lambda a, y, x: _gather2d_tiled(a, y, x, m_wide, 1),
                lambda a, y, x: _gather2d_chunked(a, y, x, chunks),
            ],
            img, yi, xi,
        )

    @adaptive.def_vmap
    def _rule(axis_size, in_batched, img, yi, xi, valid):
        # Unroll per batch element: vmap of lax.switch would execute ALL
        # branches per element (select semantics), and vmap of jnp.take
        # reintroduces the faulting multi-dim gather (see _gather2d_vmap).
        def at(z, batched, i):
            return z[i] if batched else z

        ib, yb, xb, vb = in_batched
        outs = [
            adaptive(
                at(img, ib, i), at(yi, yb, i), at(xi, xb, i),
                at(valid, vb, i),
            )
            for i in range(axis_size)
        ]
        return jnp.stack(outs), True

    return adaptive


def gather2d_band_adaptive(img, yi, xi, valid, row0, chunks: int = 1):
    """Displacement-adaptive tiled gather for a ROW BAND of a full-frame
    table (the sharded solver's per-shard warp): output row ``b`` samples
    around global source row ``row0 + b`` (``row0`` traced — typically
    ``shard_index * band_rows``).  Without tiling, each shard's gather
    pays the FULL-frame footprint cost even though it only produces a
    band — the same ~3x the single-chip warp recovered.  The displacement
    bound uses the CONTIGUOUS expected rows, so a band's clamp-replicated
    ghost tail (a few rows) just adds its overshoot to ``disp`` — still
    exact, escalating the bucket only if it exceeds the margin.  No
    custom_vmap (the sharded path maps pairs with ``lax.map``, never
    ``vmap``)."""
    hb, w = yi.shape
    ii = row0 + jax.lax.broadcasted_iota(jnp.int32, (hb, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 1)
    zero = jnp.zeros((), jnp.int32)
    dy = jnp.max(jnp.where(valid, jnp.abs(yi - ii), zero))
    dx = jnp.max(jnp.where(valid, jnp.abs(xi - jj), zero))
    disp = jnp.maximum(dy, dx)
    m_small, m_wide = _TILE_MARGINS
    bucket = (disp > m_small).astype(jnp.int32) + (
        disp > m_wide
    ).astype(jnp.int32)
    return jax.lax.switch(
        bucket,
        [
            # Unchunked inside windows; chunked only at full table
            # (see _tiled_chunks).
            lambda a, y, x: _gather2d_tiled(a, y, x, m_small, 1, row0),
            lambda a, y, x: _gather2d_tiled(a, y, x, m_wide, 1, row0),
            lambda a, y, x: _gather2d_chunked(a, y, x, chunks),
        ],
        img, yi, xi,
    )


def bilinear_gather_packed_warp(
    pack: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, valid: jnp.ndarray,
    chunks: int = 1,
) -> jnp.ndarray:
    """``bilinear_gather_packed`` for grid-aligned warps on big tables:
    the patch gather goes through the displacement-adaptive tiled scheme.
    Bit-identical to the plain path for every ``valid`` pixel."""
    h, w = pack.shape[-2], pack.shape[-1]
    c = pack.shape[-3] // 4
    dtype = pack.dtype
    xx = jnp.trunc(x)
    yy = jnp.trunc(y)
    fx = jnp.clip((x - xx).astype(dtype), 0, 1)
    fy = jnp.clip((y - yy).astype(dtype), 0, 1)
    x0 = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
    patch = _make_adaptive_gather(chunks)(pack, y0, x0, valid)
    v00 = patch[0 * c: 1 * c]
    v10 = patch[1 * c: 2 * c]
    v01 = patch[2 * c: 3 * c]
    v11 = patch[3 * c: 4 * c]
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


# --- Pallas VPU warp (round 4) -------------------------------------------
#
# The serial gather unit costs ~2-3 ns/INDEX no matter how the windows are
# tiled; the Mosaic kernel in ops/pallas/warp.py resolves the same warp
# with within-vreg lane gathers (~3 cycles per (8,128) vreg) and replaces
# the whole sampled computation (gather + bilinear combine + OOB fill) at
# the big pyramid levels.  "auto" = TPU only; "on" forces admission (CPU
# tests run it with pallas interpret mode); "off" restores the r3 path.
_PALLAS_WARP = "auto"
# Admission floor: below ~2 MB tables the serial full-table gather is
# already in its fast regime and level times are dominated by SOR; the
# kernel also needs enough rows for its margin window.
_PALLAS_WARP_MIN_BYTES = 2 * 2**20
# Row-window margins of the Pallas warp bucket.  The margin costs ONLY
# window DMA bytes + the per-strip f32 up-convert (the candidate loop is
# data-bounded), so it is sized for real data, not the common case: a
# 60-pair 1920px sweep measures per-pair max flows of 36-201 px (p50
# ~55), and a missed bucket silently costs the whole serial-gather warp
# (~3x).  The bilinear kernel (C feature channels) affords 96; the
# bicubic one holds 12 window planes, so its VMEM caps the margin at 64.
# Beyond the margin the serial fallback still guarantees exactness.
# Margin LADDER: the window up-convert scales with the margin (measured
# on the recorded oracle flow: 1.70 ms/warp at 64 vs 2.26 at 96 for the
# L0 bilinear), so the common case runs the tight kernel and only pairs
# that actually need it pay for the wide one.  The r5 128 rung exists
# because real 1920px pairs reach ~205 px flows with within-strip spread
# beyond spread_margin_for(96) = 200 (moving-object boundaries put both
# ~0 and ~205 px displacements inside one 32-row strip) — the r5 grid's
# one 525 ms outlier was exactly such a pair on the serial fallback.
# Wide rungs (> 96) sit near the VMEM ceiling at full-res shapes, so
# they are probe-compile gated per static config (_probe_wide_margin).
_PALLAS_MARGINS = (64, 96, 128)
_PALLAS_MARGIN_BICUBIC = 128


_WIDE_MARGIN_PROBES: dict = {}


def _probe_wide_margin(kind: str, shapes, margin: int) -> bool:
    """AOT-compile gate for wide (> 96 px) warp-window rungs (same
    pattern as ``models/solver._probe_fused_level``): their window DMA
    buffers approach the VMEM ceiling at full-resolution shapes and
    Mosaic admission is toolchain-calibrated, so the first use of a
    static config compiles the kernel outside the enclosing jit and the
    rung is silently dropped from the ladder on rejection.

    ``shapes``: tuple of ``(shape, dtype)`` pairs matching the kernel's
    array arguments minus ``margin``/``dymin``."""
    from .pallas import warp as pw

    if pw._INTERPRET:
        return True
    key = (kind, tuple((s, jnp.dtype(d).str) for s, d in shapes), margin)
    hit = _WIDE_MARGIN_PROBES.get(key)
    if hit is not None:
        return hit
    try:
        h = shapes[0][0][-2]
        ns = -(-h // pw.TB)
        avals = [jax.ShapeDtypeStruct(s, d) for s, d in shapes]
        mn = jax.ShapeDtypeStruct((ns,), jnp.int32)
        if kind == "bilinear":
            fn = lambda a, b, x, y, m0: pw.warp_bilinear_pallas(  # noqa: E731
                a, b, x, y, margin=margin, dymin=m0
            )
        else:
            fn = lambda r, s4, x, y, m0: pw.warp_bicubic_pallas(  # noqa: E731
                r, s4, x, y, margin=margin, dymin=m0
            )
        jax.jit(fn).lower(*avals, mn).compile()
        ok = True
    except Exception:  # noqa: BLE001
        ok = False
    _WIDE_MARGIN_PROBES[key] = ok
    return ok


def _pallas_margins_for(h: int, cap: int | None = None):
    """Ascending usable row margins for an image of height ``h`` (the
    smallest ladder rung that fits is always included so small levels
    keep the kernel)."""
    from .pallas.warp import _wrc

    out = [
        m for m in _PALLAS_MARGINS
        if (cap is None or m <= cap) and h >= _wrc(m)
    ]
    if not out and h >= _wrc(_TILE_MARGINS[0]):
        out = [_TILE_MARGINS[0]]
    return tuple(out)


def _use_pallas_warp(img: jnp.ndarray) -> bool:
    if _PALLAS_WARP == "off" or img.ndim != 3:
        return False
    if img.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    c, h, w = img.shape
    from .pallas.warp import _wrc

    big = (
        c * h * w * jnp.dtype(img.dtype).itemsize >= _PALLAS_WARP_MIN_BYTES
        and h >= _wrc(_TILE_MARGINS[0])
        and w >= 128
    )
    if not big:
        return False
    if _PALLAS_WARP == "on":
        return True
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu"


def _strip_dy_fields(oob, y0, h: int, w: int):
    """Per-strip displacement anchors for the REBASED warp windows
    (round 5): ``mn0[s] = min(trunc(y) - i)`` over strip ``s``'s in-bounds
    pixels and the worst within-strip spread ``max(y1 - i) - mn0``.
    OOB pixels are neutralized to 0 (their accumulate is discarded)."""
    from .pallas.warp import TB

    ns = -(-h // TB)
    zero = jnp.zeros((), jnp.int32)
    i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    r0 = jnp.where(oob, zero, y0 - i)
    r1 = jnp.where(oob, zero, jnp.clip(y0 + 1, 0, h - 1) - i)
    hp = ns * TB
    if hp != h:
        r0 = jnp.pad(r0, ((0, hp - h), (0, 0)))
        r1 = jnp.pad(r1, ((0, hp - h), (0, 0)))
    mn0 = r0.reshape(ns, TB, w).min(axis=(1, 2))
    mx1 = r1.reshape(ns, TB, w).max(axis=(1, 2))
    return mn0, jnp.max(mx1 - mn0)


@jax.custom_batching.custom_vmap
def _warp_pallas_adaptive(im1, im2, vx, vy):
    """Displacement-adaptive full warp via the Pallas VPU kernel.

    Round 5: windows are REBASED per strip (anchored at each strip's
    measured displacement floor, ``warp.py _scalar_rows``), so the kernel
    is exact iff every strip's within-strip vertical displacement SPREAD
    fits the window (``spread_margin_for``) — any uniform flow magnitude
    is covered, and the serial fallback fires only for strips whose
    displacements themselves span > ~136 px (unseen on real data; the r4
    magnitude-based ladder sent every > 96 px pair to the ~3x serial
    path).  The bound is measured on device; the fallback is an
    optimization switch, never a semantics change.  (bf16 note: both
    branches are valid warps but round differently — the kernel
    accumulates in f32, within 1 bf16 ulp of the serial path and ~2x
    closer to the f64 truth.)"""
    from .pallas.warp import spread_margin_for, warp_bilinear_pallas

    h, w = im2.shape[-2], im2.shape[-1]
    ftype = jnp.float32
    vxf = vx.astype(ftype)
    vyf = vy.astype(ftype)
    j = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    x = jnp.arange(w, dtype=ftype)[None, :] + vxf
    y = jnp.arange(h, dtype=ftype)[:, None] + vyf
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    y0 = jnp.clip(jnp.trunc(y).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.trunc(x).astype(jnp.int32), 0, w - 1)
    zero = jnp.zeros((), jnp.int32)
    mn0, spread = _strip_dy_fields(oob, y0, h, w)
    # The kernel's 5-aligned-block column decomposition is exact only for
    # horizontal integer displacements within two blocks (|x0 - j| <=
    # 255) — independent of the row margin.
    dx = jnp.max(jnp.where(oob, zero, jnp.abs(x0 - j)))
    margins = tuple(
        m for m in _pallas_margins_for(h)
        if m <= 96 or _probe_wide_margin(
            "bilinear",
            ((im1.shape, im1.dtype), (im2.shape, im2.dtype),
             ((h, w), jnp.float32), ((h, w), jnp.float32)),
            m,
        )
    )
    bucket = sum(
        (spread > spread_margin_for(m)).astype(jnp.int32) for m in margins
    )
    bucket = jnp.where(dx > 255, len(margins), bucket)

    def pallas_branch(m):
        def f(im1, im2, vxf, vyf, mn0):
            return warp_bilinear_pallas(
                im1, im2, vxf, vyf, margin=m, dymin=mn0
            )

        return f

    def serial_branch(im1, im2, vxf, vyf, mn0):
        xx = jnp.arange(w, dtype=ftype)[None, :] + vxf
        yy = jnp.arange(h, dtype=ftype)[:, None] + vyf
        bad = (xx < 0) | (xx > w - 1) | (yy < 0) | (yy > h - 1)
        return jnp.where(bad, im1, bilinear_gather(im2, xx, yy))

    return jax.lax.switch(
        bucket,
        [pallas_branch(m) for m in margins] + [serial_branch],
        im1, im2, vxf, vyf, mn0,
    )


@_warp_pallas_adaptive.def_vmap
def _warp_pallas_vmap(axis_size, in_batched, im1, im2, vx, vy):
    # Unroll per batch element: vmap of lax.switch runs ALL branches per
    # element, and pallas_call does not batch (same pattern as
    # _make_adaptive_gather).
    def at(z, batched, i):
        return z[i] if batched else z

    b1, b2, bx, by = in_batched
    outs = [
        _warp_pallas_adaptive(
            at(im1, b1, i), at(im2, b2, i), at(vx, bx, i), at(vy, by, i)
        )
        for i in range(axis_size)
    ]
    return jnp.stack(outs), True


def should_pack_warp(img: jnp.ndarray) -> bool:
    """Gather-scheme policy for the backward warp, measured on v5e at
    1080x1920: TPU gather throughput collapses once the per-index slice
    exceeds ~48 bytes (f32 5-channel patch pack = 80 B/idx: 67 ms device
    vs 41 ms for four corner gathers of the unpacked 5-ch table; bf16
    pack = 40 B/idx: 20 ms, the fastest variant found).  Pack when the
    4C-channel patch slice stays within that window."""
    c = 1 if img.ndim == 2 else img.shape[-3]
    return 4 * c * jnp.dtype(img.dtype).itemsize <= 48


def _tiled_chunks(c4: int, itemsize: int) -> int:
    """Channel-chunking for the FULL-TABLE fallback branch only: big-table
    gathers cliff above ~48 B/slice, so wide slices split into 2 or 4
    chunks there (the r2 scheme).  Inside the tiled windows the cliff
    does not exist — measured at 1080x1920 window scale: one 96 B take
    9.2 ms vs 4x24 B 24.8 ms; one 192 B take 12.9 ms vs 4x48 B 31.2 ms —
    so the windowed branches always gather unchunked."""
    for chunks in (1, 2, 4):
        if c4 % chunks == 0 and c4 * itemsize // chunks <= 48:
            return chunks
    return 4


def should_prebuild_pack(img: jnp.ndarray) -> bool:
    """Whether a caller that warps the same frame repeatedly should build
    ``pack_patch2x2`` once: either the packed slice is narrow enough for
    the full-table gather (``should_pack_warp``), or the table is big
    enough that the tile-windowed scheme applies (where wide slices are
    gathered in narrow chunks).  When the Pallas VPU warp handles the
    level, no pack is needed at all (the kernel gathers the raw planes;
    its rare violent-flow fallback uses the packless 4-corner gather)."""
    if _use_pallas_warp(img):
        return False
    if should_pack_warp(img):
        return True
    c = 1 if img.ndim == 2 else img.shape[-3]
    h, w = img.shape[-2], img.shape[-1]
    return _use_tiled_warp((4 * c, h, w), jnp.dtype(img.dtype).itemsize)


def warp_bilinear(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    vx: jnp.ndarray,
    vy: jnp.ndarray,
    im2_pack: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Backward warp of frame 2 by flow ``(vx, vy)``; out-of-bounds targets
    copy the frame-1 pixel (``ImageProcessing.h:495-520`` ``warpImage``).

    ``im1``, ``im2``: ``(..., H, W)``; ``vx``, ``vy``: ``(H, W)``.
    ``im2_pack``: optional precomputed ``pack_patch2x2(im2)`` — callers that
    warp the same frame repeatedly (the fixed-point loop) should build it
    once WHEN ``should_pack_warp`` says so; with wide f32 slices the
    4-corner unpacked gather is faster (see ``should_pack_warp``).  Both
    schemes produce bit-identical values (the packed shifts pre-apply the
    same corner clamping).
    """
    # Pallas VPU warp (round 4): replaces the whole sampled computation
    # (gathers + bilinear combine + OOB fill) on TPU at the big levels.
    if vx.ndim == 2 and im1.shape == im2.shape and _use_pallas_warp(im2):
        return _warp_pallas_adaptive(im1, im2, vx, vy)
    h, w = im2.shape[-2], im2.shape[-1]
    ftype = im2.dtype if im2.dtype in (jnp.float32, jnp.float64) else jnp.float32
    j = jnp.arange(w, dtype=ftype)
    i = jnp.arange(h, dtype=ftype)
    x = j[None, :] + vx.astype(ftype)
    y = i[:, None] + vy.astype(ftype)
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    if im2_pack is None and should_prebuild_pack(im2):
        im2_pack = pack_patch2x2(im2)
    if im2_pack is not None:
        itemsize = jnp.dtype(im2_pack.dtype).itemsize
        if _use_tiled_warp(im2_pack.shape, itemsize):
            sampled = bilinear_gather_packed_warp(
                im2_pack, x, y, ~oob,
                chunks=_tiled_chunks(im2_pack.shape[-3], itemsize),
            )
        elif should_pack_warp(im2):
            sampled = bilinear_gather_packed(im2_pack, x, y)
        else:
            # Wide slices, small table: four corner gathers beat the pack.
            sampled = bilinear_gather(im2, x, y)
        if im2.ndim == 2 and sampled.ndim == 3:
            sampled = sampled[0]
    else:
        sampled = bilinear_gather(im2, x, y)
    return jnp.where(oob, im1, sampled)
