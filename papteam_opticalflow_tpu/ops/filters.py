"""Separable clamp-boundary stencil filters.

TPU-native re-implementation of the reference's 1-D correlation filters
(``Code/Parallel/src/ImageProcessing.h:262-287`` ``hfiltering``,
``:357-382`` ``vfiltering``) and image derivatives
(``Code/Parallel/src/Image.h:969-1059`` ``dx``/``dy``).

Layout: arrays are channels-first ``(..., H, W)`` so that the image width
rides the 128-wide TPU vector lanes.  The reference stores interleaved
``(H, W, C)`` C++ buffers; converting at the API boundary keeps every inner
kernel densely vectorizable on the VPU.

Boundary semantics: the reference clamps sample coordinates into range via
``EnforceRange`` (``ImageProcessing.h:34``), i.e. edge-replicate padding.
We reproduce this with an explicit edge pad followed by a shifted-slice
weighted sum, which XLA fuses into a single vectorized loop over the image.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def correlate1d(x: jnp.ndarray, taps: Sequence[float], axis: int) -> jnp.ndarray:
    """Clamp-boundary 1-D correlation along ``axis``.

    Equivalent to ``hfiltering`` (axis=-1) / ``vfiltering`` (axis=-2) of
    ``ImageProcessing.h``: ``out[j] = sum_l taps[l+f] * x[clamp(j+l)]`` for
    ``l in [-f, f]`` with ``f = (len(taps)-1)//2``.
    """
    taps = np.asarray(taps, dtype=np.float64)
    fsize = (len(taps) - 1) // 2
    if fsize == 0:
        return x * x.dtype.type(taps[0])
    axis = axis % x.ndim
    pad = [(0, 0)] * x.ndim
    pad[axis] = (fsize, fsize)
    xp = jnp.pad(x, pad, mode="edge")
    n = x.shape[axis]
    out = None
    for l, w in enumerate(taps):
        if w == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(l, l + n)
        term = xp[tuple(sl)] * x.dtype.type(w)
        out = term if out is None else out + term
    return out


def correlate_hv(
    x: jnp.ndarray, htaps: Sequence[float], vtaps: Sequence[float]
) -> jnp.ndarray:
    """Separable horizontal-then-vertical pass (``Image.h:1357-1366``
    ``imfilter_hv``)."""
    return correlate1d(correlate1d(x, htaps, axis=-1), vtaps, axis=-2)


def correlate1d_valid(x: jnp.ndarray, taps: Sequence[float], axis: int) -> jnp.ndarray:
    """'Valid'-mode 1-D correlation: no padding, output shrinks by
    ``2 * fsize`` along ``axis``.  Used by the row-sharded (halo-band)
    pipeline where the clamp padding has already been materialized in the
    band (``parallel/tiled.py``)."""
    taps = np.asarray(taps, dtype=np.float64)
    fsize = (len(taps) - 1) // 2
    if fsize == 0:
        return x * x.dtype.type(taps[0])
    axis = axis % x.ndim
    n = x.shape[axis] - 2 * fsize
    out = None
    for l, w in enumerate(taps):
        if w == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(l, l + n)
        term = x[tuple(sl)] * x.dtype.type(w)
        out = term if out is None else out + term
    return out


# 5-tap derivative filter of the reference: [1,-8,0,8,-1]/12
# (``Image.h:994-997`` for dx, ``:1042-1045`` for dy).
DERIVATIVE_5TAP = tuple(np.array([1.0, -8.0, 0.0, 8.0, -1.0]) / 12.0)

# 5-tap pre-smoothing filter used by getDxs (``OpticalFlow.cpp:84``).
PRESMOOTH_5TAP = (0.02, 0.11, 0.74, 0.11, 0.02)

# 3-tap central difference used by the bicubic warp's derivative images
# (``Image.h:2652`` dfilter = {-0.5, 0, 0.5}).
CENTRAL_DIFF_3TAP = (-0.5, 0.0, 0.5)


def dx_forward(x: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along width; last column is zero
    (``Image.h:979-991``)."""
    d = x[..., :, 1:] - x[..., :, :-1]
    return jnp.pad(d, [(0, 0)] * (x.ndim - 1) + [(0, 1)])


def dy_forward(x: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along height; last row is zero
    (``Image.h:1027-1039``)."""
    d = x[..., 1:, :] - x[..., :-1, :]
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, 1)
    return jnp.pad(d, pad)


def dx_5tap(x: jnp.ndarray) -> jnp.ndarray:
    """5-tap x-derivative with clamp boundary (``Image.h:994-997``)."""
    return correlate1d(x, DERIVATIVE_5TAP, axis=-1)


def dy_5tap(x: jnp.ndarray) -> jnp.ndarray:
    """5-tap y-derivative with clamp boundary (``Image.h:1042-1045``)."""
    return correlate1d(x, DERIVATIVE_5TAP, axis=-2)


def dxx(x: jnp.ndarray) -> jnp.ndarray:
    """Negated second x-derivative ``2 x[j] - x[j-1] - x[j+1]`` with the
    reference's border cases (``Image.h:1066-1108``: first/last column use the
    single interior neighbor).  Equivalent to clamp-boundary correlation with
    ``[-1, 2, -1]``."""
    return correlate1d(x, (-1.0, 2.0, -1.0), axis=-1)


def dyy(x: jnp.ndarray) -> jnp.ndarray:
    """Negated second y-derivative (``Image.h:1112-1155``)."""
    return correlate1d(x, (-1.0, 2.0, -1.0), axis=-2)


def laplacian_4n(x: jnp.ndarray) -> jnp.ndarray:
    """Unweighted negated 4-neighbor Laplacian with the reference's explicit
    corner (2 neighbors) and border (3 neighbors) cases
    (``ImageProcessing::Laplacian``, ``ImageProcessing.h:317-351``), which
    coincide with the clamp-boundary sum of the two 1-D second differences.
    Unused on the flow hot path (the weighted variant in ops/laplacian.py is);
    provided for ``Image::laplacian`` parity (``Image.h:1161-1166``)."""
    return dxx(x) + dyy(x)


def gradientmag(x: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel gradient magnitude ``sqrt(sum_c Ix^2 + Iy^2)`` over channels
    using the 5-tap derivatives (``Image.h:1175-1199``).  ``x``: ``(C, H, W)``
    or ``(H, W)``; returns ``(H, W)``."""
    ix = dx_5tap(x)
    iy = dy_5tap(x)
    mag2 = ix * ix + iy * iy
    if x.ndim > 2:
        mag2 = mag2.sum(axis=-3)
    return jnp.sqrt(mag2)


def filter2d(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """Dense 2-D clamp-boundary correlation with an odd ``(2f+1, 2f+1)``
    kernel (``ImageProcessing::filtering``, ``ImageProcessing.h:414-442``).
    Backs ``Image::imfilter`` / ``Image::smoothing``."""
    kernel = np.asarray(kernel, dtype=np.float64)
    fsize = (kernel.shape[0] - 1) // 2
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(fsize, fsize), (fsize, fsize)]
    xp = jnp.pad(x, pad, mode="edge")
    out = None
    for di in range(kernel.shape[0]):
        for dj in range(kernel.shape[1]):
            wgt = kernel[di, dj]
            if wgt == 0.0:
                continue
            term = xp[..., di : di + h, dj : dj + w] * x.dtype.type(wgt)
            out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(x)


def correlate1d_adjoint(y: jnp.ndarray, taps: Sequence[float], axis: int) -> jnp.ndarray:
    """Scatter-add adjoint of ``correlate1d`` — the reference's
    ``hfiltering_transpose`` (axis=-1) / ``vfiltering_transpose`` (axis=-2)
    (``ImageProcessing.h:292-313, 387-408``).  In JAX the adjoint IS the
    linear transpose of the forward stencil, so it is derived rather than
    hand-written — border scatter semantics match by construction."""
    fwd = lambda x: correlate1d(x, taps, axis)  # noqa: E731
    (out,) = jax.linear_transpose(fwd, jnp.zeros_like(y))(y)
    return out


def filter2d_adjoint(y: jnp.ndarray, kernel) -> jnp.ndarray:
    """Adjoint of ``filter2d`` (``ImageProcessing::filtering_transpose``,
    ``ImageProcessing.h:444-468``), via ``jax.linear_transpose``."""
    fwd = lambda x: filter2d(x, kernel)  # noqa: E731
    (out,) = jax.linear_transpose(fwd, jnp.zeros_like(y))(y)
    return out


def gaussian_taps(sigma: float, fsize: int) -> np.ndarray:
    """Normalized 1-D Gaussian window, reference construction
    (``Image.h:1213-1229``): ``exp(-i^2 / (2 sigma^2))`` for
    ``i in [-fsize, fsize]``, normalized to sum 1.

    Note the reference passes ``fsize`` through an ``int`` parameter, so the
    caller-side ``sigma * 3`` truncates toward zero — callers must do that
    truncation themselves (see pyramid builder).
    """
    if fsize <= 0:
        return np.array([1.0])
    i = np.arange(-fsize, fsize + 1, dtype=np.float64)
    g = np.exp(-(i * i) / (2.0 * sigma * sigma))
    return g / g.sum()


def gaussian_smooth(x: jnp.ndarray, sigma: float, fsize: int) -> jnp.ndarray:
    """Separable Gaussian smoothing (``Image.h:1213-1233``)."""
    taps = gaussian_taps(sigma, fsize)
    return correlate_hv(x, taps, taps)
