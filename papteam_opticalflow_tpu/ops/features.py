"""Feature lifting and spatio-temporal derivatives.

Reproduces ``OpticalFlow::im2feature`` (``Code/Parallel/src/OpticalFlow.cpp:
1000-1053``), ``Image<T>::desaturate`` (``Image.h:1471-1489``) and
``OpticalFlow::getDxs`` (``OpticalFlow.cpp:80-122``) as fused jitted ops on
channels-first ``(C, H, W)`` arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.params import ColorType
from .filters import (
    PRESMOOTH_5TAP,
    correlate_hv,
    dx_5tap,
    dy_5tap,
)


def desaturate(im: jnp.ndarray, color_type: ColorType = ColorType.RGB) -> jnp.ndarray:
    """Rec.601 grayscale of a ``(3, H, W)`` image (``Image.h:1482-1489``).

    RGB: ``0.299 R + 0.587 G + 0.114 B``; BGR reverses the outer weights.
    """
    r, g, b = im[0], im[1], im[2]
    if color_type == ColorType.BGR:
        r, b = b, r
    t = im.dtype.type
    return r * t(0.299) + g * t(0.587) + b * t(0.114)


def im2feature(im: jnp.ndarray, color_type: ColorType = ColorType.RGB) -> jnp.ndarray:
    """Lift an image to the feature stack used by the solver
    (``OpticalFlow.cpp:1000-1053``).

    * 1 channel  -> 3: ``(I, dx5(I), dy5(I))``
    * 3 channels -> 5: ``(gray, dx5(gray), dy5(gray), G - R, G - B)``
      (chroma channels at ``OpticalFlow.cpp:1043-1044``, on the raw image in
      its stored channel order)
    * otherwise passthrough.

    Input/output are channels-first ``(C, H, W)``.
    """
    c = im.shape[0]
    if c == 1:
        g = im[0]
        return jnp.stack([g, dx_5tap(g), dy_5tap(g)], axis=0)
    if c == 3:
        gray = desaturate(im, color_type)
        # The chroma terms index raw stored channels: data[1]-data[0] and
        # data[1]-data[2] regardless of color tag (OpticalFlow.cpp:1043-1044).
        return jnp.stack(
            [gray, dx_5tap(gray), dy_5tap(gray), im[1] - im[0], im[1] - im[2]],
            axis=0,
        )
    return im


def get_dxs(im1: jnp.ndarray, im2: jnp.ndarray):
    """Spatio-temporal derivatives for the data term
    (``OpticalFlow.cpp:80-122``).

    Pre-smooth both frames with the 5-tap ``(0.02, 0.11, 0.74, 0.11, 0.02)``
    window, blend ``Im = 0.4 * Im1s + 0.6 * Im2s``, then 5-tap derivatives of
    the blend and temporal difference ``imdt = Im2s - Im1s``.

    Returns ``(imdx, imdy, imdt)`` with the input ``(C, H, W)`` shape.
    """
    return get_dxs_presmoothed(presmooth_frame(im1), im2)


def presmooth_frame(im: jnp.ndarray) -> jnp.ndarray:
    """The 5-tap pre-smooth of ``getDxs`` applied to one frame.  Frame 1's
    features are loop-invariant across the outer fixed-point iterations
    (only ``warpIm2`` changes), so callers hoist this out of the loop —
    values identical, ~40% of getDxs saved per iteration."""
    # bf16 image path: the temporal difference is a small difference of
    # O(0.5) intensities — catastrophic in bf16 — so the derivatives are
    # always computed in >= float32 (inputs may still be stored bf16).
    ftype = im.dtype if im.dtype in (jnp.float32, jnp.float64) else jnp.float32
    return correlate_hv(im.astype(ftype), PRESMOOTH_5TAP, PRESMOOTH_5TAP)


def get_dxs_presmoothed(im1s: jnp.ndarray, im2: jnp.ndarray):
    """``get_dxs`` with frame 1 already pre-smoothed (``presmooth_frame``)."""
    ftype = im1s.dtype
    t = ftype.type if hasattr(ftype, "type") else ftype
    im2s = correlate_hv(im2.astype(ftype), PRESMOOTH_5TAP, PRESMOOTH_5TAP)
    blend = im1s * t(0.4) + im2s * t(0.6)
    imdx = dx_5tap(blend)
    imdy = dy_5tap(blend)
    imdt = im2s - im1s
    return imdx, imdy, imdt
