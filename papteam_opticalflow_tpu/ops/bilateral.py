"""Bilateral filtering.

TPU-native re-implementation of ``Image<T>::imBilateralFiltering``
(``Code/Parallel/src/Image.h:2239-2295``) and the guided/joint variant
``Image<T>::BilateralFiltering`` (``:2185-2236``): a ``(2f+1)^2`` window
whose per-pixel weights are the product of a fixed spatial Gaussian
``exp(-(di^2+dj^2)/(2 sigma_s^2))`` and a range Gaussian on the *guide*
image's channel-squared difference ``exp(-||g[p+d] - g[p]||^2 /
(2 sigma_r^2))``.  Window taps that fall outside the image are skipped
(zero weight — NOT clamped), matching the reference's ``continue``.

Instead of the reference's per-pixel scan, the window is unrolled at trace
time into shifted-slice terms that XLA fuses into one vectorized pass —
O((2f+1)^2) fused elementwise ops, no gather.

Note: the reference's guided ``BilateralFiltering`` has an output-indexing
bug (``Image.h:2232`` writes channel 0 only, dropping ``+k``); this
implementation uses the evident intent (all channels written).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _shifted(x: jnp.ndarray, di: int, dj: int):
    """``x`` translated by (di, dj) with zeros shifted in, plus the validity
    mask of in-bounds source taps."""
    h, w = x.shape[-2], x.shape[-1]
    ys = slice(max(di, 0), h + min(di, 0))
    xs = slice(max(dj, 0), w + min(dj, 0))
    yd = slice(max(-di, 0), h + min(-di, 0))
    xd = slice(max(-dj, 0), w + min(-dj, 0))
    out = jnp.zeros_like(x)
    out = out.at[..., yd, xd].set(x[..., ys, xs])
    mask = np.zeros((h, w), dtype=bool)
    mask[yd, xd] = True
    return out, mask


def bilateral_filter(
    img: jnp.ndarray,
    fsize: int,
    filter_sigma: float,
    range_sigma: float,
    guide: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilateral-filter ``img`` (``(C, H, W)`` or ``(H, W)``).

    ``guide=None`` is the self-guided ``imBilateralFiltering``; passing a
    guide reproduces the joint ``BilateralFiltering(other, ...)`` where the
    range weights come from the guide and the values from ``img``.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    g = img if guide is None else (guide[None] if guide.ndim == 2 else guide)
    t = img.dtype.type
    inv2sr = t(1.0 / (2.0 * range_sigma * range_sigma))

    num = jnp.zeros_like(img)
    den = jnp.zeros(img.shape[-2:], img.dtype)
    for di in range(-fsize, fsize + 1):
        for dj in range(-fsize, fsize + 1):
            spatial = t(
                np.exp(-(di * di + dj * dj) / (2.0 * filter_sigma * filter_sigma))
            )
            g_shift, mask = _shifted(g, di, dj)
            v_shift, _ = _shifted(img, di, dj)
            diff2 = jnp.sum((g_shift - g) ** 2, axis=-3)
            wgt = spatial * jnp.exp(-diff2 * inv2sr)
            wgt = jnp.where(jnp.asarray(mask), wgt, t(0.0))
            num = num + v_shift * wgt[None]
            den = den + wgt
    out = num / den[None]
    return out[0] if squeeze else out
