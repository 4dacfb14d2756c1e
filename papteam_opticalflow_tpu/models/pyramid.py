"""Gaussian pyramid with the reference's incremental-smoothing schedule.

Reproduces ``GaussianPyramid::ConstructPyramidLevels``
(``Code/Parallel/src/GaussianPyramid.cpp:79-108``):

* ``ratio`` outside ``[0.4, 0.98]`` resets to 0.75;
* level 0 is the input;
* ``baseSigma = 1/ratio - 1``; ``n = int(log(0.25)/log(ratio))``;
* level ``i <= n``: smooth the ORIGINAL with ``sigma = baseSigma * i`` and
  window ``fsize = int(sigma * 3)`` (C++ int-parameter truncation), then
  ratio-resize by ``ratio**i``;
* level ``i > n``: smooth level ``i - n`` with ``sigma = n * baseSigma`` and
  resize by ``rate = ratio**i * W0 / W(i-n)``.

Every level shape is a pure function of ``(H0, W0, ratio, n_levels)`` and is
precomputed host-side (`pyramid_shapes`) so each level traces and compiles
with static shapes.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ..ops.filters import gaussian_smooth
from ..ops.interp import resize_by_ratio, resize_to


def clamp_ratio(ratio: float) -> float:
    """``GaussianPyramid.cpp:81-83``."""
    if ratio > 0.98 or ratio < 0.4:
        return 0.75
    return ratio


def _pyramid_plan(h0: int, w0: int, ratio: float, n_levels: int):
    """Host-side schedule: for each level, (sigma, fsize, src_level, rate,
    dst_h, dst_w).  All floating arithmetic in Python doubles, mirroring the
    C++ double expressions so truncated sizes match exactly."""
    ratio = clamp_ratio(ratio)
    base_sigma = 1.0 / ratio - 1.0
    import math

    n = int(math.log(0.25) / math.log(ratio))
    n_sigma = base_sigma * n
    plan = [dict(sigma=0.0, fsize=0, src=0, rate=1.0, h=h0, w=w0)]
    for i in range(1, n_levels):
        if i <= n:
            sigma = base_sigma * i
            rate = ratio**i
            src = 0
            src_h, src_w = h0, w0
        else:
            sigma = n_sigma
            src = i - n
            src_h, src_w = plan[src]["h"], plan[src]["w"]
            rate = (ratio**i) * float(w0) / float(src_w)
        dst_h = int(float(src_h) * rate)
        dst_w = int(float(src_w) * rate)
        plan.append(
            dict(sigma=sigma, fsize=int(sigma * 3), src=src, rate=rate, h=dst_h, w=dst_w)
        )
    return plan


def pyramid_shapes(
    h0: int, w0: int, ratio: float, n_levels: int
) -> List[Tuple[int, int]]:
    """Static (H, W) of every pyramid level, finest (0) first."""
    return [(p["h"], p["w"]) for p in _pyramid_plan(h0, w0, ratio, n_levels)]


def n_levels_for_min_width(w0: int, ratio: float, min_width: int) -> int:
    """Level count of the minWidth-driven builder
    (``GaussianPyramid::ConstructPyramid``, ``GaussianPyramid.cpp:47-77``):
    ``nLevels = int(log(minWidth / width) / log(ratio))`` (C double->int
    truncation).  Not used by the PAP benchmark entry point, provided for
    API parity."""
    import math

    ratio = clamp_ratio(ratio)
    return int(math.log(float(min_width) / w0) / math.log(ratio))


def build_pyramid_min_width(
    image: jnp.ndarray, ratio: float, min_width: int
) -> List[jnp.ndarray]:
    """``ConstructPyramid(image, ratio, minWidth)`` equivalent."""
    n = n_levels_for_min_width(image.shape[-1], ratio, min_width)
    return build_pyramid(image, ratio, max(n, 1))


def build_pyramid(
    image: jnp.ndarray, ratio: float, n_levels: int
) -> List[jnp.ndarray]:
    """Construct the pyramid of a ``(C, H, W)`` image; traceable under jit
    (all shapes static).  Returns ``n_levels`` arrays, level 0 = input."""
    h0, w0 = image.shape[-2], image.shape[-1]
    plan = _pyramid_plan(h0, w0, ratio, n_levels)
    levels = [image]
    for i in range(1, n_levels):
        p = plan[i]
        src = image if p["src"] == 0 else levels[p["src"]]
        foo = gaussian_smooth(src, p["sigma"], p["fsize"])
        # ResizeImage's ratio-driven grid: x = (j+1)/rate - 1 with dst size
        # int(src * rate) (ImageProcessing.h:213-236).
        resized = resize_by_ratio(foo, p["rate"])
        assert resized.shape[-2:] == (p["h"], p["w"])
        levels.append(resized)
    return levels
