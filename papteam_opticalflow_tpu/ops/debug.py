"""Debug/diagnostic ops mirroring the reference's latent checks.

* ``gen_in_image_mask`` — ``OpticalFlow::genInImageMask``
  (``Code/Parallel/src/OpticalFlow.cpp:172-205``).  NOTE: on the reference
  hot path the result is computed but never read (SURVEY.md §2.2), and the
  reference swaps the flow components (``y = i + pVx; x = j + pVy``,
  ``:196-197``).  ``compat_swap=True`` reproduces that quirk; ``False`` uses
  the correct orientation.
* ``sanity_check`` — residual statistics of the linearized data term
  (``OpticalFlow::SanityCheck``, ``OpticalFlow.cpp:127-149``).
"""

from __future__ import annotations

import jax.numpy as jnp


def gen_in_image_mask(
    vx: jnp.ndarray, vy: jnp.ndarray, interval: int = 0, compat_swap: bool = True
) -> jnp.ndarray:
    """1 where the flow target stays ``interval`` px inside the image."""
    h, w = vx.shape[-2], vx.shape[-1]
    i = jnp.arange(h, dtype=vx.dtype)[:, None]
    j = jnp.arange(w, dtype=vx.dtype)[None, :]
    if compat_swap:
        y = i + vx
        x = j + vy
    else:
        y = i + vy
        x = j + vx
    inside = (
        (x >= interval) & (x <= w - 1 - interval)
        & (y >= interval) & (y <= h - 1 - interval)
    )
    return inside.astype(vx.dtype)


def sanity_check(
    imdx: jnp.ndarray,
    imdy: jnp.ndarray,
    imdt: jnp.ndarray,
    du: float,
    dv: float,
):
    """Mean and max |It + Ix du + Iy dv| over all elements."""
    residual = jnp.abs(imdt + imdx * du + imdy * dv)
    return jnp.mean(residual), jnp.max(residual)
