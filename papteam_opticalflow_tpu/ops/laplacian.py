"""Weighted graph Laplacian of the flow field.

Reproduces ``OpticalFlow::Laplacian`` (``Code/Parallel/src/OpticalFlow.cpp:
725-778``) — the fused flux/divergence form used on the reference hot path.
The fusion in the reference drops two border accumulations relative to the
original two-pass version (commented at ``OpticalFlow.cpp:656-723``):

* the horizontal pass loops ``j < width-1`` only, so the **last column**
  never receives ``+flux_h[j-1]``;
* the vertical pass loops ``i < height-1`` only, so the **last row** never
  receives ``+flux_v[i-1]``.

Those truncated borders are the reference semantics for BOTH the Serial and
Parallel builds (the Parallel build additionally races on the vertical flux;
functional arrays make that disappear here).  ``compat=True`` reproduces the
truncation; ``compat=False`` computes the complete divergence.
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_laplacian(
    flow: jnp.ndarray, weight: jnp.ndarray, compat: bool = True
) -> jnp.ndarray:
    """``out = div(weight * grad(flow))`` with forward-difference flux.

    ``flow``, ``weight``: ``(H, W)`` (or leading batch dims).
    """
    # Horizontal flux: fh[i, j] = (flow[i, j+1] - flow[i, j]) * weight[i, j],
    # defined for j < W-1.
    fh = (flow[..., :, 1:] - flow[..., :, :-1]) * weight[..., :, :-1]
    # Vertical flux: fv[i, j] = (flow[i+1, j] - flow[i, j]) * weight[i, j],
    # defined for i < H-1.
    fv = (flow[..., 1:, :] - flow[..., :-1, :]) * weight[..., :-1, :]

    zcol = jnp.zeros_like(fh[..., :, :1])
    zrow = jnp.zeros_like(fv[..., :1, :])

    # -fh at j < W-1 ; +fh[j-1] at 1 <= j (<= W-2 in compat mode).
    out = jnp.concatenate([-fh, zcol], axis=-1)
    if compat:
        # Fused loop covers j in [0, W-2] only: last column gets no +fh term.
        out = out + jnp.concatenate([zcol, fh[..., :, :-1], zcol], axis=-1)
    else:
        out = out + jnp.concatenate([zcol, fh], axis=-1)

    # -fv at i < H-1 ; +fv[i-1] at 1 <= i (<= H-2 in compat mode).
    out = out + jnp.concatenate([-fv, zrow], axis=-2)
    if compat:
        out = out + jnp.concatenate([zrow, fv[..., :-1, :], zrow], axis=-2)
    else:
        out = out + jnp.concatenate([zrow, fv], axis=-2)
    return out
