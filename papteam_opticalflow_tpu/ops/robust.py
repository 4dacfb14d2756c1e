"""Robust-penalty weights and linear-system assembly.

Reproduces the Phi / Psi weight computation and the per-channel system
products of ``OpticalFlow::SmoothFlowSOR``
(``Code/Parallel/src/OpticalFlow.cpp:317-446``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def phi_weight(
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    vx: jnp.ndarray,
    vy: jnp.ndarray,
    varepsilon_phi: float,
) -> jnp.ndarray:
    """Smoothness-term weight ``0.5 / sqrt(|grad u|^2 + |grad v|^2 + eps)``
    (``OpticalFlow.cpp:328-338``)."""
    t = ux.dtype.type
    mag = ux * ux + uy * uy + vx * vx + vy * vy
    return t(0.5) / jnp.sqrt(mag + t(varepsilon_phi))


def psi_weight(
    imdx: jnp.ndarray,
    imdy: jnp.ndarray,
    imdt: jnp.ndarray,
    du: jnp.ndarray,
    dv: jnp.ndarray,
    varepsilon_psi: float,
    lap_para: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Data-term weight per channel (Laplacian noise model,
    ``OpticalFlow.cpp:341-418``):

    ``psi = 1 / (2 sqrt((It + Ix du + Iy dv)^2 + eps))``.

    ``imdx/imdy/imdt``: ``(C, H, W)``; ``du/dv``: ``(H, W)`` (broadcast over
    channels).  If ``lap_para`` (shape ``(C,)``-compatible) is given, channels
    whose parameter is below 1e-20 yield zero weight — the reference's
    ``continue`` guard over a reset buffer (``OpticalFlow.cpp:409-410``).
    """
    t = imdx.dtype.type
    temp = imdt + imdx * du[None] + imdy * dv[None]
    temp = temp * temp
    psi = t(1.0) / (t(2.0) * jnp.sqrt(temp + t(varepsilon_psi)))
    if lap_para is not None:
        c = imdx.shape[0]
        guard = (lap_para[:c] >= 1e-20).astype(psi.dtype)
        psi = psi * guard[:, None, None]
    return psi


def assemble_system(
    psi: jnp.ndarray, imdx: jnp.ndarray, imdy: jnp.ndarray, imdt: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-channel weighted products collapsed to the channel mean
    (``OpticalFlow.cpp:425-446``: ``Multiply`` then ``collapse``).

    Returns ``(imdxy, imdx2, imdy2, imdtdx, imdtdy)``, each ``(H, W)``.
    For single-channel inputs the collapse is a copy (no averaging), matching
    the ``nChannels > 1`` branch of the reference.
    """
    c = psi.shape[0]

    def collapse(x):
        if c == 1:
            return x[0]
        return jnp.mean(x, axis=0)

    imdxy = collapse(psi * imdx * imdy)
    imdx2 = collapse(psi * imdx * imdx)
    imdy2 = collapse(psi * imdy * imdy)
    imdtdx = collapse(psi * imdx * imdt)
    imdtdy = collapse(psi * imdy * imdt)
    return imdxy, imdx2, imdy2, imdtdx, imdtdy
