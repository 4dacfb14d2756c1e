"""Noise-model estimation.

``est_laplacian_noise`` reproduces ``OpticalFlow::estLaplacianNoise``
(``Code/Parallel/src/OpticalFlow.cpp:609-654``): the per-channel mean of
``|Im1 - Im2|`` over pixels with ``0 < |diff| < 1e6``, with a ``0.001``
fallback for channels where every pixel is invalid.  On the reference's
default path the estimate only feeds a ``< 1e-20`` guard on the Psi weight,
so the production solver can skip it (``FlowParams.estimate_laplacian_noise``).

A jitted EM for the Gaussian-mixture model (``estGaussianMixture``,
``OpticalFlow.cpp:554-606``; parameter container ``NoiseModel.h:16-183``) is
provided for the non-default ``noiseModel == GMixture`` branch.
"""

from __future__ import annotations

import jax.numpy as jnp


def est_laplacian_noise(im1: jnp.ndarray, im2: jnp.ndarray) -> jnp.ndarray:
    """Per-channel Laplacian scale estimate; ``im1``, ``im2``: ``(C, H, W)``.

    Returns shape ``(C,)``.
    """
    diff = jnp.abs(im1 - im2)
    valid = (diff > 0) & (diff < 1_000_000)
    total = jnp.sum(valid, axis=(-2, -1))
    acc = jnp.sum(jnp.where(valid, diff, 0), axis=(-2, -1))
    mean = acc / jnp.maximum(total, 1)
    return jnp.where(total == 0, im1.dtype.type(0.001), mean)
