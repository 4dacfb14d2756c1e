"""Gaussian-mixture noise model (the reference's non-default
``noiseModel == GMixture`` branch).

Reproduces the parameter container ``GaussianMixture``
(``Code/Parallel/src/NoiseModel.h:16-183``: per-channel ``alpha`` inlier
weight, ``sigma``/``beta`` scales, init ``(0.95, 0.05, 0.5)``, pdf
``exp(-x / (2 s^2)) / (2 pi s)``) and the 3-iteration EM
``OpticalFlow::estGaussianMixture`` (``OpticalFlow.cpp:554-606``) with its
``prior``-regularized M step, plus the GMixture Psi weight
(``OpticalFlow.cpp:369-373, 401-406``) — all as jitted array ops on a
parameter pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_PI = 3.141592653589793


class GMixtureParams(NamedTuple):
    """Per-channel two-component mixture parameters; all shape ``(C,)``."""

    alpha: jnp.ndarray
    sigma: jnp.ndarray
    beta: jnp.ndarray

    @property
    def sigma_square(self):
        return self.sigma * self.sigma

    @property
    def beta_square(self):
        return self.beta * self.beta


def init_gmixture(n_channels: int, dtype=jnp.float32) -> GMixtureParams:
    """``GaussianMixture(int)`` defaults (``NoiseModel.h:31-42``)."""
    return GMixtureParams(
        alpha=jnp.full((n_channels,), 0.95, dtype),
        sigma=jnp.full((n_channels,), 0.05, dtype),
        beta=jnp.full((n_channels,), 0.5, dtype),
    )


def save_gmixture(path, para: GMixtureParams) -> None:
    """Byte-compatible ``GaussianMixture::write`` (``NoiseModel.h:142-161``):
    little-endian int32 ``nChannels`` followed by the ``alpha``, ``sigma``,
    ``beta`` arrays as float64 (``sigma_square``/``beta_square`` are derived,
    not stored — the reference recomputes them via ``square()`` on read)."""
    import numpy as np

    alpha = np.asarray(para.alpha, np.float64)
    with open(path, "wb") as f:
        f.write(np.int32(alpha.size).tobytes())
        f.write(alpha.tobytes())
        f.write(np.asarray(para.sigma, np.float64).tobytes())
        f.write(np.asarray(para.beta, np.float64).tobytes())


def load_gmixture(path, dtype=jnp.float64) -> GMixtureParams:
    """Byte-compatible ``GaussianMixture::read`` (``NoiseModel.h:162-182``)."""
    import numpy as np

    with open(path, "rb") as f:
        (n,) = np.frombuffer(f.read(4), np.int32)
        alpha = np.frombuffer(f.read(8 * n), np.float64)
        sigma = np.frombuffer(f.read(8 * n), np.float64)
        beta = np.frombuffer(f.read(8 * n), np.float64)
    return GMixtureParams(
        jnp.asarray(alpha, dtype), jnp.asarray(sigma, dtype),
        jnp.asarray(beta, dtype),
    )


def _gaussian(x, scale, scale_sq):
    """``GaussianMixture::Gaussian`` (``NoiseModel.h:118-124``); note the
    reference's (unnormalized-in-1D) ``1 / (2 pi s)`` prefactor."""
    return jnp.exp(-x / (2 * scale_sq)) / (2 * _PI * scale)


def est_gaussian_mixture(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    para: GMixtureParams,
    prior: float = 0.0,
    n_iterations: int = 3,
) -> GMixtureParams:
    """EM re-estimation (``OpticalFlow.cpp:554-606``).

    ``im1``, ``im2``: ``(C, H, W)``.  The channel loop of the reference maps
    to the leading axis; sums run over pixels.
    """
    d2 = (im1 - im2) ** 2  # (C, H, W)
    t = d2.dtype.type

    # Numerical guards absent from the reference (which runs in double and
    # simply divides): (a) when BOTH component densities underflow for an
    # outlier pixel the reference computes 0/0 — split such pixels evenly;
    # (b) floor the scales so near-perfect warps (residual ~ 0 everywhere,
    # common on static JPEG backgrounds) cannot collapse sigma to 0.
    tiny = t(1e-30)
    scale_floor = t(1e-4)

    def one_iter(_, p):
        # E step
        w1 = _gaussian(d2, p.sigma[:, None, None], p.sigma_square[:, None, None]) * (
            p.alpha[:, None, None]
        )
        w2 = _gaussian(d2, p.beta[:, None, None], p.beta_square[:, None, None]) * (
            1 - p.alpha[:, None, None]
        )
        norm = w1 + w2
        degenerate = norm <= tiny
        w1 = jnp.where(degenerate, 0.5, w1 / jnp.maximum(norm, tiny))
        w2 = jnp.where(degenerate, 0.5, w2 / jnp.maximum(norm, tiny))
        total1 = jnp.sum(w1, axis=(-2, -1))
        total2 = jnp.sum(w2, axis=(-2, -1))
        # M step (with the reference's prior regularization of alpha/beta).
        sigma = jnp.sqrt(
            jnp.sum(w1 * d2, axis=(-2, -1)) / jnp.maximum(total1, tiny)
        )
        beta = jnp.sqrt(
            jnp.sum(w2 * d2, axis=(-2, -1)) / jnp.maximum(total2, tiny)
        ) * (1 - prior) + t(0.3) * t(prior)
        alpha = total1 / (total1 + total2) * (1 - prior) + t(0.95) * t(prior)
        return GMixtureParams(
            alpha, jnp.maximum(sigma, scale_floor), jnp.maximum(beta, scale_floor)
        )

    return jax.lax.fori_loop(0, n_iterations, one_iter, para)


def psi_weight_gmixture(
    imdx: jnp.ndarray,
    imdy: jnp.ndarray,
    imdt: jnp.ndarray,
    du: jnp.ndarray,
    dv: jnp.ndarray,
    para: GMixtureParams,
) -> jnp.ndarray:
    """Psi under the mixture model (``OpticalFlow.cpp:399-406``):
    ``(p1/(2 s^2) + p2/(2 b^2)) / (p1 + p2)`` with
    ``p1 = N(t^2; sigma) alpha`` and ``p2 = N(t^2; beta) (1 - alpha)``."""
    temp = imdt + imdx * du[None] + imdy * dv[None]
    temp = temp * temp
    a = para.alpha[:, None, None]
    s = para.sigma[:, None, None]
    ss = para.sigma_square[:, None, None]
    b = para.beta[:, None, None]
    bs = para.beta_square[:, None, None]
    prob1 = _gaussian(temp, s, ss) * a
    prob2 = _gaussian(temp, b, bs) * (1 - a)
    prob11 = prob1 / (2 * ss)
    prob22 = prob2 / (2 * bs)
    tiny = temp.dtype.type(1e-30)
    # Underflow guard (see est_gaussian_mixture): outlier pixels where both
    # densities vanish get the outlier-component weight 1/(2 beta^2).
    return jnp.where(
        prob1 + prob2 <= tiny,
        1 / (2 * bs) * jnp.ones_like(temp),
        (prob11 + prob22) / jnp.maximum(prob1 + prob2, tiny),
    )
