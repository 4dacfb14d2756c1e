"""Stochastic / statistics utilities.

TPU-native re-implementation of the reference's ``CStochastic`` toolbox
(``Code/Parallel/src/Stochastic.{h,cpp}``) — sampling, moments, density
utilities, k-means clustering and Gaussian window generation.  None of it is
on the optical-flow hot path (SURVEY.md §2.8 item 18); it exists for feature
parity and is built the JAX way: explicit ``jax.random`` keys instead of
``rand()`` global state, ``vmap``/``argmin`` instead of pointer loops, and a
``lax.fori_loop`` k-means that jits to a fixed iteration count.

Reference quirks reproduced deliberately:

* ``Generate1DGaussian`` (``Stochastic.cpp:79-86``) divides by ``2*sigma``
  (NOT ``2*sigma^2``) and does not normalize; default ``sigma = size/2``.
* ``Generate2DGaussian`` (``:88-101``) squares sigma and normalizes;
  default ``sigma = WinSize``.
* ``entropy`` (``:103-111``) floors the density at ``1e-6`` inside the log.
* ``GetMeanVar`` (``Stochastic.h:57-71``) uses the unbiased ``length-1``
  variance denominator.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Sampling (CStochastic::UniformSampling / GaussianSampling / Sampling).
# The reference uses libc rand() global state; here every draw takes an
# explicit jax.random key (deterministic, reproducible across hosts).
# ---------------------------------------------------------------------------

def uniform_sampling(key, shape=()) -> jnp.ndarray:
    """U[0, 1) draws (``Stochastic.cpp:31-34``)."""
    return jax.random.uniform(key, shape)


def uniform_sampling_int(key, r: int, shape=()) -> jnp.ndarray:
    """Uniform integers in ``[0, R)`` (``Stochastic.cpp:36-41``)."""
    return jax.random.randint(key, shape, 0, r)


def gaussian_sampling(key, shape=()) -> jnp.ndarray:
    """Standard-normal draws.

    The reference approximates N(0,1) by summing 12 uniforms
    (``Stochastic.cpp:44-51``, Irwin-Hall CLT trick); we draw exactly.
    """
    return jax.random.normal(key, shape)


def sampling(key, density: jnp.ndarray, shape=()) -> jnp.ndarray:
    """Draw category indices from an (unnormalized-tail tolerant) density by
    inverse-CDF, the vectorized form of ``CStochastic::Sampling``
    (``Stochastic.cpp:65-77``): first index where the running sum reaches a
    uniform draw, falling back to the last index."""
    density = jnp.asarray(density)
    cdf = jnp.cumsum(density)
    r = jax.random.uniform(key, shape, dtype=cdf.dtype)
    idx = jnp.searchsorted(cdf, r, side="left")
    return jnp.minimum(idx, density.shape[0] - 1)


# ---------------------------------------------------------------------------
# Moments and density utilities.
# ---------------------------------------------------------------------------

def get_mean_var(signal: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and unbiased variance (``Stochastic.h:57-71``)."""
    signal = jnp.asarray(signal)
    mean = signal.mean()
    var = jnp.sum((signal - mean) ** 2) / (signal.size - 1)
    return mean, var


def normalize_density(density: jnp.ndarray) -> jnp.ndarray:
    """Scale to unit sum (``Stochastic.h:83-91``)."""
    density = jnp.asarray(density)
    return density / density.sum()


def entropy(density: jnp.ndarray) -> jnp.ndarray:
    """``-sum p log(max(p, 1e-6))`` (``Stochastic.cpp:103-111``)."""
    density = jnp.asarray(density)
    return -jnp.sum(jnp.log(jnp.maximum(density, 1e-6)) * density)


def sort_with_index(
    data: jnp.ndarray, descending: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sorted values + original indices (``CStochastic::sort``,
    ``Stochastic.h:102-130``; default SortDescending)."""
    data = jnp.asarray(data)
    order = jnp.argsort(-data if descending else data)
    return data[order], order


def find_max(data: jnp.ndarray) -> jnp.ndarray:
    """Index of the maximum (``CStochastic::FindMax``)."""
    return jnp.argmax(jnp.asarray(data))


def vector_square_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance (``Stochastic.h`` VectorSquareDistance)."""
    d = jnp.asarray(a) - jnp.asarray(b)
    return jnp.sum(d * d)


def compute_vector_mean(
    data: jnp.ndarray, weight: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Weighted mean of ``(N, D)`` rows (``CStochastic::ComputeVectorMean``)."""
    data = jnp.asarray(data)
    if weight is None:
        return data.mean(axis=0)
    weight = jnp.asarray(weight)
    return (data * weight[:, None]).sum(axis=0) / weight.sum()


def compute_mean_covariance(
    data: jnp.ndarray, weight: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted mean + diagonal covariance of ``(N, D)`` rows
    (``CStochastic::ComputeMeanCovariance`` — the reference stores only the
    per-dimension variance diagonal)."""
    data = jnp.asarray(data)
    mean = compute_vector_mean(data, weight)
    centered = data - mean
    if weight is None:
        cov = (centered * centered).mean(axis=0)
    else:
        weight = jnp.asarray(weight)
        cov = (centered * centered * weight[:, None]).sum(axis=0) / weight.sum()
    return mean, cov


def find_closest_point(point_set: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest row of ``(N, D)`` to ``query``
    (``CStochastic::FindClosestPoint``)."""
    point_set = jnp.asarray(point_set)
    d = point_set - jnp.asarray(query)[None, :]
    return jnp.argmin(jnp.sum(d * d, axis=1))


# ---------------------------------------------------------------------------
# Gaussian window generation (CStochastic variants — distinct from the
# normalized Image.h kernel in ops/filters.gaussian_taps).
# ---------------------------------------------------------------------------

def generate_1d_gaussian(size: int, sigma: float = 0.0) -> np.ndarray:
    """``exp(-i^2 / (2 sigma))`` for ``i in [-size, size]`` — the reference
    divides by ``2*sigma`` unsquared and skips normalization
    (``Stochastic.cpp:79-86``); default ``sigma = size/2``."""
    if sigma == 0.0:
        sigma = size / 2
    i = np.arange(-size, size + 1, dtype=np.float64)
    return np.exp(-(i * i) / (2.0 * sigma))


def generate_2d_gaussian(win_size: int, sigma: float = 0.0) -> np.ndarray:
    """Normalized ``(2w+1, 2w+1)`` Gaussian, ``sigma^2`` denominator
    (``Stochastic.cpp:88-101``); default ``sigma = win_size``."""
    s = float(win_size) if sigma == 0.0 else float(sigma)
    i = np.arange(-win_size, win_size + 1, dtype=np.float64)
    g2 = np.exp(-(i[:, None] ** 2 + i[None, :] ** 2) / (2.0 * s * s))
    return g2 / g2.sum()


def gaussian_filtering_1d(
    signal: jnp.ndarray, size: int, sigma: float
) -> jnp.ndarray:
    """Clamp-boundary Gaussian smoothing of a ``(N,)`` or ``(N, C)`` signal
    (``CStochastic::GaussianFiltering``), normalized window
    ``exp(-i^2/(2 sigma^2))``."""
    i = np.arange(-size, size + 1, dtype=np.float64)
    taps = np.exp(-(i * i) / (2.0 * sigma * sigma))
    taps /= taps.sum()
    signal = jnp.asarray(signal)
    flat = signal if signal.ndim > 1 else signal[:, None]
    pad = jnp.pad(flat, [(size, size), (0, 0)], mode="edge")
    n = flat.shape[0]
    out = sum(
        pad[l : l + n] * flat.dtype.type(w) for l, w in enumerate(taps)
    )
    return out if signal.ndim > 1 else out[:, 0]


# ---------------------------------------------------------------------------
# K-means (CStochastic::KMeanClustering, Stochastic.h:288-370).
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_clusters", "max_iterations"))
def kmeans(
    key,
    data: jnp.ndarray,
    n_clusters: int,
    max_iterations: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's k-means over ``(N, D)`` rows.

    The reference seeds centers from a random partition and loops
    assignment/update with a restart if any cluster collapses below
    ``MinClusterSampleNumber``; here empty clusters instead keep their
    previous center (deterministic, jit-stable — no data-dependent restart).
    Returns ``(partition (N,) int32, centers (K, D))``.
    """
    data = jnp.asarray(data)
    n = data.shape[0]
    part0 = jax.random.randint(key, (n,), 0, n_clusters)

    def update_centers(partition, prev_centers):
        one_hot = jax.nn.one_hot(partition, n_clusters, dtype=data.dtype)
        counts = one_hot.sum(axis=0)
        sums = one_hot.T @ data
        safe = jnp.maximum(counts, 1.0)[:, None]
        means = sums / safe
        return jnp.where(counts[:, None] > 0, means, prev_centers)

    centers0 = update_centers(part0, jnp.zeros((n_clusters, data.shape[1]), data.dtype))

    def body(_, carry):
        partition, centers = carry
        d2 = (
            jnp.sum(data * data, axis=1)[:, None]
            - 2.0 * data @ centers.T
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        partition = jnp.argmin(d2, axis=1).astype(jnp.int32)
        centers = update_centers(partition, centers)
        return partition, centers

    return jax.lax.fori_loop(
        0, max_iterations, body, (part0.astype(jnp.int32), centers0)
    )


def visual_words(
    img_chw: jnp.ndarray, dictionary: jnp.ndarray
) -> jnp.ndarray:
    """Per-pixel nearest-dictionary-entry quantization — the TPU form of
    ``Image::kmeansIndex`` / ``ConvertToVisualWords``
    (``Code/Parallel/src/Image.h:2297-2345``).

    ``img_chw``: ``(C, H, W)``; ``dictionary``: ``(K, C)`` codebook rows.
    Returns ``(H, W)`` int32 indices.  One MXU matmul instead of the
    reference's per-pixel scan.
    """
    c, h, w = img_chw.shape
    pix = img_chw.reshape(c, h * w).T  # (HW, C)
    d2 = (
        jnp.sum(pix * pix, axis=1)[:, None]
        - 2.0 * pix @ dictionary.T
        + jnp.sum(dictionary * dictionary, axis=1)[None, :]
    )
    return jnp.argmin(d2, axis=1).astype(jnp.int32).reshape(h, w)
