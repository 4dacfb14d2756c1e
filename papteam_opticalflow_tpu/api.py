"""Public API.

``coarse2fine_flow`` mirrors the reference's Python-facing binding
``pyflow.coarse2fine_flow(im1, im2, pyramidLevels, nCores) ->
(timing_dict, u, v, warpI2)`` (``Code/Parallel/pyflow.pyx:31-70``) with
numpy-friendly ``(H, W, C)`` inputs in ``[0, 1]``.  There is no Cython/C ABI
layer to cross — the whole pipeline is one jitted XLA program — so the
``n_cores`` knob of the reference becomes a no-op compatibility argument
(parallelism is the chip mesh; see ``papteam_opticalflow_tpu.parallel``).
"""

from __future__ import annotations

import time
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.coarse2fine import coarse2fine_flow_chw, from_chw, to_chw
from .utils.params import DEFAULT_PARAMS, FlowParams


class FlowResult(NamedTuple):
    timing: Dict[str, str]
    u: np.ndarray
    v: np.ndarray
    warp_i2: np.ndarray


def coarse2fine_flow(
    im1,
    im2,
    pyramid_levels: int = 4,
    n_cores: int = 0,
    params: FlowParams = DEFAULT_PARAMS,
    dtype=jnp.float32,
) -> Tuple[Dict[str, str], np.ndarray, np.ndarray, np.ndarray]:
    """Compute dense optical flow between two frames.

    Args:
      im1, im2: ``(H, W, C)`` or ``(H, W)`` arrays, values in ``[0, 1]``.
      pyramid_levels: pyramid height (the reference's ``pyramidLevels``).
      n_cores: ignored; kept for drop-in signature parity with
        ``pyflow.coarse2fine_flow`` (``pyflow.pyx:31``).
      params: algorithm hyperparameters (defaults = reference constants).
      dtype: compute dtype (float32 default; float64 for parity testing).

    Returns:
      ``(timing_dict, u, v, warpI2)`` where ``timing_dict`` carries
      ``"Total C++ Execution"``-style wall-clock keys (here
      ``"Total Device Execution"`` plus a compatibility alias), ``u``/``v``
      are ``(H, W)`` float arrays and ``warpI2`` is ``im2`` warped to ``im1``
      (same layout as the input).
    """
    del n_cores
    x1 = to_chw(im1, dtype=dtype)
    x2 = to_chw(im2, dtype=dtype)
    start = time.perf_counter()
    u, v, warp = coarse2fine_flow_chw(x1, x2, pyramid_levels, params)
    jax.block_until_ready((u, v, warp))
    elapsed = time.perf_counter() - start
    timing = {
        "Total Device Execution": str(elapsed),
        # Compatibility alias so harness code keyed on the reference's
        # timing-map entry (OpticalFlow.cpp:939) keeps working.
        "Total C++ Execution": str(elapsed),
    }
    warp_out = np.asarray(from_chw(warp))
    if np.ndim(im1) == 2:
        warp_out = warp_out[..., 0]
    return timing, np.asarray(u), np.asarray(v), warp_out
