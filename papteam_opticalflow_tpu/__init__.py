"""papteam_opticalflow_tpu — TPU-native coarse-to-fine variational optical flow.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``ElijahHyndman/PAPTeam_OpticalFlow`` (Ce Liu's Coarse2Fine variational flow
benchmarked over traffic-video frame pairs): Gaussian pyramids, robust-penalty
fixed-point iterations, red-black SOR solves, and warp feedback — jitted
end-to-end on TPU, sharded over device meshes for batch and spatial scale-out.
"""

from .api import FlowResult, coarse2fine_flow
from .utils.params import (
    DEFAULT_PARAMS,
    ColorType,
    FlowParams,
    Interpolation,
    NoiseModel,
)

__version__ = "0.1.0"

__all__ = [
    "FlowResult",
    "coarse2fine_flow",
    "FlowParams",
    "DEFAULT_PARAMS",
    "Interpolation",
    "NoiseModel",
    "ColorType",
]
