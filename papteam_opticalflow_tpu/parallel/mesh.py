"""Device-mesh construction.

The reference's entire parallelism story is OpenMP threads inside one
process (SURVEY.md §2.6-2.7); its ``nCores`` knob becomes the mesh shape
here.  Axes:

* ``frame`` — data parallelism over frame pairs (the reference's benchmark
  iterates 101 pairs per collection serially; they are embarrassingly
  parallel).  Maps to DCN across hosts, ICI within a host.
* ``ty`` — spatial row-tiling of a single pair (the context-parallel
  analogue, SURVEY.md §5.7): stencils and red-black SOR exchange 1-2 halo
  rows per step over ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_frame: Optional[int] = None,
    n_ty: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``('frame', 'ty')`` mesh.  Defaults to all devices on the
    frame axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_frame is None:
        n_frame = len(devices) // n_ty
    assert n_frame * n_ty == len(devices), (
        f"mesh {n_frame}x{n_ty} != {len(devices)} devices"
    )
    import numpy as np

    return Mesh(np.array(devices).reshape(n_frame, n_ty), ("frame", "ty"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-pairs arrays: leading axis over 'frame'."""
    return NamedSharding(mesh, P("frame"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Single-image (H, W) arrays: rows over 'ty'."""
    return NamedSharding(mesh, P("ty", None))
