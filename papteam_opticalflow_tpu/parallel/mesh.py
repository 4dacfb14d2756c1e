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
* ``tx`` — optional second spatial axis (SURVEY.md §5.8's
  ``('frame','ty','tx')`` mesh).  On TPU the W dimension is the 128-lane
  vector dimension, so splitting columns across chips would shard the lane
  axis — a poor hardware fit.  Instead ``tx`` COMPOSES with ``ty`` into one
  flattened spatial axis (finer row bands): every collective in the tiled
  solver takes the ``('ty', 'tx')`` axis-name tuple, so halo ``ppermute``
  still rides ICI between physically adjacent chips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_frame: Optional[int] = None,
    n_ty: int = 1,
    devices=None,
    n_tx: int = 1,
) -> Mesh:
    """Build a ``('frame', 'ty')`` mesh — or ``('frame', 'ty', 'tx')`` when
    ``n_tx > 1``.  Defaults to all devices on the frame axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_frame is None:
        n_frame = len(devices) // (n_ty * n_tx)
    assert n_frame * n_ty * n_tx == len(devices), (
        f"mesh {n_frame}x{n_ty}x{n_tx} != {len(devices)} devices"
    )
    import numpy as np

    if n_tx > 1:
        return Mesh(
            np.array(devices).reshape(n_frame, n_ty, n_tx),
            ("frame", "ty", "tx"),
        )
    return Mesh(np.array(devices).reshape(n_frame, n_ty), ("frame", "ty"))


def spatial_axes(mesh: Mesh):
    """The mesh's spatial axis name(s) with size > 1: ``'ty'``,
    ``('ty', 'tx')``, or None when the mesh is pure data-parallel.  The
    tiled solver's collectives accept either form."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    names = tuple(a for a in ("ty", "tx") if axes.get(a, 1) > 1)
    if not names:
        return None
    return names[0] if len(names) == 1 else names


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-pairs arrays: leading axis over 'frame'."""
    return NamedSharding(mesh, P("frame"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Single-image (H, W) arrays: rows over 'ty'."""
    return NamedSharding(mesh, P("ty", None))
