"""Frame-pair batch parallelism (+ optional spatial tiling).

The reference benchmark walks 101 consecutive frame pairs per collection
serially (``TestSuite.py:66-87``); pairs are independent, so the production
scale-out axis is DATA parallelism over the ``frame`` mesh axis (DCN across
hosts, ICI within).  Composed with the ``ty`` row-tiling axis
(``parallel/tiled.py``) a ``(frame, ty)`` mesh runs, e.g., 4 pairs at a time
each solved across 2 chips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.coarse2fine import _coarse2fine_impl
from ..utils.params import FlowParams
from .tiled import pair_flow_tiled


@functools.partial(jax.jit, static_argnames=("pyramid_levels", "params"))
def vmapped_coarse2fine_flow(
    im1s: jnp.ndarray,
    im2s: jnp.ndarray,
    pyramid_levels: int,
    params: FlowParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flow for a batch of pairs ``(B, C, H, W)`` on ONE chip via ``vmap``.

    vmap widens every kernel by the batch dimension; the per-batch warp
    gathers unroll at trace time (see ``ops.interp._gather2d_vmap``), so
    trace/compile time grows with ``B`` — prefer ``mapped_coarse2fine_flow``
    for large batches.  The Pallas SOR kernels batch via a custom rule
    that ``lax.map``s the unbatched kernel over the batch
    (``models.sor_dispatch._batchable``), so vmapping no longer downgrades
    the solver to the XLA path.
    """
    fn = lambda a, b: _coarse2fine_impl(a, b, pyramid_levels, params)  # noqa: E731
    return jax.vmap(fn)(im1s, im2s)


@functools.partial(jax.jit, static_argnames=("pyramid_levels", "params"))
def mapped_coarse2fine_flow(
    im1s: jnp.ndarray,
    im2s: jnp.ndarray,
    pyramid_levels: int,
    params: FlowParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flow for a batch of pairs ``(B, C, H, W)`` on ONE chip via
    ``lax.map``: pairs run sequentially on-device inside ONE dispatch.

    This is the single-chip throughput configuration: each pair runs the
    exact single-pair program (fast 2-D warp gathers, Pallas SOR at small
    levels) while the per-dispatch host/runtime overhead (~25 ms on the
    tunneled platform) amortizes over the batch.  Traces the body once, so
    compile time is batch-size independent.
    """
    fn = lambda ab: _coarse2fine_impl(ab[0], ab[1], pyramid_levels, params)  # noqa: E731
    return jax.lax.map(fn, (im1s, im2s))


@functools.partial(
    jax.jit, static_argnames=("pyramid_levels", "params", "mesh")
)
def batched_coarse2fine_flow(
    im1s: jnp.ndarray,
    im2s: jnp.ndarray,
    pyramid_levels: int,
    params: FlowParams,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flow for a batch of pairs ``(B, C, H, W)``.

    The batch axis shards over the mesh's ``frame`` axis; if the mesh also
    has a ``ty`` axis of size > 1, each pair's solve is additionally
    row-tiled across it.  ``B`` must be divisible by the ``frame`` axis
    size.  Returns ``(u, v, warpI2)`` with leading batch axis.
    """
    from .mesh import spatial_axes

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_frame = axes.get("frame", 1)
    tile_axes = spatial_axes(mesh)  # 'ty', ('ty','tx'), or None
    b = im1s.shape[0]
    assert b % n_frame == 0, f"batch {b} not divisible by frame axis {n_frame}"

    def one_pair(pair):
        im1, im2 = pair
        if tile_axes is not None:
            return pair_flow_tiled(im1, im2, pyramid_levels, params, tile_axes)
        return _coarse2fine_impl(im1, im2, pyramid_levels, params)

    def per_device(b1, b2):
        return jax.lax.map(one_pair, (b1, b2))

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("frame"), P("frame")),
        out_specs=(P("frame"), P("frame"), P("frame")),
        check_vma=False,  # replicated over 'ty' by construction
    )(im1s, im2s)
