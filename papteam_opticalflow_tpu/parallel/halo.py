"""Halo exchange over a row-sharded image axis.

Inside ``shard_map`` over axis ``ty``, each device holds a ``(H/n, W)`` row
band.  Stencil ops need ``halo`` ghost rows from the neighbors; this module
provides them with ``jax.lax.ppermute`` shifts (rides ICI on TPU), with
edge replication at the global image boundary — matching the reference's
``EnforceRange`` clamp semantics (``ImageProcessing.h:34``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_down(x, axis_name):
    """Every shard receives its UP-neighbor's data (shard i gets i-1's)."""
    n = jax.lax.axis_size(axis_name)
    return jax.lax.ppermute(x, axis_name, [(i, (i + 1) % n) for i in range(n)])


def _shift_up(x, axis_name):
    """Every shard receives its DOWN-neighbor's data (shard i gets i+1's)."""
    n = jax.lax.axis_size(axis_name)
    return jax.lax.ppermute(x, axis_name, [(i, (i - 1) % n) for i in range(n)])


def with_halo_rows(
    x: jnp.ndarray, halo: int, axis_name: str, edge_mode: str = "edge"
) -> jnp.ndarray:
    """Return ``x`` extended with ``halo`` rows on both vertical ends.

    ``x``: local shard ``(..., h, W)``.  Interior shards receive real
    neighbor rows; global-boundary shards get edge-replicated (or zero)
    rows, matching the reference's clamp boundary.
    """
    if halo <= 0:
        return x
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_rows = x[..., :halo, :]       # my first rows -> sent down? no: needed by shard below
    bot_rows = x[..., -halo:, :]

    # Shard i's top halo = shard i-1's last rows; bottom halo = i+1's first.
    from_above = _shift_down(bot_rows, axis_name)
    from_below = _shift_up(top_rows, axis_name)

    if edge_mode == "edge":
        # Global top/bottom: replicate own edge row(s).
        edge_top = jnp.repeat(x[..., :1, :], halo, axis=-2)
        edge_bot = jnp.repeat(x[..., -1:, :], halo, axis=-2)
    else:
        edge_top = jnp.zeros_like(top_rows)
        edge_bot = jnp.zeros_like(bot_rows)

    from_above = jnp.where(idx == 0, edge_top, from_above)
    from_below = jnp.where(idx == n - 1, edge_bot, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=-2)


def local_row_offset(local_h: int, axis_name: str) -> jnp.ndarray:
    """Global row index of this shard's first row."""
    return jax.lax.axis_index(axis_name) * local_h
