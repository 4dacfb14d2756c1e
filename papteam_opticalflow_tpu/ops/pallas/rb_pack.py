"""Dense red/black packing for the SOR kernels.

The first-generation Pallas kernels computed every half-sweep over the FULL
(H, W) plane and then ``jnp.where``-masked one checkerboard color — half the
VPU work thrown away, plus 4 ``pltpu.roll``s of the iterate and 2 of ``phi``
per neighbor sum.  This module packs each plane into two dense half-planes

* ``R[i, jj] = x[i, 2*jj + (i % 2)]``   (the "red" points, (i+j) even)
* ``B[i, jj] = x[i, 2*jj + 1 - (i % 2)]`` ("black", (i+j) odd)

so each half-sweep updates one dense (H, W/2) plane with NO masking.  All
four neighbors of a red point are black (and vice versa); vertical
neighbors keep the same packed column (``B[i±1, jj]``), horizontal
neighbors alternate between ``jj-1/jj`` and ``jj/jj+1`` with row parity —
one roll plus one parity select each.

The arithmetic per point is kept in the exact operation order of the
reference sweep (``Code/Parallel/src/OpticalFlow.cpp:478-518``) and of the
other backends (``models/solver.sor_solve_jnp``), so packed results are
bit-identical to the unpacked red-black sweep.

Packing/unpacking runs in XLA outside the kernels (one fused pass,
amortized over ``30 + 3k`` sweeps); the in-kernel helpers here are shared
by the whole-level kernel (``sor.py``) and the ghost-zone blocked kernel
(``sor_blocked.py``).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_rb(x: jnp.ndarray, row0=0):
    """Pack ``(..., H, W)`` (W even) into dense ``(R, B)`` half-planes.

    ``row0``: global index of row 0 (may be a traced value) — colors are
    assigned by GLOBAL ``(i + j)`` parity, so row bands that start at an
    odd global row pack consistently with whole-image packing."""
    h = x.shape[-2]
    ev = x[..., 0::2]
    od = x[..., 1::2]
    evrow = (((jnp.arange(h) + row0) % 2) == 0)[:, None]
    r = jnp.where(evrow, ev, od)
    b = jnp.where(evrow, od, ev)
    return r, b


def pack_rb_concat(x: jnp.ndarray) -> jnp.ndarray:
    """``(..., H, W)`` -> ``(..., H, W)`` with columns re-ordered as
    ``[R | B]`` halves — same shape, so the blocked kernel's row-band DMA
    plans are unchanged."""
    r, b = pack_rb(x)
    return jnp.concatenate([r, b], axis=-1)


def unpack_rb(r: jnp.ndarray, b: jnp.ndarray, row0=0) -> jnp.ndarray:
    """Inverse of :func:`pack_rb` (same ``row0`` parity offset)."""
    h, w2 = r.shape[-2], r.shape[-1]
    evrow = (((jnp.arange(h) + row0) % 2) == 0)[:, None]
    ev = jnp.where(evrow, r, b)
    od = jnp.where(evrow, b, r)
    return jnp.stack([ev, od], axis=-1).reshape(*r.shape[:-2], h, 2 * w2)


def unpack_rb_concat(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_rb_concat`."""
    w2 = x.shape[-1] // 2
    return unpack_rb(x[..., :w2], x[..., w2:])


def make_packed_weights(phi_r, phi_b, gi, jj, h: int, w: int, roll):
    """Sweep-invariant packed SOR neighbor weights, border-masked by the
    TRUE image extents (``OpticalFlow.cpp:482-509``: left weight =
    ``phi[o-1]``, right/down = ``phi[o]``, up = ``phi[o-w]``).

    ``gi``/``jj``: global row / packed-column index grids of shape
    ``(rows, W/2)``; ``roll(x, shift, axis)`` is the kernel's circular
    shift.  Returns ``(wlR, wrR, wuR, wdR, wlB, wrB, wuB, wdB)``.
    """
    p = gi % 2
    evrow = p == 0
    zero = jnp.zeros_like(phi_r)
    col_r = 2 * jj + p          # global column of each red point
    col_b = 2 * jj + 1 - p      # ... and black point
    left_of_red = jnp.where(evrow, roll(phi_b, 1, 1), phi_b)
    left_of_blk = jnp.where(evrow, phi_r, roll(phi_r, 1, 1))
    wl_r = jnp.where(col_r > 0, left_of_red, zero)
    wr_r = jnp.where(col_r < w - 1, phi_r, zero)
    wu_r = jnp.where(gi > 0, roll(phi_b, 1, 0), zero)
    wd_r = jnp.where(gi < h - 1, phi_r, zero)
    wl_b = jnp.where(col_b > 0, left_of_blk, zero)
    wr_b = jnp.where(col_b < w - 1, phi_b, zero)
    wu_b = jnp.where(gi > 0, roll(phi_r, 1, 0), zero)
    wd_b = jnp.where(gi < h - 1, phi_b, zero)
    return wl_r, wr_r, wu_r, wd_r, wl_b, wr_b, wu_b, wd_b


def make_packed_sweep(
    weights,
    imdxy_r, imdxy_b,
    rdx_r, rdx_b,
    rdy_r, rdy_b,
    rhsx_r, rhsx_b,
    rhsy_r, rhsy_b,
    evrow,
    alpha,
    omega,
    roll,
):
    """Build the dense packed red-black sweep body.

    One call of the returned ``sweep(du_r, du_b, dv_r, dv_b)`` performs one
    full reference sweep: red half (du then dv, with the in-sweep u-v
    coupling through the just-updated ``du``), then black half reading the
    freshly updated red planes — identical Gauss-Seidel ordering and
    identical per-point arithmetic to ``sor_solve_jnp``.
    """
    wl_r, wr_r, wu_r, wd_r, wl_b, wr_b, wu_b, wd_b = weights

    def nbr_red(xb):  # neighbors of red points live in the black plane
        left = jnp.where(evrow, roll(xb, 1, 1), xb)
        right = jnp.where(evrow, xb, roll(xb, -1, 1))
        return (wl_r * left + wr_r * right
                + wu_r * roll(xb, 1, 0) + wd_r * roll(xb, -1, 0))

    def nbr_blk(xr):
        left = jnp.where(evrow, xr, roll(xr, 1, 1))
        right = jnp.where(evrow, roll(xr, -1, 1), xr)
        return (wl_b * left + wr_b * right
                + wu_b * roll(xr, 1, 0) + wd_b * roll(xr, -1, 0))

    def sweep(du_r, du_b, dv_r, dv_b):
        s1 = -alpha * nbr_red(du_b) + imdxy_r * dv_r
        du_r = (1 - omega) * du_r + (rhsx_r - s1) * rdx_r
        s2 = -alpha * nbr_red(dv_b) + imdxy_r * du_r
        dv_r = (1 - omega) * dv_r + (rhsy_r - s2) * rdy_r
        s3 = -alpha * nbr_blk(du_r) + imdxy_b * dv_b
        du_b = (1 - omega) * du_b + (rhsx_b - s3) * rdx_b
        s4 = -alpha * nbr_blk(dv_r) + imdxy_b * du_b
        dv_b = (1 - omega) * dv_b + (rhsy_b - s4) * rdy_b
        return du_r, du_b, dv_r, dv_b

    return sweep
