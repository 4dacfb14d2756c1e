"""Row-tiled (spatially sharded) coarse-to-fine solver.

The context-parallel analogue of the reference's problem-size scaling
(SURVEY.md §5.7): a single frame pair's solve is sharded over the ``ty``
mesh axis as horizontal row bands.  Per outer fixed-point iteration the
flow field is all-gathered (small), stencil bands carry clamp-replicated
halos, and each red-black half-sweep of the SOR exchanges one halo row of
``du``/``dv`` over ICI via ``ppermute`` — the deterministic replacement for
the reference's chaotic shared-memory SOR (``OpticalFlow.cpp:469-520``).

Design notes
------------
* Every shard handles ``h = ceil(H / n_ty)`` rows; rows beyond the real
  image height are "ghost" rows maintained as copies of the last real row so
  band extraction stays contiguous (`lax.dynamic_slice`) and clamp-boundary
  semantics fall out automatically (forward differences across the real
  bottom edge vanish).
* Pyramid construction, feature lifting and the final bicubic warp are
  computed replicated (once per level); only the fixed-point/SOR state is
  sharded.  The data term's warp gathers read the full (replicated)
  frame — flow magnitude is unbounded so no fixed halo suffices
  (SURVEY.md §7.3).
* **Amdahl cap of the replicated work** (re-measured r4 at 1920px P15
  bf16 on v5e, bench phases/ops): pyramid construction 3.9 ms +
  per-level features 0.3 + inter-level resize 0.6 + final bicubic 3.1 of
  the 169 ms device pair — ~4.6% replicated, since the r4 Pallas warp /
  bicubic kernels shrank exactly the pieces that used to be replicated
  hot spots, and the band warp runs the same kernel sharded.  Projected
  ty efficiency (tools/measure_scaling.py, SCALING.json): 0.84 at ty=2,
  0.73 at ty=4.  Spatial tiling is the *memory/latency* axis; THROUGHPUT
  scaling belongs to the ``frame`` axis (``parallel/batch.py``), where
  pairs are embarrassingly parallel.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.pyramid import build_pyramid, clamp_ratio
from ..models.solver import checkerboard  # noqa: F401  (single-device twin)
from ..ops.bicubic import threshold01, warp_bicubic_ref
from ..ops.features import im2feature
from ..ops.filters import (
    DERIVATIVE_5TAP,
    PRESMOOTH_5TAP,
    correlate1d,
    correlate1d_valid,
)
from ..ops.interp import (
    bilinear_gather,
    bilinear_gather_packed,
    pack_patch2x2,
    resize_to,
    should_prebuild_pack,
)
from ..ops.robust import assemble_system, phi_weight, psi_weight
from ..utils.params import FlowParams, Interpolation
from .halo import with_halo_rows


def _edge_fix_pad(x: jnp.ndarray, real_h: int, pad_h: int, halo: int) -> jnp.ndarray:
    """Clamp-extend a full-height array along rows: rows ``[real_h, pad_h)``
    and ``halo`` rows on both ends all replicate the nearest real row.
    Result has ``pad_h + 2 * halo`` rows; padded row ``p`` holds the value of
    global row ``clip(p - halo, 0, real_h - 1)``."""
    x = x[..., :real_h, :]
    top = jnp.repeat(x[..., :1, :], halo, axis=-2)
    bot = jnp.repeat(x[..., -1:, :], pad_h - real_h + halo, axis=-2)
    return jnp.concatenate([top, x, bot], axis=-2)


def _band(x_padded: jnp.ndarray, r0, length: int, halo_of_pad: int, halo: int):
    """Rows ``[r0 - halo, r0 - halo + length)`` in global (clamped)
    coordinates from an ``_edge_fix_pad``-ed array built with
    ``halo_of_pad >= halo``."""
    start = r0 + (halo_of_pad - halo)
    return jax.lax.dynamic_slice_in_dim(x_padded, start, length, axis=-2)


def _repair_ghost(x_local: jnp.ndarray, r0, h: int, real_h: int) -> jnp.ndarray:
    """Overwrite ghost rows (global index >= real_h) with the last real row,
    keeping clamp semantics consistent across sweeps."""
    g = r0 + jnp.arange(h)
    edge_idx = jnp.clip(real_h - 1 - r0, 0, h - 1)
    edge_row = jax.lax.dynamic_index_in_dim(x_local, edge_idx, axis=-2, keepdims=True)
    return jnp.where((g >= real_h)[:, None], edge_row, x_local)


def _reclamp_band(x, r0, halo: int, real_h: int):
    """Re-impose the reference's per-stage clamp boundary on a row band:
    band rows whose global index falls outside ``[0, real_h)`` are replaced
    by the band row at the clamped global index.  Each filtering stage in the
    reference clamps independently (``EnforceRange`` inside hfiltering /
    vfiltering), so smoothed-beyond-edge values must NOT leak into the next
    stage."""
    n = x.shape[-2]
    i = jnp.arange(n)
    src = jnp.clip(jnp.clip(r0 - halo + i, 0, real_h - 1) - (r0 - halo), 0, n - 1)
    return jnp.take(x, src, axis=-2)


def _presmooth_band(feat1_b4, r0, real_h: int):
    """Frame 1's getDxs pre-smooth on a halo-4 band (loop-invariant across
    the outer fixed-point iterations — hoisted by the caller, mirroring
    the single-chip ``features.presmooth_frame`` hoist)."""
    s1 = correlate1d_valid(correlate1d(feat1_b4, PRESMOOTH_5TAP, -1), PRESMOOTH_5TAP, -2)
    return _reclamp_band(s1, r0, 2, real_h)


def _get_dxs_band(s1, warp_b4, r0, real_h: int):
    """getDxs (OpticalFlow.cpp:80-122) on a halo-4 row band: clamp
    horizontal, valid vertical with per-stage clamp re-imposed between the
    presmooth and the derivative.  ``s1``: ``_presmooth_band`` of frame 1;
    ``warp_b4``: ``(C, h+8, W)`` -> outputs ``(C, h, W)``."""
    t = s1.dtype.type
    s2 = correlate1d_valid(correlate1d(warp_b4, PRESMOOTH_5TAP, -1), PRESMOOTH_5TAP, -2)
    s2 = _reclamp_band(s2, r0, 2, real_h)
    blend = s1 * t(0.4) + s2 * t(0.6)  # (C, h+4, W)
    imdx = correlate1d(blend, DERIVATIVE_5TAP, -1)[..., 2:-2, :]
    imdy = correlate1d_valid(blend, DERIVATIVE_5TAP, -2)
    imdt = (s2 - s1)[..., 2:-2, :]
    return imdx, imdy, imdt


def _warp_band(feat1_b, feat2, feat2_pack, u_b, v_b, y_rows, h_img, r0=None):
    """Bilinear backward warp for band rows; OOB copies feat1
    (ImageProcessing.h:495-520).  ``feat2_pack``: ``pack_patch2x2`` of the
    full frame when ``should_prebuild_pack`` says so, else None (wide
    slices over small tables gather faster as four unpacked corner
    gathers — same policy as the single-chip path); ``y_rows``: global
    (clamped) row index per band row; ``r0``: the band's global base row
    (traced) — when given and the table is big, the patch gather runs
    through the row-anchored tile-windowed scheme
    (``interp.gather2d_band_adaptive``), so each shard gathers from small
    source windows instead of paying the full-frame footprint cost."""
    from ..ops.interp import (
        _pallas_margins_for,
        _tiled_chunks,
        _use_pallas_warp,
        _use_tiled_warp,
        gather2d_band_adaptive,
    )

    w = feat2.shape[-1]
    ftype = feat2.dtype
    j = jnp.arange(w, dtype=ftype)
    x = j[None, :] + u_b
    y = y_rows.astype(ftype)[:, None] + v_b
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h_img - 1)
    if r0 is not None and _use_pallas_warp(feat2):
        # Pallas VPU band warp (round 4): per-shard strips gather from
        # the replicated full frame through the candidate-row kernel —
        # without this, ty-sharding would run the serial gather unit and
        # give back most of the single-chip warp win.  Same adaptive
        # exactness contract as interp._warp_pallas_adaptive, banded.
        from ..ops.pallas.warp import warp_bilinear_pallas_band

        hb = u_b.shape[-2]
        ftype32 = jnp.float32
        # The kernel clamps its nominal rows (clip(r0 + i, 0, h-1)) —
        # exactly the band's y_rows — so v_b passes through unchanged.
        ii = (r0 + jnp.arange(hb))[:, None]
        jj = jnp.arange(w)[None, :]
        y0i = jnp.clip(jnp.trunc(y).astype(jnp.int32), 0, h_img - 1)
        x0i = jnp.clip(jnp.trunc(x).astype(jnp.int32), 0, w - 1)
        zero = jnp.zeros((), jnp.int32)
        dy = jnp.max(jnp.where(oob, zero, jnp.abs(y0i - ii)))
        dx = jnp.max(jnp.where(oob, zero, jnp.abs(x0i - jj)))
        margins = _pallas_margins_for(h_img)
        bucket = sum((dy > m).astype(jnp.int32) for m in margins)
        bucket = jnp.where(dx > 255, len(margins), bucket)

        def pallas_branch(m):
            def f(f1b, f2, ub, vyb):
                return warp_bilinear_pallas_band(f1b, f2, ub, vyb, r0,
                                                 margin=m)

            return f

        def serial_branch(f1b, f2, ub, vyb):
            return jnp.where(oob, f1b, bilinear_gather(f2, x, y))

        return jax.lax.switch(
            bucket,
            [pallas_branch(m) for m in margins] + [serial_branch],
            feat1_b, feat2, u_b.astype(ftype32), v_b.astype(ftype32),
        )
    if feat2_pack is not None:
        itemsize = jnp.dtype(feat2_pack.dtype).itemsize
        if r0 is not None and _use_tiled_warp(feat2_pack.shape, itemsize):
            h = feat2_pack.shape[-2]
            dtype = feat2_pack.dtype
            c = feat2_pack.shape[-3] // 4
            xx = jnp.trunc(x)
            yy = jnp.trunc(y)
            fx = jnp.clip((x - xx).astype(dtype), 0, 1)
            fy = jnp.clip((y - yy).astype(dtype), 0, 1)
            x0 = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
            y0 = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
            patch = gather2d_band_adaptive(
                feat2_pack, y0, x0, ~oob, r0,
                chunks=_tiled_chunks(feat2_pack.shape[-3], itemsize),
            )
            v00 = patch[0 * c:1 * c]
            v10 = patch[1 * c:2 * c]
            v01 = patch[2 * c:3 * c]
            v11 = patch[3 * c:4 * c]
            # Same weight-product association as bilinear_gather_packed —
            # the sharded path is pinned bit-identical to single-chip.
            w00 = (1 - fx) * (1 - fy)
            w10 = fx * (1 - fy)
            w01 = (1 - fx) * fy
            w11 = fx * fy
            sampled = v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11
        else:
            sampled = bilinear_gather_packed(feat2_pack, x, y)
    else:
        sampled = bilinear_gather(feat2, x, y)
    return jnp.where(oob, feat1_b, sampled)


def _weighted_laplacian_band(u_b2, phi_b1, g, real_h: int, compat: bool):
    """Weighted Laplacian (OpticalFlow.cpp:725-778) on local rows from a
    halo-2 flow band and halo-1 weight band.  ``g``: global row indices of
    the local rows."""
    u_b1 = u_b2[..., 1:-1, :]          # rows g0-1 .. g0+h
    u_loc = u_b2[..., 2:-2, :]
    phi_loc = phi_b1[..., 1:-1, :]

    # Horizontal pass (fully local): flux fh[j] = (u[j+1]-u[j])*phi[j].
    fh = (u_loc[..., :, 1:] - u_loc[..., :, :-1]) * phi_loc[..., :, :-1]
    zcol = jnp.zeros_like(fh[..., :, :1])
    out = jnp.concatenate([-fh, zcol], axis=-1)
    if compat:
        out = out + jnp.concatenate([zcol, fh[..., :, :-1], zcol], axis=-1)
    else:
        out = out + jnp.concatenate([zcol, fh], axis=-1)

    # Vertical pass: fv on rows g0-1 .. g0+h-1 (+1 lookahead); edge-fixed
    # bands make fv vanish across the real bottom edge automatically.
    fv_b = (u_b1[..., 1:, :] - u_b1[..., :-1, :]) * phi_b1[..., :-1, :]  # h+1 rows
    fv_here = fv_b[..., 1:, :]      # fv[i]   for local rows
    fv_above = fv_b[..., :-1, :]    # fv[i-1] for local rows
    m_valid = (g < real_h - 1)[:, None]
    out = out - jnp.where(m_valid, fv_here, 0)
    if compat:
        m_prev = ((g > 0) & (g <= real_h - 2))[:, None]
    else:
        m_prev = (g > 0)[:, None]
    out = out + jnp.where(m_prev, fv_above, 0)
    return out


def _ghost_zone_sor(
    du,
    dv,
    phi,
    imdxy,
    denx,
    deny,
    rhs_x,
    rhs_y,
    *,
    r0,
    real_h: int,
    n_sor: int,
    alpha,
    omega,
    sweeps_per_exchange: int,
    axis_name,
    use_pallas: bool = False,
):
    """Red-black SOR over row shards with ghost-zone (temporally blocked)
    halo exchange — the scalable replacement for the reference's chaotic
    shared-memory SOR (``OpticalFlow.cpp:469-520``).

    The naive sharded sweep exchanges a 1-row halo of ``du``/``dv`` every
    half-sweep (8 ``ppermute``s per sweep — ICI-latency-bound at
    ``30 + 3k`` sweeps per inner iteration).  This instead applies the same
    temporal-blocking argument as ``ops/pallas/sor_blocked.py``: one full
    red-black sweep invalidates two ghost rows per side, so after
    exchanging a ``2S``-row ghost zone once, ``S`` sweeps run entirely
    locally and the shard's own rows come out bit-identical to ``S``
    global sweeps.  Collectives per inner iteration drop from
    ``8 * n_sor`` to ``2 + 2 * ceil(n_sor / S)`` (the sweep-invariant
    system planes are exchanged once, stacked into a single ppermute
    pair; each chunk exchanges only the stacked ``du``/``dv`` ghost zone).

    The redundant ghost-row compute (``4S`` extra rows per shard per
    sweep) trades VPU flops for ICI latency, exactly as the Pallas kernel
    trades them for HBM traffic.

    With ``use_pallas`` (TPU backend), each chunk's local sweeps run in
    the packed VMEM-resident band kernel (``ops/pallas/sor.sor_band_pallas``
    — global-row-offset-aware masks/parity) when the extended band fits
    the VMEM budget, so the multi-chip path keeps the single-chip kernel's
    sweep throughput; oversized bands fall back to the XLA sweeps.
    """
    h, w = du.shape
    dt = du.dtype
    s = max(1, min(int(sweeps_per_exchange), h // 2, n_sor))
    if h < 2 * s:  # tiny coarse-level bands: plain halo-1 exchange
        s = 1
    if h < 2:
        return _halo1_sor(
            du, dv, phi, imdxy, denx, deny, rhs_x, rhs_y,
            r0=r0, real_h=real_h, n_sor=n_sor, alpha=alpha, omega=omega,
            axis_name=axis_name,
        )
    G = 2 * s

    # The system planes are sweep-invariant: halo-extend them ONCE for the
    # whole n_sor budget, stacked so the exchange is a single ppermute pair.
    planes = jnp.stack([phi, imdxy, denx, deny, rhs_x, rhs_y])
    planes_e = with_halo_rows(planes, G, axis_name)  # (6, h+2G, w)

    gext = r0 - G + jnp.arange(h + 2 * G)
    jcol = jnp.arange(w)
    red_e = ((gext[:, None] + jcol[None, :]) % 2) == 0

    if use_pallas:
        from ..ops.pallas.sor import band_fits_vmem

        use_pallas = band_fits_vmem(h + 2 * G, w, dt)

    def band_arrays(gg: int):
        """Views of the G-extended planes/masks at ghost width ``gg``."""
        sl = slice(G - gg, h + G + gg)
        p = planes_e[:, sl]
        phi_e = p[0]
        ge = gext[sl]
        zcol = jnp.zeros((h + 2 * gg, 1), dt)
        zrow = jnp.zeros((1, w), dt)
        # SOR neighbor weights at every band row (OpticalFlow.cpp:482-509),
        # masked by GLOBAL row index.  The band-edge rows read a zero pad
        # for their up-neighbor weight — they are ghost rows whose values
        # never propagate ``gg`` rows deep within ``gg/2`` sweeps.
        wl = jnp.concatenate([zcol, phi_e[:, :-1]], axis=-1)
        wr = jnp.concatenate([phi_e[:, :-1], zcol], axis=-1)
        wu = jnp.where(
            (ge > 0)[:, None],
            jnp.concatenate([zrow, phi_e[:-1]], axis=-2),
            0,
        )
        wd = jnp.where((ge < real_h - 1)[:, None], phi_e, 0)
        # Divides hoisted out of the sweep loop (same transform as
        # solver.py and both Pallas kernels — all backends identical).
        rdx = omega / p[2]
        rdy = omega / p[3]
        return (p[1], p[4], p[5], wl, wr, wu, wd, rdx, rdy, red_e[sl],
                zcol, zrow, p)

    def run_chunk(du, dv, n_sweeps: int, gg: int, band):
        (imdxy_e, rhsx_e, rhsy_e, wl, wr, wu, wd, rdx, rdy, red,
         zcol, zrow, p) = band
        duv = with_halo_rows(jnp.stack([du, dv]), gg, axis_name)
        du_e, dv_e = duv[0], duv[1]

        if use_pallas:
            from ..ops.pallas.sor import sor_band_pallas

            du_e, dv_e = sor_band_pallas(
                du_e, dv_e, p[0], p[1], p[2], p[3], p[4], p[5],
                row0=r0 - gg, real_h=real_h, real_w=w,
                n_sweeps=n_sweeps, alpha=float(alpha), omega=float(omega),
            )
            return du_e[gg:gg + h], dv_e[gg:gg + h]

        def nbr(x):
            left = jnp.concatenate([zcol, x[:, :-1]], axis=-1)
            right = jnp.concatenate([x[:, 1:], zcol], axis=-1)
            up = jnp.concatenate([zrow, x[:-1]], axis=-2)
            down = jnp.concatenate([x[1:], zrow], axis=-2)
            return wl * left + wr * right + wu * up + wd * down

        def half(a, b, mask):
            s1 = -alpha * nbr(a) + imdxy_e * b
            a = jnp.where(mask, (1 - omega) * a + (rhsx_e - s1) * rdx, a)
            s2 = -alpha * nbr(b) + imdxy_e * a
            b = jnp.where(mask, (1 - omega) * b + (rhsy_e - s2) * rdy, b)
            return a, b

        def sweep(_, c):
            a, b = c
            a, b = half(a, b, red)
            a, b = half(a, b, ~red)
            return a, b

        du_e, dv_e = jax.lax.fori_loop(0, n_sweeps, sweep, (du_e, dv_e))
        return du_e[gg:gg + h], dv_e[gg:gg + h]

    n_full, rem = divmod(n_sor, s)
    if n_full:
        band_s = band_arrays(G)
        du, dv = jax.lax.fori_loop(
            0, n_full,
            lambda _, c: run_chunk(c[0], c[1], s, G, band_s),
            (du, dv),
        )
    if rem:
        du, dv = run_chunk(du, dv, rem, 2 * rem, band_arrays(2 * rem))
    return du, dv


def _halo1_sor(
    du, dv, phi, imdxy, denx, deny, rhs_x, rhs_y,
    *, r0, real_h, n_sor, alpha, omega, axis_name,
):
    """Per-half-sweep halo-1 fallback for bands too small to ghost-zone
    (h == 1).  Same arithmetic as ``_ghost_zone_sor``."""
    h, w = du.shape
    dt = du.dtype
    g = r0 + jnp.arange(h)
    jcol = jnp.arange(w)
    red = ((g[:, None] + jcol[None, :]) % 2) == 0
    zcol = jnp.zeros((h, 1), dt)
    wl = jnp.concatenate([zcol, phi[:, :-1]], axis=-1)
    wr = jnp.concatenate([phi[:, :-1], zcol], axis=-1)
    phi_h = with_halo_rows(phi, 1, axis_name)
    wu = jnp.where((g > 0)[:, None], phi_h[:-2], 0)
    wd = jnp.where((g < real_h - 1)[:, None], phi, 0)
    rdx = omega / denx
    rdy = omega / deny

    def nbr(x, x_h):
        left = jnp.concatenate([zcol, x[:, :-1]], axis=-1)
        right = jnp.concatenate([x[:, 1:], zcol], axis=-1)
        return wl * left + wr * right + wu * x_h[:-2] + wd * x_h[2:]

    def half(a, b, mask):
        ab_h = with_halo_rows(jnp.stack([a, b]), 1, axis_name)
        s1 = -alpha * nbr(a, ab_h[0]) + imdxy * b
        a = jnp.where(mask, (1 - omega) * a + (rhs_x - s1) * rdx, a)
        s2 = -alpha * nbr(b, ab_h[1]) + imdxy * a
        b = jnp.where(mask, (1 - omega) * b + (rhs_y - s2) * rdy, b)
        return a, b

    def sweep(_, c):
        a, b = c
        a, b = half(a, b, red)
        a, b = half(a, b, ~red)
        return a, b

    return jax.lax.fori_loop(0, n_sor, sweep, (du, dv))


def _tiled_level_solver(
    feat1,
    feat2,
    u_full,
    v_full,
    *,
    params: FlowParams,
    n_outer: int,
    n_inner: int,
    n_sor: int,
    axis_name: str = "ty",
):
    """One pyramid level of SmoothFlowSOR, row-sharded over ``axis_name``
    (a single mesh axis or an axis-name tuple like ``('ty', 'tx')`` — the
    collectives flatten composed axes, so a 3-axis §5.8 mesh tiles as finer
    row bands).

    All arguments are FULL (replicated) arrays; the function internally owns
    rows ``[idx*h, (idx+1)*h)`` and returns full (replicated) updated flow.
    """
    n_ty = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    real_h, w = u_full.shape[-2], u_full.shape[-1]
    h = -(-real_h // n_ty)
    pad_h = h * n_ty
    r0 = idx * h
    t = u_full.dtype.type
    alpha = t(params.alpha)
    omega = t(params.omega)

    g = r0 + jnp.arange(h)
    m_top = (g > 0)[:, None]
    m_bot = (g < real_h - 1)[:, None]

    feat1_p4 = _edge_fix_pad(feat1, real_h, pad_h, 4)
    # Flow-independent; built once per level — but only when packing keeps
    # the gather on its fast path (same policy as the single-chip warp).
    feat2_pack = pack_patch2x2(feat2) if should_prebuild_pack(feat2) else None
    y4 = jnp.clip(r0 - 4 + jnp.arange(h + 8), 0, real_h - 1)

    def gather_full(x_loc):
        xg = jax.lax.all_gather(x_loc, axis_name, axis=0, tiled=True)  # (pad_h, W)
        return xg

    # Loop-invariant hoists: frame 1's band and its getDxs pre-smooth
    # (only warpIm2 changes per outer iteration; values identical).
    f1_b4 = _band(feat1_p4, r0, h + 8, 4, 4)
    f1s_b = _presmooth_band(f1_b4, r0, real_h)

    def outer_body(_, carry):
        u_loc, v_loc = carry
        # Phase 1: warp + spatio-temporal derivatives on a halo-4 band.
        # A 4-row halo exchange replaces the r3 full flow all-gather —
        # the band only ever reads rows [r0-4, r0+h+4), so gathering the
        # whole field per outer iteration was ~8x the needed ICI bytes
        # (the one remaining all-gather runs once per LEVEL, for the
        # replicated inter-level resize).  Mesh-edge halos replicate the
        # shard's edge row, which IS the clamp row: the bottom shard's
        # ghost rows are maintained as copies of the last real row
        # (_repair_ghost), so values match the r3 _edge_fix_pad bands
        # bit-exactly.  Bands shorter than the halo (tiny coarse levels)
        # would need rows from beyond the immediate neighbor — those keep
        # the gather construction (they are a few KB anyway).  So do
        # levels with a FULLY-ghost shard ((n_ty-1)*h >= real_h): there
        # _repair_ghost's edge_idx clamps to that shard's local row 0,
        # which is itself a ghost, so its rows go stale after the first
        # outer iteration and the neighbor halo would feed stale values
        # into the bottom-edge stencils (ADVICE r4, high).
        if h >= 4 and (n_ty - 1) * h < real_h:
            uv_b4 = with_halo_rows(jnp.stack([u_loc, v_loc]), 4, axis_name)
            u_b4, v_b4 = uv_b4[0], uv_b4[1]
        else:
            u_p4 = _edge_fix_pad(gather_full(u_loc), real_h, pad_h, 4)
            v_p4 = _edge_fix_pad(gather_full(v_loc), real_h, pad_h, 4)
            u_b4 = _band(u_p4, r0, h + 8, 4, 4)
            v_b4 = _band(v_p4, r0, h + 8, 4, 4)
        warp_b4 = _warp_band(f1_b4, feat2, feat2_pack, u_b4, v_b4, y4,
                             real_h, r0=r0 - 4)
        imdx, imdy, imdt = _get_dxs_band(f1s_b, warp_b4, r0, real_h)

        u_b2 = u_b4[..., 2:-2, :]
        v_b2 = v_b4[..., 2:-2, :]
        u_loc = u_b4[..., 4:-4, :]
        v_loc = v_b4[..., 4:-4, :]

        du = jnp.zeros((h, w), u_full.dtype)
        dv = jnp.zeros((h, w), u_full.dtype)

        for _inner in range(n_inner):
            # Phase 2-3: flow derivatives and robust weights on halo-1 band.
            du_b2 = with_halo_rows(du, 2, axis_name)
            dv_b2 = with_halo_rows(dv, 2, axis_name)
            uu_b2 = u_b2 + du_b2
            vv_b2 = v_b2 + dv_b2
            ux_b1 = jnp.concatenate(
                [uu_b2[..., 1:-1, 1:] - uu_b2[..., 1:-1, :-1],
                 jnp.zeros((h + 2, 1), u_full.dtype)], axis=-1)
            vx_b1 = jnp.concatenate(
                [vv_b2[..., 1:-1, 1:] - vv_b2[..., 1:-1, :-1],
                 jnp.zeros((h + 2, 1), u_full.dtype)], axis=-1)
            uy_b1 = uu_b2[..., 2:, :] - uu_b2[..., 1:-1, :]
            vy_b1 = vv_b2[..., 2:, :] - vv_b2[..., 1:-1, :]
            # Forward-difference dy is zero on the real last row; edge-fixed
            # bands already guarantee that for the *initial* flow, and the
            # ghost-row repair keeps du/dv consistent too — but shard-edge
            # halos are real neighbor rows, so mask explicitly at the image
            # bottom for the du/dv part (with_halo edge-replicates only at
            # mesh ends).
            gb1 = jnp.clip(r0 - 1 + jnp.arange(h + 2), 0, real_h - 1)
            row_valid = (gb1 < real_h - 1)[:, None]
            uy_b1 = jnp.where(row_valid, uy_b1, 0)
            vy_b1 = jnp.where(row_valid, vy_b1, 0)
            phi_b1 = phi_weight(ux_b1, uy_b1, vx_b1, vy_b1, params.varepsilon_phi)
            phi = phi_b1[..., 1:-1, :]

            psi = psi_weight(imdx, imdy, imdt, du, dv, params.varepsilon_psi)
            imdxy, imdx2, imdy2, imdtdx, imdtdy = assemble_system(
                psi, imdx, imdy, imdt
            )
            lap_u = _weighted_laplacian_band(
                u_b2, phi_b1, g, real_h, params.compat_laplacian_borders
            )
            lap_v = _weighted_laplacian_band(
                v_b2, phi_b1, g, real_h, params.compat_laplacian_borders
            )
            rhs_x = -imdtdx - alpha * lap_u
            rhs_y = -imdtdy - alpha * lap_v

            # SOR neighbor weights (OpticalFlow.cpp:482-509).
            zcol = jnp.zeros((h, 1), u_full.dtype)
            wl = jnp.concatenate([zcol, phi[..., :, :-1]], axis=-1)
            wr = jnp.concatenate([phi[..., :, :-1], zcol], axis=-1)
            wu = jnp.where(m_top, phi_b1[..., :-2, :], 0)
            wd = jnp.where(m_bot, phi, 0)
            coeff = (wl + wr + wu + wd) * alpha
            diag = alpha * t(params.diag_reg_scale)
            denx = imdx2 + diag + coeff
            deny = imdy2 + diag + coeff

            from ..models.sor_dispatch import _pallas_available

            du, dv = _ghost_zone_sor(
                du, dv, phi, imdxy, denx, deny, rhs_x, rhs_y,
                r0=r0, real_h=real_h, n_sor=n_sor,
                alpha=alpha, omega=omega,
                sweeps_per_exchange=params.sor_halo_sweeps,
                axis_name=axis_name,
                use_pallas=(
                    params.use_pallas_sor
                    and params.sor_red_black
                    and _pallas_available()
                ),
            )
            du = _repair_ghost(du, r0, h, real_h)
            dv = _repair_ghost(dv, r0, h, real_h)

        return u_loc + du, v_loc + dv

    u0 = _band(_edge_fix_pad(u_full, real_h, pad_h, 0), r0, h, 0, 0)
    v0 = _band(_edge_fix_pad(v_full, real_h, pad_h, 0), r0, h, 0, 0)
    u_loc, v_loc = jax.lax.fori_loop(0, n_outer, outer_body, (u0, v0))
    return gather_full(u_loc)[:real_h], gather_full(v_loc)[:real_h]


def pair_flow_tiled(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    pyramid_levels: int,
    params: FlowParams,
    axis_name: str = "ty",
):
    """Full coarse-to-fine flow for ONE pair with every level's solve
    row-sharded over ``axis_name``.  Must run inside a ``shard_map`` whose
    mesh has that axis; ``im1``/``im2``: ``(C, H, W)`` replicated across it.
    Pyramid/features/final-warp are computed replicated (cheap, once per
    level); only the fixed-point/SOR state is sharded."""
    assert params.interpolation == Interpolation.BILINEAR, (
        "tiled path supports the reference default (bilinear feedback)"
    )
    ratio = clamp_ratio(params.ratio)
    pyr1 = build_pyramid(im1, ratio, pyramid_levels)
    pyr2 = build_pyramid(im2, ratio, pyramid_levels)
    t = im1.dtype.type

    u = v = None
    for k in range(pyramid_levels - 1, -1, -1):
        feat1 = im2feature(pyr1[k], params.color_type)
        feat2 = im2feature(pyr2[k], params.color_type)
        h, w = feat1.shape[-2], feat1.shape[-1]
        if k == pyramid_levels - 1:
            u = jnp.zeros((h, w), im1.dtype)
            v = jnp.zeros((h, w), im1.dtype)
        else:
            inv_ratio = t(1.0 / ratio)
            u = resize_to(u, h, w) * inv_ratio
            v = resize_to(v, h, w) * inv_ratio
        n_outer, n_inner, n_sor = params.level_schedule(k)
        u, v = _tiled_level_solver(
            feat1, feat2, u, v,
            params=params, n_outer=n_outer, n_inner=n_inner, n_sor=n_sor,
            axis_name=axis_name,
        )

    warp_i2 = threshold01(warp_bicubic_ref(im1, im2, u, v))
    return u, v, warp_i2


@functools.partial(
    jax.jit, static_argnames=("pyramid_levels", "params", "mesh", "axis_name")
)
def tiled_coarse2fine_flow(
    im1, im2, pyramid_levels: int, params: FlowParams, mesh: Mesh,
    axis_name: str = "ty",
):
    """Single-pair flow, row-tiled over ``axis_name`` of ``mesh``."""
    fn = functools.partial(
        pair_flow_tiled,
        pyramid_levels=pyramid_levels,
        params=params,
        axis_name=axis_name,
    )
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # outputs replicated by construction (all_gather)
    )(im1, im2)
