"""Temporally-blocked (ghost-zone) red-black SOR Pallas kernel.

For pyramid levels too large for the whole-level-in-VMEM kernel
(``ops/pallas/sor.py``), the XLA fallback re-reads the ~8 coefficient/iterate
planes from HBM for every half-sweep — at the finest level of a 1920px run
that is ~300 plane passes per inner iteration, plus ~60 op launches.

This kernel applies the classic stencil *temporal blocking* trick to the
red-black sweep (SURVEY.md §5.7's spatial-tiling plan, applied to time):

* the image is cut into row bands of ``R`` valid rows;
* each band loads a window of ``R + 4S`` rows (a ``2S``-row ghost zone per
  side) of all six coefficient planes and the current ``du``/``dv`` iterates
  into VMEM with explicit DMAs;
* it runs ``S`` full red-black sweeps entirely in VMEM — one full sweep
  invalidates two ghost rows per side, so after ``S`` sweeps the central
  ``R`` rows are bit-identical to ``S`` global sweeps;
* only the valid ``R`` rows of ``du``/``dv`` are DMA'd back.

HBM traffic per chunk of ``S`` sweeps: ``8 * (R + 4S) + 2R`` row-planes
instead of XLA's ``10 * R * S`` — a ~5x reduction at ``S = 8`` — and one
kernel launch instead of ``4S`` fused-op launches.

Bands are independent within a chunk (grid is sequential on one TensorCore,
so duplicate writes of the clamped edge bands are race-free and identical);
the chunk loop lives in the caller.  Cited reference semantics:
``OpticalFlow.cpp:469-520`` (sweep arithmetic), ``:482-509`` (border
weights).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the windowed planes.  Measured on v5e: the compiled
# kernel's scoped footprint is ~25 window-planes (8 resident + Mosaic
# temporaries for the rolled neighbor sums); budget at 26.  The pallas_call
# raises the scoped-VMEM limit to match the window (the default ~16 MB cap
# would reject the deeper plans; v5e has 128 MB of VMEM).
_VMEM_BUDGET_BYTES = 56 * 1024 * 1024
_WINDOW_PLANES = 26
# Empirical Mosaic ceiling on window_rows * w_pad (elements) on this
# toolchain: 112x1920 = 215040 compiles and runs, 128x1920 crashes the
# compiler (tpu_compile_helper exit 1), while 128x960 has always worked —
# the constraint is the window AREA, not the row count or VMEM alone.
_WINDOW_ELEMS_MAX = 215_040


def plan_blocking(h: int, w: int, itemsize: int) -> Tuple[int, int] | None:
    """Pick (band_rows R, sweeps_per_chunk S) such that the ghost-zone
    window fits both the VMEM budget and the Mosaic window-area ceiling;
    None if the level is too small to be worth blocking.  The DMA'd width
    is padded to a lane tile, so budget against that.  Larger R amortizes
    the 4S halo rows over more valid rows; measured at 1080x1920 on v5e:
    (80,8) = 28 ms/30 sweeps vs (48,4) = 47 ms."""
    w_pad = -(-w // 128) * 128
    # NOTE: every candidate keeps 2*s % 8 == 0 so win_start = out_start -
    # halo stays sublane-aligned (the dropped (32, 2) plan violated that);
    # plans other than 112x1920 / 128x960 rest on the window-AREA theory
    # but 192x960 (the (160, 8) row at 960px) was exercised end-to-end by
    # the full 1920px P15 TPU bench.
    for r, s in ((224, 8), (160, 8), (128, 8), (96, 8), (80, 8), (64, 8),
                 (48, 4), (32, 4)):
        v = r + 4 * s
        if h < v:
            continue
        if v * w_pad > _WINDOW_ELEMS_MAX:
            continue
        if _WINDOW_PLANES * v * w_pad * itemsize <= _VMEM_BUDGET_BYTES:
            return r, s
    return None


def _sor_blocked_kernel(
    n_sweeps: int,
    band_rows: int,
    window_rows: int,
    h: int,       # TRUE image height (for boundary masks / checkerboard)
    h_pad: int,   # 8-aligned padded height of the HBM buffers (Mosaic DMA
                  # slices must be sublane/lane-tile aligned)
    w: int,       # TRUE image width (for boundary masks)
    w_pad: int,   # 128-aligned padded width of the HBM buffers
    alpha: float,
    omega: float,
    # inputs (HBM)
    phi_hbm,
    imdxy_hbm,
    denx_hbm,
    deny_hbm,
    rhsx_hbm,
    rhsy_hbm,
    du_in_hbm,
    dv_in_hbm,
    # outputs (HBM)
    du_out_hbm,
    dv_out_hbm,
    # scratch
    win,      # VMEM (8, window_rows, w); [6]/[7] double as output staging
    in_sem,
    out_sem,
):
    b = pl.program_id(0)
    halo = (window_rows - band_rows) // 2
    # Last band is clamped so its valid rows overlap the previous band
    # (identical values; grid steps are sequential, so no write race).
    # All starts stay multiples of 8 because band_rows, halo, h_pad and
    # window_rows are — Mosaic requires sublane-aligned DMA slices.
    out_start = pl.multiple_of(
        jnp.minimum(b * band_rows, h_pad - band_rows), 8
    )
    win_start = pl.multiple_of(
        jnp.clip(out_start - halo, 0, h_pad - window_rows), 8
    )

    srcs = (phi_hbm, imdxy_hbm, denx_hbm, deny_hbm, rhsx_hbm, rhsy_hbm,
            du_in_hbm, dv_in_hbm)
    for i, src in enumerate(srcs):
        pltpu.make_async_copy(
            src.at[pl.ds(win_start, window_rows)], win.at[i], in_sem
        ).start()
    for i in range(len(srcs)):
        pltpu.make_async_copy(
            srcs[i].at[pl.ds(win_start, window_rows)], win.at[i], in_sem
        ).wait()

    phi = win[0]
    imdxy = win[1]
    rhsx = win[4]
    rhsy = win[5]
    du0 = win[6]
    dv0 = win[7]

    t = phi.dtype.type
    alpha = t(alpha)
    omega = t(omega)
    # Divides hoisted out of the sweep loop (same transform as sor.py).
    rdx = omega / win[2]
    rdy = omega / win[3]

    li = jax.lax.broadcasted_iota(jnp.int32, (window_rows, w_pad), 0)
    gi = li + win_start  # global row index
    j = jax.lax.broadcasted_iota(jnp.int32, (window_rows, w_pad), 1)
    red = ((gi + j) % 2) == 0
    zero = jnp.zeros_like(phi)

    def roll(x, shift, axis):
        return pltpu.roll(x, shift % x.shape[axis], axis)

    # Border-masked neighbor weights from GLOBAL coordinates
    # (OpticalFlow.cpp:482-509); recomputed per use to cap VMEM residency.
    def nbr_sum(x):
        wl = jnp.where(j > 0, roll(phi, 1, 1), zero)
        wr = jnp.where(j < w - 1, phi, zero)
        wu = jnp.where(gi > 0, roll(phi, 1, 0), zero)
        wd = jnp.where(gi < h - 1, phi, zero)
        return (
            wl * roll(x, 1, 1)
            + wr * roll(x, -1, 1)
            + wu * roll(x, 1, 0)
            + wd * roll(x, -1, 0)
        )

    def half(du, dv, mask):
        sigma1 = -alpha * nbr_sum(du) + imdxy * dv
        du = jnp.where(mask, (1 - omega) * du + (rhsx - sigma1) * rdx, du)
        sigma2 = -alpha * nbr_sum(dv) + imdxy * du
        dv = jnp.where(mask, (1 - omega) * dv + (rhsy - sigma2) * rdy, dv)
        return du, dv

    def body(_, carry):
        du, dv = carry
        du, dv = half(du, dv, red)
        du, dv = half(du, dv, jnp.logical_not(red))
        return du, dv

    du, dv = jax.lax.fori_loop(0, n_sweeps, body, (du0, dv0))

    # Valid center rows -> HBM, via a dynamically-sliced ref DMA (Mosaic
    # cannot lower a value-level dynamic_slice, but ref slicing in a DMA is
    # native).  Reuse the window scratch as the staging buffer.
    off = pl.multiple_of(out_start - win_start, 8)  # in [0, 2*halo]
    win[6] = du
    win[7] = dv
    cp0 = pltpu.make_async_copy(
        win.at[6].at[pl.ds(off, band_rows)],
        du_out_hbm.at[pl.ds(out_start, band_rows)],
        out_sem,
    )
    cp1 = pltpu.make_async_copy(
        win.at[7].at[pl.ds(off, band_rows)],
        dv_out_hbm.at[pl.ds(out_start, band_rows)],
        out_sem,
    )
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "n_sweeps", "band_rows", "window_rows", "alpha", "omega",
    ),
)
def _sor_blocked_chunk(
    phi, imdxy, denx, deny, rhsx, rhsy, du, dv,
    *, h, w, n_sweeps, band_rows, window_rows, alpha, omega,
):
    """Inputs are already padded to (h_pad, w_pad); ``h``/``w`` are the true
    extents used for boundary masks.  Returns padded (h_pad, w_pad) outputs."""
    h_pad, w_pad = phi.shape
    n_bands = -(-h_pad // band_rows)
    kernel = functools.partial(
        _sor_blocked_kernel, n_sweeps, band_rows, window_rows, h, h_pad,
        w, w_pad, alpha, omega,
    )
    # Size the scoped-VMEM limit from the actual window footprint (the
    # default ~16 MB cap would reject the deeper-blocking plans; v5e has
    # 128 MB of VMEM).  Budget = explicit scratch + Mosaic temporaries for
    # the rolled neighbor sums (~3x the 8 resident window planes, measured).
    vmem_limit = min(
        100 * 2**20,
        max(24 * 2**20, 26 * window_rows * w_pad * phi.dtype.itemsize),
    )
    return pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((h_pad, w_pad), phi.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((8, window_rows, w_pad), phi.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=44 * n_sweeps * h_pad * w_pad,
            bytes_accessed=(8 * window_rows * n_bands + 2 * h_pad) * w_pad
            * phi.dtype.itemsize,
            transcendentals=0,
        ),
    )(phi, imdxy, denx, deny, rhsx, rhsy, du, dv)


def sor_solve_blocked(
    system, n_iterations: int, params, plan: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``n_iterations`` red-black sweeps in ``ceil(n/S)`` ghost-zone
    chunks.  Bit-identical to ``sor_solve_jnp`` (same arithmetic, same
    sweep ordering)."""
    band_rows, s = plan
    h, w = system.phi.shape
    h_pad = -(-h // 8) * 8
    w_pad = -(-w // 128) * 128  # Mosaic DMA slices need lane-tile alignment
    pad = ((0, h_pad - h), (0, w_pad - w))
    # Denominators pad with 1 (not 0): padded cells still evaluate the
    # update formula, and 0/0 -> NaN would leak into valid cells through
    # 0 * NaN in the rolled neighbor sums.
    def padded(x, const=0.0):
        if pad == ((0, 0), (0, 0)):
            return x
        return jnp.pad(x, pad, constant_values=const)

    args = (
        padded(system.phi),
        padded(system.imdxy),
        padded(system.denom_x, 1.0),
        padded(system.denom_y, 1.0),
        padded(system.rhs_x),
        padded(system.rhs_y),
    )
    du = jnp.zeros((h_pad, w_pad), system.phi.dtype)
    dv = jnp.zeros((h_pad, w_pad), system.phi.dtype)
    remaining = n_iterations
    while remaining > 0:
        step = min(s, remaining)
        du, dv = _sor_blocked_chunk(
            *args, du, dv,
            h=h, w=w,
            n_sweeps=step,
            band_rows=band_rows,
            window_rows=band_rows + 4 * s,
            alpha=float(params.alpha),
            omega=float(params.omega),
        )
        remaining -= step
    return du[:h, :w], dv[:h, :w]
