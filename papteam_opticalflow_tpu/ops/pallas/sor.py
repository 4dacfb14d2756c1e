"""Fused red-black SOR Pallas kernel (whole level resident in VMEM).

The SOR sweep loop is the dominant cost of the solver
(``Code/Parallel/src/OpticalFlow.cpp:469-520``: ``30 + 3k`` sweeps per inner
iteration).  The XLA implementation re-reads every coefficient array from HBM
each half-sweep; this kernel instead pins the coefficient planes and the
``du/dv`` iterates in VMEM and runs ALL sweeps in one kernel launch, so HBM
traffic is one read of the system + one write of the result regardless of
sweep count.

The planes are packed into dense red/black half-planes (``rb_pack.py``)
outside the kernel (fused into the surrounding level jit), so every
half-sweep is a DENSE update of one (H, W/2) plane — no checkerboard
``where``-masking — and the sweep-invariant neighbor weights are built once
before the loop.  Measured on v5e at 296x512: 2.45 us/sweep vs 3.41 for the
r1 masked kernel (1.4x).  Each half-plane is a SEPARATE kernel operand:
slicing a loaded ``[R|B]`` concat value into halves de-optimized the whole
loop body (~2.5x slower), so the pack boundary lives at the pallas_call
signature.  Results match ``models/solver.sor_solve_jnp`` to float
associativity (same per-point arithmetic and ordering).

Levels too large for VMEM fall back to the ghost-zone blocked kernel or the
XLA path (see ``models/sor_dispatch.py``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rb_pack import (
    make_packed_sweep,
    make_packed_weights,
    pack_rb,
    unpack_rb,
)

# Whole-level-resident admission gate.  The packed kernel keeps ~14
# plane-equivalents live (6 system + 4 precomputed weights + 2 reciprocal
# denominators + 2 iterates) plus Mosaic temporaries for the rolled
# neighbor sums; budget at 40 f32-planes/pixel with headroom so a fresh
# compile (no cache) never hits the scoped-vmem OOM.  (The r1 unpacked
# kernel measured ~32 planes with 8 resident; weights add 4+2 resident.)
_VMEM_BUDGET_BYTES = 15 * 1024 * 1024
_PLANES = 40

# Interpret-mode escape hatch for CPU tests (tests/test_pallas_interpret.py).
_INTERPRET = False


def sor_fits_vmem(h: int, w: int, dtype) -> bool:
    return _PLANES * h * w * jnp.dtype(dtype).itemsize <= _VMEM_BUDGET_BYTES


def _roll(x, shift, axis):
    # pltpu.roll requires a non-negative shift; normalize modulo the axis size.
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _sor_kernel(
    n_iterations: int,
    h: int,       # TRUE image height (border masks)
    w: int,       # TRUE image width (border masks; halves are w_pad/2 wide)
    alpha: float,
    omega: float,
    phi_r_ref, phi_b_ref,
    imdxy_r_ref, imdxy_b_ref,
    denx_r_ref, denx_b_ref,
    deny_r_ref, deny_b_ref,
    rhsx_r_ref, rhsx_b_ref,
    rhsy_r_ref, rhsy_b_ref,
    du_r_ref, du_b_ref,
    dv_r_ref, dv_b_ref,
):
    phi_r = phi_r_ref[:]
    phi_b = phi_b_ref[:]

    t = phi_r.dtype.type
    alpha = t(alpha)
    omega = t(omega)
    # Hoist the divides out of the sweep loop: du update becomes
    # (1-w)du + (rhs - sigma) * (w/den).
    rdx_r = omega / denx_r_ref[:]
    rdx_b = omega / denx_b_ref[:]
    rdy_r = omega / deny_r_ref[:]
    rdy_b = omega / deny_b_ref[:]

    rows, w2 = phi_r.shape
    gi = jax.lax.broadcasted_iota(jnp.int32, (rows, w2), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows, w2), 1)
    evrow = (gi % 2) == 0
    weights = make_packed_weights(phi_r, phi_b, gi, jj, h, w, _roll)
    sweep = make_packed_sweep(
        weights,
        imdxy_r_ref[:], imdxy_b_ref[:],
        rdx_r, rdx_b, rdy_r, rdy_b,
        rhsx_r_ref[:], rhsx_b_ref[:],
        rhsy_r_ref[:], rhsy_b_ref[:],
        evrow, alpha, omega, _roll,
    )

    zero = jnp.zeros_like(phi_r)
    du_r, du_b, dv_r, dv_b = jax.lax.fori_loop(
        0, n_iterations, lambda _, c: sweep(*c), (zero, zero, zero, zero)
    )
    du_r_ref[:] = du_r
    du_b_ref[:] = du_b
    dv_r_ref[:] = dv_r
    dv_b_ref[:] = dv_b


@functools.partial(
    jax.jit, static_argnames=("n_iterations", "h", "w", "alpha", "omega")
)
def _sor_call(*halves, n_iterations, h, w, alpha, omega):
    rows, w2 = halves[0].shape
    kernel = functools.partial(_sor_kernel, n_iterations, h, w, alpha, omega)
    out_shape = [jax.ShapeDtypeStruct((rows, w2), halves[0].dtype)] * 4
    flops_per_half = 22 * rows * w2
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_iterations * flops_per_half,
            bytes_accessed=16 * rows * w2 * halves[0].dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(*halves)


def _sor_band_kernel(
    n_sweeps: int,
    real_h: int,
    real_w: int,
    alpha: float,
    omega: float,
    row0_ref,  # SMEM (1,1): global row index of the band's first row
    phi_r_ref, phi_b_ref,
    imdxy_r_ref, imdxy_b_ref,
    denx_r_ref, denx_b_ref,
    deny_r_ref, deny_b_ref,
    rhsx_r_ref, rhsx_b_ref,
    rhsy_r_ref, rhsy_b_ref,
    du_r_in_ref, du_b_in_ref,
    dv_r_in_ref, dv_b_in_ref,
    du_r_ref, du_b_ref,
    dv_r_ref, dv_b_ref,
):
    """Packed red-black sweeps over a ROW BAND of a larger image: row
    parity and border masks come from GLOBAL row indices (``row0`` may be
    negative for a clamp-extended ghost band — such rows mask like row <=0
    and their values never propagate inward within the ghost budget).
    Used by the sharded ghost-zone solver (``parallel/tiled.py``) so the
    multi-chip path runs the same VMEM-resident kernel as single-chip."""
    phi_r = phi_r_ref[:]
    phi_b = phi_b_ref[:]
    t = phi_r.dtype.type
    alpha = t(alpha)
    omega = t(omega)
    rdx_r = omega / denx_r_ref[:]
    rdx_b = omega / denx_b_ref[:]
    rdy_r = omega / deny_r_ref[:]
    rdy_b = omega / deny_b_ref[:]

    rows, w2 = phi_r.shape
    li = jax.lax.broadcasted_iota(jnp.int32, (rows, w2), 0)
    gi = li + row0_ref[0, 0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows, w2), 1)
    evrow = (gi % 2) == 0
    weights = make_packed_weights(phi_r, phi_b, gi, jj, real_h, real_w, _roll)
    sweep = make_packed_sweep(
        weights,
        imdxy_r_ref[:], imdxy_b_ref[:],
        rdx_r, rdx_b, rdy_r, rdy_b,
        rhsx_r_ref[:], rhsx_b_ref[:],
        rhsy_r_ref[:], rhsy_b_ref[:],
        evrow, alpha, omega, _roll,
    )
    du_r, du_b, dv_r, dv_b = jax.lax.fori_loop(
        0, n_sweeps, lambda _, c: sweep(*c),
        (du_r_in_ref[:], du_b_in_ref[:], dv_r_in_ref[:], dv_b_in_ref[:]),
    )
    du_r_ref[:] = du_r
    du_b_ref[:] = du_b
    dv_r_ref[:] = dv_r
    dv_b_ref[:] = dv_b


def band_fits_vmem(rows: int, w: int, dtype) -> bool:
    """Admission gate for the band kernel.  Unlike the whole-level kernel
    (default 16 MB scoped limit), the band call raises its scoped-VMEM
    limit like the blocked kernel does, so the budget is 48 half-planes
    against 56 MB; the per-value Mosaic window-area ceiling (~215k
    elements, see sor_blocked.py) still applies."""
    w2_pad = -(-((w + 1) // 2) // 128) * 128
    rows_pad = -(-rows // 8) * 8
    if rows_pad * w2_pad > 215_040:
        return False
    return 48 * rows * (w2_pad) * jnp.dtype(dtype).itemsize <= 56 * 1024 * 1024


def sor_band_pallas(
    du, dv, phi, imdxy, denx, deny, rhs_x, rhs_y,
    *, row0, real_h: int, real_w: int, n_sweeps: int,
    alpha: float, omega: float,
):
    """``n_sweeps`` packed red-black sweeps on an ``(hE, w)`` band starting
    at (possibly traced, possibly negative) global row ``row0``; continues
    from the given ``du``/``dv``.  Same arithmetic as the XLA band sweeps
    in ``parallel/tiled._ghost_zone_sor``."""
    hE, w = du.shape
    w_pad = w + (w % 2)
    row0 = jnp.asarray(row0, jnp.int32)

    def prep(x, const=0.0):
        if w_pad != w:
            x = jnp.pad(x, ((0, 0), (0, 1)), constant_values=const)
        # Colors by GLOBAL parity: a band starting at an odd global row
        # must pack consistently with the kernel's gi-based masks.
        return pack_rb(x, row0=row0)

    halves = (
        *prep(phi), *prep(imdxy), *prep(denx, 1.0), *prep(deny, 1.0),
        *prep(rhs_x), *prep(rhs_y), *prep(du), *prep(dv),
    )
    kernel = functools.partial(
        _sor_band_kernel, n_sweeps, real_h, real_w,
        float(alpha), float(omega),
    )
    w2 = w_pad // 2
    row0_arr = row0.reshape(1, 1)
    # Raise the scoped-VMEM limit to the band's actual footprint (the
    # default ~16 MB cap rejects realistic 1920px-wide shard bands; a
    # 167x960-half band measured 16.93 MB scoped).  48 half-planes covers
    # the ~27 measured resident planes plus Mosaic temporaries.
    vmem_limit = min(
        100 * 2**20,
        max(24 * 2**20, 48 * hE * w2 * du.dtype.itemsize),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((hE, w2), du.dtype)] * 4,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=44 * n_sweeps * hE * w2,
            bytes_accessed=20 * hE * w2 * du.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(row0_arr, *halves)
    du_r, du_b, dv_r, dv_b = out
    return (
        unpack_rb(du_r, du_b, row0=row0)[:, :w],
        unpack_rb(dv_r, dv_b, row0=row0)[:, :w],
    )


def sor_solve_pallas(system, n_iterations: int, params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h, w = system.phi.shape
    w_pad = w + (w % 2)

    def prep(x, const=0.0):
        if w_pad != w:
            x = jnp.pad(x, ((0, 0), (0, 1)), constant_values=const)
        return pack_rb(x)

    halves = (
        *prep(system.phi),
        *prep(system.imdxy),
        # Denominators pad with 1 (not 0): padded cells still evaluate the
        # update formula and 0/0 -> NaN would poison the rolls.
        *prep(system.denom_x, 1.0),
        *prep(system.denom_y, 1.0),
        *prep(system.rhs_x),
        *prep(system.rhs_y),
    )
    du_r, du_b, dv_r, dv_b = _sor_call(
        *halves,
        n_iterations=n_iterations,
        h=h,
        w=w,
        alpha=float(params.alpha),
        omega=float(params.omega),
    )
    du = unpack_rb(du_r, du_b)[:, :w]
    dv = unpack_rb(dv_r, dv_b)[:, :w]
    return du, dv
