"""Fused red-black SOR Pallas kernel (whole level resident in VMEM).

The SOR sweep loop is the dominant cost of the solver
(``Code/Parallel/src/OpticalFlow.cpp:469-520``: ``30 + 3k`` sweeps per inner
iteration).  The XLA implementation re-reads every coefficient array from HBM
each half-sweep; this kernel instead pins the six coefficient planes and the
``du/dv`` iterates in VMEM and runs ALL sweeps in one kernel launch, so HBM
traffic is one read of the system + one write of the result regardless of
sweep count.

Neighbor access uses circular ``pltpu.roll``; correctness at the borders is
guaranteed because the border neighbor *weights* are identically zero
(``neighbor_weights``), so wrapped values are multiplied by 0.

Levels too large for VMEM fall back to the XLA path (see
``models/sor_dispatch.py``); a halo-tiled multi-block kernel is the planned
upgrade for the finest levels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Whole-level-resident admission gate.  Measured on v5e: the compiled
# kernel's scoped VMEM footprint is ~127 bytes/pixel (6 coefficient planes +
# 2 iterates + Mosaic temporaries for the rolled neighbor sums), e.g.
# 303x540 f32 -> 20.85 MB reported by the compiler against the 16 MB scoped
# limit.  Budget at 32 f32-planes/pixel with headroom so a fresh compile
# (no cache) never hits the scoped-vmem OOM.
_VMEM_BUDGET_BYTES = 15 * 1024 * 1024
_PLANES = 32


def sor_fits_vmem(h: int, w: int, dtype) -> bool:
    return _PLANES * h * w * jnp.dtype(dtype).itemsize <= _VMEM_BUDGET_BYTES


def _roll(x, shift, axis):
    # pltpu.roll requires a non-negative shift; normalize modulo the axis size.
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _sor_kernel(
    n_iterations: int,
    alpha: float,
    omega: float,
    phi_ref,
    imdxy_ref,
    denx_ref,
    deny_ref,
    rhsx_ref,
    rhsy_ref,
    du_ref,
    dv_ref,
):
    phi = phi_ref[:]
    imdxy = imdxy_ref[:]
    rhsx = rhsx_ref[:]
    rhsy = rhsy_ref[:]
    h, w = phi.shape
    t = phi.dtype.type
    alpha = t(alpha)
    omega = t(omega)
    # Hoist the divides out of the sweep loop: du update becomes
    # (1-w)du + (rhs - sigma) * (w/den) — one multiply per point instead of
    # a divide every half-sweep.
    rdx = omega / denx_ref[:]
    rdy = omega / deny_ref[:]

    i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    red = ((i + j) % 2) == 0
    zero = jnp.zeros_like(phi)

    def nbr_sum(x):
        # Border-masked neighbor weights (models/solver.neighbor_weights),
        # recomputed from phi per call to keep VMEM residency at 8 planes.
        wl = jnp.where(j > 0, _roll(phi, 1, 1), zero)
        wr = jnp.where(j < w - 1, phi, zero)
        wu = jnp.where(i > 0, _roll(phi, 1, 0), zero)
        wd = jnp.where(i < h - 1, phi, zero)
        return (
            wl * _roll(x, 1, 1)
            + wr * _roll(x, -1, 1)
            + wu * _roll(x, 1, 0)
            + wd * _roll(x, -1, 0)
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

    du, dv = jax.lax.fori_loop(0, n_iterations, body, (zero, zero))
    du_ref[:] = du
    dv_ref[:] = dv


@functools.partial(jax.jit, static_argnames=("n_iterations", "alpha", "omega"))
def _sor_call(phi, imdxy, denx, deny, rhsx, rhsy, *, n_iterations, alpha, omega):
    h, w = phi.shape
    kernel = functools.partial(_sor_kernel, n_iterations, alpha, omega)
    out_shape = [jax.ShapeDtypeStruct((h, w), phi.dtype)] * 2
    flops_per_half = 22 * h * w
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_iterations * flops_per_half,
            bytes_accessed=8 * h * w * phi.dtype.itemsize,
            transcendentals=0,
        ),
    )(phi, imdxy, denx, deny, rhsx, rhsy)


def sor_solve_pallas(system, n_iterations: int, params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    du, dv = _sor_call(
        system.phi,
        system.imdxy,
        system.denom_x,
        system.denom_y,
        system.rhs_x,
        system.rhs_y,
        n_iterations=n_iterations,
        alpha=float(params.alpha),
        omega=float(params.omega),
    )
    return du, dv
