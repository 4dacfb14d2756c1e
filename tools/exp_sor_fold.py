"""SOR issue-pressure experiment (VERDICT r3 task 8): folded-plane sweep.

The packed red-black sweep runs ~1.1-1.3 TF/s useful f32 work — VPU
ISSUE-bound at 50-68% of the measured ceilings (tools/vpu_peak.py), with
~19 vreg ops per half-plane component update:

    s  = -alpha * (wl*l + wr*r + wu*u + wd*d) + imdxy * other
    x' = (1-omega) * x + (rhs - s) * rd          [rd = omega / denom]

Distributing ``rd`` through the update gives an equivalent pure-FMA
chain (same fixed point, different rounding):

    x' = (1-omega)*x + A + Bl*l + Br*r + Bu*u + Bd*d - C*other
    A  = rhs * rd,  B* = alpha * rd * w*,  C = rd * imdxy

— 6 FMAs + 3 rolls + 2 parity selects = ~11 ops (~1.7x less issue
pressure) at the cost of 3 extra resident half-planes per color per
component (the folds are sweep-invariant, computed once per solve).

This tool measures both sweeps as whole-level Pallas kernels, reporting
us/sweep and the speedup, plus the max |delta| after n sweeps (expected:
f32 reassociation noise only).

OUTCOME (v5e, r4): recorded DEAD END for production.  At small shapes
the fold is a large win (296x512: 1.70 -> 0.57 us/sweep, 3.0x; 160x960:
0.99 -> 0.31, 3.2x) and deltas are pure f32 reassociation (~2e-7 after
30 sweeps).  But at the shapes the engine actually runs hot — the
blocked kernel's (192, 960-half) windows at 1080x1920 — Mosaic's
schedule inverts: 6.73 -> 5.49 us/sweep (1.2x) in isolation and
not reflected end-to-end (pair measured 181-183 ms folded vs 174.7
pre-fold — though the machine drifted ~+8% during the session: the
REVERTED build measured 189-195 minutes later, so treat the end-to-end
delta as bounded by noise), with chaotic shape sensitivity in isolated
chunk probes (192x960 measured 0.28x, 96x1920 5.6x on the same run).  The production sweeps keep the r3 arithmetic
(bit-pinned across all four backends); wiring the fold only into the
small-level whole-level kernel would break the cross-backend 1e-14 pins
for ~2 ms of the 39 ms SOR total (small levels are a minor share) and
was rejected.  Revisit if a future Mosaic toolchain schedules long FMA
chains better at wide lane counts.

Run: python tools/exp_sor_fold.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from papteam_opticalflow_tpu.ops.pallas.rb_pack import (
    make_packed_sweep,
    make_packed_weights,
    pack_rb,
)

ALPHA, OMEGA = 0.012, 1.8


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _folded_sweep(weights, imdxy, rd, rhs, evrow, alpha, omega, roll):
    """The folded-plane sweep: precompute per color/component
    A = rhs*rd, B* = alpha*rd*w*, C = rd*imdxy, then pure FMA chains."""
    wl_r, wr_r, wu_r, wd_r, wl_b, wr_b, wu_b, wd_b = weights
    imdxy_r, imdxy_b = imdxy
    rdx_r, rdx_b, rdy_r, rdy_b = rd
    rhsx_r, rhsx_b, rhsy_r, rhsy_b = rhs

    def folds(rd_c, w4):
        wl, wr, wu, wd = w4
        return (alpha * rd_c * wl, alpha * rd_c * wr,
                alpha * rd_c * wu, alpha * rd_c * wd)

    w_r = (wl_r, wr_r, wu_r, wd_r)
    w_b = (wl_b, wr_b, wu_b, wd_b)
    bx_r = folds(rdx_r, w_r)
    by_r = folds(rdy_r, w_r)
    bx_b = folds(rdx_b, w_b)
    by_b = folds(rdy_b, w_b)
    ax_r, ay_r = rhsx_r * rdx_r, rhsy_r * rdy_r
    ax_b, ay_b = rhsx_b * rdx_b, rhsy_b * rdy_b
    cx_r, cy_r = rdx_r * imdxy_r, rdy_r * imdxy_r
    cx_b, cy_b = rdx_b * imdxy_b, rdy_b * imdxy_b
    om = 1 - omega

    def sweep_real(du_r, du_b, dv_r, dv_b):
        du_r = upd_red_x(du_r, du_b, dv_r)
        dv_r = upd_red_y(dv_r, dv_b, du_r)
        du_b = upd_blk_x(du_b, du_r, dv_b)
        dv_b = upd_blk_y(dv_b, dv_r, du_b)
        return du_r, du_b, dv_r, dv_b

    def upd_red_x(x, xnbr, other):
        bl, br, bu, bd = bx_r
        left = jnp.where(evrow, roll(xnbr, 1, 1), xnbr)
        right = jnp.where(evrow, xnbr, roll(xnbr, -1, 1))
        return (om * x + ax_r + bl * left + br * right
                + bu * roll(xnbr, 1, 0) + bd * roll(xnbr, -1, 0)
                - cx_r * other)

    def upd_red_y(x, xnbr, other):
        bl, br, bu, bd = by_r
        left = jnp.where(evrow, roll(xnbr, 1, 1), xnbr)
        right = jnp.where(evrow, xnbr, roll(xnbr, -1, 1))
        return (om * x + ay_r + bl * left + br * right
                + bu * roll(xnbr, 1, 0) + bd * roll(xnbr, -1, 0)
                - cy_r * other)

    def upd_blk_x(x, xnbr, other):
        bl, br, bu, bd = bx_b
        left = jnp.where(evrow, xnbr, roll(xnbr, 1, 1))
        right = jnp.where(evrow, roll(xnbr, -1, 1), xnbr)
        return (om * x + ax_b + bl * left + br * right
                + bu * roll(xnbr, 1, 0) + bd * roll(xnbr, -1, 0)
                - cx_b * other)

    def upd_blk_y(x, xnbr, other):
        bl, br, bu, bd = by_b
        left = jnp.where(evrow, xnbr, roll(xnbr, 1, 1))
        right = jnp.where(evrow, roll(xnbr, -1, 1), xnbr)
        return (om * x + ay_b + bl * left + br * right
                + bu * roll(xnbr, 1, 0) + bd * roll(xnbr, -1, 0)
                - cy_b * other)

    return sweep_real


def _make_call(h, w, n_iter, folded: bool):
    def kernel(*refs):
        (phi_r_ref, phi_b_ref, imdxy_r_ref, imdxy_b_ref,
         denx_r_ref, denx_b_ref, deny_r_ref, deny_b_ref,
         rhsx_r_ref, rhsx_b_ref, rhsy_r_ref, rhsy_b_ref,
         du_r_ref, du_b_ref, dv_r_ref, dv_b_ref) = refs
        phi_r = phi_r_ref[:]
        phi_b = phi_b_ref[:]
        t = phi_r.dtype.type
        alpha = t(ALPHA)
        omega = t(OMEGA)
        rdx_r = omega / denx_r_ref[:]
        rdx_b = omega / denx_b_ref[:]
        rdy_r = omega / deny_r_ref[:]
        rdy_b = omega / deny_b_ref[:]
        rows, w2 = phi_r.shape
        gi = jax.lax.broadcasted_iota(jnp.int32, (rows, w2), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (rows, w2), 1)
        evrow = (gi % 2) == 0
        weights = make_packed_weights(phi_r, phi_b, gi, jj, h, w, _roll)
        if folded:
            sweep = _folded_sweep(
                weights,
                (imdxy_r_ref[:], imdxy_b_ref[:]),
                (rdx_r, rdx_b, rdy_r, rdy_b),
                (rhsx_r_ref[:], rhsx_b_ref[:], rhsy_r_ref[:], rhsy_b_ref[:]),
                evrow, alpha, omega, _roll,
            )
        else:
            sweep = make_packed_sweep(
                weights, imdxy_r_ref[:], imdxy_b_ref[:],
                rdx_r, rdx_b, rdy_r, rdy_b,
                rhsx_r_ref[:], rhsx_b_ref[:], rhsy_r_ref[:], rhsy_b_ref[:],
                evrow, alpha, omega, _roll,
            )
        zero = jnp.zeros_like(phi_r)
        du_r, du_b, dv_r, dv_b = jax.lax.fori_loop(
            0, n_iter, lambda _, c: sweep(*c), (zero, zero, zero, zero)
        )
        du_r_ref[:] = du_r
        du_b_ref[:] = du_b
        dv_r_ref[:] = dv_r
        dv_b_ref[:] = dv_b

    @jax.jit
    def call(*halves):
        rows, w2 = halves[0].shape
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((rows, w2), halves[0].dtype)] * 4,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
        )(*halves)

    return call


def run(h=296, w=512):
    rng = np.random.default_rng(0)

    def f(lo=0.5):
        return jnp.asarray(lo + rng.random((h, w)), jnp.float32)

    arrs = dict(
        phi=f(), imdxy=f(0.0) * 0.1, denx=f(1.0), deny=f(1.0),
        rhsx=f(-0.5), rhsy=f(-0.5),
    )
    halves = []
    for k in ("phi", "imdxy", "denx", "deny", "rhsx", "rhsy"):
        halves.extend(pack_rb(arrs[k]))

    def timed(call):
        out = call(*halves)
        float(jnp.sum(out[0]))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(jnp.sum(call(*halves)[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = 30, 330
    res = {}
    for name, folded in (("current", False), ("folded", True)):
        t_lo = timed(_make_call(h, w, lo, folded))
        t_hi = timed(_make_call(h, w, hi, folded))
        res[name + "_us_per_sweep"] = round(
            (t_hi - t_lo) / (hi - lo) * 1e6, 3
        )
    res["speedup"] = round(
        res["current_us_per_sweep"] / res["folded_us_per_sweep"], 3
    )
    # Numerical delta after 30 sweeps (expect f32 reassociation noise).
    cur = _make_call(h, w, 30, False)(*halves)
    fld = _make_call(h, w, 30, True)(*halves)
    res["max_delta_30_sweeps"] = float(
        max(jnp.max(jnp.abs(a - b)) for a, b in zip(cur, fld))
    )
    res["shape"] = f"{h}x{w}"
    return res


if __name__ == "__main__":
    out = {}
    out["small"] = run(296, 512)
    out["band"] = run(160, 960)
    print(json.dumps(out, indent=2))
