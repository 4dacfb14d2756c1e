"""Fused whole-level coarse-tail solver (Pallas/Mosaic) — the round-5 kernel.

Motivation (VERDICT r4 #1): at 1920px P15 the coarse pyramid levels >= 7
cost ~22 ms (~12% of the pair) running ``(7+k)`` outer x ``(30+3k)`` sweep
iterations of TINY ops — per-op fixed overhead, not arithmetic (the grids
are <= ~143x256 px).  This kernel runs the ENTIRE level solve of
``OpticalFlow::SmoothFlowSOR`` (``Code/Parallel/src/OpticalFlow.cpp:
242-551``) — all outer fixed-point iterations, including the bilinear warp
feedback (``warpFL``, ``:154-166``), ``getDxs`` (``:80-122``), the robust
Phi/Psi weights + system assembly (``:296-459``) and every red-black SOR
sweep — in ONE kernel launch with all state VMEM-resident, so a level that
used to execute ~45 tiny XLA ops per outer iteration becomes one call.

Decompositions (all building on the r4 warp-kernel playbook,
``ops/pallas/warp.py``):

* planes are ``(h, wp)`` with ``wp = nj * 128`` lane padding only (rows
  exact); per-128-lane blocks where ``take_along_axis`` needs a
  single-vreg gather dim;
* clamp-boundary x-stencils resolve through within-vreg lane gathers
  (``_gx``: per output block, adjacent source blocks selected by
  ``idx // 128`` masks); y-stencils through row-concat clamp extension
  and static row slices;
* the in-kernel warp loops over candidate row offsets ``d`` (a dynamic
  ``fori`` with data-derived bounds, like the strip kernels) rolling the
  VMEM-resident frame by ``d`` — no DMA, no alignment constraints;
* the SOR reuses the dense red/black packed sweep machinery
  (``rb_pack.make_packed_weights/make_packed_sweep``) with take-based
  pack/unpack; packed halves are single-vreg 128-lane planes.

Numerics: compute dtype is f32 (f64 under the CPU interpret tests); bf16
feature planes are up-converted ONCE and the warp feedback stays f32
across outer iterations (the XLA bf16 path re-rounds warpIm2 to bf16 each
outer — this kernel is the MORE accurate of the two, same contract as the
r4 warp kernel).  In f32/f64 the arithmetic mirrors the XLA path op for
op; differences are FMA contraction / reduction-order only.

Lane-padding safety: all out-of-image lanes are sanitized to finite
neutral values before they can meet a masked zero weight (0 * inf = NaN
is the failure mode this guards); flows are re-zeroed outside the true
width every outer iteration, so padding garbage can never compound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filters import DERIVATIVE_5TAP, PRESMOOTH_5TAP
from .rb_pack import make_packed_sweep, make_packed_weights

# Interpret-mode escape hatch for CPU tests.
_INTERPRET = False

# Admission: lane blocks (packed halves span <= 2 vreg-columns ->
# wp <= 512) and a VMEM footprint envelope (~55 plane-equivalents live
# across the outer body at C=5: 140k * 4 B * 55 ~= 31 MB, comfortably
# inside v5e VMEM).  r5 extension 3/80k -> 4/140k admits level 5 @1920
# (256x455), level 3 @960 (228x405) and the FINEST level @480 (270x480)
# — measured per-level wins on v5e (fused vs op-by-op XLA, see
# tools/exp_fused_extent.py): the whole 480px pair collapses to fused
# kernels end to end.
_MAX_NJ = 4
_MAX_AREA = 140_000  # h * wp elements per plane (level 5 @1920: 256*512)


def fused_level_fits(c: int, h: int, w: int, dtype) -> bool:
    """Whether the whole-level fused kernel admits this level shape."""
    if c < 1 or h < 1 or w < 2:
        return False
    nj = -(-w // 128)
    if nj > _MAX_NJ:
        return False
    wp = nj * 128
    if h * wp > _MAX_AREA:
        return False
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.float64),
        jnp.dtype(jnp.bfloat16),
    ):
        return False
    return True


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _level_kernel(
    c: int, h: int, w: int, nj: int,
    n_outer: int, n_inner: int, n_sor: int,
    alpha: float, omega: float,
    eps_phi: float, eps_psi: float, diag_scale: float,
    compat: bool, cdtype,
    feat1_ref, feat2_ref, warp0_ref, u_ref, v_ref,
    u_out_ref, v_out_ref, warp_out_ref, scratch_ref,
):
    # Every full-width plane is a LIST of nj single-vreg (h, 128) blocks:
    # Mosaic CHECK-fails on lane-slicing COMPUTED values at non-8-multiple
    # sublane extents (probed on v5e: ``iota(h,256)[:, :128]`` aborts the
    # compiler at h=81), so nothing wider than one vreg-column is ever
    # materialized — cross-block data moves only through ``gxh``'s masked
    # per-block gathers.
    t = jnp.dtype(cdtype).type
    alpha = t(alpha)
    omega = t(omega)
    wp = nj * 128
    njp = -(-((w + (w % 2)) // 2) // 128)  # packed-half vreg columns
    zh = jnp.zeros((h, 128), cdtype)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, 128), 0)
    j0 = jax.lax.broadcasted_iota(jnp.int32, (h, 128), 1)
    fi = ii.astype(cdtype)
    jjs = [j0 + cb * 128 for cb in range(nj)]   # global column per block
    fjs = [j.astype(cdtype) for j in jjs]
    in_ws = [j < w for j in jjs]                # true-image column masks

    def rd(ref, ch=None):
        """Read a ref as a block list (ref slicing is Mosaic-safe)."""
        if ch is None:
            return [
                ref[:, cb * 128:(cb + 1) * 128].astype(cdtype)
                for cb in range(nj)
            ]
        return [
            ref[ch, :, cb * 128:(cb + 1) * 128].astype(cdtype)
            for cb in range(nj)
        ]

    def gxh(blocks, idx128):
        """One output block of ``plane[i, idx[i, j]]``: single-vreg lane
        gathers from each source block, selected by ``idx // 128`` masks
        (warp.py ``_apply_column_blocks`` analogue, ungated — nj <= 4
        keeps the constant factor modest)."""
        acc = None
        for sb, blk in enumerate(blocks):
            g = jnp.take_along_axis(
                blk, jnp.clip(idx128 - sb * 128, 0, 127), axis=-1
            )
            term = jnp.where((idx128 // 128) == sb, g, t(0.0))
            acc = term if acc is None else acc + term
        return acc

    def gx(blocks, idx_blocks):
        return [gxh(blocks, idx_blocks[cb]) for cb in range(nj)]

    def xconv(p, taps):
        """Clamp-boundary correlation along width (``hfiltering``,
        ``ImageProcessing.h:262-287``)."""
        f = (len(taps) - 1) // 2
        out = [None] * nj
        for l, wgt in enumerate(taps):
            if wgt == 0.0:
                continue
            idx = [jnp.clip(jjs[cb] + (l - f), 0, w - 1) for cb in range(nj)]
            g = gx(p, idx)
            for cb in range(nj):
                term = g[cb] * t(wgt)
                out[cb] = term if out[cb] is None else out[cb] + term
        return out

    def yconv(p, taps):
        """Clamp-boundary correlation along height (``vfiltering``):
        row-concat clamp extension + static row slices, per block."""
        f = (len(taps) - 1) // 2
        out = []
        for cb in range(nj):
            b = p[cb]
            parts = [b[0:1]] * f + [b] + [b[h - 1:h]] * f
            pc = jnp.concatenate(parts, axis=0) if f else b
            o = None
            for l, wgt in enumerate(taps):
                if wgt == 0.0:
                    continue
                term = pc[l:l + h] * t(wgt)
                o = term if o is None else o + term
            out.append(o)
        return out

    def presmooth(p):
        # correlate_hv order: horizontal pass, then vertical.
        return yconv(xconv(p, PRESMOOTH_5TAP), PRESMOOTH_5TAP)

    feat1 = [rd(feat1_ref, ch) for ch in range(c)]
    # Frame 1's getDxs pre-smooth is loop-invariant — hoisted, as in
    # models/solver.smooth_flow_sor.
    feat1s = [presmooth(p) for p in feat1]
    # Dynamic-shift rolls (the warp's candidate-row loop) require an
    # 8-aligned sublane extent (also probed); pad frame 2 once — matched
    # rows always read real rows, mismatched lanes carry zero weight.
    h8 = -(-h // 8) * 8
    feat2r = []
    for ch in range(c):
        blocks = rd(feat2_ref, ch)
        if h8 != h:
            zpad = jnp.zeros((h8 - h, 128), cdtype)
            blocks = [jnp.concatenate([b, zpad], axis=0) for b in blocks]
        feat2r.append(blocks)

    def warp(u, v):
        """In-kernel ``warpFL``: bilinear backward warp of feat2, OOB
        copies feat1 (``ImageProcessing.h:495-520``).  Candidate-row
        ``d`` loop over VMEM-resident rolled planes."""
        oob, fx, fy, x0n, x1n, r0, r1 = [], [], [], [], [], [], []
        for cb in range(nj):
            x = fjs[cb] + u[cb]
            y = fi + v[cb]
            ob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
            xx = jnp.trunc(x)
            yy = jnp.trunc(y)
            x0 = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
            x1 = jnp.clip(x0 + 1, 0, w - 1)
            y0 = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
            y1 = jnp.clip(y0 + 1, 0, h - 1)
            # Neutralized candidate offsets keep the data-derived trip
            # count tight (oob lanes' accumulate is discarded by the
            # final select, but their d range must not inflate the loop).
            jn = jnp.clip(jjs[cb], 0, w - 1)
            oob.append(ob)
            fx.append(jnp.clip(x - xx, t(0.0), t(1.0)))
            fy.append(jnp.clip(y - yy, t(0.0), t(1.0)))
            x0n.append(jnp.where(ob, jn, x0))
            x1n.append(jnp.where(ob, jn, x1))
            r0.append(jnp.where(ob, 0, y0 - ii))
            r1.append(jnp.where(ob, 0, y1 - ii))
        dlo = jnp.min(r0[0])
        dhi = jnp.max(r1[0])
        for cb in range(1, nj):
            dlo = jnp.minimum(dlo, jnp.min(r0[cb]))
            dhi = jnp.maximum(dhi, jnp.max(r1[cb]))
        omfx = [t(1.0) - f for f in fx]

        def dbody(d, accs):
            accs = list(accs)
            wys = [
                jnp.where(r0[cb] == d, t(1.0) - fy[cb], t(0.0))
                + jnp.where(r1[cb] == d, fy[cb], t(0.0))
                for cb in range(nj)
            ]
            w0 = [omfx[cb] * wys[cb] for cb in range(nj)]
            w1 = [fx[cb] * wys[cb] for cb in range(nj)]
            for ch in range(c):
                rolled = [_roll(b, -d, 0)[0:h] for b in feat2r[ch]]
                g0 = gx(rolled, x0n)
                g1 = gx(rolled, x1n)
                for cb in range(nj):
                    k = ch * nj + cb
                    accs[k] = accs[k] + w0[cb] * g0[cb] + w1[cb] * g1[cb]
            return tuple(accs)

        accs = jax.lax.fori_loop(
            dlo, dhi + 1, dbody, tuple(zh for _ in range(c * nj))
        )
        return [
            [
                jnp.where(oob[cb], feat1[ch][cb], accs[ch * nj + cb])
                for cb in range(nj)
            ]
            for ch in range(c)
        ]

    def get_dxs(warp2):
        """``getDxs`` (``OpticalFlow.cpp:80-122``) against the hoisted
        frame-1 smooth."""
        imdx, imdy, imdt = [], [], []
        for ch in range(c):
            s2 = presmooth(warp2[ch])
            blend = [
                feat1s[ch][cb] * t(0.4) + s2[cb] * t(0.6) for cb in range(nj)
            ]
            imdx.append(xconv(blend, DERIVATIVE_5TAP))
            imdy.append(yconv(blend, DERIVATIVE_5TAP))
            imdt.append([s2[cb] - feat1s[ch][cb] for cb in range(nj)])
        return imdx, imdy, imdt

    def dx_fwd(p):
        idx = [jnp.clip(jjs[cb] + 1, 0, wp - 1) for cb in range(nj)]
        sh = gx(p, idx)
        return [
            jnp.where(jjs[cb] < w - 1, sh[cb] - p[cb], t(0.0))
            for cb in range(nj)
        ]

    def dy_fwd(p):
        out = []
        for cb in range(nj):
            b = p[cb]
            sh = (jnp.concatenate([b[1:], b[h - 1:h]], axis=0)
                  if h > 1 else b)
            out.append(jnp.where(ii < h - 1, sh - b, t(0.0)))
        return out

    def xshift_m1(p):
        """``p[:, j-1]`` with col 0 arbitrary (callers mask it)."""
        idx = [jnp.clip(jjs[cb] - 1, 0, wp - 1) for cb in range(nj)]
        return gx(p, idx)

    def yshift_m1(b):
        """``b[i-1]`` per block with row 0 clamped (callers mask it)."""
        return jnp.concatenate([b[0:1], b[:h - 1]], axis=0) if h > 1 else b

    def weighted_lap(flow, phi):
        """``OpticalFlow::Laplacian`` fused flux/divergence form with the
        compat border truncation (``OpticalFlow.cpp:725-778``)."""
        dxf = dx_fwd(flow)
        dyf = dy_fwd(flow)
        fh = [
            jnp.where(jjs[cb] < w - 1, dxf[cb] * phi[cb], t(0.0))
            for cb in range(nj)
        ]
        fv = [
            jnp.where(ii < h - 1, dyf[cb] * phi[cb], t(0.0))
            for cb in range(nj)
        ]
        hi = w - 2 if compat else w - 1
        vi = h - 2 if compat else h - 1
        fh_m1 = xshift_m1(fh)
        out = []
        for cb in range(nj):
            o = -fh[cb]
            o = o + jnp.where(
                (jjs[cb] >= 1) & (jjs[cb] <= hi), fh_m1[cb], t(0.0)
            )
            o = o + (-fv[cb])
            o = o + jnp.where(
                (ii >= 1) & (ii <= vi), yshift_m1(fv[cb]), t(0.0)
            )
            out.append(o)
        return out

    # --- red/black packed planes ----------------------------------------
    # Packed halves live as (h, w2p) planes with ``w2p = njp * 128 >=
    # ceil(w_pad / 2)``, materialized through the VMEM scratch ref: a
    # multi-vreg plane built from computed blocks would need a lane
    # concat, which Mosaic rejects on computed values (module docstring).
    # Columns beyond the true packed width hold NEUTRAL values (phi/
    # cross-term/rhs 0, denominators 1) — NOT clamp copies of the edge:
    # garbage columns iterate under the sweep too, and with copied
    # weights/denominators that iteration is not contractive — measured
    # on real 960px data it grows ~6x/sweep and overflows to inf by
    # ~sweep 50, after which masked-zero weights turn inf into NaN in
    # REAL lanes (the r5 960px P8/P15 divergence).  With neutral
    # coefficients the garbage update is ``(1-omega) * du + omega *
    # (bounded forcing)`` — |1-omega| = 0.8 < 1, so garbage stays finite
    # forever and border-masked weights keep it out of real points.
    par = ii % 2
    evrow_b = par == 0                  # per-block (h, 128) row parity
    w2p = njp * 128
    gi2 = jax.lax.broadcasted_iota(jnp.int32, (h, w2p), 0)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (h, w2p), 1)
    evrow2 = (gi2 % 2) == 0

    def pack_to_scratch(k, blocks, neutral=0.0):
        """Write plane ``blocks``'s red/black halves to scratch planes
        ``2k`` / ``2k + 1``; packed columns beyond the true width get
        ``neutral`` (see the garbage-column note above)."""
        for pb in range(njp):
            jpb = j0 + pb * 128
            col_r = 2 * jpb + par
            col_b = 2 * jpb + 1 - par
            sl = slice(pb * 128, (pb + 1) * 128)
            scratch_ref[2 * k, :, sl] = jnp.where(
                col_r < w,
                gxh(blocks, jnp.minimum(col_r, wp - 1)),
                t(neutral),
            )
            scratch_ref[2 * k + 1, :, sl] = jnp.where(
                col_b < w,
                gxh(blocks, jnp.minimum(col_b, wp - 1)),
                t(neutral),
            )

    def unpack_from_scratch(r_k, b_k):
        """Packed scratch planes ``r_k``/``b_k`` -> full-width blocks."""
        rblk = [
            scratch_ref[r_k, :, pb * 128:(pb + 1) * 128]
            for pb in range(njp)
        ]
        bblk = [
            scratch_ref[b_k, :, pb * 128:(pb + 1) * 128]
            for pb in range(njp)
        ]
        ev = [jnp.where(evrow_b, rblk[pb], bblk[pb]) for pb in range(njp)]
        od = [jnp.where(evrow_b, bblk[pb], rblk[pb]) for pb in range(njp)]
        outs = []
        for cb in range(nj):
            jcb = jjs[cb]
            idx = jcb // 2  # < w2p
            e = gxh(ev, idx)
            o = gxh(od, idx)
            outs.append(jnp.where(jcb % 2 == 0, e, o))
        return outs

    def inner_solve(u, v, du, dv, imdx, imdy, imdt):
        """Phases 2-4 + the SOR sweeps (``OpticalFlow.cpp:296-520``)."""
        uu = [u[cb] + du[cb] for cb in range(nj)]
        vv = [v[cb] + dv[cb] for cb in range(nj)]
        ux, uy = dx_fwd(uu), dy_fwd(uu)
        vx, vy = dx_fwd(vv), dy_fwd(vv)
        phi = [
            t(0.5) / jnp.sqrt(
                ux[cb] * ux[cb] + uy[cb] * uy[cb]
                + vx[cb] * vx[cb] + vy[cb] * vy[cb] + t(eps_phi)
            )
            for cb in range(nj)
        ]
        # psi per channel + channel-mean assembly (collapse).
        sums = [[None] * nj for _ in range(5)]
        for ch in range(c):
            for cb in range(nj):
                temp = (imdt[ch][cb] + imdx[ch][cb] * du[cb]
                        + imdy[ch][cb] * dv[cb])
                psi = t(1.0) / (t(2.0) * jnp.sqrt(temp * temp + t(eps_psi)))
                prods = (
                    psi * imdx[ch][cb] * imdy[ch][cb],
                    psi * imdx[ch][cb] * imdx[ch][cb],
                    psi * imdy[ch][cb] * imdy[ch][cb],
                    psi * imdx[ch][cb] * imdt[ch][cb],
                    psi * imdy[ch][cb] * imdt[ch][cb],
                )
                for k in range(5):
                    sums[k][cb] = (
                        prods[k] if sums[k][cb] is None
                        else sums[k][cb] + prods[k]
                    )
        if c > 1:
            fc = t(float(c))
            sums = [[b / fc for b in row] for row in sums]
        imdxy, imdx2, imdy2, imdtdx, imdtdy = sums
        lap_u = weighted_lap(u, phi)
        lap_v = weighted_lap(v, phi)
        rhs_x = [-imdtdx[cb] - alpha * lap_u[cb] for cb in range(nj)]
        rhs_y = [-imdtdy[cb] - alpha * lap_v[cb] for cb in range(nj)]
        # SOR neighbor weights + denominators (models/solver.py
        # neighbor_weights; OpticalFlow.cpp:482-518).
        phi_m1 = xshift_m1(phi)
        diag = alpha * t(diag_scale)
        denx, deny = [], []
        for cb in range(nj):
            wl = jnp.where(jjs[cb] > 0, phi_m1[cb], t(0.0))
            wr = jnp.where(jjs[cb] < w - 1, phi[cb], t(0.0))
            wu = jnp.where(ii > 0, yshift_m1(phi[cb]), t(0.0))
            wd = jnp.where(ii < h - 1, phi[cb], t(0.0))
            coeff = (wl + wr + wu + wd) * alpha
            denx.append(imdx2[cb] + diag + coeff)
            deny.append(imdy2[cb] + diag + coeff)

        # Sanitize pad lanes to finite neutrals BEFORE packing: a masked
        # zero weight times a non-finite neighbor is NaN, and pad-lane
        # iterates amplify across sweeps without this.
        def san(p, neutral):
            return [
                jnp.where(in_ws[cb], p[cb], t(neutral)) for cb in range(nj)
            ]

        pack_to_scratch(0, san(phi, 0.0))
        pack_to_scratch(1, san(imdxy, 0.0))
        pack_to_scratch(2, san(denx, 1.0), neutral=1.0)
        pack_to_scratch(3, san(deny, 1.0), neutral=1.0)
        pack_to_scratch(4, san(rhs_x, 0.0))
        pack_to_scratch(5, san(rhs_y, 0.0))
        phi_r, phi_b = scratch_ref[0], scratch_ref[1]
        imdxy_r, imdxy_b = scratch_ref[2], scratch_ref[3]
        rdx_r = omega / scratch_ref[4]
        rdx_b = omega / scratch_ref[5]
        rdy_r = omega / scratch_ref[6]
        rdy_b = omega / scratch_ref[7]
        rhsx_r, rhsx_b = scratch_ref[8], scratch_ref[9]
        rhsy_r, rhsy_b = scratch_ref[10], scratch_ref[11]
        weights = make_packed_weights(
            phi_r, phi_b, gi2, jj2, h, w, _roll
        )
        sweep = make_packed_sweep(
            weights, imdxy_r, imdxy_b, rdx_r, rdx_b, rdy_r, rdy_b,
            rhsx_r, rhsx_b, rhsy_r, rhsy_b, evrow2, alpha, omega, _roll,
        )
        z2 = jnp.zeros((h, w2p), cdtype)
        du_r, du_b, dv_r, dv_b = jax.lax.fori_loop(
            0, n_sor, lambda _, cs: sweep(*cs), (z2, z2, z2, z2)
        )
        scratch_ref[12] = du_r
        scratch_ref[13] = du_b
        scratch_ref[14] = dv_r
        scratch_ref[15] = dv_b
        du = san(unpack_from_scratch(12, 13), 0.0)
        dv = san(unpack_from_scratch(14, 15), 0.0)
        return du, dv

    def outer_body(_, carry):
        carry = list(carry)
        u = carry[0:nj]
        v = carry[nj:2 * nj]
        warp2 = [
            carry[2 * nj + ch * nj:2 * nj + (ch + 1) * nj]
            for ch in range(c)
        ]
        imdx, imdy, imdt = get_dxs(warp2)
        du = [zh] * nj
        dv = [zh] * nj
        for _i in range(n_inner):
            du, dv = inner_solve(u, v, du, dv, imdx, imdy, imdt)
        u = [u[cb] + du[cb] for cb in range(nj)]
        v = [v[cb] + dv[cb] for cb in range(nj)]
        warp2 = warp(u, v)
        return (*u, *v, *(b for ch in warp2 for b in ch))

    u0 = [
        jnp.where(in_ws[cb], b, t(0.0)) for cb, b in enumerate(rd(u_ref))
    ]
    v0 = [
        jnp.where(in_ws[cb], b, t(0.0)) for cb, b in enumerate(rd(v_ref))
    ]
    warp2 = [rd(warp0_ref, ch) for ch in range(c)]
    out = jax.lax.fori_loop(
        0, n_outer, outer_body,
        (*u0, *v0, *(b for ch in warp2 for b in ch)),
    )
    for cb in range(nj):
        sl = slice(cb * 128, (cb + 1) * 128)
        u_out_ref[:, sl] = out[cb].astype(u_out_ref.dtype)
        v_out_ref[:, sl] = out[nj + cb].astype(v_out_ref.dtype)
        for ch in range(c):
            warp_out_ref[ch, :, sl] = out[
                2 * nj + ch * nj + cb
            ].astype(warp_out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_outer", "n_inner", "n_sor", "alpha", "omega",
        "eps_phi", "eps_psi", "diag_scale", "compat",
    ),
)
def _fused_level_call(
    feat1, feat2, warp0, u, v,
    *, n_outer, n_inner, n_sor, alpha, omega,
    eps_phi, eps_psi, diag_scale, compat,
):
    c, h, w = feat1.shape
    nj = -(-w // 128)
    wp = nj * 128
    cdtype = jnp.float64 if u.dtype == jnp.float64 else jnp.float32

    def padw(a):
        if a.shape[-1] == wp:
            return a
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, wp - a.shape[-1])]
        return jnp.pad(a, cfg)

    kernel = functools.partial(
        _level_kernel, c, h, w, nj, n_outer, n_inner, n_sor,
        float(alpha), float(omega), float(eps_phi), float(eps_psi),
        float(diag_scale), bool(compat), cdtype,
    )
    out_shape = [
        jax.ShapeDtypeStruct((h, wp), u.dtype),
        jax.ShapeDtypeStruct((h, wp), u.dtype),
        jax.ShapeDtypeStruct((c, h, wp), warp0.dtype),
    ]
    itemsize = jnp.dtype(cdtype).itemsize
    njp = -(-((w + (w % 2)) // 2) // 128)
    vmem_limit = min(
        100 * 2**20,
        max(24 * 2**20, 64 * h * wp * itemsize * max(1, c // 2))
        + 16 * h * njp * 128 * itemsize,
    )
    u_o, v_o, warp_o = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[pltpu.VMEM((16, h, njp * 128), cdtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_outer * (2 * n_inner * 22 + 40 * c) * h * wp,
            bytes_accessed=(3 * c + 4) * h * wp * itemsize,
            transcendentals=2 * n_outer * n_inner * h * wp,
        ),
        interpret=_INTERPRET,
    )(padw(feat1), padw(feat2), padw(warp0), padw(u), padw(v))
    return u_o[:, :w], v_o[:, :w], warp_o[:, :, :w]


def _solve_one(args, *, n_outer, n_inner, n_sor, params):
    feat1, feat2, warp0, u, v = args
    return _fused_level_call(
        feat1, feat2, warp0, u, v,
        n_outer=n_outer, n_inner=n_inner, n_sor=n_sor,
        alpha=params.alpha, omega=params.omega,
        eps_phi=params.varepsilon_phi, eps_psi=params.varepsilon_psi,
        diag_scale=params.diag_reg_scale,
        compat=params.compat_laplacian_borders,
    )


def smooth_flow_level_fused(
    feat1, feat2, warp0, u, v, n_outer, n_inner, n_sor, params
):
    """Whole-level solve via the fused kernel: returns ``(u, v, warp2)``
    exactly as ``models/solver.smooth_flow_sor``'s hot path would (the
    final warp feedback is computed in-kernel).  ``vmap`` runs the same
    unbatched program per element under ``lax.map`` (the sor_dispatch
    ``_batchable`` pattern — pallas_call has no batching rule)."""
    solve = functools.partial(
        _solve_one, n_outer=n_outer, n_inner=n_inner, n_sor=n_sor,
        params=params,
    )
    wrapped = jax.custom_batching.custom_vmap(solve)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, args):  # noqa: ANN001
        args_b = jax.tree.map(
            lambda x, b: x if b
            else jnp.broadcast_to(x, (axis_size, *x.shape)),
            args, in_batched[0],
        )
        out = jax.lax.map(solve, args_b)
        return out, (True, True, True)

    return wrapped((feat1, feat2, warp0, u, v))
