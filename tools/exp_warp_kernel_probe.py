"""Round-3 capability probe: a MINI version of the planned Pallas warp
kernel, validating every mechanism the production kernel needs:

  mini  — single-strip bilinear warp, window as a VMEM input:
          * in-kernel f32 coordinate math (trunc/clip, same semantics as
            ops/interp.bilinear_gather),
          * per-jv (128-col block) processing with static field slices,
          * scalar loop bounds from in-kernel vector min/max reductions,
          * DYNAMIC fori_loop over candidate row offsets d (traced bounds),
          * nested dynamic fori over aligned column blocks cb,
          * ref slices with traced sublane offset (pl.ds(d, TB)) and
            traced lane-aligned offset (pl.ds(cb*128, 128)),
          * lane gather + masked-weight accumulate,
          * OOB fill from an im1 block.
          Checked bit-exact vs the XLA warp at f32.
  dma   — same, but the window is DMA'd from an HBM-resident source with
          a per-strip SMEM base array (grid over strips), the production
          data path.

Run: python tools/exp_warp_kernel_probe.py [mini|dma|all]
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, np, pl, pltpu


TB, W, C = 8, 512, 2
MARGIN = 6
WR = (-(-(TB + 2 * MARGIN + 2) // 8)) * 8 + 8  # window rows (aligned-load pad)


def _fields(jnp, H, W, strip0, vx, vy, base):
    """In-kernel coordinate fields (must mirror ops/interp semantics)."""
    import jax

    i = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
    x = j.astype(jnp.float32) + vx
    y = (i + strip0).astype(jnp.float32) + vy
    oob = (x < 0) | (x > W - 1) | (y < 0) | (y > H - 1)
    xx = jnp.trunc(x)
    yy = jnp.trunc(y)
    fx = jnp.clip(x - xx, 0.0, 1.0)
    fy = jnp.clip(y - yy, 0.0, 1.0)
    x0 = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    # Candidate row offsets relative to the window base: row y0 sits at
    # window-local row (y0 - base); candidate d means local rows [d, d+TB).
    r0 = y0 - base - i
    r1 = y1 - base - i
    return x, y, oob, fx, fy, x0, x1, r0, r1


def _mini_body(jax, jnp, pl, H, strip0, win_load, vx, vy, base, im1, out_ref):
    x, y, oob, fx, fy, x0, x1, r0, r1 = _fields(jnp, H, W, strip0, vx, vy, base)

    nj = W // 128
    for jv in range(nj):
        sl = slice(jv * 128, (jv + 1) * 128)
        fxs, fys = fx[:, sl], fy[:, sl]
        x0s, x1s = x0[:, sl], x1[:, sl]
        r0s, r1s = r0[:, sl], r1[:, sl]
        dlo = jnp.clip(jnp.min(r0s), 0, WR - TB)
        dhi = jnp.clip(jnp.max(r1s), 0, WR - TB)
        cb_lo = jnp.min(x0s) // 128
        cb_hi = jnp.max(x1s) // 128
        acc0 = jnp.zeros((C, TB, 128), jnp.float32)

        def dbody(d, acc):
            wy = jnp.where(r0s == d, 1.0 - fys, 0.0) + jnp.where(
                r1s == d, fys, 0.0
            )

            def cbody(cb, acc):
                m0 = (x0s // 128) == cb
                m1 = (x1s // 128) == cb
                w0 = jnp.where(m0, (1.0 - fxs) * wy, 0.0)
                w1 = jnp.where(m1, fxs * wy, 0.0)
                lx0 = jnp.clip(x0s - cb * 128, 0, 127)
                lx1 = jnp.clip(x1s - cb * 128, 0, 127)
                outs = []
                for c in range(C):
                    src = win_load(c, d, cb)
                    g0 = jnp.take_along_axis(src, lx0, axis=-1)
                    g1 = jnp.take_along_axis(src, lx1, axis=-1)
                    outs.append(acc[c] + w0 * g0 + w1 * g1)
                return jnp.stack(outs)

            return jax.lax.fori_loop(cb_lo, cb_hi + 1, cbody, acc)

        acc = jax.lax.fori_loop(dlo, dhi + 1, dbody, acc0)
        for c in range(C):
            out_ref[c, :, sl] = jnp.where(oob[:, sl], im1[c][:, sl], acc[c])


def probe_mini():
    jax, jnp, np, pl, pltpu = _setup()
    H = 64
    strip0 = 24
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((C, H, W)), jnp.float32)
    im1 = jnp.asarray(rng.random((C, TB, W)), jnp.float32)
    vx = jnp.asarray(rng.uniform(-4.5, 4.5, (TB, W)), jnp.float32)
    vy = jnp.asarray(rng.uniform(-4.5, 4.5, (TB, W)), jnp.float32)
    base = strip0 - MARGIN  # window rows [base, base+WR)
    window = img[:, base : base + WR, :]

    def kern(win_ref, vx_ref, vy_ref, base_ref, im1_ref, out_ref):
        def win_load(c, d, cb):
            k = pl.multiple_of((d // 8) * 8, 8)
            blk = win_ref[c, pl.ds(k, 16), pl.ds(cb * 128, 128)]
            blk = pltpu.roll(blk, -(d % 8) % 16, 0)
            return blk[0:8, :]

        _mini_body(
            jax, jnp, pl, H, strip0, win_load,
            vx_ref[:], vy_ref[:], base_ref[0, 0],
            [im1_ref[c] for c in range(C)], out_ref,
        )

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, TB, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(window, vx, vy, jnp.asarray([[base]], jnp.int32), im1)

    # XLA reference with identical semantics.
    from papteam_opticalflow_tpu.ops.interp import bilinear_gather

    i = np.arange(TB)[:, None] + strip0
    j = np.arange(W)[None, :]
    xr = jnp.asarray(j + np.asarray(vx))
    yr = jnp.asarray(i + np.asarray(vy))
    oobr = (xr < 0) | (xr > W - 1) | (yr < 0) | (yr > H - 1)
    ref = jnp.where(oobr, im1, bilinear_gather(img, xr, yr))
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"mini: COMPILES max_err={err} bit_exact={err == 0.0}")


def probe_dma():
    jax, jnp, np, pl, pltpu = _setup()
    H = 96
    NS = H // TB
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((C, H, W)), jnp.float32)
    im1 = jnp.asarray(rng.random((C, H, W)), jnp.float32)
    vx = jnp.asarray(rng.uniform(-4.5, 4.5, (H, W)), jnp.float32)
    vy = jnp.asarray(rng.uniform(-4.5, 4.5, (H, W)), jnp.float32)
    # Per-strip window base rows, computed outside (clamped) and
    # floor-aligned to 8 (HBM DMA slices need 8-aligned sublane starts;
    # WR's +8 pad absorbs the alignment loss).
    bases = (np.clip(
        np.arange(NS) * TB - MARGIN, 0, H - WR
    ) // 8 * 8).astype(np.int32)

    def kern(base_ref, img_hbm, vx_ref, vy_ref, im1_ref, out_ref, win, sem):
        s = pl.program_id(0)
        base = pl.multiple_of(base_ref[s], 8)
        dma = pltpu.make_async_copy(
            img_hbm.at[:, pl.ds(base, WR), :], win, sem
        )
        dma.start()
        dma.wait()
        strip_i = s * TB

        def win_load(c, d, cb):
            k = pl.multiple_of((d // 8) * 8, 8)
            blk = win[c, pl.ds(k, 16), pl.ds(cb * 128, 128)]
            blk = pltpu.roll(blk, -(d % 8) % 16, 0)
            return blk[0:8, :]

        # NOTE: strip0 must be a traced value here (grid-dependent).
        i = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
        x = j.astype(jnp.float32) + vx_ref[:]
        y = (i + strip_i).astype(jnp.float32) + vy_ref[:]
        oob = (x < 0) | (x > W - 1) | (y < 0) | (y > H - 1)
        xx = jnp.trunc(x)
        yy = jnp.trunc(y)
        fx = jnp.clip(x - xx, 0.0, 1.0)
        fy = jnp.clip(y - yy, 0.0, 1.0)
        x0 = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        y0 = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        r0 = y0 - base - i
        r1 = y1 - base - i
        for jv in range(W // 128):
            sl = slice(jv * 128, (jv + 1) * 128)
            fxs, fys = fx[:, sl], fy[:, sl]
            x0s, x1s = x0[:, sl], x1[:, sl]
            r0s, r1s = r0[:, sl], r1[:, sl]
            dlo = jnp.clip(jnp.min(r0s), 0, WR - TB)
            dhi = jnp.clip(jnp.max(r1s), 0, WR - TB)
            cb_lo = jnp.min(x0s) // 128
            cb_hi = jnp.max(x1s) // 128
            acc0 = jnp.zeros((C, TB, 128), jnp.float32)

            def dbody(d, acc):
                wy = jnp.where(r0s == d, 1.0 - fys, 0.0) + jnp.where(
                    r1s == d, fys, 0.0
                )

                def cbody(cb, acc):
                    m0 = (x0s // 128) == cb
                    m1 = (x1s // 128) == cb
                    w0 = jnp.where(m0, (1.0 - fxs) * wy, 0.0)
                    w1 = jnp.where(m1, fxs * wy, 0.0)
                    lx0 = jnp.clip(x0s - cb * 128, 0, 127)
                    lx1 = jnp.clip(x1s - cb * 128, 0, 127)
                    outs = []
                    for c in range(C):
                        src = win_load(c, d, cb)
                        g0 = jnp.take_along_axis(src, lx0, axis=-1)
                        g1 = jnp.take_along_axis(src, lx1, axis=-1)
                        outs.append(acc[c] + w0 * g0 + w1 * g1)
                    return jnp.stack(outs)

                return jax.lax.fori_loop(cb_lo, cb_hi + 1, cbody, acc)

            acc = jax.lax.fori_loop(dlo, dhi + 1, dbody, acc0)
            for c in range(C):
                out_ref[c, :, sl] = jnp.where(
                    oob[:, sl], im1_ref[c][:, sl], acc[c]
                )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # img stays in HBM
            pl.BlockSpec((TB, W), lambda s, base: (s, 0)),
            pl.BlockSpec((TB, W), lambda s, base: (s, 0)),
            pl.BlockSpec((C, TB, W), lambda s, base: (0, s, 0)),
        ],
        out_specs=pl.BlockSpec((C, TB, W), lambda s, base: (0, s, 0)),
        scratch_shapes=[
            pltpu.VMEM((C, WR, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        grid_spec=grid_spec,
    )(jnp.asarray(bases), img, vx, vy, im1)

    from papteam_opticalflow_tpu.ops.interp import warp_bilinear

    ref = warp_bilinear(im1, img, vx, vy, im2_pack=None)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"dma: COMPILES max_err={err} bit_exact={err == 0.0}")


PROBES = {"mini": probe_mini, "dma": probe_dma}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "all":
        for name in PROBES:
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, __file__, name],
                capture_output=True, text=True, timeout=420,
            )
            lines = (r.stdout + r.stderr).strip().splitlines()
            if r.returncode == 0:
                good = [ln for ln in lines if "COMPILES" in ln]
                print(good[-1] if good else lines[-1], f"({time.time()-t0:.0f}s)")
            else:
                why = [
                    ln for ln in lines
                    if "Not implemented" in ln or "NotImplemented" in ln
                    or "Error" in ln or "error" in ln
                ]
                print(f"{name}: FAILS ({(why[-1] if why else '?')[-200:]})")
        return
    PROBES[which]()


if __name__ == "__main__":
    main()
