"""Experiment: pair-gathered warp — one 3x4-patch index per horizontal
output PAIR.  MEASURED DEAD END (r3): 9.9 ms vs 8.4 ms production.

Hypothesis: the windowed gather looked index-count-bound (~4 ns/idx,
slice width nearly free when comparing equal-index-count chunkings), so
gathering one 12C patch per output pair (half the indices, 3x the slice)
should win ~2x.  Measured: the 3x slice costs ~2.4x per index at window
scale, cancelling the halved index count, and the per-pixel sub-patch
selects add ~1 ms — net 0.85x.  Lesson: at window footprint, per-index
cost is width-free only at FIXED index count; trading index count for
slice width does not pay.  The scheme IS bit-exact (validity-effective
pair bases + dy<=1/dx<=2 coverage; verified on CPU and TPU), so this
file stays as the reproducible record.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from tools.gather_floor import _smooth_flow


def pack_patch3x4(img: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) -> (12C, H, W): channel block (dy*4+dx)*C holds
    img[:, min(y+dy, H-1), min(x+dx, W-1)] for dy in {0,1,2}, dx in
    {0..3}.  A horizontal output PAIR needs dx up to 3: adjacent sample
    xs differ by 1+dvx, so truncated corners straddle up to 2 columns
    apart even for tiny smooth gradients, plus the +1 right corner."""
    if img.ndim == 2:
        img = img[None]

    def shift(a, d, axis):
        if d == 0:
            return a
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(d, None)
        edge = [slice(None)] * a.ndim
        edge[axis] = slice(-1, None)
        return jnp.concatenate(
            [a[tuple(sl)]] + [a[tuple(edge)]] * d, axis=axis)

    cols = [shift(img, dx, -1) for dx in range(4)]
    blocks = []
    for dy in range(3):
        for dx in range(4):
            blocks.append(shift(cols[dx], dy, -2))
    return jnp.concatenate(blocks, axis=-3)


def warp_pairs(im1, pack12, vx, vy, margin=24, tb=54, tc=128):
    """Pair-gathered tiled warp: one 3x4-patch index per horizontal
    output pair.  Exact iff (validity-effective) pair deltas satisfy
    dy <= 1, dx <= 2 and displacement <= margin (caller guards)."""
    c12, h, w = pack12.shape
    c = c12 // 12
    dtype = pack12.dtype
    ftype = jnp.float32
    j = jnp.arange(w, dtype=ftype)
    i = jnp.arange(h, dtype=ftype)
    x = j[None, :] + vx.astype(ftype)
    y = i[:, None] + vy.astype(ftype)
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    xx = jnp.trunc(x)
    yy = jnp.trunc(y)
    fx = jnp.clip((x - xx).astype(dtype), 0, 1)
    fy = jnp.clip((y - yy).astype(dtype), 0, 1)
    x0 = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(yy.astype(jnp.int32), 0, h - 1)

    # Validity-effective corners: an OOB slot inherits its partner's
    # corner (its own gathered value is never consumed), so clamped OOB
    # coordinates cannot drag the pair base away from the valid pixel.
    valid = (~oob).reshape(h, w // 2, 2)
    x0p = x0.reshape(h, w // 2, 2)
    y0p = y0.reshape(h, w // 2, 2)
    x0e = jnp.where(valid, x0p, x0p[..., ::-1])
    y0e = jnp.where(valid, y0p, y0p[..., ::-1])
    bx = jnp.min(x0e, axis=-1)
    by = jnp.min(y0e, axis=-1)
    ox = jnp.clip(x0e - bx[..., None], 0, 2)   # {0,1,2} when pairable
    oy = jnp.clip(y0e - by[..., None], 0, 1)   # {0,1}

    nb, nc = -(-h // tb), -(-(w // 2) // tc)
    h_pad, wp_pad = nb * tb, nc * tc
    winr, winc = tb + 2 * margin, 2 * tc + 2 * margin + 4
    pad = ((0, h_pad - h), (0, wp_pad - w // 2))
    byp = jnp.pad(by, pad)
    bxp = jnp.pad(bx, pad)

    def one_tile(t):
        bi, ci = t // nc, t % nc
        r0, c0 = bi * tb, ci * tc            # c0 in pairs
        ws = jnp.clip(r0 - margin, 0, h - winr)
        cs = jnp.clip(2 * c0 - margin, 0, w - winc)  # pixel coords
        window = jax.lax.dynamic_slice(pack12, (0, ws, cs), (c12, winr, winc))
        yb = jax.lax.dynamic_slice(byp, (r0, c0), (tb, tc))
        xb = jax.lax.dynamic_slice(bxp, (r0, c0), (tb, tc))
        ly = jnp.clip(yb - ws, 0, winr - 1)
        lx = jnp.clip(xb - cs, 0, winc - 1)
        flat = window.reshape(c12, winr * winc)
        idx = (ly * winc + lx).reshape(-1)
        return jnp.take(flat, idx, axis=-1).reshape(c12, tb, tc)

    _, tiles = jax.lax.scan(lambda _, t: (None, one_tile(t)), None,
                            jnp.arange(nb * nc))
    tiles = tiles.reshape(nb, nc, c12, tb, tc)
    patch = jnp.moveaxis(tiles, (0, 3, 1, 4), (1, 2, 3, 4)).reshape(
        c12, h_pad, wp_pad)[:, :h, :w // 2]     # (12C, H, W/2)
    p12 = patch.reshape(3, 4, c, h, w // 2)

    def corner(n, m):
        outs = []
        for p in range(2):
            oyp = oy[..., p][None]
            oxp = ox[..., p][None]

            def xsel(k):
                return jnp.where(
                    oxp == 0, p12[k, m],
                    jnp.where(oxp == 1, p12[k, m + 1], p12[k, m + 2]))

            v = jnp.where(oyp == 0, xsel(n), xsel(n + 1))
            outs.append(v)
        return jnp.stack(outs, axis=-1).reshape(c, h, w)

    v00 = corner(0, 0)
    v10 = corner(0, 1)
    v01 = corner(1, 0)
    v11 = corner(1, 1)
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    sampled = v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11
    return jnp.where(oob, im1, sampled)


@functools.partial(jax.jit, static_argnames=("iters",))
def chained_pairs(im1, pack9, vx, vy, iters):
    def body(_, carry):
        acc, vx, vy = carry
        wimg = warp_pairs(im1, pack9, vx, vy)
        bump = jnp.minimum(jnp.abs(jnp.sum(wimg.astype(jnp.float32))), 0.0)
        return acc + bump, vx + bump, vy + bump
    acc, _, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), vx, vy))
    return acc


def main():
    h, w, c = 1080, 1920, 5
    dtype = jnp.bfloat16
    rng = np.random.default_rng(2)
    from papteam_opticalflow_tpu.ops.interp import (
        pack_patch2x2, warp_bilinear,
    )

    im1 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype)
    im2 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype)
    pack2 = pack_patch2x2(im2)
    pack9 = pack_patch3x4(im2)
    vxn, vyn = _smooth_flow(h, w)
    vx, vy = jnp.asarray(vxn), jnp.asarray(vyn)

    ref = warp_bilinear(im1, im2, vx, vy, im2_pack=pack2)
    got = warp_pairs(im1, pack9, vx, vy)
    diff = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                 - got.astype(jnp.float32))))
    print(f"pair warp max|diff| = {diff}")
    assert diff == 0.0

    from tools.gather_floor import _chained_warp

    def per_iter(fn_of_iters, lo=2, hi=12):
        def t(n):
            float(jnp.sum(fn_of_iters(n)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(fn_of_iters(n)))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(hi) - t(lo)) / (hi - lo)

    t_cur = per_iter(lambda n: _chained_warp(im1, im2, pack2, vx, vy, n))
    print(f"current production warp: {t_cur*1e3:.2f} ms")
    t_pair = per_iter(lambda n: chained_pairs(im1, pack9, vx, vy, n))
    print(f"pair-gathered warp:      {t_pair*1e3:.2f} ms ({t_cur/t_pair:.2f}x)")


if __name__ == "__main__":
    main()
