"""Experiment: row-banded warp gather (r3 candidate optimization).

tools/gather_floor.py showed TPU gather cost per index SCALES WITH TABLE
FOOTPRINT (2 ns/idx @2.6 MB table -> 29 ns/idx @83 MB, same index
pattern).  The warp's flow displacements are locally bounded, so each
band of output rows only reads a narrow source-row window: materialize
the window with a contiguous dynamic_slice (HBM-bandwidth cheap) and
gather from the SMALL window instead of the big table.

Variants timed here (1080x1920, 5ch bf16 pack = 20ch, smooth flow amp 8):
  full      — production warp_bilinear (baseline, ~22 ms r2)
  band<B>m<M> — row bands of B output rows, margin M, lax.map over bands
  tile      — 2-D tiles (rows x cols windows)
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

from tools.gather_floor import _smooth_flow

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))


def banded_gather_packed(pack, x, y, band: int, margin: int):
    """bilinear_gather_packed, but gathering each band of output rows from
    a materialized source-row window.  EXACT iff every in-bounds sample's
    |y - row| <= margin (caller guards with lax.cond on max|vy|)."""
    c4, h, w = pack.shape
    c = c4 // 4
    dtype = pack.dtype
    n_bands = -(-h // band)
    h_pad = n_bands * band
    win = band + 2 * margin

    xx = jnp.trunc(x)
    yy = jnp.trunc(y)
    fx = jnp.clip((x - xx).astype(dtype), 0, 1)
    fy = jnp.clip((y - yy).astype(dtype), 0, 1)
    x0 = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(yy.astype(jnp.int32), 0, h - 1)

    def pad_rows(a):
        return jnp.pad(a, ((0, h_pad - h), (0, 0)))

    x0p, y0p = pad_rows(x0), pad_rows(y0)

    def one_band(b):
        r0 = b * band
        ws = jnp.clip(r0 - margin, 0, h - win)
        window = jax.lax.dynamic_slice(pack, (0, ws, 0), (c4, win, w))
        yb = jax.lax.dynamic_slice(y0p, (r0, 0), (band, w))
        xb = jax.lax.dynamic_slice(x0p, (r0, 0), (band, w))
        ly = jnp.clip(yb - ws, 0, win - 1)
        flat = window.reshape(c4, win * w)
        idx = (ly * w + xb).reshape(-1)
        return jnp.take(flat, idx, axis=-1).reshape(c4, band, w)

    patches = jax.lax.map(one_band, jnp.arange(n_bands))  # (nb, c4, band, w)
    patch = jnp.moveaxis(patches, 0, 1).reshape(c4, h_pad, w)[:, :h]
    v00 = patch[0 * c:1 * c]
    v10 = patch[1 * c:2 * c]
    v01 = patch[2 * c:3 * c]
    v11 = patch[3 * c:4 * c]
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


def warp_banded(im1, im2_pack, vx, vy, band: int, margin: int):
    c4, h, w = im2_pack.shape
    ftype = jnp.float32
    j = jnp.arange(w, dtype=ftype)
    i = jnp.arange(h, dtype=ftype)
    x = j[None, :] + vx.astype(ftype)
    y = i[:, None] + vy.astype(ftype)
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    sampled = banded_gather_packed(im2_pack, x, y, band, margin)
    return jnp.where(oob, im1, sampled)


@functools.partial(jax.jit, static_argnames=("band", "margin", "iters"))
def chained_banded(im1, pack, vx, vy, band, margin, iters):
    def body(_, carry):
        acc, vx, vy = carry
        wimg = warp_banded(im1, pack, vx, vy, band, margin)
        bump = jnp.minimum(jnp.abs(jnp.sum(wimg.astype(jnp.float32))), 0.0)
        return acc + bump, vx + bump, vy + bump

    acc, _, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), vx, vy)
    )
    return acc


def timed(fn, reps=3):
    float(jnp.sum(fn()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn()))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(fn_of_iters, lo=2, hi=12):
    t_lo = timed(lambda: fn_of_iters(lo))
    t_hi = timed(lambda: fn_of_iters(hi))
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def main():
    h, w, c = 1080, 1920, 5
    dtype = jnp.bfloat16
    rng = np.random.default_rng(2)
    from papteam_opticalflow_tpu.ops.interp import pack_patch2x2

    im1 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype)
    im2 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype)
    pack = pack_patch2x2(im2)
    vxn, vyn = _smooth_flow(h, w)
    vx, vy = jnp.asarray(vxn), jnp.asarray(vyn)

    # Correctness vs production first.
    from papteam_opticalflow_tpu.ops.interp import warp_bilinear

    ref = warp_bilinear(im1, im2, vx, vy, im2_pack=pack)
    for band, margin in ((120, 40), (216, 40), (54, 24)):
        got = warp_banded(im1, pack, vx, vy, band, margin)
        diff = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                     - got.astype(jnp.float32))))
        print(f"band={band} margin={margin}: max|diff| = {diff}")
        assert diff == 0.0, "banded warp mismatch"

    # Timings.
    from tools.gather_floor import _chained_warp

    t_full = per_iter(lambda it: _chained_warp(im1, im2, pack, vx, vy, it))
    print(f"full engine warp: {t_full * 1e3:.2f} ms")
    for band, margin in ((270, 40), (216, 40), (120, 40), (120, 24),
                         (54, 24), (40, 16)):
        t = per_iter(
            lambda it: chained_banded(im1, pack, vx, vy, band, margin, it)
        )
        win_mb = (band + 2 * margin) * w * 20 * 2 / 1e6
        print(f"banded B={band} M={margin} (win {win_mb:.1f} MB): "
              f"{t * 1e3:.2f} ms  ({t_full / t:.2f}x)")


if __name__ == "__main__":
    main()


# ---- 2-D tiled variant (appended experiment) ----

def tiled_gather_packed(pack, x0, y0, tb, tc, mr, mc):
    c4, h, w = pack.shape
    nb = -(-h // tb)
    nc = -(-w // tc)
    h_pad, w_pad = nb * tb, nc * tc
    winr, winc = tb + 2 * mr, tc + 2 * mc

    y0p = jnp.pad(y0, ((0, h_pad - h), (0, w_pad - w)))
    x0p = jnp.pad(x0, ((0, h_pad - h), (0, w_pad - w)))

    def one_tile(t):
        bi, ci = t // nc, t % nc
        r0, c0 = bi * tb, ci * tc
        ws = jnp.clip(r0 - mr, 0, h - winr)
        cs = jnp.clip(c0 - mc, 0, w - winc)
        window = jax.lax.dynamic_slice(pack, (0, ws, cs), (c4, winr, winc))
        yb = jax.lax.dynamic_slice(y0p, (r0, c0), (tb, tc))
        xb = jax.lax.dynamic_slice(x0p, (r0, c0), (tb, tc))
        ly = jnp.clip(yb - ws, 0, winr - 1)
        lx = jnp.clip(xb - cs, 0, winc - 1)
        flat = window.reshape(c4, winr * winc)
        idx = (ly * winc + lx).reshape(-1)
        return jnp.take(flat, idx, axis=-1).reshape(c4, tb, tc)

    tiles = jax.lax.map(one_tile, jnp.arange(nb * nc))  # (nt, c4, tb, tc)
    tiles = tiles.reshape(nb, nc, c4, tb, tc)
    patch = jnp.moveaxis(tiles, (0, 3, 1, 4), (1, 2, 3, 4)).reshape(
        c4, h_pad, w_pad)[:, :h, :w]
    return patch


def warp_tiled(im1, pack, vx, vy, tb, tc, mr, mc):
    c4, h, w = pack.shape
    c = c4 // 4
    dtype = pack.dtype
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
    patch = tiled_gather_packed(pack, x0, y0, tb, tc, mr, mc)
    v00 = patch[0 * c:1 * c]
    v10 = patch[1 * c:2 * c]
    v01 = patch[2 * c:3 * c]
    v11 = patch[3 * c:4 * c]
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    sampled = v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11
    return jnp.where(oob, im1, sampled)


@functools.partial(jax.jit,
                   static_argnames=("tb", "tc", "mr", "mc", "iters"))
def chained_tiled(im1, pack, vx, vy, tb, tc, mr, mc, iters):
    def body(_, carry):
        acc, vx, vy = carry
        wimg = warp_tiled(im1, pack, vx, vy, tb, tc, mr, mc)
        bump = jnp.minimum(jnp.abs(jnp.sum(wimg.astype(jnp.float32))), 0.0)
        return acc + bump, vx + bump, vy + bump

    acc, _, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), vx, vy)
    )
    return acc


def main2():
    h, w, c = 1080, 1920, 5
    dtype = jnp.bfloat16
    rng = np.random.default_rng(2)
    from papteam_opticalflow_tpu.ops.interp import pack_patch2x2, warp_bilinear

    im1 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype)
    im2 = jnp.asarray(rng.random((c, h, w), dtype=np.float32), dtype)
    pack = pack_patch2x2(im2)
    vxn, vyn = _smooth_flow(h, w)
    vx, vy = jnp.asarray(vxn), jnp.asarray(vyn)
    ref = warp_bilinear(im1, im2, vx, vy, im2_pack=pack)

    for tb, tc, mr, mc in ((120, 512, 24, 16), (54, 512, 24, 16),
                           (54, 256, 12, 12), (120, 1920, 12, 0)):
        got = warp_tiled(im1, pack, vx, vy, tb, tc, mr, mc)
        diff = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                     - got.astype(jnp.float32))))
        ok = "OK " if diff == 0 else "BAD"
        t = per_iter(lambda it: chained_tiled(
            im1, pack, vx, vy, tb, tc, mr, mc, it))
        win_mb = (tb + 2 * mr) * (tc + 2 * mc) * 40 / 1e6
        print(f"tiled {tb}x{tc} m=({mr},{mc}) win {win_mb:.1f}MB {ok}: "
              f"{t * 1e3:.2f} ms")

    # Tighter row bands (margin just above flow bound 8+1).
    for band, margin in ((54, 12), (27, 12), (108, 12)):
        got = warp_banded(im1, pack, vx, vy, band, margin)
        diff = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                     - got.astype(jnp.float32))))
        ok = "OK " if diff == 0 else "BAD"
        t = per_iter(lambda it: chained_banded(
            im1, pack, vx, vy, band, margin, it))
        win_mb = (band + 2 * margin) * w * 40 / 1e6
        print(f"banded B={band} M={margin} (win {win_mb:.1f} MB) {ok}: "
              f"{t * 1e3:.2f} ms")


if __name__ == "__main__" and "--tiled" in sys.argv:
    main2()
