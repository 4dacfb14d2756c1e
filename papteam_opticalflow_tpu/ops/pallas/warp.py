"""VPU bilinear warp kernel (Pallas/Mosaic) — the round-4 warp engine.

Re-implements the hot backward warp (``ImageProcessing.h:495-520``
``warpImage``: bilinear sample with C-truncation semantics, out-of-bounds
targets copied from frame 1) as a Mosaic kernel that resolves the gather
with WITHIN-VREG dynamic lane gathers instead of the serial per-index
gather unit.

Why: TPU serial gathers cost ~2-3 ns per INDEX regardless of width
(r2/r3 measurements, ``tools/gather_floor.py``); three rounds of window
tiling got the engine to ~3.2 ns/idx and the warp still dominated the
pair (146 of 291 ms at 1920px P15, VERDICT r3).  Mosaic's
``tpu.DynamicGatherOp`` (``jnp.take_along_axis`` along a single-vreg
dimension) instead gathers a full (8, 128) vreg in ~3 cycles — ~650x
denser.  The catch: the gather dimension must fit one vreg (lanes == 128),
so the 2-D warp gather is decomposed into

  * a dynamic CANDIDATE-ROW loop: within a row strip, the integer
    vertical displacement ``y0 - i`` varies by only Δ (median 1 px,
    p90 3-7 on the recorded 1920px oracle flow), so source rows are
    covered by ``Δ+2`` shifted window slices (``d`` loop, data-derived
    trip count via in-kernel min/max reductions);
  * per 128-column output block, five STATICALLY predicated aligned
    source column blocks (``_apply_column_blocks``, exact for
    ``|x0 - j| <= 255``), each resolved with one lane gather +
    masked-weight accumulate — dynamic nested while-loops were the
    first cut's dominant overhead.

Strip windows are DMA'd HBM→VMEM (double-buffered) from the raw ``im2``
planes — the 4C patch pack of the serial-gather scheme is NOT needed
(corner (x0+1, y0+1) samples come from ``idx+1`` lane gathers and the
``d`` loop).  bf16 image planes are up-converted to f32 in VMEM once per
strip; the bilinear combine runs in f32 and rounds once on output (the
XLA bf16 path multiplies bf16 weights — the kernel is the MORE accurate
of the two; the f32 path is bit-exact vs ``ops/interp.bilinear_gather``).

Exactness contract: the kernel is exact when every in-bounds sample
satisfies ``|y0 - i| <= margin`` (window row coverage) and
``|x0 - j| <= 255`` (column block coverage).  Callers wrap it in a
displacement-measuring ``lax.switch`` over a margin ladder
(``ops/interp._warp_pallas_adaptive``), falling back to the serial
gather paths for violent flows, so semantics never change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output strip rows per grid step: larger strips amortize per-strip
# overhead (window up-convert, DMA issue, per-jv reductions) over more
# pixels at slightly larger candidate-row ranges.  Measured on v5e at
# 1080x1920 5ch bf16 on the recorded oracle flow: 16->1.89, 24->1.63,
# 32->1.75, 40->1.44, 48->1.52, 64->1.59 ms/warp — but in the FULL pair
# (all level shapes, in-context flows) 32 beats 40 by ~1.5 ms/pair
# (175.6 vs 177.1 at 1920px P15), so 32 ships.
TB = 32
# Top ghost rows: must cover TB-1 rows of negative candidate offset at
# the image top, rounded to sublane alignment.
_G = -(-(TB - 1) // 8) * 8

# Interpret-mode escape hatch for CPU tests.
_INTERPRET = False


def _wrc(margin: int, h: int = 0) -> int:
    """Window CONTENT rows: strip + one-sided margins + the y0+1 corner
    row, rounded to a multiple of 8 plus 8 rows of base-flooring slack —
    Mosaic requires BOTH the start and the LENGTH of HBM DMA slices to be
    sublane-aligned, so the window is a constant 8-multiple and ``im2``
    is row-padded to a multiple of 8 instead (``h`` is unused, kept for
    the admission callers' convenience)."""
    return -(-(TB + 2 * margin + 2) // 8) * 8 + 8


def _alloc_rows(margin: int) -> int:
    """Scratch rows: ghosts + content + aligned-load overrun room (the
    candidate loader reads an aligned TB+8-row block and rolls)."""
    wrc = _wrc(margin)
    return _G + ((wrc - 1) // 8) * 8 + TB + 8


def _scalar_rows(row0, ns: int, h: int, margin: int, dymin=None):
    """Per-strip prefetch scalars ``[bases | strip0s]``: window DMA base
    rows (8-aligned, clamped into the 8-padded image) and the strips'
    global first output rows.  ``row0`` may be a traced scalar (the
    sharded band warp) or 0 (whole-frame warps).

    ``dymin`` (round 5): optional per-strip minimum vertical displacement
    ``min(trunc(y) - i)`` over the strip's in-bounds pixels.  When given,
    each window is ANCHORED at its strip's own displacement floor instead
    of symmetric ``±margin`` around the strip — the window then covers any
    uniform flow (vehicles, panning) and the exactness contract becomes a
    bound on the within-strip displacement SPREAD
    (``spread_margin_for``), killing the violent-flow fallback for real
    data (VERDICT r4 weak #3: one ~200 px pair cost 2.8x the median)."""
    wrc = _wrc(margin)
    h8 = -(-h // 8) * 8
    strip0s = row0 + jnp.arange(ns, dtype=jnp.int32) * TB
    if dymin is None:
        bases = jnp.clip(strip0s - margin, 0, max(h8 - wrc, 0)) // 8 * 8
    else:
        bases = jnp.clip(
            (strip0s + dymin) // 8 * 8, 0, max(h8 - wrc, 0)
        )
    return jnp.concatenate([bases, strip0s])


def spread_margin_for(margin: int) -> int:
    """Max within-strip displacement spread (``max(y1 - i) - min(y0 - i)``
    per strip) for which the REBASED window of ``margin`` is exact.

    Coverage proof: ``base = floor8(strip0 + mn0)`` loses at most 7 rows,
    windows hold ``wrc`` content rows, the strip spans ``TB`` output rows,
    so ``mx1 - mn0 <= wrc - TB - 8`` keeps every sample row inside
    ``[base, base + wrc)`` (the boundary clips only widen coverage on the
    clipped side)."""
    return _wrc(margin) - TB - 8


def _window_pipeline(bases_ref, src_hbm, land_ref, win_ref, sem, wrc):
    """Double-buffered HBM->VMEM strip-window DMA + one f32 up-convert.

    Content rows land at scratch rows [_G, _G + wrc) (top ghost for
    negative candidate offsets; ghosts zeroed so masked zero-weight
    lanes never multiply non-finite garbage)."""
    s = pl.program_id(0)
    ns = pl.num_programs(0)

    def dma(slot, strip):
        base = pl.multiple_of(bases_ref[strip], 8)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(base, wrc), :],
            land_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(s == 0)
    def _():
        dma(0, 0).start()

    @pl.when(s + 1 < ns)
    def _():
        dma((s + 1) % 2, s + 1).start()

    dma(s % 2, s).wait()
    win_ref[:, 0:_G, :] = jnp.zeros_like(win_ref[:, 0:_G, :])
    win_ref[:, _G + wrc:, :] = jnp.zeros_like(win_ref[:, _G + wrc:, :])
    win_ref[:, _G:_G + wrc, :] = land_ref[s % 2].astype(jnp.float32)


def _coord_fields(h, w, wp, vx_ref, vy_ref, base, strip0, clip01):
    """Shared warp coordinate fields on the (TB, Wp) strip, mirroring the
    serial paths' f32 arithmetic (``ops/interp``/``ops/bicubic``).
    ``clip01``: bilinear clamps the fractions into [0, 1]
    (``ImageProcessing.h:146-147``); the bicubic uses the raw ``x - x0``
    with the CLIPPED base (``Image.h:2698-2701``) — identical in-bounds,
    different only at discarded OOB pixels."""
    fi = jax.lax.broadcasted_iota(jnp.int32, (TB, wp), 0)
    fj = jax.lax.broadcasted_iota(jnp.int32, (TB, wp), 1)
    # Row indices CLAMP into the image: interior strips are unaffected
    # (strip0 + i < h), and the sharded band warp's clamp-replicated
    # halo/ghost rows get their exact sample row this way — folding the
    # clamp into vy instead would round the coordinate at the magnitude
    # of the row index (~1e-5 at 1080 rows).
    ic = jnp.clip(fi + strip0, 0, h - 1)
    x = fj.astype(jnp.float32) + vx_ref[:]
    y = ic.astype(jnp.float32) + vy_ref[:]
    oob = (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    xx = jnp.trunc(x)
    yy = jnp.trunc(y)
    x0 = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    if clip01:
        fx = jnp.clip(x - xx, 0.0, 1.0)
        fy = jnp.clip(y - yy, 0.0, 1.0)
    else:
        fx = x - x0.astype(jnp.float32)
        fy = y - y0.astype(jnp.float32)
    # Candidate row offsets: source row y0 sits at window-content offset
    # y0 - base; candidate ``d`` covers rows [base + d + i].  OOB pixels'
    # clamped coordinates would blow the data-derived loop ranges up, so
    # neutralize them (their accumulate is discarded by the final oob
    # select anyway).
    neutral_r = strip0 - base
    r0 = jnp.where(oob, neutral_r, y0 - base - fi)
    r1 = jnp.where(oob, neutral_r, y1 - base - fi)
    # (r0/r1 stay relative to the NOMINAL rows fi + strip0 — the window
    # coverage proof is about strip geometry, and clamped rows just have
    # slightly larger |r|, which the d-loop bounds absorb.)
    xn = jnp.clip(fj, 0, w - 1)
    x0n = jnp.where(oob, xn, x0)
    x1n = jnp.where(oob, xn, x1)
    return oob, fx, fy, x0n, x1n, r0, r1


def _apply_column_blocks(jv, nj, x0s, x1s, accumulate):
    """Statically unrolled aligned source-column blocks jv-2..jv+2, each
    gated by a cheap any-pixel-needs-it scalar flag (ascending cb keeps
    the serial accumulate order: x0 before x1 per candidate row).  Five
    blocks cover integer horizontal displacements |x0 - j| <= 255; the
    adaptive wrappers route larger flows to the serial fallback."""
    for off in (-2, -1):
        cb = jv + off
        if cb >= 0:
            need = jnp.min(x0s) < (cb + 1) * 128

            @pl.when(need)
            def _(cb=cb):
                accumulate(cb)
    accumulate(jv)
    for off in (1, 2):
        cb = jv + off
        if cb < nj:
            need = jnp.max(x1s) >= cb * 128

            @pl.when(need)
            def _(cb=cb):
                accumulate(cb)


def _warp_kernel(
    c: int, h: int, w: int, wp: int, margin: int, out_dtype,
    bases_ref,                     # scalar-prefetch (NS,) int32
    im2_hbm,                       # (C, H, W) image dtype, stays in HBM
    vx_ref, vy_ref,                # (TB, Wp) f32 strip blocks
    im1_ref,                       # (C, TB, Wp) image-dtype strip block
    out_ref,                       # (C, TB, Wp) image-dtype strip block
    land_ref,                      # (2, C, WRC, Wp) image-dtype DMA landing
    win_ref,                       # (C, ALLOC, Wp) f32 gather window
    acc_ref,                       # (C, TB, 128) f32 accumulator
    sem,                           # DMA semaphores (2,)
):
    wrc = _wrc(margin)
    s = pl.program_id(0)
    ns = pl.num_programs(0)
    _window_pipeline(bases_ref, im2_hbm, land_ref, win_ref, sem, wrc)
    base = bases_ref[s]
    strip0 = bases_ref[ns + s]  # global row of the strip's first output row
    oob, fx, fy, x0n, x1n, r0, r1 = _coord_fields(
        h, w, wp, vx_ref, vy_ref, base, strip0, clip01=True
    )

    # Per 128-column output block: ONE dynamic fori over candidate row
    # offsets (the data-dependent part — trip count == within-strip
    # displacement variation + 2, median ~3); the column side is fully
    # static (_apply_column_blocks) — dynamic while-loops were the
    # dominant overhead of the first cut (nested d x cb whiles measured
    # 1.5-2x slower than this structure).
    nj = wp // 128
    for jv in range(nj):
        sl = slice(jv * 128, (jv + 1) * 128)
        fxs, fys = fx[:, sl], fy[:, sl]
        x0s, x1s = x0n[:, sl], x1n[:, sl]
        r0s, r1s = r0[:, sl], r1[:, sl]
        dlo = jnp.maximum(jnp.min(r0s), -_G)
        dhi = jnp.minimum(jnp.max(r1s), wrc - 1)
        one_m_fx = 1.0 - fxs
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def dbody(d, carry):
            wy = jnp.where(r0s == d, 1.0 - fys, 0.0) + jnp.where(
                r1s == d, fys, 0.0
            )
            dd = d + _G  # scratch-local (top ghost offset)
            k = pl.multiple_of((dd // 8) * 8, 8)
            rshift = dd % 8

            def accumulate(cb):
                w0 = jnp.where((x0s // 128) == cb, one_m_fx * wy, 0.0)
                w1 = jnp.where((x1s // 128) == cb, fxs * wy, 0.0)
                lx0 = jnp.clip(x0s - cb * 128, 0, 127)
                lx1 = jnp.clip(x1s - cb * 128, 0, 127)
                for ch in range(c):
                    blk = win_ref[ch, pl.ds(k, TB + 8), cb * 128:(cb + 1) * 128]
                    blk = pltpu.roll(blk, (-rshift) % (TB + 8), 0)
                    src = blk[0:TB, :]
                    g0 = jnp.take_along_axis(src, lx0, axis=-1)
                    g1 = jnp.take_along_axis(src, lx1, axis=-1)
                    acc_ref[ch] = acc_ref[ch] + w0 * g0 + w1 * g1

            _apply_column_blocks(jv, nj, x0s, x1s, accumulate)
            return carry

        jax.lax.fori_loop(dlo, dhi + 1, dbody, 0)
        for ch in range(c):
            out_ref[ch, :, sl] = jnp.where(
                oob[:, sl], im1_ref[ch, :, sl], acc_ref[ch].astype(out_dtype)
            )


@functools.partial(jax.jit, static_argnames=("margin",))
def warp_bilinear_pallas(im1, im2, vx, vy, margin: int = 24, dymin=None):
    """Full backward warp (``warpImage`` semantics) via the VPU kernel.

    ``im1``, ``im2``: ``(C, H, W)``; ``vx``, ``vy``: ``(H, W)``.  EXACT
    (f32: bit-exact; bf16: f32-accumulated, <= 1 bf16 ulp vs the XLA
    path) iff every in-bounds sample satisfies ``|trunc(y) - i| <=
    margin`` — or, with per-strip ``dymin`` rebasing, iff each strip's
    displacement spread is within ``spread_margin_for(margin)``; wrap in
    the displacement-adaptive switch for arbitrary flows
    (``ops/interp.warp_bilinear``)."""
    c, h, w = im2.shape
    ns = -(-h // TB)
    hp = ns * TB
    wp = -(-w // 128) * 128
    h8 = -(-h // 8) * 8
    wrc = _wrc(margin)
    alloc = _alloc_rows(margin)
    if h < wrc:
        raise ValueError(
            f"warp_bilinear_pallas: image height {h} < window {wrc} rows "
            f"(margin {margin}) — gate with supports_pallas_warp()"
        )

    def pad(a, rows, cols):
        if rows == a.shape[-2] and cols == a.shape[-1]:
            return a
        cfg = [(0, 0)] * (a.ndim - 2) + [
            (0, rows - a.shape[-2]), (0, cols - a.shape[-1])
        ]
        return jnp.pad(a, cfg)

    vx_p = pad(vx.astype(jnp.float32), hp, wp)
    vy_p = pad(vy.astype(jnp.float32), hp, wp)
    im1_p = pad(im1, hp, wp)
    # Mosaic HBM DMA slices need sublane-aligned row starts/lengths and
    # lane-aligned widths; pad im2 to (ceil8 rows, ceil128 cols) with
    # zeros (only ever touched through zero-weight masked lanes, and the
    # full-width DMA then fills the landing buffer completely — no ghost
    # hygiene needed there).  No-op at the aligned levels.
    im2_p = pad(im2, h8, wp) if (h8 != h or wp != w) else im2
    bases = _scalar_rows(jnp.int32(0), ns, h, margin, dymin=dymin)

    kernel = functools.partial(
        _warp_kernel, c, h, w, wp, margin, im2.dtype
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # im2 in HBM
            pl.BlockSpec((TB, wp), lambda s, b: (s, 0)),
            pl.BlockSpec((TB, wp), lambda s, b: (s, 0)),
            pl.BlockSpec((c, TB, wp), lambda s, b: (0, s, 0)),
        ],
        out_specs=pl.BlockSpec((c, TB, wp), lambda s, b: (0, s, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c, wrc, wp), im2.dtype),
            pltpu.VMEM((c, alloc, wp), jnp.float32),
            pltpu.VMEM((c, TB, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vmem_bytes = (
        2 * c * wrc * wp * im2.dtype.itemsize
        + alloc * c * wp * 4
        + 3 * c * TB * wp * im2.dtype.itemsize
        + 2 * TB * wp * 4
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), im2.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes * 2.5) + 2 * 2**20, 100 * 2**20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * c * hp * wp,
            bytes_accessed=(2 * c + 3) * hp * wp * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(bases, im2_p, vx_p, vy_p, im1_p)
    return out[:, :h, :w]


def _bicubic_kernel(
    c: int, h: int, w: int, wp: int, margin: int, out_dtype,
    bases_ref,                     # scalar-prefetch (NS,) int32
    stack_hbm,                     # (4C, H, W) stencil table, stays in HBM
    vx_ref, vy_ref,                # (TB, Wp) f32 strip blocks
    ref_ref,                       # (C, TB, Wp) fill-frame strip block
    out_ref,                       # (C, TB, Wp) strip block
    land_ref,                      # (2, 4C, WRC, Wp) table-dtype DMA landing
    win_ref,                       # (4C, ALLOC, Wp) f32 gather window
    acc_ref,                       # (C, TB, 128) f32 accumulator
    sem,                           # DMA semaphores (2,)
):
    """Hermite bicubic warp (``Image.h:2650-2768`` ``warpImageBicubicRef``)
    on the candidate-row machinery of ``_warp_kernel``.

    ``val = hx . G . hy`` with ``hx/hy`` the cubic Hermite basis at the
    fractional offsets and ``G`` the 16 stencil values — 4 planes
    ``[f, f_x, f_y, f_xy]`` (the ``stack4`` built by
    ``ops/bicubic.warp_bicubic_ref``) at the 2x2 corner positions.  Per
    candidate (d, cb): 8 combined weight fields (plane x x-corner), then
    per image channel 4 plane-gather pairs + FMAs."""
    wrc = _wrc(margin)
    s = pl.program_id(0)
    ns = pl.num_programs(0)
    _window_pipeline(bases_ref, stack_hbm, land_ref, win_ref, sem, wrc)
    base = bases_ref[s]
    strip0 = bases_ref[ns + s]  # global row of the strip's first output row
    oob, fx, fy, x0n, x1n, r0, r1 = _coord_fields(
        h, w, wp, vx_ref, vy_ref, base, strip0, clip01=False
    )
    # Cubic Hermite basis (rows of px @ _HERMITE_M, ops/bicubic.py).
    def hermite(t):
        t2 = t * t
        t3 = t2 * t
        return (1 - 3 * t2 + 2 * t3, 3 * t2 - 2 * t3,
                t - 2 * t2 + t3, -t2 + t3)

    hx = hermite(fx)
    hy = hermite(fy)

    nj = wp // 128
    for jv in range(nj):
        sl = slice(jv * 128, (jv + 1) * 128)
        hxs = [hh[:, sl] for hh in hx]
        hys = [hh[:, sl] for hh in hy]
        x0s, x1s = x0n[:, sl], x1n[:, sl]
        r0s, r1s = r0[:, sl], r1[:, sl]
        dlo = jnp.maximum(jnp.min(r0s), -_G)
        dhi = jnp.minimum(jnp.max(r1s), wrc - 1)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def dbody(d, carry):
            a0 = r0s == d
            a1 = r1s == d
            # Per-fieldy row weights: hy[2*fy_ + yc] masked by yc match.
            wyf = [
                jnp.where(a0, hys[0], 0.0) + jnp.where(a1, hys[1], 0.0),
                jnp.where(a0, hys[2], 0.0) + jnp.where(a1, hys[3], 0.0),
            ]
            dd = d + _G
            k = pl.multiple_of((dd // 8) * 8, 8)
            rshift = dd % 8

            def accumulate(cb):
                m0 = (x0s // 128) == cb
                m1 = (x1s // 128) == cb
                lx0 = jnp.clip(x0s - cb * 128, 0, 127)
                lx1 = jnp.clip(x1s - cb * 128, 0, 127)
                # w[fieldx][fieldy][xc]
                wc = [
                    [
                        [
                            jnp.where(m0, hxs[2 * fx_ + 0], 0.0) * wyf[fy_],
                            jnp.where(m1, hxs[2 * fx_ + 1], 0.0) * wyf[fy_],
                        ]
                        for fy_ in range(2)
                    ]
                    for fx_ in range(2)
                ]
                for ch in range(c):
                    for fy_ in range(2):
                        for fx_ in range(2):
                            plane = (fx_ + 2 * fy_) * c + ch
                            blk = win_ref[
                                plane, pl.ds(k, TB + 8),
                                cb * 128:(cb + 1) * 128,
                            ]
                            blk = pltpu.roll(blk, (-rshift) % (TB + 8), 0)
                            src = blk[0:TB, :]
                            g0 = jnp.take_along_axis(src, lx0, axis=-1)
                            g1 = jnp.take_along_axis(src, lx1, axis=-1)
                            acc_ref[ch] = (
                                acc_ref[ch]
                                + wc[fx_][fy_][0] * g0
                                + wc[fx_][fy_][1] * g1
                            )

            _apply_column_blocks(jv, nj, x0s, x1s, accumulate)
            return carry

        jax.lax.fori_loop(dlo, dhi + 1, dbody, 0)
        for ch in range(c):
            out_ref[ch, :, sl] = jnp.where(
                oob[:, sl], ref_ref[ch, :, sl], acc_ref[ch].astype(out_dtype)
            )


@functools.partial(jax.jit, static_argnames=("margin",))
def warp_bicubic_pallas(ref, stack4, vx, vy, margin: int = 24, dymin=None):
    """Hermite bicubic backward warp via the VPU kernel.

    ``ref``: ``(C, H, W)`` fill frame (OOB targets copy it); ``stack4``:
    ``(4C, H, W)`` stencil table ``[f, f_x, f_y, f_xy]`` (channel-major
    per plane, as built by ``ops/bicubic.warp_bicubic_ref``); ``vx``,
    ``vy``: ``(H, W)``.  Output dtype == ``ref.dtype`` (the Hermite
    evaluation runs in f32 regardless of the table dtype).  Exact under
    the same ``|trunc(y) - i| <= margin`` contract as the bilinear
    kernel."""
    c, h, w = ref.shape
    c4 = stack4.shape[0]
    assert c4 == 4 * c, (c4, c)
    ns = -(-h // TB)
    hp = ns * TB
    wp = -(-w // 128) * 128
    h8 = -(-h // 8) * 8
    wrc = _wrc(margin)
    alloc = _alloc_rows(margin)
    if h < wrc:
        raise ValueError(
            f"warp_bicubic_pallas: image height {h} < window {wrc} rows"
        )

    def pad(a, rows, cols):
        if rows == a.shape[-2] and cols == a.shape[-1]:
            return a
        cfg = [(0, 0)] * (a.ndim - 2) + [
            (0, rows - a.shape[-2]), (0, cols - a.shape[-1])
        ]
        return jnp.pad(a, cfg)

    vx_p = pad(vx.astype(jnp.float32), hp, wp)
    vy_p = pad(vy.astype(jnp.float32), hp, wp)
    ref_p = pad(ref, hp, wp)
    stack_p = pad(stack4, h8, wp) if (h8 != h or wp != w) else stack4
    bases = _scalar_rows(jnp.int32(0), ns, h, margin, dymin=dymin)

    kernel = functools.partial(
        _bicubic_kernel, c, h, w, wp, margin, ref.dtype
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # table in HBM
            pl.BlockSpec((TB, wp), lambda s, b: (s, 0)),
            pl.BlockSpec((TB, wp), lambda s, b: (s, 0)),
            pl.BlockSpec((c, TB, wp), lambda s, b: (0, s, 0)),
        ],
        out_specs=pl.BlockSpec((c, TB, wp), lambda s, b: (0, s, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c4, wrc, wp), stack4.dtype),
            pltpu.VMEM((c4, alloc, wp), jnp.float32),
            pltpu.VMEM((c, TB, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vmem_bytes = (
        2 * c4 * wrc * wp * stack4.dtype.itemsize
        + alloc * c4 * wp * 4
        + 3 * c * TB * wp * ref.dtype.itemsize
        + 2 * TB * wp * 4
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), ref.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes * 2.5) + 2 * 2**20, 100 * 2**20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=90 * c * hp * wp,
            bytes_accessed=(2 * c4 + 3) * hp * wp * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(bases, stack_p, vx_p, vy_p, ref_p)
    return out[:, :h, :w]


@functools.partial(jax.jit, static_argnames=("margin",))
def warp_bilinear_pallas_band(im1_b, im2, vx_b, vy_b, row0, margin: int = 64):
    """Banded ``warp_bilinear_pallas`` for the row-sharded solver
    (``parallel/tiled._warp_band``): the output covers band rows
    ``[row0, row0 + hb)`` of the full image (``row0`` traced — typically
    ``shard_index * band_rows - halo``), gathering from the replicated
    full ``im2``.  Callers fold any clamped halo-row coordinates into
    ``vy_b`` (``y == row0 + i + vy_b`` must hold).  Exact under the same
    ``|y0 - (row0 + i)| <= margin`` / ``|x0 - j| <= 255`` contract."""
    c, hb, w = im1_b.shape
    ci, h, wi = im2.shape
    assert (ci, wi) == (c, w), (im1_b.shape, im2.shape)
    ns = -(-hb // TB)
    hp = ns * TB
    wp = -(-w // 128) * 128
    h8 = -(-h // 8) * 8
    wrc = _wrc(margin)
    alloc = _alloc_rows(margin)
    if h < wrc:
        raise ValueError(
            f"warp_bilinear_pallas_band: image height {h} < window {wrc}"
        )

    def pad(a, rows, cols):
        if rows == a.shape[-2] and cols == a.shape[-1]:
            return a
        cfg = [(0, 0)] * (a.ndim - 2) + [
            (0, rows - a.shape[-2]), (0, cols - a.shape[-1])
        ]
        return jnp.pad(a, cfg)

    vx_p = pad(vx_b.astype(jnp.float32), hp, wp)
    vy_p = pad(vy_b.astype(jnp.float32), hp, wp)
    im1_p = pad(im1_b, hp, wp)
    im2_p = pad(im2, h8, wp) if (h8 != h or wp != w) else im2
    scalars = _scalar_rows(jnp.asarray(row0, jnp.int32), ns, h, margin)

    kernel = functools.partial(
        _warp_kernel, c, h, w, wp, margin, im2.dtype
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TB, wp), lambda s, b: (s, 0)),
            pl.BlockSpec((TB, wp), lambda s, b: (s, 0)),
            pl.BlockSpec((c, TB, wp), lambda s, b: (0, s, 0)),
        ],
        out_specs=pl.BlockSpec((c, TB, wp), lambda s, b: (0, s, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c, wrc, wp), im2.dtype),
            pltpu.VMEM((c, alloc, wp), jnp.float32),
            pltpu.VMEM((c, TB, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vmem_bytes = (
        2 * c * wrc * wp * im2.dtype.itemsize
        + alloc * c * wp * 4
        + 3 * c * TB * wp * im2.dtype.itemsize
        + 2 * TB * wp * 4
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), im2.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes * 2.5) + 2 * 2**20, 100 * 2**20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * c * hp * wp,
            bytes_accessed=(2 * c + 3) * hp * wp * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(scalars, im2_p, vx_p, vy_p, im1_p)
    return out[:, :hb, :w]
