"""Measure production warp cost per pyramid-level shape under candidate
tile geometries.

The r3 adaptive `_tile_plan` picks (tb, tc) from fixed option lists, then
pads the output grid to tile multiples.  At 1920px P15 the padding waste
is shape-dependent: L0 1080x1920 pads 1.00x, but L1 810x1440 -> 864x1920
(1.42x gathered work) and L3 455x810 -> 540x1152 (1.69x) — matching the
in-situ per-level outliers from tools/level_profile.py (L1/L3 cost ~1.5x
their neighbors per pixel-iteration).

This experiment times the REAL warp (warp_bilinear on a prebuilt patch
pack, via the displacement-adaptive tiled gather) with `_tile_plan`
monkeypatched, using the op-table chained-amplification timer.

Usage: python tools/exp_tile_plan.py
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main():
    from papteam_opticalflow_tpu.ops import interp
    from papteam_opticalflow_tpu.ops.interp import (
        pack_patch2x2,
        warp_bilinear,
    )
    from papteam_opticalflow_tpu.utils.profiling import (
        _make_chain,
        _time_chain,
    )

    rng = np.random.default_rng(0)
    shapes = [(1080, 1920), (810, 1440), (607, 1080), (455, 810), (341, 607)]

    def candidates(h, w):
        """Current plan + divisor-aware plans (minimal padding)."""
        cur = interp._tile_plan(h, w)
        cands = {cur}
        for target_b in (54, 108, 128):
            nb = max(1, round(h / target_b))
            tb = -(-h // nb)
            for target_c in (384, 512, 640, 896):
                nc = max(1, round(w / target_c))
                tc = -(-(-(-w // nc)) // 128) * 128
                cands.add((tb, tc))
                # also 8-aligned rows
                cands.add((-(-tb // 8) * 8, tc))
        return cur, sorted(cands)

    for h, w in shapes:
        c = 5
        img = jnp.asarray(rng.random((c, h, w)), jnp.bfloat16)
        pack = pack_patch2x2(img)
        u = jnp.asarray(
            3.0 * np.sin(np.linspace(0, 6, h))[:, None]
            * np.cos(np.linspace(0, 6, w))[None, :], jnp.float32)
        v = jnp.asarray(
            2.0 * np.cos(np.linspace(0, 5, h))[:, None]
            * np.sin(np.linspace(0, 7, w))[None, :], jnp.float32)
        f1 = img.astype(jnp.float32)

        def op_warp(o, b):
            return warp_bilinear(o["f1"], o["img"], o["u"] + b, o["v"],
                                 im2_pack=o["pack"])

        operands = {"f1": f1, "img": img, "u": u, "v": v, "pack": pack}
        cur, cands = candidates(h, w)
        rows = []
        for tb, tc in cands:
            orig = interp._tile_plan
            interp._tile_plan = lambda oh, ow, _tb=tb, _tc=tc: (_tb, _tc)
            try:
                chain = _make_chain(op_warp)
                t = _time_chain(chain, operands, lo=3, hi=23)
            finally:
                interp._tile_plan = orig
            nb, nc = -(-h // tb), -(-w // tc)
            waste = (nb * tb * nc * tc) / (h * w)
            tag = " <= CURRENT" if (tb, tc) == cur else ""
            rows.append((t, tb, tc, waste, tag))
            print(f"{h}x{w}: tile {tb}x{tc:4d} pad {waste:.2f}x "
                  f"{t*1e3:7.2f} ms{tag}", flush=True)
        best = min(rows)
        print(f"  BEST {h}x{w}: {best[1]}x{best[2]} {best[0]*1e3:.2f} ms "
              f"(current {[r for r in rows if r[4]][0][0]*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
