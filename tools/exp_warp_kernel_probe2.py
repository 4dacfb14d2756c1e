"""Row-shift mechanics for the warp kernel: the candidate-row slice
``win[d : d+8]`` needs an ARBITRARY traced sublane offset, which Mosaic
rejects ("index in dimension 1 must be a multiple of 8").  Probe the two
workarounds:

  roll_dyn    — pltpu.roll with a TRACED shift (tpu.DynamicRotateOp).
  aligned_dyn — load at (d//8)*8 via pl.multiple_of, then fix the
                residual shift with a dynamic roll (composition the
                kernel will actually use: aligned 16-row load + roll +
                static [0:8] slice).
  subg_shift  — residual shift via two sublane gathers + select
                (fallback if dynamic roll is unsupported).

Run: python tools/exp_warp_kernel_probe2.py [roll_dyn|aligned_dyn|subg_shift|all]
"""

from __future__ import annotations

import subprocess
import sys
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


def probe_roll_dyn():
    jax, jnp, np, pl, pltpu = _setup()
    x = jnp.asarray(np.random.default_rng(0).random((16, 128)), jnp.float32)
    sh = jnp.asarray([[5]], jnp.int32)

    def kern(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], -s_ref[0, 0] % 16, 0)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, sh)
    ref = jnp.roll(x, -5, axis=0)
    print(f"roll_dyn: COMPILES exact={bool((out == ref).all())}")


def probe_aligned_dyn():
    jax, jnp, np, pl, pltpu = _setup()
    WR = 40
    x = jnp.asarray(np.random.default_rng(0).random((WR, 128)), jnp.float32)
    d = 13

    def kern(x_ref, s_ref, o_ref):
        dd = s_ref[0, 0]
        k = pl.multiple_of((dd // 8) * 8, 8)
        blk = x_ref[pl.ds(k, 16), :]            # aligned 16-row load
        blk = pltpu.roll(blk, -(dd % 8) % 16, 0)  # residual dynamic shift
        o_ref[:] = blk[0:8, :]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.asarray([[d]], jnp.int32))
    ref = x[d : d + 8]
    print(f"aligned_dyn: COMPILES exact={bool((out == ref).all())}")


def probe_subg_shift():
    jax, jnp, np, pl, pltpu = _setup()
    WR = 40
    x = jnp.asarray(np.random.default_rng(0).random((WR, 128)), jnp.float32)
    d = 13

    def kern(x_ref, s_ref, o_ref):
        dd = s_ref[0, 0]
        k = pl.multiple_of((dd // 8) * 8, 8)
        a = x_ref[pl.ds(k, 8), :]
        b = x_ref[pl.ds(k + 8, 8), :]
        r = dd % 8
        i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lo = jnp.take_along_axis(a, jnp.clip(i + r, 0, 7), axis=-2)
        hi = jnp.take_along_axis(b, jnp.clip(i + r - 8, 0, 7), axis=-2)
        o_ref[:] = jnp.where(i + r < 8, lo, hi)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.asarray([[d]], jnp.int32))
    ref = x[d : d + 8]
    print(f"subg_shift: COMPILES exact={bool((out == ref).all())}")


PROBES = {
    "roll_dyn": probe_roll_dyn,
    "aligned_dyn": probe_aligned_dyn,
    "subg_shift": probe_subg_shift,
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "all":
        for name in PROBES:
            r = subprocess.run(
                [sys.executable, __file__, name],
                capture_output=True, text=True, timeout=300,
            )
            lines = (r.stdout + r.stderr).strip().splitlines()
            if r.returncode == 0:
                good = [ln for ln in lines if "COMPILES" in ln]
                print(good[-1] if good else lines[-1])
            else:
                why = [
                    ln for ln in lines
                    if "Not implemented" in ln or "Error" in ln
                    or "prove" in ln
                ]
                print(f"{name}: FAILS ({(why[-1] if why else '?')[-160:]})")
        return
    PROBES[which]()


if __name__ == "__main__":
    main()
