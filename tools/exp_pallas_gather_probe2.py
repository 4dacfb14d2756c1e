"""Round-2 capability probes: the within-vreg dynamic_gather envelope.

Mosaic's ``take_along_axis`` lowering (``tpu.DynamicGatherOp``) refuses
"multiple source vregs along gather dimension" — so the gather dimension
must be a single vreg: lanes == 128, or sublanes == 8 (f32) / 16 (bf16).
These probes pin down what IS allowed (the building blocks of a VPU warp
kernel):

  lane128_f32   — src (64,128) f32, idx (64,128) in [0,128): per-row
                  lane gather, non-gather dim multiple vregs.
  lane128_bf16  — same in bf16 (one vreg = (16,128)).
  sub8_f32      — src (8,512) f32, idx (8,512) in [0,8): sublane gather,
                  lanes multiple vregs.
  sub16_bf16    — src (16,512) bf16, idx in [0,16).
  dynslice_val  — jax.lax.dynamic_slice of a loaded VALUE at a traced
                  offset (dynamic column alignment inside the kernel).
  dynslice_ref  — ref[pl.ds(traced, size), :] load (dynamic row block).
  iota_idx      — building (8,128) index fields from broadcasted_iota +
                  arithmetic and feeding them into the lane gather.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _pl():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, np, pl, pltpu


def _run1(kern, out_shape, *args):
    jax, jnp, np, pl, pltpu = _pl()
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def probe_lane128_f32():
    jax, jnp, np, pl, pltpu = _pl()
    R, W = 64, 128
    src = jnp.asarray(np.random.default_rng(0).random((R, W)), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, W, (R, W)), jnp.int32)

    def kern(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=-1)

    out = _run1(kern, jax.ShapeDtypeStruct((R, W), jnp.float32), src, idx)
    ok = bool((out == jnp.take_along_axis(src, idx, axis=-1)).all())
    print(f"lane128_f32: COMPILES exact={ok}")


def probe_lane128_bf16():
    jax, jnp, np, pl, pltpu = _pl()
    R, W = 64, 128
    src = jnp.asarray(np.random.default_rng(0).random((R, W)), jnp.bfloat16)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, W, (R, W)), jnp.int32)

    def kern(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=-1)

    out = _run1(kern, jax.ShapeDtypeStruct((R, W), jnp.bfloat16), src, idx)
    ok = bool((out == jnp.take_along_axis(src, idx, axis=-1)).all())
    print(f"lane128_bf16: COMPILES exact={ok}")


def probe_sub8_f32():
    jax, jnp, np, pl, pltpu = _pl()
    R, W = 8, 512
    src = jnp.asarray(np.random.default_rng(0).random((R, W)), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, R, (R, W)), jnp.int32)

    def kern(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=-2)

    out = _run1(kern, jax.ShapeDtypeStruct((R, W), jnp.float32), src, idx)
    ok = bool((out == jnp.take_along_axis(src, idx, axis=-2)).all())
    print(f"sub8_f32: COMPILES exact={ok}")


def probe_sub16_bf16():
    jax, jnp, np, pl, pltpu = _pl()
    R, W = 16, 512
    src = jnp.asarray(np.random.default_rng(0).random((R, W)), jnp.bfloat16)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, R, (R, W)), jnp.int32)

    def kern(s, i, o):
        o[:] = jnp.take_along_axis(s[:], i[:], axis=-2)

    out = _run1(kern, jax.ShapeDtypeStruct((R, W), jnp.bfloat16), src, idx)
    ok = bool((out == jnp.take_along_axis(src, idx, axis=-2)).all())
    print(f"sub16_bf16: COMPILES exact={ok}")


def probe_dynslice_val():
    jax, jnp, np, pl, pltpu = _pl()
    src = jnp.asarray(np.random.default_rng(0).random((8, 512)), jnp.float32)
    off = jnp.asarray([[3]], jnp.int32)

    def kern(s, o_ref, out):
        val = s[:]
        shift = o_ref[0, 0]
        out[:] = jax.lax.dynamic_slice(val, (0, shift * 32), (8, 128))

    jax_, jnp_, np_, pl_, pltpu_ = _pl()
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, off)
    ok = bool((out == src[:, 96:224]).all())
    print(f"dynslice_val: COMPILES exact={ok}")


def probe_dynslice_ref():
    jax, jnp, np, pl, pltpu = _pl()
    src = jnp.asarray(np.random.default_rng(0).random((64, 256)), jnp.float32)
    off = jnp.asarray([[2]], jnp.int32)

    def kern(s, o_ref, out):
        r0 = o_ref[0, 0] * 8
        out[:] = s[pl.ds(r0, 16), :]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, off)
    ok = bool((out == src[16:32]).all())
    print(f"dynslice_ref: COMPILES exact={ok}")


def probe_iota_idx():
    jax, jnp, np, pl, pltpu = _pl()
    R, W = 16, 128
    src = jnp.asarray(np.random.default_rng(0).random((R, W)), jnp.float32)
    sh = jnp.asarray(
        np.random.default_rng(1).integers(-3, 4, (R, W)), jnp.int32
    )

    def kern(s, d, o):
        jj = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        idx = jnp.clip(jj + d[:], 0, W - 1)
        o[:] = jnp.take_along_axis(s[:], idx, axis=-1)

    out = _run1(kern, jax.ShapeDtypeStruct((R, W), jnp.float32), src, sh)
    jj = np.arange(W)[None, :]
    idx = np.clip(jj + np.asarray(sh), 0, W - 1)
    ref = np.take_along_axis(np.asarray(src), idx, axis=-1)
    ok = bool((np.asarray(out) == ref).all())
    print(f"iota_idx: COMPILES exact={ok}")


PROBES = {
    "lane128_f32": probe_lane128_f32,
    "lane128_bf16": probe_lane128_bf16,
    "sub8_f32": probe_sub8_f32,
    "sub16_bf16": probe_sub16_bf16,
    "dynslice_val": probe_dynslice_val,
    "dynslice_ref": probe_dynslice_ref,
    "iota_idx": probe_iota_idx,
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "all":
        for name in PROBES:
            try:
                r = subprocess.run(
                    [sys.executable, __file__, name],
                    capture_output=True, text=True, timeout=240,
                )
                lines = (r.stdout + r.stderr).strip().splitlines()
                if r.returncode == 0:
                    print(lines[-1] if lines else f"{name}: ???")
                else:
                    why = [
                        ln for ln in lines
                        if "Not implemented" in ln or "NotImplemented" in ln
                        or "Unsupported" in ln
                    ]
                    print(f"{name}: FAILS ({why[-1][-120:] if why else 'see -v'})")
            except subprocess.TimeoutExpired:
                print(f"{name}: TIMEOUT")
        return
    PROBES[which]()


if __name__ == "__main__":
    main()
