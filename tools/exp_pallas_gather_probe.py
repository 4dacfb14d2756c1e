"""Capability probe: which gather formulations does Mosaic (Pallas TPU)
compile, and at what throughput?  (VERDICT r4 task 1 groundwork.)

Each probe runs in its own invocation (``python exp_pallas_gather_probe.py
<probe>``) so a Mosaic crash or TPU-worker fault cannot take down a batch
of results; the parent driver (``all``) spawns subprocesses with timeouts.

Probes:
  take_flat      — jnp.take of a flattened (C, R*W) VMEM window with a
                   per-output-pixel index vector (the production gather
                   shape, in-kernel).
  take_along_lane — jnp.take_along_axis(src, idx, axis=-1) per-row lane
                   gather.
  take_along_sub  — jnp.take_along_axis(src, idx, axis=-2) sublane gather.
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
    return jax


def probe_take_flat():
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, R, W = 8, 64, 256
    TB, TC = 32, 128

    def kern(win_ref, idx_ref, out_ref):
        flat = win_ref[:].reshape(C, R * W)
        idx = idx_ref[:].reshape(-1)
        out_ref[:] = jnp.take(flat, idx, axis=-1).reshape(C, TB, TC)

    win = jnp.asarray(np.random.default_rng(0).random((C, R, W)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, R * W, (TB, TC)), jnp.int32
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, TB, TC), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, idx)
    ref = jnp.take(win.reshape(C, R * W), idx.reshape(-1), axis=-1).reshape(
        C, TB, TC
    )
    ok = bool(jnp.max(jnp.abs(out - ref)) == 0)
    print(f"take_flat: COMPILES exact={ok}")


def probe_take_along_lane():
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W = 64, 512

    def kern(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=-1)

    src = jnp.asarray(np.random.default_rng(0).random((R, W)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, W, (R, W)), jnp.int32
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    ref = jnp.take_along_axis(src, idx, axis=-1)
    ok = bool(jnp.max(jnp.abs(out - ref)) == 0)
    print(f"take_along_lane: COMPILES exact={ok}")


def probe_take_along_sub():
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W = 128, 256

    def kern(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=-2)

    src = jnp.asarray(np.random.default_rng(0).random((R, W)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, R, (R, W)), jnp.int32
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    ref = jnp.take_along_axis(src, idx, axis=-2)
    ok = bool(jnp.max(jnp.abs(out - ref)) == 0)
    print(f"take_along_sub: COMPILES exact={ok}")


PROBES = {
    "take_flat": probe_take_flat,
    "take_along_lane": probe_take_along_lane,
    "take_along_sub": probe_take_along_sub,
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
                out = (r.stdout + r.stderr).strip().splitlines()
                tail = out[-1] if out else ""
                if r.returncode == 0:
                    print(tail)
                else:
                    print(f"{name}: FAILS ({tail[-160:]})")
            except subprocess.TimeoutExpired:
                print(f"{name}: TIMEOUT")
        return
    PROBES[which]()


if __name__ == "__main__":
    main()
