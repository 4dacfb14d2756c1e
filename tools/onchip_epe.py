"""On-chip EPE vs the committed Serial-oracle fixtures (VERDICT r2 task 3).

Runs the production pipeline ON THE REAL TPU CHIP in both image modes
(f32 and bf16-images/f32-solver) at the given configs and reports the
end-point error against ``tests/fixtures/oracle_<px>_P<levels>.npz`` —
the parity number for the exact configuration the headline bench
advertises.  (The f64 CPU parity mode is asserted separately by
``tests/test_fixture_parity.py``.)

Usage: ``python tools/onchip_epe.py [px:levels ...]``
(default: ``1920:15 480:4``).  Prints one JSON object.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import jax.numpy as jnp
import numpy as np


def measure(px: int, levels: int) -> dict:
    import oracle
    from papteam_opticalflow_tpu.models.coarse2fine import (
        coarse2fine_flow_chw,
        to_chw,
    )
    from papteam_opticalflow_tpu.utils.params import DEFAULT_PARAMS

    fixture = REPO / "tests" / "fixtures" / f"oracle_{px}_P{levels}.npz"
    d = np.load(fixture)
    im1, im2 = oracle.load_frame_pair(f"HoChiMinhTraffic_10FPS_{px}", 1)
    x1 = to_chw(im1, dtype=jnp.float32)
    x2 = to_chw(im2, dtype=jnp.float32)
    out = {"device": str(jax.devices()[0])}
    for image_dtype in ("float32", "bfloat16"):
        params = dataclasses.replace(DEFAULT_PARAMS, image_dtype=image_dtype)
        u, v, _ = coarse2fine_flow_chw(x1, x2, levels, params)
        out[image_dtype] = round(
            float(oracle.epe(np.asarray(u), np.asarray(v), d["u"], d["v"])),
            6,
        )
    return out


def main():
    cfgs = sys.argv[1:] or ["1920:15", "480:4"]
    out = {}
    for cfg in cfgs:
        px, levels = (int(x) for x in cfg.split(":"))
        out[f"{px}px_P{levels}"] = measure(px, levels)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
