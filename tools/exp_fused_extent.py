"""Per-level fused-vs-op-by-op solve times at the r5 admission-extension
shapes (nj=4 / 140k: level 5 @1920, level 3 @960, the finest level @480,
plus the prior-extent level 6 @1920 as a control).

Times one whole-level SmoothFlowSOR solve both ways on the real chip via
chained amplification (utils/profiling._make_chain / _time_chain — trip-
count differencing cancels the ~25 ms dispatch floor):

  fused : ops/pallas/level_fused.smooth_flow_level_fused (one kernel)
  xla   : models/solver.smooth_flow_sor with use_fused_level=False
          (the op-by-op XLA + Pallas-SOR composition)

Usage: python tools/exp_fused_extent.py   (prints one JSON object)
"""

import dataclasses
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from papteam_opticalflow_tpu.models.solver import (
    _use_fused_level, smooth_flow_sor,
)
from papteam_opticalflow_tpu.utils.params import DEFAULT_PARAMS
from papteam_opticalflow_tpu.utils.profiling import _make_chain, _time_chain

# (tag, h, w, level_k) — schedules are the reference's 7+k / 30+3k.
CASES = [
    ("1920_L6_control", 192, 341, 6),
    ("1920_L5", 256, 455, 5),
    ("960_L3", 228, 405, 3),
    ("480_L0_finest", 270, 480, 0),
]


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(3)
    out = {}
    for tag, h, w, k in CASES:
        c = 5
        no, ni, ns = DEFAULT_PARAMS.level_schedule(k)
        feat1 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        feat2 = jnp.asarray(
            np.roll(np.asarray(feat1), 2, axis=2) * 0.95 + 0.02
        )
        u = jnp.asarray((rng.random((h, w)) * 2 - 1) * 3.0, jnp.float32)
        v = jnp.asarray((rng.random((h, w)) * 2 - 1) * 3.0, jnp.float32)
        o = {"f1": feat1, "f2": feat2, "u": u, "v": v}
        fused_ok = _use_fused_level(feat1, u, no, ni, ns, DEFAULT_PARAMS, None)
        plain = dataclasses.replace(DEFAULT_PARAMS, use_fused_level=False)

        def op_xla(o, b):
            return smooth_flow_sor(
                o["f1"], o["f2"], o["f2"], o["u"] + b, o["v"],
                no, ni, ns, plain,
            )[0]

        row = {"h": h, "w": w, "schedule": [no, ni, ns],
               "fused_admitted": bool(fused_ok)}
        row["xla_ms"] = round(
            _time_chain(_make_chain(op_xla), o, hi=33) * 1e3, 3)
        if fused_ok:
            from papteam_opticalflow_tpu.ops.pallas.level_fused import (
                smooth_flow_level_fused,
            )

            def op_fused(o, b):
                return smooth_flow_level_fused(
                    o["f1"], o["f2"], o["f2"], o["u"] + b, o["v"],
                    no, ni, ns, DEFAULT_PARAMS,
                )[0]

            row["fused_ms"] = round(
                _time_chain(_make_chain(op_fused), o, hi=33) * 1e3, 3)
            row["speedup"] = round(row["xla_ms"] / row["fused_ms"], 2)
        out[tag] = row
        print(f"{tag}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
