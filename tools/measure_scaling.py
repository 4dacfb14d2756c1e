"""Weak-scaling measurement of the ``frame`` (data-parallel) mesh axis.

BASELINE.md targets >=80% scaling efficiency at N>=2 hosts (the reference
has no distributed story at all, SURVEY.md §2.7).  This tool measures weak
scaling of ``batched_coarse2fine_flow``: N frame-groups each solve their
own pair batch, so perfect scaling keeps wall time flat as N grows.

On this machine only one real TPU chip exists, so by default the sweep
runs on a virtual CPU device mesh (``--platform cpu --devices 8``).  CPU
virtual devices share the same cores — the numbers VALIDATE THE SCALING
PLUMBING (sharding, collectives, dispatch) rather than claim hardware
efficiency; on a real pod slice run with ``--platform tpu`` and the same
flags for the honest measurement.

Writes one JSON object to stdout and to ``SCALING.json``::

    {"platform": "cpu", "weak_scaling": [{"n_frame": 1, "s_per_pair": ...},
     ...], "efficiency_vs_1": {...}, "note": "..."}

Multi-process variant: ``tests/test_distributed.py`` exercises the same
path across two coordinated ``jax.distributed`` processes.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual device count for the cpu platform")
    ap.add_argument("--size", type=int, nargs=2, default=(96, 128),
                    metavar=("H", "W"))
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(REPO / "SCALING.json"))
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from papteam_opticalflow_tpu.parallel.batch import batched_coarse2fine_flow
    from papteam_opticalflow_tpu.parallel.mesh import make_mesh
    from papteam_opticalflow_tpu.utils.params import FlowParams

    devices = jax.devices()
    params = FlowParams(
        use_pallas_sor=jax.default_backend() == "tpu"
    )
    h, w = args.size
    rng = np.random.default_rng(0)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    rows = []
    for n in sizes:
        mesh = make_mesh(n_frame=n, n_ty=1, devices=devices[:n])
        im1s = jnp.asarray(rng.random((n, 3, h, w)), jnp.float32)
        im2s = jnp.asarray(np.roll(np.asarray(im1s), 1, axis=3), jnp.float32)
        u, v, _ = batched_coarse2fine_flow(im1s, im2s, args.levels, params, mesh)
        float(jnp.sum(u))  # compile + barrier
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            u, v, _ = batched_coarse2fine_flow(
                im1s, im2s, args.levels, params, mesh
            )
            float(jnp.sum(u))
            best = min(best, time.perf_counter() - t0)
        rows.append({"n_frame": n, "batch": n, "wall_s": round(best, 4),
                     "s_per_pair": round(best / n, 4)})
        print(f"n_frame={n}: {best:.3f} s wall, {best / n:.3f} s/pair",
              file=sys.stderr, flush=True)

    base = rows[0]["wall_s"]
    eff = {str(r["n_frame"]): round(base / r["wall_s"], 3) for r in rows}
    result = {
        "platform": jax.default_backend(),
        "device_count": len(devices),
        "size": [h, w],
        "levels": args.levels,
        "weak_scaling": rows,
        "efficiency_vs_1": eff,
        "note": (
            "weak scaling: N pairs over N frame-groups; efficiency = "
            "t(1)/t(N), 1.0 is perfect. CPU virtual devices share cores — "
            "cpu runs validate plumbing, not hardware efficiency."
        ),
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
