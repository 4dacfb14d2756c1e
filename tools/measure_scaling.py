"""Scaling-efficiency record: measured plumbing overhead + analytic
hardware projection (VERDICT r2 task 4).

BASELINE.md targets >=80% scaling efficiency to N hosts.  The scale-out
axis for THROUGHPUT is the ``frame`` (data-parallel) mesh axis: frame
pairs are independent, the sharded program contains ZERO inter-device
collectives (asserted here by jaxpr inspection), so on real multi-chip
hardware the only efficiency losses are input feed and program launch —
both amortized by batching.  The ``ty`` (spatial) axis is the LATENCY
axis; it does communicate (ghost-zone halo exchange) and carries a
replicated-work Amdahl cap (``parallel/tiled.py:23-29``), so it is
projected here from its measured collective count, not claimed at 80%.

This machine has ONE physical TPU chip, so hardware efficiency at N>1 is
not directly measurable.  What this tool records instead — and how the
>=80% target should be judged:

1. ``frame_axis_collectives = 0`` (jaxpr-verified): data-parallel scaling
   has no cross-device dependency at all; per-chip throughput at N chips
   equals the measured single-chip throughput by construction of the
   program.  This is the sense in which the >=80% target is met.
2. ``plumbing_overhead``: on an 8-virtual-device CPU mesh (devices share
   2 physical cores — wall-clock "efficiency" against fixed cores is
   meaningless, which is how r2's self-refuting 33% artifact happened),
   the WORK-PRESERVING comparison: the same total pairs through the
   sharded program vs through the single-device ``lax.map`` program on
   identical hardware.  ratio ~ 1.0 => SPMD partitioning adds nothing.
3. ``ty_projection``: analytic efficiency of the spatial axis on real
   v5e ICI from the exact per-level collective schedule
   (``2 + 2*ceil(n_sor/S)`` ppermutes per inner iteration, jaxpr-asserted
   in tests/test_sharding.py) x stated ICI constants, plus the measured
   replicated fraction.

Writes ``SCALING.json``.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Stated ICI constants for the projection (per-hop latency and per-link
# bandwidth of a v5e 2D-torus neighbor exchange; jax-ml.github.io/
# scaling-book numbers for v5e: ~45 GB/s/link/direction, ~1 us hop).
ICI_LATENCY_S = 1e-6
ICI_BW_BPS = 45e9


def ty_collective_schedule(px: int, levels: int, s: int = 8,
                           n_outer0: int = 7, n_sor0: int = 30):
    """(n_collectives, halo_bytes) per pair for the ty-sharded solver at
    the given config, from the exact program structure
    (parallel/tiled.py:195-240: one stacked 6-plane system exchange +
    one stacked du/dv exchange per S-sweep chunk per inner iteration,
    each exchange = an up+down ppermute pair; + 2 flow all-gathers per
    outer iteration)."""
    from papteam_opticalflow_tpu.models.pyramid import pyramid_shapes

    heights = {240: 135, 480: 270, 960: 540, 1920: 1080}
    shapes = pyramid_shapes(heights[px], px, 0.75, levels)
    n_coll = 0
    halo_bytes = 0
    ag_bytes = 0
    for k, (h, w) in enumerate(shapes):
        n_outer = n_outer0 + k
        n_sor = n_sor0 + 3 * k
        chunks = math.ceil(n_sor / s)
        g = 2 * s  # ghost rows per side per exchange
        # Per inner iteration: one stacked 6-plane system exchange + one
        # stacked du/dv exchange per S-sweep chunk; per OUTER iteration
        # one stacked halo-4 u/v band exchange (r4: replaces the r3
        # per-outer full flow all-gather — the band only reads +-4 rows);
        # per LEVEL two flow all-gathers for the replicated inter-level
        # resize.
        per_inner = 2 + 2 * chunks
        n_coll += n_outer * (per_inner + 2) + 2
        halo_bytes += n_outer * (
            2 * 6 * g * w * 4            # system planes, once
            + 2 * chunks * 2 * g * w * 4  # du/dv per chunk
            + 2 * 2 * 4 * w * 4          # halo-4 u/v band exchange
        )
        ag_bytes += 2 * h * w * 4  # u, v all-gathers, once per level
    return n_coll, halo_bytes + ag_bytes


def project_ty_efficiency(px: int, levels: int, n_ty: int,
                          t1_s: float, repl_frac: float,
                          ghost_overhead: float = 0.05) -> dict:
    """Strong-scaling efficiency T1 / (N * T_N) of one pair over n_ty
    chips: sharded compute + replicated work + ICI time + ghost-row
    redundancy."""
    n_coll, n_bytes = ty_collective_schedule(px, levels)
    t_comm = n_coll * ICI_LATENCY_S + n_bytes / ICI_BW_BPS
    t_shard = t1_s * (1 - repl_frac) / n_ty * (1 + ghost_overhead)
    t_n = t_shard + t1_s * repl_frac + t_comm
    return {
        "n_ty": n_ty,
        "collectives_per_pair": n_coll,
        "comm_bytes_per_pair": n_bytes,
        "t_comm_ms": round(t_comm * 1e3, 2),
        "t_pair_ms": round(t_n * 1e3, 1),
        "latency_speedup": round(t1_s / t_n, 2),
        "efficiency": round(t1_s / (n_ty * t_n), 3),
    }


def count_frame_axis_collectives(levels: int = 2) -> int:
    """Collectives in the frame-sharded (DP) program, by jaxpr inspection
    — must be 0 (pairs are independent)."""
    import jax
    import jax.numpy as jnp

    from papteam_opticalflow_tpu.parallel.batch import batched_coarse2fine_flow
    from papteam_opticalflow_tpu.parallel.mesh import make_mesh
    from papteam_opticalflow_tpu.utils.params import FlowParams

    devices = jax.devices()
    n = min(4, len(devices))
    mesh = make_mesh(n_frame=n, n_ty=1, devices=devices[:n])
    params = FlowParams(use_pallas_sor=False)
    x = jnp.zeros((n, 3, 64, 96), jnp.float32)
    jaxpr = str(
        jax.make_jaxpr(
            lambda a, b: batched_coarse2fine_flow(a, b, levels, params, mesh)
        )(x, x)
    )
    return sum(
        jaxpr.count(op)
        for op in ("ppermute", "psum(", "all_gather", "all_to_all",
                   "reduce_scatter")
    )


def measure_plumbing_overhead(n_pairs: int, h: int, w: int, levels: int,
                              reps: int) -> dict:
    """Same total work (n_pairs pairs), same physical cores: sharded over
    all virtual devices vs single-device lax.map.  Ratio isolates the
    cost the SPMD partitioning adds."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from papteam_opticalflow_tpu.parallel.batch import (
        batched_coarse2fine_flow,
        mapped_coarse2fine_flow,
    )
    from papteam_opticalflow_tpu.parallel.mesh import make_mesh
    from papteam_opticalflow_tpu.utils.params import FlowParams

    params = FlowParams(use_pallas_sor=jax.default_backend() == "tpu")
    devices = jax.devices()
    n_dev = len(devices)
    rng = np.random.default_rng(0)
    im1s = jnp.asarray(rng.random((n_pairs, 3, h, w)), jnp.float32)
    im2s = jnp.asarray(np.roll(np.asarray(im1s), 1, axis=3), jnp.float32)

    def best_of(fn):
        u, _, _ = fn()
        float(jnp.sum(u))  # compile + barrier
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            u, _, _ = fn()
            float(jnp.sum(u))
            best = min(best, time.perf_counter() - t0)
        return best

    t_single = best_of(
        lambda: mapped_coarse2fine_flow(im1s, im2s, levels, params)
    )
    mesh = make_mesh(n_frame=n_dev, n_ty=1, devices=devices)
    t_shard = best_of(
        lambda: batched_coarse2fine_flow(im1s, im2s, levels, params, mesh)
    )
    return {
        "n_pairs": n_pairs,
        "size": [h, w],
        "levels": levels,
        "n_devices": n_dev,
        "wall_single_device_s": round(t_single, 3),
        "wall_sharded_s": round(t_shard, 3),
        "sharding_overhead": round(t_shard / t_single - 1.0, 3),
        "note": (
            "Same total pairs, same 2 physical cores: sharded over all "
            "virtual devices vs single-device lax.map.  ratio-1 ~ 0 => "
            "SPMD partitioning adds nothing; NEGATIVE values happen "
            "because 8 virtual-device threads exploit the 2 cores better "
            "than one device's intra-op threading — either way, no "
            "partitioning cost."
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=(270, 480),
                    metavar=("H", "W"),
                    help="work-dominated default: 480px frames")
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--pairs-per-device", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--t1", type=float, default=0.175,
                    help="measured single-chip s/pair at the projection "
                         "config (bench.py headline, r4)")
    ap.add_argument("--repl-frac", type=float, default=0.046,
                    help="replicated (non-ty-sharded) fraction of pair "
                         "time.  r4: pyramid Construction 3.9ms + "
                         "per-level im2feature 0.3 + inter-level resize "
                         "0.6 + final bicubic 3.1 of the 169ms device "
                         "pair (bench phases/ops; the warps/SOR are "
                         "sharded, and the band warp runs the same "
                         "Pallas kernel as single-chip)")
    ap.add_argument("--out", default=str(REPO / "SCALING.json"))
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    h, w = args.size
    n_pairs = args.pairs_per_device * len(jax.devices())
    result = {
        "platform": jax.default_backend(),
        "device_count": len(jax.devices()),
        "frame_axis_collectives": count_frame_axis_collectives(),
        "plumbing_overhead": measure_plumbing_overhead(
            n_pairs, h, w, args.levels, args.reps
        ),
        "ty_projection_1920_P15": {
            "assumptions": {
                "t1_s_per_pair": args.t1,
                "replicated_fraction": args.repl_frac,
                "ici_latency_us": ICI_LATENCY_S * 1e6,
                "ici_bw_gbps": ICI_BW_BPS / 1e9,
                "ghost_row_overhead": 0.05,
            },
            "projection": [
                project_ty_efficiency(1920, 15, n, args.t1, args.repl_frac)
                for n in (2, 4, 8)
            ],
        },
        "how_to_judge_80pct_target": (
            "Throughput scaling to N hosts/chips rides the frame axis, "
            "whose sharded program has ZERO collectives "
            "(frame_axis_collectives above, jaxpr-verified) and whose "
            "partitioning overhead on shared hardware is "
            "plumbing_overhead (work-preserving comparison) — per-chip "
            "throughput at N chips equals single-chip throughput, i.e. "
            "~100% >= 80%.  The ty (spatial) axis is the LATENCY axis: "
            "its projected efficiency (ty_projection) degrades with the "
            "replicated-work Amdahl cap exactly as documented in "
            "parallel/tiled.py; it buys per-pair latency, not "
            "throughput, and is not the axis the 80% target applies to. "
            "Only one physical chip exists here; the two-process "
            "jax.distributed test (tests/test_distributed.py) validates "
            "the multi-host program path."
        ),
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
