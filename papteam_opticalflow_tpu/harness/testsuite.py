"""Benchmark/sweep harness — the reference's ``TestSuite.py`` as a real CLI.

The reference hardcodes its sweep in source (``Code/Parallel/TestSuite.py:93``
runs ``Progression='Final'`` x 3 images x pyramid (2,4,8,15) x threads
(2,4,8,16,24)``) and has no flag parser (an argparse block is commented out,
``OpticalFlowCalculation.py:24-31``).  This harness exposes the same sweep
structure as flags, replaces the thread progression with mesh shapes, and
adds what the reference lacks (SURVEY.md §5.3-5.5): a resumable sweep
manifest, NaN/divergence detection per frame, and structured JSONL timing
alongside the reference-compatible ``UniversalTiming.txt``.

Usage:
    python -m papteam_opticalflow_tpu.harness.testsuite \
        --root /root/reference --progression Final --images-per-collection 3 \
        --pyramid-levels 2 4 8 15 --output output/
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from ..data.discovery import FramePairGenerator
from ..data.native_loader import PrefetchingPairLoader
from ..utils.params import DEFAULT_PARAMS, FlowParams
from ..utils.timing import JsonlTimingLog, UniversalTimingWriter
from ..utils.viz import save_flow_image

# Reference progression names (TestSuite.py:14-26).
COLLECTION_LEVELS = {
    "Light": "HoChiMinhTraffic_10FPS_320",
    "Medium": "HoChiMinhTraffic_10FPS_800",
    "Heavy": "HoChiMinhTraffic_10FPS_1920",
}
FINAL_LEVELS = (
    "HoChiMinhTraffic_10FPS_240",
    "HoChiMinhTraffic_10FPS_480",
    "HoChiMinhTraffic_10FPS_960",
    "HoChiMinhTraffic_10FPS_1920",
)
PROGRESSIONS = {
    "Light": (COLLECTION_LEVELS["Light"],),
    "Default": (COLLECTION_LEVELS["Medium"],),
    "Heavy": (COLLECTION_LEVELS["Heavy"],),
    "Full": tuple(COLLECTION_LEVELS.values()),
    "Final": FINAL_LEVELS,
}


import functools


@functools.lru_cache(maxsize=None)
def _stats_jit(vmapped: bool = False):
    """Jitted divergence-stats function, built ONCE per variant — a fresh
    ``jax.jit`` wrapper per pair would pay a cache miss + retrace on every
    call, exactly the host overhead the pipeline hides (ADVICE r3)."""
    import jax

    fn = jax.vmap(_pair_stats) if vmapped else _pair_stats
    return jax.jit(fn)


def _pair_stats(u, v):
    """Device-side divergence stats for one pair: ``[finite, max_flow]``
    as float32.  Fetching this (2,) vector is the sweep's completion
    barrier — the full (H, W) flow fields stay on device unless an image
    artifact actually needs them (the tunneled host link costs ~25 ms/MB,
    so fetching u+v at 1920px is ~0.4 s/pair of pure transfer that the
    reference's in-process C++ never pays)."""
    import jax.numpy as jnp

    finite = jnp.isfinite(u).all() & jnp.isfinite(v).all()
    max_flow = jnp.maximum(jnp.abs(u).max(), jnp.abs(v).max())
    return jnp.stack(
        [finite.astype(jnp.float32), max_flow.astype(jnp.float32)]
    )


@functools.lru_cache(maxsize=None)
def _flow_u8_jit(levels: int, params: FlowParams):
    """Jitted flow whose inputs are DEVICE-resident uint8 frames,
    normalized on device: the tunneled host link costs ~25 ms/MB, so a
    1920px pair's f32 planes (48 MB) take ~1.2 s of pure transfer — 6x
    the compute.  uint8 cuts the bytes 4x.  The 255 divisor is passed as
    a TRACED operand: a constant ``/ 255.0`` gets strength-reduced by
    XLA to a reciprocal multiply (1 ulp off true division), while the
    traced divide reproduces the host loaders' IEEE f32 rounding
    bit-exactly (tests/test_harness.py pins this)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.coarse2fine import coarse2fine_flow_chw

    def f(a, b, scale):
        return coarse2fine_flow_chw(
            a.astype(jnp.float32) / scale,
            b.astype(jnp.float32) / scale,
            levels, params,
        )

    jitted = jax.jit(f)
    scale = np.float32(255.0)
    return lambda a, b: jitted(a, b, scale)


@functools.lru_cache(maxsize=None)
def _flow_u8_batch_jit(levels: int, params: FlowParams):
    """Batched analogue of ``_flow_u8_jit``: uint8 frame stacks normalized
    on device, then ``lax.map`` over pairs in one dispatch — the batch
    path's link traffic drops 4x vs f32 stacking (e.g. 240px b=16: 3.1 MB
    instead of 12.4 MB per dispatch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..parallel.batch import mapped_coarse2fine_flow

    def f(a, b, scale):
        return mapped_coarse2fine_flow(
            a.astype(jnp.float32) / scale,
            b.astype(jnp.float32) / scale,
            levels, params,
        )

    jitted = jax.jit(f)
    scale = np.float32(255.0)
    return lambda a, b: jitted(a, b, scale)


def _frame_to_device_u8(arr, key, cache: dict):
    """Host frame -> device uint8, cached by frame key so the shared frame
    of consecutive video pairs transfers ONCE (pair k's ``after`` is pair
    k+1's ``before`` — halves link traffic again).

    The serving path feeds raw uint8 straight from the JPEG decoder
    (``PrefetchingPairLoader(dtype=np.uint8)``): the r4 f32 path spent
    ~47 ms/frame of host numpy on ``rint(x*255)`` — measured r5, the whole
    steady-state gap between the sweep (190 ms) and the pipelined engine
    (~145 ms).  f32 input still converts here (exact inverse of ``u8/255``)
    for callers without a u8 loader.  ``jnp.asarray`` of the u8 buffer is
    an async put (~13 ms return, tools/overlap_probe.py) whose wire time
    rides under the in-flight previous pair; the loader ring keeps the
    host buffer alive for depth-1 iterations, far longer than the
    transfer."""
    import jax.numpy as jnp

    dev = cache.get(key)
    if dev is None:
        if arr.dtype != np.uint8:
            arr = np.rint(arr * 255.0).astype(np.uint8)
        dev = jnp.asarray(arr)
        cache[key] = dev
        while len(cache) > 4:
            cache.pop(next(iter(cache)))
    return dev


def _flow_chw_dispatch(im1_chw, im2_chw, levels: int, params: FlowParams,
                       u8_device: bool = False):
    """Enqueue one pair WITHOUT waiting for it (JAX dispatch is async):
    returns an opaque pending handle for ``_flow_chw_resolve``.  Used by
    the pipelined sweep to keep the next pair's program queued while the
    previous one executes, hiding the per-dispatch host latency.
    ``u8_device``: inputs are device-resident uint8 frames
    (``_flow_u8_jit`` normalizes on device)."""
    import jax.numpy as jnp

    start = time.perf_counter()
    if u8_device:
        u, v, _w = _flow_u8_jit(levels, params)(im1_chw, im2_chw)
    else:
        from ..models.coarse2fine import coarse2fine_flow_chw

        u, v, _w = coarse2fine_flow_chw(
            jnp.asarray(im1_chw), jnp.asarray(im2_chw), levels, params
        )
    return start, u, v, _stats_jit()(u, v)


def _flow_chw_resolve(pending, t_prev: float | None = None):
    """Barrier on a pending pair: one small stats fetch (axon ignores
    block_until_ready).  Returns (timing, u, v, finite, max_flow).

    ``t_prev``: the previous pair's resolve timestamp, passed by the
    pipelined sweep.  In pipeline mode pair k is dispatched while pair
    k-1 still executes, so dispatch-to-resolve spans ~two executions;
    the inter-resolve interval is the true steady-state per-pair time
    (ADVICE r3).  Clamped below by ``start`` so a long host stall
    between resolves never inflates the row."""
    start, u, v, stats_dev = pending
    stats = np.asarray(stats_dev)
    now = time.perf_counter()
    t0 = start if t_prev is None else max(start, t_prev)
    elapsed = now - t0
    timing = {
        "Total Device Execution": str(elapsed),
        "Total C++ Execution": str(elapsed),
    }
    return timing, u, v, bool(stats[0]), float(stats[1])


def _flow_chw(im1_chw, im2_chw, levels: int, params: FlowParams):
    """One pair through the jitted pipeline; returns
    (timing, u, v, finite, max_flow) — ``u``/``v`` are DEVICE arrays."""
    return _flow_chw_resolve(
        _flow_chw_dispatch(im1_chw, im2_chw, levels, params)
    )


def _flow_chw_batch(im1s_chw, im2s_chw, levels: int, params: FlowParams):
    """A batch of pairs in ONE device dispatch (``lax.map`` on-chip);
    returns (per-pair timing dicts, u stack, v stack, finites, max_flows).
    uint8 frame stacks (the u8 loader path) normalize on device."""
    import jax
    import jax.numpy as jnp

    from ..parallel.batch import mapped_coarse2fine_flow

    stats_fn = _stats_jit(vmapped=True)
    start = time.perf_counter()
    if im1s_chw[0].dtype == np.uint8:
        u, v, _w = _flow_u8_batch_jit(levels, params)(
            jnp.asarray(np.stack(im1s_chw)),
            jnp.asarray(np.stack(im2s_chw)),
        )
    else:
        u, v, _w = mapped_coarse2fine_flow(
            jnp.asarray(np.stack(im1s_chw)),
            jnp.asarray(np.stack(im2s_chw)),
            levels,
            params,
        )
    stats = np.asarray(stats_fn(u, v))  # (n, 2) barrier fetch
    per = (time.perf_counter() - start) / len(im1s_chw)
    timing = {
        "Total Device Execution": str(per),
        "Total C++ Execution": str(per),
    }
    return (
        [dict(timing) for _ in im1s_chw], u, v,
        [bool(s) for s in stats[:, 0]], [float(s) for s in stats[:, 1]],
    )


def _flow_chw_mesh(im1s_chw, im2s_chw, levels: int, params: FlowParams, mesh):
    """A batch of pairs over a device mesh: the batch shards over the
    ``frame`` axis and each pair row-tiles over ``ty``/``tx``
    (``parallel/batch.batched_coarse2fine_flow``).  Short batches are
    padded by repeating the last pair (results dropped) so the batch
    divides the frame axis."""
    import jax.numpy as jnp

    from ..parallel.batch import batched_coarse2fine_flow
    from ..parallel.distributed import pad_batch_for_mesh

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_frame = axes.get("frame", 1)
    n = len(im1s_chw)
    pad = pad_batch_for_mesh(n, n_frame)
    x1 = np.stack(list(im1s_chw) + [im1s_chw[-1]] * pad)
    x2 = np.stack(list(im2s_chw) + [im2s_chw[-1]] * pad)
    stats_fn = _stats_jit(vmapped=True)
    start = time.perf_counter()
    u, v, _w = batched_coarse2fine_flow(
        jnp.asarray(x1), jnp.asarray(x2), levels, params, mesh
    )
    stats = np.asarray(stats_fn(u, v))[:n]  # barrier + drop pad results
    per = (time.perf_counter() - start) / n
    u, v = u[:n], v[:n]
    timing = {
        "Total Device Execution": str(per),
        "Total C++ Execution": str(per),
    }
    return (
        [dict(timing) for _ in range(n)], u, v,
        [bool(s) for s in stats[:, 0]], [float(s) for s in stats[:, 1]],
    )


def build_mesh_from_args(args):
    """The ``numCores`` knob of the reference (``TestSuite.py:93``) mapped
    onto a device mesh: ``--mesh-frame/--mesh-ty/--mesh-tx`` pick the
    data-parallel and spatial-tiling axis sizes.  Returns None when the
    sweep is single-device."""
    mf = getattr(args, "mesh_frame", 1) or 1
    mt = getattr(args, "mesh_ty", 1) or 1
    mx = getattr(args, "mesh_tx", 1) or 1
    if mf * mt * mx <= 1:
        return None
    import jax

    from ..parallel.mesh import make_mesh

    need = mf * mt * mx
    devices = jax.devices()
    if len(devices) < need:
        raise SystemExit(
            f"mesh {mf}x{mt}x{mx} needs {need} devices, "
            f"have {len(devices)}"
        )
    return make_mesh(mf, mt, devices=devices[:need], n_tx=mx)


def run_sweep(args) -> dict:
    gen = FramePairGenerator(args.root)
    if args.collections:
        collections = args.collections
    else:
        collections = [
            c for c in PROGRESSIONS[args.progression] if c in gen.collections
        ]
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    timing_tsv = UniversalTimingWriter(out_dir / "UniversalTiming.txt")
    timing_jsonl = JsonlTimingLog(out_dir / "timing.jsonl")
    # Append-only manifest: one JSON-encoded key per line, so recording a
    # completed pair is O(1) instead of rewriting the whole sorted set
    # (the reference's full sweep is ~1,600 work items).
    manifest_path = out_dir / "sweep_manifest.jsonl"
    legacy_manifest = out_dir / "sweep_manifest.json"
    done = set()
    if args.resume:
        if manifest_path.exists():
            done.update(
                json.loads(line)
                for line in manifest_path.read_text().splitlines()
                if line.strip()
            )
        if legacy_manifest.exists():  # pre-r3 whole-set format
            done.update(json.loads(legacy_manifest.read_text())["completed"])

    params = DEFAULT_PARAMS
    mesh = build_mesh_from_args(args)
    if mesh is not None:
        # Timing rows must report the devices actually driven, not the
        # host's device count (the mesh may use a subset).
        n_devices = mesh.devices.size
    else:
        n_devices = 1

    stats = {"completed": 0, "skipped": 0, "failed": 0}
    t_begin = time.perf_counter()
    for _rep in range(args.repetitions):
        for collection in collections:
            pairs = gen.pairs_from_collection(collection)
            if args.images_per_collection >= 1:
                pairs = pairs[: args.images_per_collection]
            for levels in args.pyramid_levels:
              # Batch progression = the TPU analogue of the reference's
              # threadProgression sweep (``TestSuite.py:93``): the
              # parallelism knob is pairs-per-dispatch, not thread count.
              for batch in (getattr(args, "batch_progression", None) or [1]):
                img_dir = (
                    out_dir / f"{collection}{args.suffix}" / f"images_P{levels}"
                )
                btag = f"|b{batch}" if batch > 1 else ""

                def key_of(p):
                    return (
                        f"{collection}|P{levels}|{p.before.path.name}"
                        f"|rep{_rep}{btag}"
                    )

                todo = [p for p in pairs if key_of(p) not in done]
                stats["skipped"] += len(pairs) - len(todo)
                gif_frames = []
                # Single-chip sweeps (single-pair AND batched) decode
                # straight to uint8 (device-side normalize, 4x less link
                # traffic); the mesh path keeps f32 host stacking.
                # Ring depth: yielded arrays are VIEWS valid for depth-1
                # further iterations, and the batch/mesh group loop holds
                # up to ``batch`` views before stacking — size the ring so
                # a full group is always live.
                loader = PrefetchingPairLoader(
                    n_threads=args.loader_threads,
                    depth=max(4, batch + 1),
                    dtype=np.uint8 if mesh is None else np.float32,
                )
                frames = loader.iter_pairs(
                    [(p.before.path, p.after.path) for p in todo]
                )

                def record_pair(pair, timing, u, v, finite, max_flow):
                    key = key_of(pair)
                    # Failure detection the reference lacks (SURVEY.md §5.3):
                    # flag NaN/divergence per frame instead of writing
                    # garbage.  Stats arrive device-computed (_pair_stats);
                    # u/v are fetched to host ONLY if an image artifact
                    # needs them below.
                    if not finite:
                        max_flow = float("nan")
                    if not finite or max_flow > args.divergence_threshold:
                        stats["failed"] += 1
                        timing_jsonl.append(
                            dict(
                                key=key, status="diverged", finite=finite,
                                max_flow=max_flow,
                            )
                        )
                        return
                    if not args.no_images or getattr(args, "gif", False):
                        import jax.numpy as jnp

                        # Viz-only fetch: cast to f16 on device first —
                        # halves the ~25 ms/MB tunneled transfer; f16's
                        # ~1e-3 relative error is invisible in the uint8
                        # HSV rendering (flow values are recorded in the
                        # timing logs from the device-side stats, never
                        # from this cast).
                        u = np.asarray(jnp.asarray(u, jnp.float16),
                                       dtype=np.float32)
                        v = np.asarray(jnp.asarray(v, jnp.float16),
                                       dtype=np.float32)
                    if not args.no_images:
                        img_dir.mkdir(parents=True, exist_ok=True)
                        save_flow_image(
                            img_dir / f"frame{pair.before.index_string}.jpg", u, v
                        )
                    if getattr(args, "gif", False):
                        from ..utils.viz import flow_to_hsv_image

                        gif_frames.append(flow_to_hsv_image(u, v))
                    timing_tsv.append(
                        timing, collection, n_devices * batch, levels
                    )
                    timing_jsonl.append(
                        dict(
                            key=key, status="ok", collection=collection,
                            levels=levels, devices=n_devices, batch=batch,
                            seconds=float(timing["Total Device Execution"]),
                            # batch/mesh groups report wall/batch (pairs
                            # share one dispatch; no device-side per-pair
                            # timer exists on this platform)
                            timing_mode=(
                                "pipelined" if (
                                    batch == 1 and mesh is None
                                    and getattr(args, "pipeline", False)
                                ) else "per_pair"
                                if batch == 1 and mesh is None
                                else "wall_over_batch"
                            ),
                            max_flow=max_flow,
                        )
                    )
                    done.add(key)
                    stats["completed"] += 1
                    with manifest_path.open("a") as mf:
                        mf.write(json.dumps(key) + "\n")

                idx = 0
                pending = None  # pipelined mode: (pair, dispatch handle)
                last_resolve = None  # previous resolve timestamp (pipeline)
                frame_cache = {}  # path -> device uint8 frame (video reuse)
                while idx < len(todo):
                    group, ims = [], []
                    while idx < len(todo) and len(group) < batch:
                        pair = todo[idx]
                        idx += 1
                        try:
                            im1, im2 = next(frames)
                        except StopIteration:
                            idx = len(todo)
                            break
                        except IOError as e:
                            # Corrupt/unreadable frame: record and keep
                            # sweeping (the loader pipeline stays usable).
                            stats["failed"] += 1
                            timing_jsonl.append(
                                dict(key=key_of(pair), status="load_error",
                                     error=str(e))
                            )
                            continue
                        group.append(pair)
                        ims.append((im1, im2))
                    if not group:
                        continue
                    print(
                        f"[{'; '.join(p.as_storage_string() for p in group)}]"
                        f" P[{levels}]" + (f" B[{batch}]" if batch > 1 else ""),
                        flush=True,
                    )
                    if mesh is not None:
                        timings, us, vs, fin, mf = _flow_chw_mesh(
                            [a for a, _ in ims], [b for _, b in ims],
                            levels, params, mesh,
                        )
                        for pair, timing, u, v, f, m in zip(
                            group, timings, us, vs, fin, mf
                        ):
                            record_pair(pair, timing, u, v, f, m)
                    elif len(group) == 1:
                        # Single-pair paths ship uint8 frames and reuse
                        # the consecutive-video shared frame on device:
                        # at 1920px this turns a ~1.2 s/pair f32 transfer
                        # into ~0.15 s overlapped (the link is the sweep
                        # bottleneck, not the engine).
                        dev_a = _frame_to_device_u8(
                            ims[0][0], str(group[0].before.path), frame_cache
                        )
                        dev_b = _frame_to_device_u8(
                            ims[0][1], str(group[0].after.path), frame_cache
                        )
                        if getattr(args, "pipeline", False):
                            # Depth-1 software pipeline: enqueue this
                            # pair, then resolve the previous one — the
                            # device never idles between pairs, so sweep
                            # throughput loses the per-dispatch host
                            # latency (~25 ms/pair on this platform).
                            disp = _flow_chw_dispatch(
                                dev_a, dev_b, levels, params, u8_device=True
                            )
                            if pending is not None:
                                p_pair, p_disp = pending
                                res = _flow_chw_resolve(p_disp, last_resolve)
                                last_resolve = time.perf_counter()
                                record_pair(p_pair, *res)
                            pending = (group[0], disp)
                        else:
                            timing, u, v, f, m = _flow_chw_resolve(
                                _flow_chw_dispatch(
                                    dev_a, dev_b, levels, params,
                                    u8_device=True,
                                )
                            )
                            record_pair(group[0], timing, u, v, f, m)
                    else:
                        timings, us, vs, fin, mf = _flow_chw_batch(
                            [a for a, _ in ims], [b for _, b in ims],
                            levels, params,
                        )
                        for pair, timing, u, v, f, m in zip(
                            group, timings, us, vs, fin, mf
                        ):
                            record_pair(pair, timing, u, v, f, m)
                if pending is not None:  # drain the pipeline tail
                    p_pair, p_disp = pending
                    record_pair(p_pair, *_flow_chw_resolve(p_disp, last_resolve))
                    pending = None
                loader.close()
                if gif_frames:
                    # The reference's per-collection demo artifact
                    # (images_Video/*/normal_out.gif equivalent).
                    from PIL import Image

                    gif_dir = out_dir / f"{collection}{args.suffix}"
                    gif_dir.mkdir(parents=True, exist_ok=True)
                    ims = [Image.fromarray(f) for f in gif_frames]
                    ims[0].save(
                        str(gif_dir / f"flow_P{levels}{btag.replace('|', '_')}.gif"),
                        save_all=True,
                        append_images=ims[1:],
                        duration=100,
                        loop=0,
                    )
    stats["wall_seconds"] = time.perf_counter() - t_begin
    print(f"Program Execution time: {stats['wall_seconds']:.2f}")
    return stats


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--root", default="/root/reference",
                   help="dataset root containing images_New/ etc.")
    p.add_argument("--progression", choices=sorted(PROGRESSIONS), default="Final")
    p.add_argument("--collections", nargs="*", default=None,
                   help="explicit collection names (overrides --progression)")
    p.add_argument("--images-per-collection", type=int, default=3,
                   help="-1 for all pairs")
    p.add_argument("--pyramid-levels", type=int, nargs="+", default=[2, 4, 8, 15])
    p.add_argument("--repetitions", type=int, default=1)
    p.add_argument("--batch-progression", type=int, nargs="+", default=[1],
                   help="pairs per device dispatch to sweep — the TPU "
                        "analogue of the reference's threadProgression "
                        "(TestSuite.py:93)")
    p.add_argument("--mesh-frame", type=int, default=1,
                   help="frame (data-parallel) mesh axis size; the sweep "
                        "routes through batched_coarse2fine_flow when any "
                        "mesh axis > 1")
    p.add_argument("--mesh-ty", type=int, default=1,
                   help="row-tiling mesh axis size (spatial sharding of "
                        "each pair's solve)")
    p.add_argument("--mesh-tx", type=int, default=1,
                   help="second spatial axis; composes with ty into finer "
                        "row bands (parallel/mesh.py)")
    p.add_argument("--suffix", default="_tpu")
    p.add_argument("--output", default="output")
    p.add_argument("--pipeline", action="store_true",
                   help="depth-1 software pipeline for single-pair sweeps: "
                        "enqueue pair k+1 before waiting on pair k, hiding "
                        "the per-dispatch host latency.  Timing rows report "
                        "the inter-resolve interval (steady-state per-pair "
                        "throughput), NOT dispatch-to-completion latency; "
                        "timing_mode tags them 'pipelined'")
    p.add_argument("--resume", action="store_true",
                   help="skip work items recorded in sweep_manifest.jsonl (or the legacy sweep_manifest.json)")
    p.add_argument("--no-images", action="store_true")
    p.add_argument("--gif", action="store_true",
                   help="assemble each collection's flow sequence into an "
                        "animated GIF (the reference's normal_out.gif "
                        "deliverable)")
    p.add_argument("--divergence-threshold", type=float, default=1e4)
    p.add_argument("--loader-threads", type=int, default=2,
                   help="native JPEG-decode worker threads")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    run_sweep(args)


if __name__ == "__main__":
    main()
