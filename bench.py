"""Headline benchmark: frames/s of the full coarse-to-fine flow on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

``vs_baseline`` is the speedup over the reference Serial C++ build measured
on THIS machine (tools/measure_baseline.py -> BASELINE_MEASURED.json); the
reference repo publishes no numbers of its own (BASELINE.md).

Config via env:
  BENCH_CONFIG=960:8   (<width_px>:<pyramid_levels>), default 960:8
  BENCH_ITERS=5
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_pair(width_px: int):
    from papteam_opticalflow_tpu.data.discovery import FramePairGenerator
    from PIL import Image

    gen = FramePairGenerator("/root/reference")
    name = f"HoChiMinhTraffic_10FPS_{width_px}"
    if name in gen.collections:
        pair = gen.pairs_from_collection(name)[1]
        a = np.asarray(Image.open(pair.before.path)).astype(np.float32) / 255.0
        b = np.asarray(Image.open(pair.after.path)).astype(np.float32) / 255.0
        return a, b
    # Dataset not mounted: synthesize frames at the canonical size.
    h = {240: 135, 480: 270, 960: 540, 1920: 1080}.get(width_px, width_px * 9 // 16)
    rng = np.random.default_rng(0)
    a = rng.random((h, width_px, 3), dtype=np.float32)
    b = np.roll(a, 2, axis=1)
    return a, b


def bench_config(width_px: int, levels: int, iters: int):
    from papteam_opticalflow_tpu.models.coarse2fine import (
        coarse2fine_flow_chw,
        to_chw,
    )

    a, b = load_pair(width_px)
    x1 = to_chw(a, dtype=jnp.float32)
    x2 = to_chw(b, dtype=jnp.float32)
    log(f"bench: {width_px}px P{levels} on {jax.devices()[0]}")

    # NOTE: on the axon platform block_until_ready does not actually block;
    # fetching an output element is the only reliable completion barrier.
    def run_once():
        out = coarse2fine_flow_chw(x1, x2, levels)
        u = np.asarray(out[0])
        if not np.isfinite(u).all():
            raise RuntimeError("non-finite flow")
        return u

    t0 = time.perf_counter()
    run_once()
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = 1.0 / best
    log(f"per-pair: best {best * 1e3:.1f} ms, all {[f'{t*1e3:.1f}' for t in times]}")

    vs_baseline = None
    baseline_file = REPO / "BASELINE_MEASURED.json"
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())
        key = f"{width_px}px_P{levels}"
        ref_s = base.get("serial", {}).get(key)
        if ref_s:
            vs_baseline = ref_s / best
            log(f"reference serial: {ref_s:.2f}s/pair -> speedup {vs_baseline:.1f}x")

    return {
        "metric": f"frames_per_sec_{width_px}px_P{levels}",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }


class _Watchdog(Exception):
    pass


def main():
    import signal

    width_px, levels = (
        int(x) for x in os.environ.get("BENCH_CONFIG", "960:8").split(":")
    )
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    per_attempt_s = int(os.environ.get("BENCH_TIMEOUT", "900"))

    def on_alarm(sig, frame):
        raise _Watchdog(f"attempt exceeded {per_attempt_s}s")

    signal.signal(signal.SIGALRM, on_alarm)

    # The tunneled TPU worker occasionally crashes or hangs and needs ~1-3
    # min to restart; bound each attempt with an alarm, retry, then fall
    # back to a smaller config so the driver always records a number.
    attempts = [(width_px, levels), (width_px, levels), (480, 4)]
    last_err = None
    for w_px, lv in attempts:
        try:
            signal.alarm(per_attempt_s)
            result = bench_config(w_px, lv, iters)
            signal.alarm(0)
            print(json.dumps(result))
            return
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            last_err = e
            log(f"bench {w_px}:{lv} failed ({e}); retrying after cooldown")
            time.sleep(90)
    raise SystemExit(f"bench failed: {last_err}")


if __name__ == "__main__":
    main()
