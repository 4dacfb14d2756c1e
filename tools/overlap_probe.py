"""Does host->device transfer overlap device compute on the axon tunnel?

VERDICT r4 task #2: sustained serving steady-state is ~190 ms/pair against
a 145-158 ms engine — the ~35-45 ms gap matches the uint8 frame transfer
(~3.1 MB/pair new data after shared-frame caching).  Whether that gap can
be closed in software depends on a platform fact this probe measures:

  A. does ``jnp.asarray`` / ``jax.device_put`` of a host u8 buffer RETURN
     before the transfer completes (async dispatch)?
  B. does an in-flight transfer PROCEED while a previously-dispatched
     kernel executes (stream overlap), or do transfer and compute
     serialize on the tunneled device?
  C. does issuing the transfer from a separate Python thread change B?

Method: a jitted compute chain calibrated to ~300 ms of device time; a
~6 MB uint8 buffer (one 1920px frame pair's worth).  Compare
  t(compute)               — barrier on compute alone
  t(transfer)              — device_put + tiny use, device idle
  t(dispatch; put; barrier)— transfer issued while compute in flight
If the third ~= max of the first two: overlap works (double-buffering in
the harness will hide the link).  If ~= sum: the tunnel serializes, and
the honest fix is recording the platform limit (CLAUDE.md) instead.

Run on the real chip: ``python tools/overlap_probe.py``.
"""

import json
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")

    @jax.jit
    def compute(x, n):
        def body(_, c):
            a, b = c
            a = a * np.float32(0.9999) + jnp.roll(b, 1, axis=0)
            b = b * np.float32(0.9999) + jnp.roll(a, 1, axis=1)
            return a, b

        a, b = jax.lax.fori_loop(0, n, body, (x, x * np.float32(0.5)))
        return jnp.sum(a) + jnp.sum(b)

    @jax.jit
    def touch(u8):
        return jnp.sum(u8.astype(jnp.float32))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1024, 1920), dtype=np.float32))
    host_u8 = rng.integers(0, 255, size=(2, 3, 1080, 1920), dtype=np.uint8)

    # Calibrate compute to ~300 ms.
    float(compute(x, jnp.int32(3)))
    n = 3
    while True:
        t0 = time.perf_counter()
        float(compute(x, jnp.int32(n)))
        dt = time.perf_counter() - t0
        if dt > 0.25 or n > 4096:
            break
        n *= 2
    log(f"compute trip {n}: {dt*1e3:.1f} ms")
    float(touch(jnp.asarray(host_u8)))  # compile touch

    def timed(fn, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # A. device_put return semantics + full transfer cost.
    def put_only():
        d = jax.device_put(host_u8)
        return d

    t_ret = timed(lambda: put_only())
    def put_barrier():
        d = jax.device_put(host_u8)
        float(touch(d))
    t_put = timed(put_barrier)
    log(f"A: device_put returns in {t_ret*1e3:.1f} ms; "
        f"transfer+use barrier {t_put*1e3:.1f} ms "
        f"({host_u8.nbytes/2**20:.1f} MB)")

    # B. transfer issued while compute is in flight (same thread).
    def compute_only():
        float(compute(x, jnp.int32(n)))
    t_comp = timed(compute_only)

    def overlapped():
        h = compute(x, jnp.int32(n))  # async dispatch
        d = jax.device_put(host_u8)
        s = touch(d)
        float(h)
        float(s)
    t_over = timed(overlapped)
    log(f"B: compute alone {t_comp*1e3:.1f} ms; compute+transfer "
        f"interleaved {t_over*1e3:.1f} ms; serial sum would be "
        f"{(t_comp+t_put)*1e3:.1f} ms")

    # C. transfer from a second thread while main thread barriers compute.
    def threaded():
        h = compute(x, jnp.int32(n))
        out = {}

        def xfer():
            d = jax.device_put(host_u8)
            out["s"] = touch(d)

        th = threading.Thread(target=xfer)
        th.start()
        float(h)
        th.join()
        float(out["s"])
    t_thr = timed(threaded)
    log(f"C: threaded transfer during compute barrier: {t_thr*1e3:.1f} ms")

    verdict = {
        "put_return_ms": round(t_ret * 1e3, 1),
        "put_barrier_ms": round(t_put * 1e3, 1),
        "compute_ms": round(t_comp * 1e3, 1),
        "interleaved_ms": round(t_over * 1e3, 1),
        "threaded_ms": round(t_thr * 1e3, 1),
        "mb": round(host_u8.nbytes / 2**20, 1),
        "overlap_fraction_interleaved": round(
            max(0.0, (t_comp + t_put - t_over) / t_put), 2),
        "overlap_fraction_threaded": round(
            max(0.0, (t_comp + t_put - t_thr) / t_put), 2),
    }
    print(json.dumps(verdict, indent=2))


if __name__ == "__main__":
    main()
