"""Helpers to run the compiled reference oracle (tools/ref_harness) and
exchange raw frames/flows with it."""

from __future__ import annotations

import os
import struct
import subprocess
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
HARNESS = REPO / "tools" / "ref_harness"
REF_IMAGES = Path("/root/reference/images_New")


def harness_bin(variant: str = "serial") -> Path:
    return HARNESS / "bin" / f"ref_{variant}"


def have_oracle(variant: str = "serial") -> bool:
    return harness_bin(variant).exists()


def run_reference(
    im1: np.ndarray,
    im2: np.ndarray,
    pyramid_levels: int,
    n_cores: int = 1,
    variant: str = "serial",
    workdir: Path | None = None,
):
    """Run the reference Coarse2FineFlow on an (H, W, C) float pair in [0,1].

    Returns (u, v, warpI2, timing_dict)."""
    im1 = np.ascontiguousarray(np.atleast_3d(im1), dtype=np.float64)
    im2 = np.ascontiguousarray(np.atleast_3d(im2), dtype=np.float64)
    assert im1.shape == im2.shape
    h, w, c = im1.shape
    workdir = Path(workdir or "/tmp/ref_oracle")
    workdir.mkdir(parents=True, exist_ok=True)
    inp = workdir / f"in_{os.getpid()}.bin"
    out = workdir / f"out_{os.getpid()}.bin"
    with open(inp, "wb") as f:
        f.write(struct.pack("<iii", h, w, c))
        f.write(im1.tobytes())
        f.write(im2.tobytes())
    res = subprocess.run(
        [str(harness_bin(variant)), str(inp), str(out), str(pyramid_levels), str(n_cores)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if res.returncode != 0:
        raise RuntimeError(f"oracle failed: {res.stderr}\n{res.stdout}")
    raw = np.fromfile(out, dtype=np.float64)
    np_ = h * w
    u = raw[:np_].reshape(h, w)
    v = raw[np_ : 2 * np_].reshape(h, w)
    warp = raw[2 * np_ :].reshape(h, w, c)
    timing = {}
    for line in res.stdout.splitlines():
        parts = line.split("\t")
        if parts[0] == "TIMING" and len(parts) == 3:
            timing[parts[1]] = parts[2]
        elif parts[0] == "WALL":
            timing["wall"] = parts[1]
    inp.unlink(missing_ok=True)
    out.unlink(missing_ok=True)
    return u, v, warp, timing


def load_frame_pair(collection: str = "HoChiMinhTraffic_10FPS_240", index: int = 1):
    """Load a consecutive JPG frame pair from the reference dataset,
    normalized to [0, 1] float64 (as OpticalFlowCalculation.py:66-71 does)."""
    from PIL import Image

    d = REF_IMAGES / collection
    frames = sorted(p for p in d.iterdir() if p.suffix == ".jpg")
    a = np.asarray(Image.open(frames[index])).astype(np.float64) / 255.0
    b = np.asarray(Image.open(frames[index + 1])).astype(np.float64) / 255.0
    return a, b


def epe(u1, v1, u2, v2) -> float:
    """Mean endpoint error between two flow fields."""
    return float(np.mean(np.hypot(u1 - u2, v1 - v2)))
