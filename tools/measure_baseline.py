"""Measure the reference's ground-truth timings on this machine.

The reference publishes no numbers (BASELINE.md); this produces them by
running the compiled oracle harness over the benchmark configurations of
``Code/Parallel/TestSuite.py:93`` (resolutions x pyramid heights; thread
progression capped at the machine's core count) and writes
``BASELINE_MEASURED.json`` plus recorded flow fields for EPE testing.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from oracle import load_frame_pair, run_reference  # noqa: E402

REPO = Path(__file__).resolve().parent.parent

COLLECTIONS = {
    240: "HoChiMinhTraffic_10FPS_240",
    480: "HoChiMinhTraffic_10FPS_480",
    960: "HoChiMinhTraffic_10FPS_960",
    1920: "HoChiMinhTraffic_10FPS_1920",
}
PYRAMIDS = (2, 4, 8, 15)


def main():
    n_cores = os.cpu_count() or 1
    out = {
        "machine": {"n_cores": n_cores},
        "serial": {},
        "parallel": {},
        "notes": (
            "Total C++ Execution seconds per frame pair (pair index 1 of each "
            "collection), reference Serial and Parallel (OpenMP) builds "
            "compiled -O3 -fopenmp on this machine."
        ),
    }
    flow_dir = REPO / "tests" / "fixtures"
    flow_dir.mkdir(parents=True, exist_ok=True)

    for px, coll in COLLECTIONS.items():
        im1, im2 = load_frame_pair(coll, 1)
        for levels in PYRAMIDS:
            key = f"{px}px_P{levels}"
            u, v, w, t = run_reference(im1, im2, levels, variant="serial")
            out["serial"][key] = float(t["Total C++ Execution"])
            print(f"serial  {key}: {t['Total C++ Execution']}s", flush=True)
            if levels in (4, 15):  # record oracle flows for EPE tests
                np.savez_compressed(
                    flow_dir / f"oracle_{px}_P{levels}.npz",
                    u=u.astype(np.float32), v=v.astype(np.float32),
                )
            _, _, _, tp = run_reference(
                im1, im2, levels, n_cores=n_cores, variant="parallel"
            )
            out["parallel"][key] = float(tp["Total C++ Execution"])
            print(f"parallel({n_cores}) {key}: {tp['Total C++ Execution']}s", flush=True)

    with open(REPO / "BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote BASELINE_MEASURED.json")


if __name__ == "__main__":
    main()
