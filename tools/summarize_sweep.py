"""Summarize a harness sweep's ``timing.jsonl`` into per-config stats and
a README-ready speedup table (VERDICT r4 task #4: the reference's Final
benchmark grid, every cell driver-verifiable from committed artifacts).

Usage:
    python tools/summarize_sweep.py output_dir [--json artifacts/x.json]

Reads ``<output_dir>/timing.jsonl`` (rows written by
``harness/testsuite.py``), groups by (collection, levels, batch), and for
each cell reports n/p50/p95/max seconds per pair, max/p50 ratio, the
largest observed flow, and the speedup of the p50 against the serial and
OpenMP-parallel reference builds measured on this machine
(``BASELINE_MEASURED.json`` — the reference publishes no numbers of its
own, BASELINE.md).
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WIDTH_OF_COLLECTION = {
    "HoChiMinhTraffic_10FPS_240": 240,
    "HoChiMinhTraffic_10FPS_320": 320,
    "HoChiMinhTraffic_10FPS_480": 480,
    "HoChiMinhTraffic_10FPS_800": 800,
    "HoChiMinhTraffic_10FPS_960": 960,
    "HoChiMinhTraffic_10FPS_1920": 1920,
}


def pct(xs, q):
    xs = sorted(xs)
    if not xs:
        return float("nan")
    i = min(len(xs) - 1, max(0, round(q * (len(xs) - 1))))
    return xs[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("--json", default=None, help="write summary JSON here")
    ap.add_argument("--markdown", action="store_true",
                    help="print a README-ready markdown table")
    args = ap.parse_args()

    rows = []
    for line in (Path(args.output_dir) / "timing.jsonl").read_text().splitlines():
        if line.strip():
            rows.append(json.loads(line))

    base_path = REPO / "BASELINE_MEASURED.json"
    base = json.loads(base_path.read_text()) if base_path.exists() else {}

    cells = {}
    statuses = {}
    for r in rows:
        if r.get("status") != "ok":
            k = (r.get("key", "?").split("|")[0], r.get("status"))
            statuses[k] = statuses.get(k, 0) + 1
            continue
        key = (r["collection"], r["levels"], r.get("batch", 1))
        cells.setdefault(key, []).append(r)

    summary = {}
    for (coll, levels, batch), rs in sorted(cells.items()):
        # The chronologically FIRST pair of a cell absorbs that config's
        # jit compile (tens to hundreds of seconds, amortized once per
        # config per process); steady-state stats exclude it, and it is
        # reported separately as first_pair_incl_compile.
        first = rs[0]["seconds"]
        steady = [r["seconds"] for r in rs[1:]] or [first]
        secs = steady
        width = WIDTH_OF_COLLECTION.get(coll)
        bkey = f"{width}px_P{levels}"
        serial = base.get("serial", {}).get(bkey)
        par = base.get("parallel", {}).get(bkey)
        p50 = pct(secs, 0.50)
        cell = {
            "n": len(rs),
            "p50_ms": round(p50 * 1e3, 1),
            "p95_ms": round(pct(secs, 0.95) * 1e3, 1),
            "max_ms": round(max(secs) * 1e3, 1),
            "mean_ms": round(sum(secs) / len(secs) * 1e3, 1),
            "max_over_p50": round(max(secs) / p50, 2),
            "first_pair_incl_compile_s": round(first, 1),
            "max_flow_px": round(max(r.get("max_flow", 0.0) for r in rs), 1),
            "timing_mode": rs[0].get("timing_mode"),
            "speedup_vs_serial": round(serial / p50, 1) if serial else None,
            "speedup_vs_parallel": round(par / p50, 1) if par else None,
        }
        tag = f"{coll}|P{levels}" + (f"|b{batch}" if batch != 1 else "")
        summary[tag] = cell

    out = {
        "source": str(Path(args.output_dir) / "timing.jsonl"),
        "baseline": "BASELINE_MEASURED.json serial/parallel (p50 basis)",
        "cells": summary,
        "non_ok": {f"{c}:{s}": n for (c, s), n in sorted(statuses.items())},
    }
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))
        print(f"wrote {args.json}", file=sys.stderr)

    if args.markdown:
        print("| config | pairs | p50 ms | p95 ms | max ms | max/p50 "
              "| vs serial C++ | vs OpenMP |")
        print("|---|---|---|---|---|---|---|---|")
        for tag, c in summary.items():
            coll = tag.split("|")[0]
            width = WIDTH_OF_COLLECTION.get(coll, "?")
            ptag = tag.split("|")[1]
            btag = tag.split("|")[2] if tag.count("|") > 1 else ""
            vs_s = f"{c['speedup_vs_serial']}x" if c["speedup_vs_serial"] else "-"
            vs_p = f"{c['speedup_vs_parallel']}x" if c["speedup_vs_parallel"] else "-"
            print(f"| {width}px {ptag}{(' ' + btag) if btag else ''} "
                  f"| {c['n']} | {c['p50_ms']} | {c['p95_ms']} "
                  f"| {c['max_ms']} | {c['max_over_p50']} | {vs_s} | {vs_p} |")
    else:
        print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
