"""Timing output.

``UniversalTimingWriter`` reproduces the reference's append-only TSV schema
(``Code/Parallel/OpticalFlowCalculation.py:168-189``): a header row written
once per file, then one line per run keyed
``"<pixels> pixels <C> threads<P> pyramid"`` (``:135``).  ``JsonlTimingLog``
is the richer structured log (SURVEY.md §5.5's upgrade path).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Dict, Mapping


class UniversalTimingWriter:
    def __init__(self, path):
        self.path = Path(path)

    def line_starter(self, collection: str, n_cores: int, n_levels: int) -> str:
        pixels = collection.split("_")[-1]
        return f"{pixels} pixels {n_cores} threads{n_levels} pyramid\t"

    def append(
        self, timing: Mapping[str, str], collection: str, n_cores: int, n_levels: int
    ) -> None:
        write_header = not self.path.exists()
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a") as f:
            if write_header:
                f.write(str(self.path) + "\n")
                f.write("Image\t" + "\t".join(timing.keys()) + "\n")
            f.write(self.line_starter(collection, n_cores, n_levels))
            f.write("\t".join(str(v) for v in timing.values()) + "\n")


class JsonlTimingLog:
    def __init__(self, path):
        self.path = Path(path)

    def append(self, record: Dict) -> None:
        record = dict(record)
        record.setdefault("timestamp", time.time())
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
