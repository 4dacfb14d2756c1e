"""Input discovery: image collections and consecutive frame pairs.

Re-implements the reference's ``InputCreation`` package
(``Code/Parallel/InputCreation/TestImagePairGenerator.py:51-171``,
``TestImage.py:70-154``, ``TestImagePair.py``, ``ImageCollection.py``):
walk source directories, group frames into collections, and pair frame N
with frame N+1 — keeping a pair only when the successor file exists.

Unlike the reference (which increments the digit substring of the filename
to *guess* the successor, ``TestImage.py:118-154``), successor matching here
sorts the actual directory listing and pairs adjacent frame indices, which
is equivalent on the reference's ``frame_#####.jpg`` layout and robust to
other zero-padded naming schemes.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence

# Default source subdirectories scanned by the reference
# (TestImagePairGenerator.py:56).
DEFAULT_SOURCE_DIRS = ("images", "images_MPI", "images_Video", "images_New")

_FRAME_RE = re.compile(r"^(?P<prefix>.*?)(?P<index>\d+)$")


@dataclasses.dataclass(frozen=True)
class FrameImage:
    """A single frame on disk (reference ``TestImage``)."""

    path: Path

    @property
    def collection(self) -> str:
        return self.path.parent.name

    @property
    def index_string(self) -> str:
        m = _FRAME_RE.match(self.path.stem)
        return m.group("index") if m else self.path.stem

    @property
    def index(self) -> Optional[int]:
        m = _FRAME_RE.match(self.path.stem)
        return int(m.group("index")) if m else None


@dataclasses.dataclass(frozen=True)
class FramePair:
    """A BEFORE/AFTER consecutive pair (reference ``TestImagePair``)."""

    before: FrameImage
    after: FrameImage

    def as_storage_string(self, sep: str = " -> ", long: bool = False) -> str:
        if long:
            return f"{self.before.path}{sep}{self.after.path}"
        return f"{self.before.path.name}{sep}{self.after.path.name}"


@dataclasses.dataclass(frozen=True)
class ImageCollection:
    """A directory of frames (reference ``ImageCollection``)."""

    path: Path

    @property
    def name(self) -> str:
        return self.path.name

    @property
    def source(self) -> str:
        return self.path.parent.name

    def frames(self, extensions: Sequence[str] = (".jpg", ".jpeg", ".png")) -> List[FrameImage]:
        files = sorted(
            p for p in self.path.iterdir()
            if p.suffix.lower() in extensions and _FRAME_RE.match(p.stem)
        )
        return [FrameImage(p) for p in files]

    def pairs(self) -> List[FramePair]:
        """Consecutive-index pairs; a pair exists only if frame N+1 is on
        disk (TestImagePairGenerator.py:151-171)."""
        frames = self.frames()
        by_index = {f.index: f for f in frames if f.index is not None}
        out = []
        for f in frames:
            if f.index is not None and (f.index + 1) in by_index:
                out.append(FramePair(f, by_index[f.index + 1]))
        return out


class FramePairGenerator:
    """Walks source dirs and exposes collections by name (reference
    ``TestImagePairGenerator``)."""

    def __init__(
        self,
        root: Path | str,
        source_dirs: Sequence[str] = DEFAULT_SOURCE_DIRS,
    ):
        self.root = Path(root)
        self.collections: Dict[str, ImageCollection] = {}
        for src in source_dirs:
            base = self.root / src
            if not base.is_dir():
                continue
            for d in sorted(base.iterdir()):
                if d.is_dir():
                    self.collections[d.name] = ImageCollection(d)

    def collection_names(self) -> List[str]:
        return sorted(self.collections)

    def pairs_from_collection(self, name: str) -> List[FramePair]:
        return self.collections[name].pairs()
