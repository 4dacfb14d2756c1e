"""Input discovery: image collections and consecutive frame pairs.

Re-implements the reference's ``InputCreation`` package
(``Code/Parallel/InputCreation/TestImagePairGenerator.py:51-171``,
``TestImage.py:70-154``, ``TestImagePair.py``, ``ImageCollection.py``):
walk source directories, group frames into collections, and pair frame N
with frame N+1 — keeping a pair only when the successor file exists.

Successor pairing follows the reference exactly: the digit substring of
each filename is incremented width-preservingly (``TestImage.py:118-154``
``incrementWithFormat``: leading zeros kept, overflow chops high digits,
``'9' -> '0'``) to *guess* the successor file, and a pair is kept only when
that guessed file exists on disk (``TestImagePairGenerator.py:151-171``).
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


def digits_in(string: str) -> str:
    """All digits of ``string`` concatenated; ``'0'`` when none
    (``TestImage.py:digitsIn``)."""
    digits = re.sub(r"\D", "", string)
    return digits if digits else "0"


def increment_with_format(string: str) -> str:
    """Width-preserving increment of a digit string
    (``TestImage.py:incrementWithFormat``): ``'009' -> '010'``,
    ``'9' -> '0'`` (overflow chops the spilled leading digits)."""
    out = str(int(digits_in(string)) + 1)
    lead = len(string) - len(out)
    if lead >= 0:
        return "0" * lead + out
    return out[-lead:]


@dataclasses.dataclass(frozen=True)
class FrameImage:
    """A single frame on disk (reference ``TestImage``)."""

    path: Path

    @property
    def collection(self) -> str:
        return self.path.parent.name

    @property
    def index_string(self) -> str:
        """Concatenated digits of the stem (``TestImage.IMAGE_INDEX_STRING``
        = ``digitsIn(IMAGE_NAME)``)."""
        return digits_in(self.path.stem)

    @property
    def index(self) -> Optional[int]:
        m = _FRAME_RE.match(self.path.stem)
        return int(m.group("index")) if m else None

    def after(self) -> "FrameImage":
        """The successor frame this file *should* precede, by the
        reference's digit-string increment (``TestImage.py:70-81``):
        replace the index substring of the filename with its
        width-preserving increment.  The result may or may not exist on
        disk — callers check (``TestImagePairGenerator.py:166``)."""
        idx = self.index_string
        next_name = self.path.name.replace(idx, increment_with_format(idx))
        return FrameImage(self.path.parent / next_name)


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
        """Consecutive pairs via the reference's successor guess: frame N's
        filename digit-string is incremented and the pair is kept only if
        that guessed file exists (TestImagePairGenerator.py:151-171,
        TestImage.after).

        Two sanity guards the reference lacks (its guess can misfire on
        layouts outside its own ``frame_#####.jpg`` datasets): a pair is
        dropped when the guess degenerates to the same file (stems whose
        digits are non-contiguous make the replace a no-op — the reference
        would pair a frame with itself), or when both stems parse to
        trailing indices that are not consecutive (width-overflow rollover
        like ``frame_9 -> frame_0``).  Neither guard changes behavior on
        the reference's zero-padded collections."""
        out = []
        for f in self.frames():
            nxt = f.after()
            if not nxt.path.is_file() or nxt.path == f.path:
                continue
            fi, ni = f.index, FrameImage(nxt.path).index
            if fi is not None and ni is not None and ni != fi + 1:
                continue
            out.append(FramePair(f, nxt))
        if not out and self.frames():
            import warnings

            warnings.warn(
                f"collection {self.name!r} contains frames but produced no "
                "pairs: reference-parity successor guessing requires stems "
                "whose digits form one contiguous run that increments by 1 "
                "between consecutive frames (e.g. frame_00057.jpg -> "
                "frame_00058.jpg)",
                stacklevel=2,
            )
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
