"""Typed binary image serialization.

Byte-compatible with ``Image<T>::saveImage`` / ``loadImage``
(``Code/Parallel/src/Image.h:810-962``), the reference's latent checkpoint
format for arbitrary image buffers:

    char type[16]      — typeid(T).name(), NUL-padded (GCC mangled names)
    int32 width, int32 height, int32 nchannels   (little-endian)
    uint8 IsDerivativeImage
    payload            — h*w*c elements of T, row-major interleaved

The loader also accepts the plain aliases "uint16"/"uint32" that the
reference special-cases (``Image.h:856-858``).  Arrays here are channels-last
``(H, W, C)`` numpy, matching the reference's interleaved layout exactly;
use this for golden fixtures and cross-checking against C++-written files.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

# GCC typeid(T).name() single-letter mangles for the Image<T> instantiations
# the reference typedefs (Image.h:465-469).
_TYPEID_BY_DTYPE = {
    np.dtype(np.uint8): b"h",    # unsigned char  (BiImage/UCImage)
    np.dtype(np.uint16): b"t",   # unsigned short
    np.dtype(np.uint32): b"j",   # unsigned int
    np.dtype(np.int32): b"i",    # int            (IntImage)
    np.dtype(np.float32): b"f",  # float          (FImage)
    np.dtype(np.float64): b"d",  # double         (DImage)
}
_DTYPE_BY_TYPEID = {v: k for k, v in _TYPEID_BY_DTYPE.items()}
_DTYPE_BY_TYPEID[b"uint16"] = np.dtype(np.uint16)
_DTYPE_BY_TYPEID[b"uint32"] = np.dtype(np.uint32)
_DTYPE_BY_TYPEID[b"unsigned short"] = np.dtype(np.uint16)
_DTYPE_BY_TYPEID[b"unsigned int"] = np.dtype(np.uint32)


def save_image(path, img: np.ndarray, is_derivative: bool = False) -> None:
    """Write ``(H, W)`` or ``(H, W, C)`` ``img`` in the reference layout."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if img.ndim != 3:
        raise ValueError(f"expected (H, W[, C]) image, got shape {img.shape}")
    dtype = img.dtype.newbyteorder("=")
    type_id = _TYPEID_BY_DTYPE.get(np.dtype(dtype))
    if type_id is None:
        raise ValueError(f"unsupported dtype {img.dtype} (no Image<T> typedef)")
    h, w, c = img.shape
    with open(path, "wb") as f:
        f.write(type_id.ljust(16, b"\x00"))
        f.write(struct.pack("<iiiB", w, h, c, 1 if is_derivative else 0))
        f.write(np.ascontiguousarray(img, dtype=img.dtype.newbyteorder("<")).tobytes())


def load_image(path) -> Tuple[np.ndarray, bool]:
    """Read a reference-format image file.

    Returns ``(img (H, W, C), is_derivative)``.
    """
    with open(path, "rb") as f:
        type_name = f.read(16).rstrip(b"\x00").lower()
        dtype = _DTYPE_BY_TYPEID.get(type_name)
        if dtype is None:
            raise ValueError(f"unknown Image<T> type tag {type_name!r}")
        w, h, c, deriv = struct.unpack("<iiiB", f.read(13))
        n = h * w * c
        payload = f.read(n * dtype.itemsize)
        if len(payload) != n * dtype.itemsize:
            raise ValueError("truncated image payload")
        img = np.frombuffer(payload, dtype=dtype.newbyteorder("<")).reshape(h, w, c)
    return img.astype(dtype), bool(deriv)
