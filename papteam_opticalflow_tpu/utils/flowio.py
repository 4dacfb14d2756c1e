"""Binary flow-field serialization.

Byte-compatible with the reference's latent checkpoint support
(``OpticalFlow::SaveOpticalFlow`` / ``LoadOpticalFlow``,
``Code/Parallel/src/OpticalFlow.cpp:1055-1107``): the flow is quantized with
the fixed-point encoding ``uint16((clamp(val, -200, 200) + 200) * 160)`` of
an interleaved ``(H, W, 2)`` field and dumped through
``Image<unsigned short>::saveImage`` (``Image.h:824-836``), whose layout is

    char type[16]   — typeid(T).name() (GCC: "t" for unsigned short)
    int32 width, int32 height, int32 nchannels
    uint8 IsDerivativeImage
    payload         — h*w*c little-endian uint16
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

# GCC's typeid(unsigned short).name(); the reference accepts "uint16" too
# (Image.h:856-858).
_GCC_USHORT_TYPEID = b"t"


def encode_flow_fixed(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """``OpticalFlow.cpp:1085-1095`` quantization."""
    flow = np.stack([u, v], axis=-1)
    q = (np.clip(flow, -200.0, 200.0) + 200.0) * 160.0
    return q.astype(np.uint16)


def decode_flow_fixed(q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """``OpticalFlow.cpp:1063-1075`` dequantization."""
    flow = q.astype(np.float64) / 160.0 - 200.0
    return flow[..., 0], flow[..., 1]


def save_flow(path, u: np.ndarray, v: np.ndarray) -> None:
    """Write a reference-compatible fixed-point binary flow file."""
    q = encode_flow_fixed(u, v)
    h, w = q.shape[:2]
    with open(path, "wb") as f:
        f.write(_GCC_USHORT_TYPEID.ljust(16, b"\x00"))
        f.write(struct.pack("<iii?", w, h, 2, False))
        f.write(np.ascontiguousarray(q.astype("<u2")).tobytes())


def load_flow(path) -> Tuple[np.ndarray, np.ndarray]:
    """Read a reference-format flow file back to float (u, v)."""
    with open(path, "rb") as f:
        type_name = f.read(16).rstrip(b"\x00").lower()
        if type_name not in (b"t", b"uint16", b"unsigned short"):
            raise ValueError(f"not a ushort flow file: type={type_name!r}")
        w, h, c, _deriv = struct.unpack("<iii?", f.read(13))
        if c != 2:
            raise ValueError(f"expected 2 flow channels, got {c}")
        q = np.frombuffer(f.read(h * w * c * 2), dtype="<u2").reshape(h, w, c)
    return decode_flow_fixed(q)
