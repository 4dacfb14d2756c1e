"""Flow visualization: the reference's HSV rendering
(``Code/Parallel/OpticalFlowCalculation.py:143-162``): hue = angle/2,
value = min-max-normalized magnitude, saturation = 255."""

from __future__ import annotations

import numpy as np


def flow_to_hsv_image(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Render flow as an RGB uint8 image (H, W, 3)."""
    import cv2

    hsv = np.zeros((*u.shape, 3), dtype=np.uint8)
    hsv[..., 0] = 255
    hsv[..., 1] = 255
    mag, ang = cv2.cartToPolar(np.asarray(u, np.float64), np.asarray(v, np.float64))
    hsv[..., 0] = ang * 180 / np.pi / 2
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
    bgr = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    return bgr[..., ::-1]


def save_flow_image(path, u: np.ndarray, v: np.ndarray) -> None:
    import cv2

    rgb = flow_to_hsv_image(u, v)
    cv2.imwrite(str(path), rgb[..., ::-1])


def save_flow_gif(path, flows, fps: float = 10.0) -> None:
    """Assemble a flow sequence into an animated GIF — the deliverable the
    reference ships for its video collections (``images_Video/*/
    normal_out.gif``, stripped from the checkout per .MISSING_LARGE_BLOBS).

    ``flows``: iterable of (u, v) arrays, one per consecutive frame pair.
    """
    from PIL import Image

    ims = [Image.fromarray(flow_to_hsv_image(u, v)) for u, v in flows]
    if not ims:
        raise ValueError("empty flow sequence")
    ims[0].save(
        str(path),
        save_all=True,
        append_images=ims[1:],
        duration=int(round(1000.0 / fps)),
        loop=0,
    )
