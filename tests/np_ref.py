"""Independent NumPy re-derivations of the reference semantics.

These are scalar-loop oracles written from the behavioral spec in SURVEY.md
(§2.2-2.5) — clamp boundaries, the truncating resize grid, fused-Laplacian
border truncation, lexicographic SOR — used as golden references for the
vectorized JAX ops.  Deliberately naive; only run on tiny shapes.
"""

from __future__ import annotations

import numpy as np


def clamp(i, n):
    return min(max(i, 0), n - 1)


def hfilter(img, taps):
    """img: (H, W, C); clamp-boundary horizontal correlation."""
    h, w, c = img.shape
    f = (len(taps) - 1) // 2
    out = np.zeros_like(img)
    for i in range(h):
        for j in range(w):
            for l in range(-f, f + 1):
                out[i, j] += img[i, clamp(j + l, w)] * taps[l + f]
    return out


def vfilter(img, taps):
    h, w, c = img.shape
    f = (len(taps) - 1) // 2
    out = np.zeros_like(img)
    for i in range(h):
        for j in range(w):
            for l in range(-f, f + 1):
                out[i, j] += img[clamp(i + l, h), j] * taps[l + f]
    return out


def bilinear_interpolate(img, x, y):
    """Reference BilinearInterpolate: truncate-toward-zero, clamp frac and
    corner indices."""
    h, w, c = img.shape
    xx, yy = int(x), int(y)
    dx = min(max(x - xx, 0.0), 1.0)
    dy = min(max(y - yy, 0.0), 1.0)
    res = np.zeros(c, dtype=img.dtype)
    for m in (0, 1):
        for n in (0, 1):
            u = clamp(xx + m, w)
            v = clamp(yy + n, h)
            s = abs(1 - m - dx) * abs(1 - n - dy)
            res += img[v, u] * s
    return res


def resize_ratio(img, ratio):
    h, w, c = img.shape
    dh, dw = int(h * ratio), int(w * ratio)
    out = np.zeros((dh, dw, c), dtype=img.dtype)
    for i in range(dh):
        for j in range(dw):
            x = (j + 1) / ratio - 1
            y = (i + 1) / ratio - 1
            out[i, j] = bilinear_interpolate(img, x, y)
    return out


def resize_dims(img, dw, dh):
    h, w, c = img.shape
    xr, yr = dw / w, dh / h
    out = np.zeros((dh, dw, c), dtype=img.dtype)
    for i in range(dh):
        for j in range(dw):
            out[i, j] = bilinear_interpolate(img, (j + 1) / xr - 1, (i + 1) / yr - 1)
    return out


def warp_image(im1, im2, vx, vy):
    h, w, c = im2.shape
    out = np.zeros_like(im2)
    for i in range(h):
        for j in range(w):
            x = j + vx[i, j]
            y = i + vy[i, j]
            if x < 0 or x > w - 1 or y < 0 or y > h - 1:
                out[i, j] = im1[i, j]
            else:
                out[i, j] = bilinear_interpolate(im2, x, y)
    return out


def warp_image_nofill(im2, vx, vy):
    """warpImage(pWarpIm2, pIm2, pVx, pVy, ...) (ImageProcessing.h:549-568):
    no Im1 fallback — out-of-bounds targets stay zero (memset)."""
    h, w, c = im2.shape
    out = np.zeros_like(im2)
    for i in range(h):
        for j in range(w):
            x = j + vx[i, j]
            y = i + vy[i, j]
            if x < 0 or x > w - 1 or y < 0 or y > h - 1:
                continue
            out[i, j] = bilinear_interpolate(im2, x, y)
    return out


def warp_image_masked(im1, im2, vx, vy):
    """warpImage(pWarpIm2, pMask, pIm1, pIm2, ...) (ImageProcessing.h:634-653):
    the hot-path warp plus an in-bounds mask (1 = interpolated, 0 = OOB,
    Im1-copied)."""
    h, w, c = im2.shape
    out = np.zeros_like(im2)
    mask = np.zeros((h, w), dtype=im2.dtype)
    for i in range(h):
        for j in range(w):
            x = j + vx[i, j]
            y = i + vy[i, j]
            if x < 0 or x > w - 1 or y < 0 or y > h - 1:
                out[i, j] = im1[i, j]
                mask[i, j] = 0
            else:
                out[i, j] = bilinear_interpolate(im2, x, y)
                mask[i, j] = 1
    return out, mask


def warp_image_transpose(im2, vx, vy):
    """warpImage_transpose (ImageProcessing.h:571-589): adjoint scatter —
    each in-bounds source pixel deposits its value onto the four clamped
    corners of its target coordinate with the bilinear weights
    (BilinearInterpolate_transpose, ImageProcessing.h:186-206); OOB pixels
    deposit nothing."""
    h, w, c = im2.shape
    out = np.zeros_like(im2)
    for i in range(h):
        for j in range(w):
            x = j + vx[i, j]
            y = i + vy[i, j]
            if x < 0 or x > w - 1 or y < 0 or y > h - 1:
                continue
            xx, yy = int(x), int(y)
            dx = min(max(x - xx, 0.0), 1.0)
            dy = min(max(y - yy, 0.0), 1.0)
            for m in (0, 1):
                for n in (0, 1):
                    u = clamp(xx + m, w)
                    v = clamp(yy + n, h)
                    s = abs(1 - m - dx) * abs(1 - n - dy)
                    out[v, u] += im2[i, j] * s
    return out


def dx_forward(img):
    out = np.zeros_like(img)
    out[:, :-1] = img[:, 1:] - img[:, :-1]
    return out


def dy_forward(img):
    out = np.zeros_like(img)
    out[:-1, :] = img[1:, :] - img[:-1, :]
    return out


def weighted_laplacian_compat(inp, wgt):
    """Fused-loop weighted Laplacian with the reference's truncated borders
    (OpticalFlow.cpp:725-778), serial order."""
    h, w = inp.shape
    out = np.zeros_like(inp)
    foo = np.zeros_like(inp)
    for i in range(h):
        for j in range(w - 1):
            foo[i, j] = (inp[i, j + 1] - inp[i, j]) * wgt[i, j]
            out[i, j] -= foo[i, j]
            if j > 0:
                out[i, j] += foo[i, j - 1]
    foo[:] = 0
    for i in range(h - 1):
        for j in range(w):
            foo[i, j] = (inp[i + 1, j] - inp[i, j]) * wgt[i, j]
            out[i, j] -= foo[i, j]
            if i > 0:
                out[i, j] += foo[i - 1, j]
    return out


def sor_lexicographic(phi, imdxy, imdx2, imdy2, rhsx, rhsy, alpha, n_iter, omega=1.8):
    """Serial Gauss-Seidel SOR exactly as OpticalFlow.cpp:469-520 (single
    thread)."""
    h, w = phi.shape
    du = np.zeros_like(phi)
    dv = np.zeros_like(phi)
    for _ in range(n_iter):
        for i in range(h):
            for j in range(w):
                s1 = s2 = coeff = 0.0
                if j > 0:
                    wt = phi[i, j - 1]
                    s1 += wt * du[i, j - 1]
                    s2 += wt * dv[i, j - 1]
                    coeff += wt
                if j < w - 1:
                    wt = phi[i, j]
                    s1 += wt * du[i, j + 1]
                    s2 += wt * dv[i, j + 1]
                    coeff += wt
                if i > 0:
                    wt = phi[i - 1, j]
                    s1 += wt * du[i - 1, j]
                    s2 += wt * dv[i - 1, j]
                    coeff += wt
                if i < h - 1:
                    wt = phi[i, j]
                    s1 += wt * du[i + 1, j]
                    s2 += wt * dv[i + 1, j]
                    coeff += wt
                s1 *= -alpha
                s2 *= -alpha
                coeff *= alpha
                s1 += imdxy[i, j] * dv[i, j]
                du[i, j] = (1 - omega) * du[i, j] + omega / (
                    imdx2[i, j] + alpha * 0.05 + coeff
                ) * (rhsx[i, j] - s1)
                s2 += imdxy[i, j] * du[i, j]
                dv[i, j] = (1 - omega) * dv[i, j] + omega / (
                    imdy2[i, j] + alpha * 0.05 + coeff
                ) * (rhsy[i, j] - s2)
    return du, dv


def bicubic_warp_ref(ref, im2, vx, vy):
    """Hermite bicubic warp (Image.h:2650-2768), scalar loops."""
    h, w, c = im2.shape
    df = np.array([-0.5, 0.0, 0.5])
    imdx = hfilter(im2, df)
    imdy = vfilter(im2, df)
    imdxdy = vfilter(imdx, df)
    out = np.zeros_like(im2)
    for i in range(h):
        for j in range(w):
            x = j + vx[i, j]
            y = i + vy[i, j]
            if x < 0 or x > w - 1 or y < 0 or y > h - 1:
                out[i, j] = ref[i, j]
                continue
            x0, y0 = clamp(int(x), w), clamp(int(y), h)
            x1, y1 = clamp(x0 + 1, w), clamp(y0 + 1, h)
            dx, dy = x - x0, y - y0
            for k in range(c):
                f = [[im2[y0, x0, k], im2[y1, x0, k]], [im2[y0, x1, k], im2[y1, x1, k]]]
                fx = [[imdx[y0, x0, k], imdx[y1, x0, k]], [imdx[y0, x1, k], imdx[y1, x1, k]]]
                fy = [[imdy[y0, x0, k], imdy[y1, x0, k]], [imdy[y0, x1, k], imdy[y1, x1, k]]]
                fxy = [
                    [imdxdy[y0, x0, k], imdxdy[y1, x0, k]],
                    [imdxdy[y0, x1, k], imdxdy[y1, x1, k]],
                ]
                m = np.array(
                    [[1, 0, 0, 0], [0, 0, 1, 0], [-3, 3, -2, -1], [2, -2, 1, 1]],
                    dtype=np.float64,
                )
                g = np.array(
                    [
                        [f[0][0], f[0][1], fy[0][0], fy[0][1]],
                        [f[1][0], f[1][1], fy[1][0], fy[1][1]],
                        [fx[0][0], fx[0][1], fxy[0][0], fxy[0][1]],
                        [fx[1][0], fx[1][1], fxy[1][0], fxy[1][1]],
                    ]
                )
                a = m @ g @ m.T
                px = np.array([1, dx, dx * dx, dx**3])
                py = np.array([1, dy, dy * dy, dy**3])
                out[i, j, k] = px @ a @ py
    return out


def desaturate(im):
    return im[..., 0] * 0.299 + im[..., 1] * 0.587 + im[..., 2] * 0.114


def pyramid_shapes(h0, w0, ratio, n_levels):
    """Level dims per GaussianPyramid.cpp:79-108 size arithmetic."""
    import math

    if ratio > 0.98 or ratio < 0.4:
        ratio = 0.75
    n = int(math.log(0.25) / math.log(ratio))
    shapes = [(h0, w0)]
    for i in range(1, n_levels):
        if i <= n:
            rate = ratio**i
            sh, sw = h0, w0
        else:
            sh, sw = shapes[i - n]
            rate = (ratio**i) * float(w0) / float(sw)
        shapes.append((int(sh * rate), int(sw * rate)))
    return shapes
