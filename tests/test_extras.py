"""Tests for the auxiliary ops/utilities that round out the reference's
component inventory: second derivatives, unweighted Laplacian, dense 2-D
filtering + adjoints, patch sampling, bilateral filtering, CStochastic
equivalents, and typed binary image serialization.

Goldens are direct NumPy ports of the reference loops (cited per test)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from papteam_opticalflow_tpu.ops import filters, interp
from papteam_opticalflow_tpu.ops.bilateral import bilateral_filter
from papteam_opticalflow_tpu.utils import imageio, stochastic

from np_ref import bilinear_interpolate, clamp


def rand(shape, seed=0):
    return np.random.default_rng(seed).random(shape)


class TestSecondDerivatives:
    def _dxx_np(self, img):
        # Image.h:1066-1108 (1-channel branch), row-wise.
        h, w = img.shape
        out = np.empty_like(img)
        for i in range(h):
            for j in range(w):
                if j == 0:
                    out[i, j] = img[i, 0] - img[i, 1]
                elif j == w - 1:
                    out[i, j] = img[i, j] - img[i, j - 1]
                else:
                    out[i, j] = 2 * img[i, j] - img[i, j - 1] - img[i, j + 1]
        return out

    def test_dxx(self):
        img = rand((9, 12))
        np.testing.assert_allclose(
            np.asarray(filters.dxx(jnp.asarray(img))), self._dxx_np(img), atol=1e-12
        )

    def test_dyy(self):
        img = rand((9, 12))
        np.testing.assert_allclose(
            np.asarray(filters.dyy(jnp.asarray(img))),
            self._dxx_np(img.T).T,
            atol=1e-12,
        )

    def test_laplacian_4n_matches_reference_borders(self):
        # ImageProcessing.h:317-351: corners 2x - 2 nbrs, borders 3x - 3 nbrs,
        # interior 4x - 4 nbrs.
        img = rand((7, 8))
        got = np.asarray(filters.laplacian_4n(jnp.asarray(img)))
        h, w = img.shape
        want = np.empty_like(img)
        for i in range(h):
            for j in range(w):
                nbrs = []
                if j > 0:
                    nbrs.append(img[i, j - 1])
                if j < w - 1:
                    nbrs.append(img[i, j + 1])
                if i > 0:
                    nbrs.append(img[i - 1, j])
                if i < h - 1:
                    nbrs.append(img[i + 1, j])
                want[i, j] = len(nbrs) * img[i, j] - sum(nbrs)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_gradientmag(self):
        # Image.h:1175-1199: sqrt of channel-summed squared 5-tap derivs.
        img = rand((3, 9, 11))
        ix = np.asarray(filters.dx_5tap(jnp.asarray(img)))
        iy = np.asarray(filters.dy_5tap(jnp.asarray(img)))
        want = np.sqrt((ix * ix + iy * iy).sum(axis=0))
        np.testing.assert_allclose(
            np.asarray(filters.gradientmag(jnp.asarray(img))), want, rtol=1e-6
        )


class TestFilter2D:
    def _filter2d_np(self, img, ker):
        # ImageProcessing.h:414-442: dense kernel, clamp boundary.
        f = (ker.shape[0] - 1) // 2
        h, w = img.shape
        out = np.zeros_like(img)
        for i in range(h):
            for j in range(w):
                for di in range(-f, f + 1):
                    for dj in range(-f, f + 1):
                        out[i, j] += (
                            ker[di + f, dj + f]
                            * img[clamp(i + di, h), clamp(j + dj, w)]
                        )
        return out

    def test_filter2d(self):
        img = rand((8, 9))
        ker = rand((5, 5), seed=1) - 0.5
        np.testing.assert_allclose(
            np.asarray(filters.filter2d(jnp.asarray(img), ker)),
            self._filter2d_np(img, ker),
            atol=1e-12,
        )

    def test_adjoints_satisfy_dot_test(self):
        # <A x, y> == <x, A^T y> pins the transposes to their forwards
        # (hfiltering_transpose / filtering_transpose semantics).
        x = jnp.asarray(rand((8, 9)))
        y = jnp.asarray(rand((8, 9), seed=2))
        taps = (0.25, 0.5, 0.25)
        lhs = jnp.vdot(filters.correlate1d(x, taps, axis=-1), y)
        rhs = jnp.vdot(x, filters.correlate1d_adjoint(y, taps, axis=-1))
        assert abs(float(lhs - rhs)) < 1e-10
        ker = rand((3, 3), seed=3)
        lhs = jnp.vdot(filters.filter2d(x, ker), y)
        rhs = jnp.vdot(x, filters.filter2d_adjoint(y, ker))
        assert abs(float(lhs - rhs)) < 1e-10


class TestPatchScatterCropFlowWarp:
    def test_sample_patch_interior_and_oob(self):
        # ImageProcessing.h:474-489: OOB window taps stay zero.
        img = rand((10, 12))
        patch = np.asarray(interp.sample_patch(jnp.asarray(img), 5.3, 4.7, 2))
        for i in range(-2, 3):
            for j in range(-2, 3):
                want = bilinear_interpolate(img[..., None], 5.3 + j, 4.7 + i)[0]
                np.testing.assert_allclose(patch[i + 2, j + 2], want, atol=1e-12)
        edge = np.asarray(interp.sample_patch(jnp.asarray(img), 0.0, 0.0, 2))
        assert (edge[:2, :] == 0).all() and (edge[:, :2] == 0).all()
        assert edge[2, 2] == pytest.approx(img[0, 0])

    def test_bilinear_scatter_adjoint(self):
        img = jnp.asarray(rand((7, 9)))
        x = jnp.asarray(rand((4, 5), seed=1) * 8)
        y = jnp.asarray(rand((4, 5), seed=2) * 6)
        vals = jnp.asarray(rand((4, 5), seed=3))
        lhs = jnp.vdot(interp.bilinear_gather(img, x, y), vals)
        rhs = jnp.vdot(img, interp.bilinear_scatter(vals, x, y, 7, 9))
        assert abs(float(lhs - rhs)) < 1e-10

    def test_crop(self):
        img = rand((10, 12))
        got = np.asarray(interp.crop_image(jnp.asarray(img), 3, 2, 5, 4))
        np.testing.assert_array_equal(got, img[2:6, 3:8])

    def test_warp_flow_matches_warp(self):
        im1 = jnp.asarray(rand((2, 8, 9)))
        im2 = jnp.asarray(rand((2, 8, 9), seed=1))
        vx = jnp.asarray(rand((8, 9), seed=2) * 2 - 1)
        vy = jnp.asarray(rand((8, 9), seed=3) * 2 - 1)
        flow = jnp.stack([vx, vy], axis=-1)
        np.testing.assert_allclose(
            np.asarray(interp.warp_bilinear_flow(im1, im2, flow)),
            np.asarray(interp.warp_bilinear(im1, im2, vx, vy)),
            atol=1e-12,
        )


class TestBilateral:
    def _bilateral_np(self, img, guide, fsize, ss, sr):
        # Image.h:2239-2295 loop port (channels-first here).
        c, h, w = img.shape
        out = np.zeros_like(img)
        for i in range(h):
            for j in range(w):
                tot = 0.0
                acc = np.zeros(c)
                for di in range(-fsize, fsize + 1):
                    for dj in range(-fsize, fsize + 1):
                        y, x = i + di, j + dj
                        if x < 0 or x >= w or y < 0 or y >= h:
                            continue
                        d2 = ((guide[:, y, x] - guide[:, i, j]) ** 2).sum()
                        wgt = np.exp(-d2 / (2 * sr * sr)) * np.exp(
                            -(di * di + dj * dj) / (2 * ss * ss)
                        )
                        tot += wgt
                        acc += wgt * img[:, y, x]
                out[:, i, j] = acc / tot
        return out

    def test_self_guided(self):
        img = rand((2, 7, 8))
        got = np.asarray(bilateral_filter(jnp.asarray(img), 2, 1.5, 0.3))
        np.testing.assert_allclose(got, self._bilateral_np(img, img, 2, 1.5, 0.3), rtol=1e-6)

    def test_joint_guided(self):
        img = rand((1, 6, 7))
        guide = rand((2, 6, 7), seed=4)
        got = np.asarray(
            bilateral_filter(jnp.asarray(img), 1, 2.0, 0.5, guide=jnp.asarray(guide))
        )
        np.testing.assert_allclose(
            got, self._bilateral_np(img, guide, 1, 2.0, 0.5), rtol=1e-6
        )


class TestStochastic:
    def test_mean_var(self):
        x = rand((50,))
        m, v = stochastic.get_mean_var(jnp.asarray(x))
        assert float(m) == pytest.approx(x.mean())
        assert float(v) == pytest.approx(x.var(ddof=1))

    def test_entropy_floor(self):
        # Stochastic.cpp:103-111 floors p at 1e-6 inside the log.
        p = np.array([0.5, 0.5, 0.0])
        want = -(np.log(np.maximum(p, 1e-6)) * p).sum()
        assert float(stochastic.entropy(jnp.asarray(p))) == pytest.approx(want)

    def test_sampling_inverse_cdf(self):
        key = jax.random.PRNGKey(0)
        density = jnp.asarray([0.1, 0.0, 0.7, 0.2])
        idx = np.asarray(stochastic.sampling(key, density, (2000,)))
        assert (idx != 1).all()  # zero-mass bin never drawn
        frac2 = (idx == 2).mean()
        assert 0.6 < frac2 < 0.8

    def test_sort_with_index(self):
        x = jnp.asarray([3.0, 1.0, 2.0])
        vals, order = stochastic.sort_with_index(x)
        np.testing.assert_array_equal(np.asarray(vals), [3.0, 2.0, 1.0])
        np.testing.assert_array_equal(np.asarray(order), [0, 2, 1])

    def test_gaussian_windows_reference_quirks(self):
        # Stochastic.cpp:79-86: 1-D divides by 2*sigma (unsquared), not
        # normalized; default sigma = size/2.
        g = stochastic.generate_1d_gaussian(3)
        np.testing.assert_allclose(
            g, np.exp(-np.arange(-3, 4) ** 2 / (2 * 1.5))
        )
        g2 = stochastic.generate_2d_gaussian(2, 1.0)
        assert g2.sum() == pytest.approx(1.0)
        assert g2[2, 2] == g2.max()

    def test_kmeans_separates_blobs(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0.0, 0.1, (40, 2))
        b = rng.normal(5.0, 0.1, (40, 2))
        data = jnp.asarray(np.concatenate([a, b]))
        part, centers = stochastic.kmeans(jax.random.PRNGKey(1), data, 2)
        part = np.asarray(part)
        assert len(set(part[:40])) == 1 and len(set(part[40:])) == 1
        assert part[0] != part[40]
        got = sorted(float(c[0]) for c in np.asarray(centers))
        assert got[0] == pytest.approx(0.0, abs=0.2)
        assert got[1] == pytest.approx(5.0, abs=0.2)

    def test_visual_words(self):
        # Image.h:2297-2345: per-pixel nearest codebook row.
        img = jnp.asarray(rand((3, 5, 6)))
        dictionary = jnp.asarray(rand((4, 3), seed=5))
        idx = np.asarray(stochastic.visual_words(img, dictionary))
        pix = np.asarray(img).reshape(3, -1).T
        d = ((pix[:, None, :] - np.asarray(dictionary)[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(idx.ravel(), d.argmin(1))

    def test_find_closest_point(self):
        pts = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
        assert int(stochastic.find_closest_point(pts, jnp.asarray([1.9, 0.2]))) == 2


class TestImageIO:
    @pytest.mark.parametrize(
        "dtype", [np.uint8, np.uint16, np.int32, np.float32, np.float64]
    )
    def test_roundtrip(self, tmp_path, dtype):
        rng = np.random.default_rng(0)
        img = (rng.random((6, 7, 3)) * 100).astype(dtype)
        p = tmp_path / "img.bin"
        imageio.save_image(p, img, is_derivative=True)
        back, deriv = imageio.load_image(p)
        assert deriv is True
        np.testing.assert_array_equal(back, img)

    def test_layout_matches_flowio(self, tmp_path):
        # Same on-disk layout as the flow codec's Image<unsigned short> dump.
        from papteam_opticalflow_tpu.utils import flowio

        u = np.linspace(-3, 3, 12).reshape(3, 4)
        v = np.linspace(2, -2, 12).reshape(3, 4)
        p1 = tmp_path / "a.bin"
        p2 = tmp_path / "b.bin"
        flowio.save_flow(p1, u, v)
        imageio.save_image(p2, flowio.encode_flow_fixed(u, v))
        assert p1.read_bytes()[:29] == p2.read_bytes()[:29]
        img, _ = imageio.load_image(p1)
        u2, v2 = flowio.decode_flow_fixed(img)
        np.testing.assert_allclose(u2, u, atol=1 / 160)
