"""Golden-value tests: JAX ops vs independent NumPy scalar oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

import np_ref
from papteam_opticalflow_tpu.ops import bicubic, features, filters, interp, laplacian, noise, robust
from papteam_opticalflow_tpu.utils.params import ColorType

RNG = np.random.default_rng(42)


def rand_img(h=13, w=17, c=3):
    return RNG.random((h, w, c))


def chw(x):
    return jnp.moveaxis(jnp.asarray(x), -1, 0)


def hwc(x):
    return np.moveaxis(np.asarray(x), 0, -1)


class TestFilters:
    def test_hfilter_clamp(self):
        img = rand_img()
        taps = np.array([1.0, -8.0, 0.0, 8.0, -1.0]) / 12.0
        want = np_ref.hfilter(img, taps)
        got = hwc(filters.correlate1d(chw(img), taps, axis=-1))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_vfilter_clamp(self):
        img = rand_img()
        taps = np.array([0.02, 0.11, 0.74, 0.11, 0.02])
        want = np_ref.vfilter(img, taps)
        got = hwc(filters.correlate1d(chw(img), taps, axis=-2))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_separable_hv(self):
        img = rand_img(9, 11, 1)
        taps = filters.gaussian_taps(0.8, 2)
        want = np_ref.vfilter(np_ref.hfilter(img, taps), taps)
        got = hwc(filters.correlate_hv(chw(img), taps, taps))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_dx_dy_forward(self):
        img = rand_img(8, 9, 1)[..., 0]
        np.testing.assert_allclose(
            np.asarray(filters.dx_forward(jnp.asarray(img))), np_ref.dx_forward(img)
        )
        np.testing.assert_allclose(
            np.asarray(filters.dy_forward(jnp.asarray(img))), np_ref.dy_forward(img)
        )

    def test_gaussian_taps_normalized(self):
        taps = filters.gaussian_taps(1.3333, 4)
        assert taps.sum() == pytest.approx(1.0)
        assert len(taps) == 9
        # fsize=0 degenerates to identity.
        assert filters.gaussian_taps(0.5, 0).tolist() == [1.0]


class TestInterp:
    def test_resize_ratio_down(self):
        img = rand_img(12, 16)
        want = np_ref.resize_ratio(img, 0.75)
        got = hwc(interp.resize_by_ratio(chw(img), 0.75))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_resize_dims_up(self):
        # Upsampling hits the negative-coordinate truncation path
        # (x = (j+1)/r - 1 < 0 at j = 0).
        img = rand_img(6, 8)
        want = np_ref.resize_dims(img, 11, 9)
        got = hwc(interp.resize_to(chw(img), 9, 11))
        np.testing.assert_allclose(got, want, atol=1e-12)

    @pytest.mark.parametrize("dims", [(9, 11, 13, 17), (26, 35, 20, 26)])
    def test_resize_matmul_backend_matches_gather(self, dims, monkeypatch):
        # The MXU lowering of the resize (two static interpolation
        # matmuls) must agree with the exact gather path; it is separable
        # bilinear with identical clamp/truncation semantics, differing
        # only in float summation order.
        dh, dw, sh, sw = dims
        img = rand_img(sh, sw)
        want = hwc(interp.resize_to(chw(img), dh, dw))
        monkeypatch.setattr(interp, "_RESIZE_BACKEND", "matmul")
        got = hwc(interp.resize_to(chw(img), dh, dw))
        np.testing.assert_allclose(got, want, atol=1e-12)
        r = 0.75
        want_r = np_ref.resize_ratio(img, r)
        got_r = hwc(interp.resize_by_ratio(chw(img), r))
        np.testing.assert_allclose(got_r, want_r, atol=1e-12)

    def test_warp_bilinear_oob_copies_im1(self):
        im1, im2 = rand_img(7, 9), rand_img(7, 9)
        vx = RNG.normal(size=(7, 9)) * 3
        vy = RNG.normal(size=(7, 9)) * 3
        want = np_ref.warp_image(im1, im2, vx, vy)
        got = hwc(interp.warp_bilinear(chw(im1), chw(im2), jnp.asarray(vx), jnp.asarray(vy)))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_warp_variants_match_reference(self):
        # The ImageProcessing.h:549-653 warp family: no-fill, transpose
        # (scatter adjoint), masked, and their interleaved-flow forms.
        im1, im2 = rand_img(7, 9), rand_img(7, 9)
        vx = RNG.normal(size=(7, 9)) * 3
        vy = RNG.normal(size=(7, 9)) * 3
        jvx, jvy = jnp.asarray(vx), jnp.asarray(vy)
        flow = jnp.stack([jvx, jvy], axis=-1)

        want = np_ref.warp_image_nofill(im2, vx, vy)
        got = hwc(interp.warp_bilinear_nofill(chw(im2), jvx, jvy))
        np.testing.assert_allclose(got, want, atol=1e-12)
        np.testing.assert_allclose(
            hwc(interp.warp_bilinear_nofill_flow(chw(im2), flow)), want,
            atol=1e-12,
        )

        want_t = np_ref.warp_image_transpose(im2, vx, vy)
        got_t = hwc(interp.warp_bilinear_transpose(chw(im2), jvx, jvy))
        np.testing.assert_allclose(got_t, want_t, atol=1e-12)
        np.testing.assert_allclose(
            hwc(interp.warp_bilinear_transpose_flow(chw(im2), flow)), want_t,
            atol=1e-12,
        )

        want_w, want_m = np_ref.warp_image_masked(im1, im2, vx, vy)
        got_w, got_m = interp.warp_bilinear_masked(chw(im1), chw(im2), jvx, jvy)
        np.testing.assert_allclose(hwc(got_w), want_w, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(got_m), want_m)

    def test_warp_packed_matches_unpacked(self):
        # The two gather schemes behind warp_bilinear (packed patch vs four
        # corner gathers — chosen by should_pack_warp for TPU perf) must be
        # numerically identical.
        im1, im2 = rand_img(7, 9), rand_img(7, 9)
        vx = RNG.normal(size=(7, 9)) * 3
        vy = RNG.normal(size=(7, 9)) * 3
        jvx, jvy = jnp.asarray(vx), jnp.asarray(vy)
        pack = interp.pack_patch2x2(chw(im2))
        a = interp.warp_bilinear(chw(im1), chw(im2), jvx, jvy, im2_pack=pack)
        b = interp.warp_bilinear(chw(im1), chw(im2), jvx, jvy)
        assert interp.should_pack_warp(chw(im2)) is False  # 3ch f64 = 96 B
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bilinear_truncation_negative_coords(self):
        # (int)(-0.25) == 0 in C, not floor(-0.25) == -1.
        img = rand_img(4, 4, 1)
        want = np_ref.bilinear_interpolate(img, -0.25, -0.75)
        got = interp.bilinear_gather(
            chw(img), jnp.asarray([[-0.25]]), jnp.asarray([[-0.75]])
        )
        np.testing.assert_allclose(np.asarray(got)[:, 0, 0], want, atol=1e-14)


class TestLaplacian:
    def test_compat_matches_fused_loops(self):
        f = RNG.random((9, 12))
        w = RNG.random((9, 12)) + 0.1
        want = np_ref.weighted_laplacian_compat(f, w)
        got = np.asarray(
            laplacian.weighted_laplacian(jnp.asarray(f), jnp.asarray(w), compat=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_compat_borders_differ_from_full(self):
        f = RNG.random((6, 7))
        w = np.ones((6, 7))
        compat = np.asarray(
            laplacian.weighted_laplacian(jnp.asarray(f), jnp.asarray(w), compat=True)
        )
        full = np.asarray(
            laplacian.weighted_laplacian(jnp.asarray(f), jnp.asarray(w), compat=False)
        )
        # Interior identical; last row/col differ by the dropped flux terms.
        np.testing.assert_allclose(compat[:-1, :-1], full[:-1, :-1], atol=1e-12)
        assert not np.allclose(compat[:, -1], full[:, -1])
        assert not np.allclose(compat[-1, :], full[-1, :])


class TestBicubic:
    def test_warp_bicubic(self):
        im1, im2 = rand_img(7, 8), rand_img(7, 8)
        vx = RNG.normal(size=(7, 8)) * 2
        vy = RNG.normal(size=(7, 8)) * 2
        want = np_ref.bicubic_warp_ref(im1, im2, vx, vy)
        got = hwc(
            bicubic.warp_bicubic_ref(chw(im1), chw(im2), jnp.asarray(vx), jnp.asarray(vy))
        )
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_threshold(self):
        x = jnp.asarray([[-0.5, 0.5, 1.5]])
        np.testing.assert_allclose(np.asarray(bicubic.threshold01(x)), [[0, 0.5, 1]])


class TestFeatures:
    def test_desaturate(self):
        img = rand_img()
        np.testing.assert_allclose(
            np.asarray(features.desaturate(chw(img))), np_ref.desaturate(img), atol=1e-12
        )

    def test_im2feature_rgb(self):
        img = rand_img(10, 11, 3)
        feat = np.asarray(features.im2feature(chw(img), ColorType.RGB))
        assert feat.shape == (5, 10, 11)
        gray = np_ref.desaturate(img)
        taps = np.array([1.0, -8.0, 0.0, 8.0, -1.0]) / 12.0
        np.testing.assert_allclose(feat[0], gray, atol=1e-12)
        np.testing.assert_allclose(
            feat[1], np_ref.hfilter(gray[..., None], taps)[..., 0], atol=1e-12
        )
        np.testing.assert_allclose(feat[3], img[..., 1] - img[..., 0], atol=1e-12)
        np.testing.assert_allclose(feat[4], img[..., 1] - img[..., 2], atol=1e-12)

    def test_im2feature_gray(self):
        img = rand_img(10, 11, 1)
        feat = np.asarray(features.im2feature(chw(img)))
        assert feat.shape == (3, 10, 11)
        np.testing.assert_allclose(feat[0], img[..., 0])

    def test_get_dxs(self):
        im1, im2 = rand_img(9, 10, 2), rand_img(9, 10, 2)
        g = np.array([0.02, 0.11, 0.74, 0.11, 0.02])
        d = np.array([1.0, -8.0, 0.0, 8.0, -1.0]) / 12.0
        s1 = np_ref.vfilter(np_ref.hfilter(im1, g), g)
        s2 = np_ref.vfilter(np_ref.hfilter(im2, g), g)
        blend = 0.4 * s1 + 0.6 * s2
        imdx, imdy, imdt = features.get_dxs(chw(im1), chw(im2))
        np.testing.assert_allclose(hwc(imdx), np_ref.hfilter(blend, d), atol=1e-12)
        np.testing.assert_allclose(hwc(imdy), np_ref.vfilter(blend, d), atol=1e-12)
        np.testing.assert_allclose(hwc(imdt), s2 - s1, atol=1e-12)


class TestRobustNoise:
    def test_phi(self):
        a = [RNG.random((5, 6)) for _ in range(4)]
        got = np.asarray(robust.phi_weight(*map(jnp.asarray, a), 1e-6))
        mag = sum(x * x for x in a)
        np.testing.assert_allclose(got, 0.5 / np.sqrt(mag + 1e-6), atol=1e-12)

    def test_psi_and_assembly(self):
        c, h, w = 3, 5, 6
        imdx, imdy, imdt = (RNG.normal(size=(c, h, w)) for _ in range(3))
        du, dv = RNG.normal(size=(h, w)), RNG.normal(size=(h, w))
        psi = np.asarray(
            robust.psi_weight(*map(jnp.asarray, (imdx, imdy, imdt, du, dv)), 1e-6)
        )
        temp = imdt + imdx * du + imdy * dv
        np.testing.assert_allclose(psi, 1 / (2 * np.sqrt(temp**2 + 1e-6)), atol=1e-12)
        out = robust.assemble_system(
            jnp.asarray(psi), jnp.asarray(imdx), jnp.asarray(imdy), jnp.asarray(imdt)
        )
        np.testing.assert_allclose(
            np.asarray(out[0]), (psi * imdx * imdy).mean(axis=0), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(out[3]), (psi * imdx * imdt).mean(axis=0), atol=1e-12
        )

    def test_est_laplacian_noise(self):
        im1 = rand_img(6, 7, 2)
        im2 = im1.copy()
        im2[..., 0] += 0.5  # channel 0: uniform diff; channel 1: all zero diff
        got = np.asarray(noise.est_laplacian_noise(chw(im1), chw(im2)))
        assert got[0] == pytest.approx(0.5)
        assert got[1] == pytest.approx(0.001)  # all-invalid fallback


class TestPyramidShapes:
    @pytest.mark.parametrize("hw", [(135, 240), (270, 480), (1080, 1920), (41, 67)])
    @pytest.mark.parametrize("levels", [2, 4, 8, 15])
    def test_shapes_match_reference_arithmetic(self, hw, levels):
        from papteam_opticalflow_tpu.models.pyramid import pyramid_shapes

        assert pyramid_shapes(hw[0], hw[1], 0.75, levels) == np_ref.pyramid_shapes(
            hw[0], hw[1], 0.75, levels
        )

    def test_ratio_clamp(self):
        from papteam_opticalflow_tpu.models.pyramid import clamp_ratio

        assert clamp_ratio(0.99) == 0.75
        assert clamp_ratio(0.3) == 0.75
        assert clamp_ratio(0.5) == 0.5


class TestTiledWarpGather:
    """The displacement-adaptive tile-windowed warp gather (r3: ~3x
    faster warp on TPU, tools/exp_banded_warp.py) must be bit-identical
    to the plain packed gather for every displacement regime."""

    H, W = 256, 1024  # min admissible table for the tiled policy

    def _pair(self, seed=0):
        rng = np.random.default_rng(seed)
        im1 = jnp.asarray(rng.random((self.H, self.W)))
        im2 = jnp.asarray(rng.random((self.H, self.W)))
        return im1, im2

    def _flow(self, amp, seed=1):
        rng = np.random.default_rng(seed)
        vx = jnp.asarray(amp * (2 * rng.random((self.H, self.W)) - 1))
        vy = jnp.asarray(amp * (2 * rng.random((self.H, self.W)) - 1))
        return vx, vy

    def _check(self, amp, monkeypatch):
        im1, im2 = self._pair()
        vx, vy = self._flow(amp)
        want = np.asarray(interp.warp_bilinear(im1, im2, vx, vy))
        monkeypatch.setattr(interp, "_TILED_WARP", "on")
        assert interp._use_tiled_warp((4, self.H, self.W), 8)
        got = np.asarray(interp.warp_bilinear(im1, im2, vx, vy))
        np.testing.assert_array_equal(got, want)

    def test_small_displacement_tight_tiles(self, monkeypatch):
        self._check(10.0, monkeypatch)  # bucket 0 (tight margin)

    def test_medium_displacement_wide_tiles(self, monkeypatch):
        self._check(40.0, monkeypatch)  # bucket 1 (wide margin)

    def test_large_displacement_full_fallback(self, monkeypatch):
        # beyond the wide margin: must fall back to the full-table
        # gather, including far-OOB pixels that copy im1
        self._check(300.0, monkeypatch)  # bucket 2

    def test_mixed_oob_rows_stay_exact(self, monkeypatch):
        # Strong uniform shift: a band of rows is OOB (copies im1) while
        # in-bounds displacement stays within the tight margin only if
        # the OOB pixels' clamped indices are correctly ignored by the
        # displacement bound.
        im1, im2 = self._pair()
        vx = jnp.full((self.H, self.W), 3.0)
        vy = jnp.full((self.H, self.W), -11.0)  # top rows OOB
        want = np.asarray(interp.warp_bilinear(im1, im2, vx, vy))
        monkeypatch.setattr(interp, "_TILED_WARP", "on")
        got = np.asarray(interp.warp_bilinear(im1, im2, vx, vy))
        np.testing.assert_array_equal(got, want)

    def test_vmap_unrolls_adaptive_gather(self, monkeypatch):
        # Single-channel f64 keeps the packed slice width on the packing
        # path (4*1*8 = 32 B <= 48), so the batched warp exercises the
        # custom_vmap rule of the adaptive gather.
        rng = np.random.default_rng(3)
        im1 = jnp.asarray(rng.random((2, self.H, self.W)))
        im2 = jnp.asarray(rng.random((2, self.H, self.W)))
        vx, vy = self._flow(8.0)
        vxs = jnp.stack([vx, vx * 0.5])
        vys = jnp.stack([vy, -vy])
        import jax

        f = jax.vmap(interp.warp_bilinear)
        want = np.asarray(f(im1, im2, vxs, vys))
        monkeypatch.setattr(interp, "_TILED_WARP", "on")
        got = np.asarray(f(im1, im2, vxs, vys))
        np.testing.assert_array_equal(got, want)

    def test_policy_rejects_small_tables(self):
        assert not interp._use_tiled_warp((4, 64, 96), 8)

    def test_bicubic_adaptive_gather_exact(self, monkeypatch):
        # The final bicubic warp's corner-chunked stencil gather also
        # routes through the adaptive tiled scheme on big tables.
        im1, im2 = self._pair()
        for amp in (10.0, 40.0, 300.0):  # all three buckets
            vx, vy = self._flow(amp, seed=int(amp))
            monkeypatch.setattr(interp, "_TILED_WARP", "off")
            want = np.asarray(bicubic.warp_bicubic_ref(im1, im2, vx, vy))
            monkeypatch.setattr(interp, "_TILED_WARP", "on")
            got = np.asarray(bicubic.warp_bicubic_ref(im1, im2, vx, vy))
            np.testing.assert_array_equal(got, want)

    def test_wide_slice_chunked_tiled_warp(self, monkeypatch):
        # 5-channel f64: packed slice is 160 B — too wide for the
        # full-table pack path (should_pack_warp False), but the tiled
        # scheme gathers it in 4 narrow chunks (interp._tiled_chunks).
        rng = np.random.default_rng(5)
        im1 = jnp.asarray(rng.random((5, self.H, self.W)))
        im2 = jnp.asarray(rng.random((5, self.H, self.W)))
        assert not interp.should_pack_warp(im2)
        assert interp._tiled_chunks(20, 8) == 4
        for amp in (10.0, 300.0):
            vx, vy = self._flow(amp, seed=int(amp) + 7)
            monkeypatch.setattr(interp, "_TILED_WARP", "off")
            want = np.asarray(interp.warp_bilinear(im1, im2, vx, vy))
            monkeypatch.setattr(interp, "_TILED_WARP", "on")
            assert interp.should_prebuild_pack(im2)
            got = np.asarray(interp.warp_bilinear(im1, im2, vx, vy))
            np.testing.assert_array_equal(got, want)

    def test_sharded_band_warp_exact(self, monkeypatch):
        # The sharded solver's per-band warp (parallel/tiled._warp_band)
        # routes through the row-anchored tiled gather; must stay
        # bit-identical to the full-table path, including the clamped
        # ghost tail of a bottom band.
        from papteam_opticalflow_tpu.parallel import tiled as T

        rng = np.random.default_rng(9)
        feat1 = jnp.asarray(rng.random((1, self.H, self.W)))
        feat2 = jnp.asarray(rng.random((1, self.H, self.W)))
        pack = interp.pack_patch2x2(feat2)
        for r0, amp in ((64, 10.0), (self.H - 72 + 4, 30.0), (0, 300.0)):
            hb = 72  # band rows incl. halo-4
            y4 = jnp.clip(r0 - 4 + jnp.arange(hb), 0, self.H - 1)
            u_b = jnp.asarray(amp * (2 * rng.random((hb, self.W)) - 1))
            v_b = jnp.asarray(amp * (2 * rng.random((hb, self.W)) - 1))
            f1_b = jnp.broadcast_to(feat1[:, :hb], (1, hb, self.W))
            monkeypatch.setattr(interp, "_TILED_WARP", "off")
            want = np.asarray(T._warp_band(
                f1_b, feat2, pack, u_b, v_b, y4, self.H, r0=r0 - 4))
            monkeypatch.setattr(interp, "_TILED_WARP", "on")
            got = np.asarray(T._warp_band(
                f1_b, feat2, pack, u_b, v_b, y4, self.H, r0=r0 - 4))
            np.testing.assert_array_equal(got, want)
