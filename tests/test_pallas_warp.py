"""CPU interpret-mode tests of the Pallas VPU warp kernel.

The kernel (``ops/pallas/warp.py``) replaces the serial-gather warp at
large pyramid levels on TPU; these tests run it through
``pl.pallas_call(interpret=True)`` and pin it to the XLA warp
(``ops/interp.warp_bilinear``, reference semantics
``ImageProcessing.h:495-520``):

* float32 — identical modulo FMA contraction (<= 2 ULP, same class of
  delta as the Pallas SOR kernels vs the XLA sweeps);
* bfloat16 — the kernel accumulates in f32 and rounds once, the XLA
  path multiplies bf16 weights; deltas bounded by ~1.5 bf16 ULP and the
  kernel is the MORE accurate vs a float64 ground truth (asserted).

Also covered: the displacement-adaptive wrapper's violent-flow fallback,
its vmap unroll rule, and end-to-end flow parity with the kernel forced
on at every admissible level.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import papteam_opticalflow_tpu.ops.pallas.warp as pwarp
from papteam_opticalflow_tpu.ops import interp

RNG = np.random.default_rng(11)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pwarp, "_INTERPRET", True)


def make_case(c, h, w, amp, dtype, seed=0):
    rng = np.random.default_rng(seed)
    im1 = jnp.asarray(rng.random((c, h, w)), dtype)
    im2 = jnp.asarray(rng.random((c, h, w)), dtype)
    vx = jnp.asarray(rng.uniform(-amp, amp, (h, w)), jnp.float32)
    vy = jnp.asarray(rng.uniform(-amp, amp, (h, w)), jnp.float32)
    return im1, im2, vx, vy


def xla_warp(im1, im2, vx, vy):
    prev = interp._PALLAS_WARP
    try:
        interp._PALLAS_WARP = "off"
        return interp.warp_bilinear(im1, im2, vx, vy)
    finally:
        interp._PALLAS_WARP = prev


class TestKernelVsXLA:
    @pytest.mark.parametrize(
        "c,h,w,amp",
        [
            (2, 128, 512, 4.5),    # interior + OOB borders
            (3, 160, 200, 21.5),   # displacement near the margin
            (1, 131, 130, 2.5),    # non-multiple H and W (padding paths)
            (5, 96, 384, 9.5),     # H < window would raise; 96 < wrc ->
        ],
    )
    def test_f32(self, c, h, w, amp):
        if h < pwarp._wrc(24, h):
            pytest.skip("below admission height (guard tested separately)")
        im1, im2, vx, vy = make_case(c, h, w, amp, jnp.float32)
        out = pwarp.warp_bilinear_pallas(im1, im2, vx, vy, margin=24)
        ref = xla_warp(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=3e-7
        )

    def test_bf16_accuracy(self):
        c, h, w, amp = 5, 128, 512, 4.5
        im1, im2, vx, vy = make_case(c, h, w, amp, jnp.bfloat16)
        out = pwarp.warp_bilinear_pallas(im1, im2, vx, vy, margin=24)
        ref = xla_warp(im1, im2, vx, vy)
        err = np.abs(
            np.asarray(out, np.float32) - np.asarray(ref, np.float32)
        )
        assert err.max() < 2e-2  # ~1.5 bf16 ULP at |v| <= 1

        # The kernel must be at least as accurate as the bf16 XLA path
        # against the f64 ground truth (it accumulates in f32).
        t64 = jnp.float64
        ref64 = xla_warp(
            im1.astype(t64), im2.astype(t64),
            vx.astype(t64), vy.astype(t64),
        )
        e_new = np.abs(np.asarray(out, np.float64) - np.asarray(ref64)).mean()
        e_old = np.abs(np.asarray(ref, np.float64) - np.asarray(ref64)).mean()
        assert e_new <= e_old * 1.05

    def test_height_guard(self):
        im1, im2, vx, vy = make_case(1, 48, 256, 2.0, jnp.float32)
        with pytest.raises(ValueError, match="height"):
            pwarp.warp_bilinear_pallas(im1, im2, vx, vy, margin=24)


class TestAdaptiveWrapper:
    def test_violent_flow_falls_back(self):
        # Displacements beyond the tight margin must route to the serial
        # 4-corner branch — same op sequence as the XLA warp; only FMA
        # contraction between the two separately compiled programs may
        # differ (<= 1 ULP).
        c, h, w = 2, 128, 384
        im1, im2, vx, vy = make_case(c, h, w, 60.0, jnp.float32)
        out = interp._warp_pallas_adaptive(im1, im2, vx, vy)
        ref = xla_warp(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=3e-7
        )

    def test_smooth_flow_uses_kernel(self):
        c, h, w = 2, 128, 384
        im1, im2, vx, vy = make_case(c, h, w, 4.0, jnp.float32)
        out = interp._warp_pallas_adaptive(im1, im2, vx, vy)
        ref = xla_warp(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=3e-7
        )

    def test_vmap_rule(self):
        c, h, w, b = 1, 128, 256, 2
        ims = [make_case(c, h, w, 3.0, jnp.float32, seed=i) for i in range(b)]
        im1 = jnp.stack([a for a, _, _, _ in ims])
        im2 = jnp.stack([a for _, a, _, _ in ims])
        vx = jnp.stack([a for _, _, a, _ in ims])
        vy = jnp.stack([a for _, _, _, a in ims])
        out = jax.vmap(interp._warp_pallas_adaptive)(im1, im2, vx, vy)
        for i in range(b):
            ref = xla_warp(im1[i], im2[i], vx[i], vy[i])
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(ref), rtol=0, atol=3e-7
            )


class TestEndToEndForcedOn:
    def test_flow_parity_with_kernel_forced(self, monkeypatch):
        # Force admission at small test sizes and run the full pipeline;
        # flow must match the serial-gather pipeline to solver noise.
        from papteam_opticalflow_tpu.models.coarse2fine import (
            coarse2fine_flow_chw,
        )
        from papteam_opticalflow_tpu.utils.params import FlowParams

        h, w = 160, 256
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        base = 0.5 + 0.5 * np.sin(2 * np.pi * xx / 37) * np.cos(
            2 * np.pi * yy / 29
        )
        im2 = np.roll(base, 2, axis=1)
        im1 = jnp.asarray(base, jnp.float32)[None]
        im2 = jnp.asarray(im2, jnp.float32)[None]

        params = FlowParams()
        u0, v0, _ = coarse2fine_flow_chw(im1, im2, 3, params)

        monkeypatch.setattr(interp, "_PALLAS_WARP", "on")
        monkeypatch.setattr(interp, "_PALLAS_WARP_MIN_BYTES", 1)
        # distinct params object -> distinct jit cache entry, so the
        # forced-on trace cannot reuse the default-path executable.
        params2 = dataclasses.replace(params, varepsilon_phi=1.0000001e-6)
        u1, v1, _ = coarse2fine_flow_chw(im1, im2, 3, params2)
        err = np.hypot(
            np.asarray(u1 - u0, np.float64), np.asarray(v1 - v0, np.float64)
        ).mean()
        assert err < 1e-4, err


class TestBicubicKernel:
    @pytest.mark.parametrize(
        "c,h,w,amp,tdt",
        [
            (3, 128, 512, 4.5, None),
            (1, 131, 200, 21.5, None),
            (3, 128, 512, 4.5, jnp.bfloat16),  # bf16 table, f32 Hermite
        ],
    )
    def test_f32_vs_serial(self, c, h, w, amp, tdt, monkeypatch):
        from papteam_opticalflow_tpu.ops import bicubic

        im1, im2, vx, vy = make_case(c, h, w, amp, jnp.float32)
        monkeypatch.setattr(interp, "_PALLAS_WARP", "off")
        want = bicubic.warp_bicubic_ref(im1, im2, vx, vy, table_dtype=tdt)
        monkeypatch.setattr(interp, "_PALLAS_WARP", "on")
        monkeypatch.setattr(interp, "_PALLAS_WARP_MIN_BYTES", 1)
        got = bicubic.warp_bicubic_ref(im1, im2, vx, vy, table_dtype=tdt)
        # Hermite combine order differs (sum-of-16 vs two basis matmuls):
        # a few f32 ULP on O(1) values.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=5e-6
        )

    def test_bf16_more_accurate_than_serial(self, monkeypatch):
        # bf16 feature path: the serial evaluation runs the Hermite sums
        # in bf16; the kernel accumulates f32 and must be closer to the
        # f64 truth.
        from papteam_opticalflow_tpu.ops import bicubic

        c, h, w = 5, 128, 384
        im1, im2, vx, vy = make_case(c, h, w, 4.5, jnp.bfloat16)
        truth = bicubic.warp_bicubic_ref(
            im1.astype(jnp.float64), im2.astype(jnp.float64),
            vx.astype(jnp.float64), vy.astype(jnp.float64),
        )
        monkeypatch.setattr(interp, "_PALLAS_WARP", "off")
        serial = bicubic.warp_bicubic_ref(im1, im2, vx, vy)
        monkeypatch.setattr(interp, "_PALLAS_WARP", "on")
        monkeypatch.setattr(interp, "_PALLAS_WARP_MIN_BYTES", 1)
        kern = bicubic.warp_bicubic_ref(im1, im2, vx, vy)
        e_s = np.abs(np.asarray(serial, np.float64) - np.asarray(truth)).mean()
        e_k = np.abs(np.asarray(kern, np.float64) - np.asarray(truth)).mean()
        assert e_k <= e_s

    def test_violent_flow_falls_back(self, monkeypatch):
        from papteam_opticalflow_tpu.ops import bicubic

        c, h, w = 2, 128, 384
        im1, im2, vx, vy = make_case(c, h, w, 60.0, jnp.float32)
        monkeypatch.setattr(interp, "_PALLAS_WARP", "off")
        want = bicubic.warp_bicubic_ref(im1, im2, vx, vy)
        monkeypatch.setattr(interp, "_PALLAS_WARP", "on")
        monkeypatch.setattr(interp, "_PALLAS_WARP_MIN_BYTES", 1)
        got = bicubic.warp_bicubic_ref(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=5e-6
        )


class TestRebasedWindows:
    """Round 5: windows anchor at each strip's displacement floor, so
    uniform violent flows stay on the kernel (the r4 ladder sent every
    > 96 px pair to the ~3x serial path) and only pathological
    within-strip SPREAD falls back."""

    def test_uniform_violent_flow_stays_on_kernel(self, monkeypatch):
        c, h, w = 2, 256, 384
        rng = np.random.default_rng(9)
        im1 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        im2 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        vx = jnp.asarray(rng.uniform(-3, 3, (h, w)), jnp.float32)
        # ~150 px uniform downward flow + small texture: far beyond every
        # ladder margin, tiny within-strip spread.
        vy = jnp.asarray(
            -150.0 + rng.uniform(-2, 2, (h, w)), jnp.float32
        )
        ref = xla_warp(im1, im2, vx, vy)
        # Poison the serial branch: if the adaptive wrapper fell back,
        # the output would be garbage and the comparison would fail.
        monkeypatch.setattr(
            interp, "bilinear_gather",
            lambda img, x, y: jnp.full(
                (*img.shape[:-2], *x.shape), jnp.nan, img.dtype
            ),
        )
        out = interp._warp_pallas_adaptive(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=3e-7
        )

    def test_extreme_spread_falls_back(self):
        # Displacement spread WITHIN strips beyond the window budget must
        # still route to the serial branch (exact, modulo FMA).
        c, h, w = 1, 128, 256
        rng = np.random.default_rng(13)
        im1 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        im2 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        vx = jnp.zeros((h, w), jnp.float32)
        # Alternate +-90 px within every strip: spread ~180 > the 96-rung
        # budget (spread_margin_for(96) = 200 at TB=32... pick +-110).
        rows = np.where((np.arange(h) % 2) == 0, 110.0, -110.0)
        vy = jnp.asarray(np.broadcast_to(rows[:, None], (h, w)), jnp.float32)
        out = interp._warp_pallas_adaptive(im1, im2, vx, vy)
        ref = xla_warp(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=3e-7
        )

    def test_rebased_kernel_exact_vs_xla(self):
        # Direct kernel call with per-strip anchors on a mixed flow.
        c, h, w = 3, 192, 256
        im1, im2, vx, vy = make_case(c, h, w, 8.0, jnp.float32, seed=17)
        vy = vy + 40.0  # uniform offset beyond the 24-margin
        i = jnp.arange(h, dtype=jnp.float32)[:, None]
        y = i + vy
        oob = (y < 0) | (y > h - 1)
        y0 = jnp.clip(jnp.trunc(y).astype(jnp.int32), 0, h - 1)
        mn0, spread = interp._strip_dy_fields(
            oob | (jnp.arange(w)[None, :] + vx < 0)
            | (jnp.arange(w)[None, :] + vx > w - 1), y0, h, w
        )
        assert int(spread) <= pwarp.spread_margin_for(24)
        out = pwarp.warp_bilinear_pallas(im1, im2, vx, vy, margin=24,
                                         dymin=mn0)
        ref = xla_warp(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=3e-7
        )

    def test_bicubic_uniform_violent_flow(self, monkeypatch):
        from papteam_opticalflow_tpu.ops import bicubic

        c, h, w = 2, 192, 256
        rng = np.random.default_rng(23)
        im1 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        im2 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        vx = jnp.asarray(rng.uniform(-2, 2, (h, w)), jnp.float32)
        vy = jnp.asarray(90.0 + rng.uniform(-2, 2, (h, w)), jnp.float32)
        monkeypatch.setattr(interp, "_PALLAS_WARP", "off")
        want = bicubic.warp_bicubic_ref(im1, im2, vx, vy)
        monkeypatch.setattr(interp, "_PALLAS_WARP", "on")
        monkeypatch.setattr(interp, "_PALLAS_WARP_MIN_BYTES", 1)
        got = bicubic.warp_bicubic_ref(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=5e-6
        )


class TestColumnBoundGuard:
    def test_horizontal_violent_flow_falls_back(self):
        # |dx| >= 128 breaks the kernel's 3-aligned-block column
        # decomposition even when dy is tiny — the adaptive wrapper must
        # route such flows to the serial branch (exact, modulo FMA).
        c, h, w = 1, 128, 640
        rng = np.random.default_rng(3)
        im1 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        im2 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        vx = jnp.full((h, w), 200.0, jnp.float32)  # in-bounds for left cols
        vy = jnp.asarray(rng.uniform(-2, 2, (h, w)), jnp.float32)
        out = interp._warp_pallas_adaptive(im1, im2, vx, vy)
        ref = xla_warp(im1, im2, vx, vy)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=3e-7
        )


class TestBandKernel:
    def test_band_matches_full_warp(self):
        # The banded wrapper must reproduce the corresponding rows of the
        # full-frame warp (traced row0, clamped halo-row coordinates
        # folded into vy).
        c, h, w = 2, 160, 384
        im1, im2, vx, vy = make_case(c, h, w, 4.5, jnp.float32)
        ref = xla_warp(im1, im2, vx, vy)
        for r0, hb in ((-4, 48), (36, 40), (120, 44)):  # top/mid/bottom
            rows = np.clip(np.arange(r0, r0 + hb), 0, h - 1)
            # Band fields at clamped rows, as parallel/tiled builds them.
            vx_b = vx[rows]
            im1_b = im1[:, rows]
            out = pwarp.warp_bilinear_pallas_band(
                im1_b, im2, vx_b, vy[rows], jnp.int32(r0), margin=24
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref[:, rows]), rtol=0, atol=3e-7
            )

    def test_tiled_band_branch_forced_on(self, monkeypatch):
        # Route parallel/tiled._warp_band through the Pallas band branch
        # (interpret mode, forced admission) and pin it to the serial
        # band machinery it replaces on TPU.
        from papteam_opticalflow_tpu.parallel import tiled

        c, h, w = 2, 160, 256
        rng = np.random.default_rng(5)
        feat1 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        feat2 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        u = jnp.asarray(rng.uniform(-4, 4, (h, w)), jnp.float32)
        v = jnp.asarray(rng.uniform(-4, 4, (h, w)), jnp.float32)
        r0, hb = 36, 48
        rows = np.clip(np.arange(r0 - 4, r0 - 4 + hb), 0, h - 1)
        y_rows = jnp.asarray(rows, jnp.int32)
        f1b, ub, vb = feat1[:, rows], u[rows], v[rows]

        want = tiled._warp_band(f1b, feat2, None, ub, vb, y_rows, h,
                                r0=jnp.int32(r0 - 4))
        monkeypatch.setattr(interp, "_PALLAS_WARP", "on")
        monkeypatch.setattr(interp, "_PALLAS_WARP_MIN_BYTES", 1)
        got = tiled._warp_band(f1b, feat2, None, ub, vb, y_rows, h,
                               r0=jnp.int32(r0 - 4))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=3e-7
        )
