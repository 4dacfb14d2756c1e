"""Tests for the non-default algorithm variants: GMixture noise model, CG
solver, bicubic per-level warp, min-width pyramid, debug ops, profiling,
multi-host work sharding."""

import numpy as np
import pytest

import jax.numpy as jnp

import np_ref
from papteam_opticalflow_tpu.models.coarse2fine import coarse2fine_flow_chw
from papteam_opticalflow_tpu.models.pyramid import (
    build_pyramid_min_width,
    n_levels_for_min_width,
)
from papteam_opticalflow_tpu.models.solver import (
    build_sor_system,
    sor_solve_jnp,
)
from papteam_opticalflow_tpu.models.solver_cg import cg_solve
from papteam_opticalflow_tpu.ops import debug, gmm
from papteam_opticalflow_tpu.ops.features import get_dxs, im2feature
from papteam_opticalflow_tpu.utils.params import (
    FlowParams,
    Interpolation,
    NoiseModel,
)

RNG = np.random.default_rng(21)


def make_pair(h=40, w=56, c=3, shift=1):
    im1 = RNG.random((c, h, w))
    im2 = np.roll(im1, shift, axis=2)
    return jnp.asarray(im1), jnp.asarray(im2)


class TestCGSolver:
    def test_cg_matches_sor_fixed_point(self):
        im1, im2 = make_pair()
        f1, f2 = im2feature(im1), im2feature(im2)
        imdx, imdy, imdt = get_dxs(f1, f2)
        z = jnp.zeros(f1.shape[-2:])
        params = FlowParams(use_pallas_sor=False, compat_laplacian_borders=False)
        system = build_sor_system(z, z, z, z, imdx, imdy, imdt, params)
        du_s, dv_s = sor_solve_jnp(system, 400, params)
        du_c, dv_c = cg_solve(system, 200, params)
        np.testing.assert_allclose(np.asarray(du_c), np.asarray(du_s), atol=1e-7)
        np.testing.assert_allclose(np.asarray(dv_c), np.asarray(dv_s), atol=1e-7)

    def test_cg_end_to_end(self):
        im1, im2 = make_pair()
        params = FlowParams(solver="cg", compat_laplacian_borders=False)
        u, v, w = coarse2fine_flow_chw(im1, im2, 2, params)
        assert bool(jnp.isfinite(u).all())
        # Shifted image: interior flow should find the +1 px shift.
        assert float(u[8:-8, 8:-8].mean()) > 0.4


class TestGMixture:
    def test_em_statistics(self):
        # Two-population residuals: EM should find a small-sigma inlier
        # component and a larger beta outlier component.
        c, h, w = 2, 40, 50
        im1 = jnp.asarray(RNG.random((c, h, w)))
        noise = RNG.normal(size=(c, h, w)) * 0.02
        outliers = (RNG.random((c, h, w)) < 0.1) * RNG.normal(size=(c, h, w)) * 0.5
        im2 = im1 + jnp.asarray(noise + outliers)
        para = gmm.est_gaussian_mixture(im1, im2, gmm.init_gmixture(c, jnp.float64))
        assert np.all(np.asarray(para.sigma) < np.asarray(para.beta))
        assert np.all(np.asarray(para.alpha) > 0.5)

    def test_psi_gmixture_formula(self):
        c, h, w = 2, 6, 7
        para = gmm.init_gmixture(c, jnp.float64)
        imdx, imdy, imdt = (jnp.asarray(RNG.normal(size=(c, h, w))) for _ in range(3))
        du = jnp.asarray(RNG.normal(size=(h, w)))
        dv = jnp.asarray(RNG.normal(size=(h, w)))
        psi = np.asarray(gmm.psi_weight_gmixture(imdx, imdy, imdt, du, dv, para))
        # scalar re-derivation at one element
        t = float(imdt[0, 2, 3] + imdx[0, 2, 3] * du[2, 3] + imdy[0, 2, 3] * dv[2, 3]) ** 2
        import math
        a, s, b = 0.95, 0.05, 0.5
        p1 = math.exp(-t / (2 * s * s)) / (2 * math.pi * s) * a
        p2 = math.exp(-t / (2 * b * b)) / (2 * math.pi * b) * (1 - a)
        want = (p1 / (2 * s * s) + p2 / (2 * b * b)) / (p1 + p2)
        assert psi[0, 2, 3] == pytest.approx(want, rel=1e-10)

    def test_gmixture_end_to_end(self):
        im1, im2 = make_pair()
        params = FlowParams(noise_model=NoiseModel.GAUSSIAN_MIXTURE)
        u, v, w = coarse2fine_flow_chw(im1, im2, 2, params)
        assert bool(jnp.isfinite(u).all())
        assert float(u[8:-8, 8:-8].mean()) > 0.3

    def test_serialization_bytes_and_roundtrip(self, tmp_path):
        # GaussianMixture::write (NoiseModel.h:155-161): int32 nChannels
        # then alpha/sigma/beta as float64; squares NOT stored (read()
        # recomputes them via square()).  Check the exact byte layout
        # against a hand-built buffer, then roundtrip.
        para = gmm.GMixtureParams(
            alpha=jnp.asarray([0.9, 0.8, 0.7], jnp.float64),
            sigma=jnp.asarray([0.04, 0.05, 0.06], jnp.float64),
            beta=jnp.asarray([0.4, 0.5, 0.6], jnp.float64),
        )
        path = tmp_path / "gm.bin"
        gmm.save_gmixture(path, para)
        want = (
            np.int32(3).tobytes()
            + np.asarray(para.alpha, np.float64).tobytes()
            + np.asarray(para.sigma, np.float64).tobytes()
            + np.asarray(para.beta, np.float64).tobytes()
        )
        assert path.read_bytes() == want
        back = gmm.load_gmixture(path)
        for a, b in zip(para, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Derived squares match the reference's square() recompute.
        np.testing.assert_allclose(
            np.asarray(back.sigma_square), np.asarray(para.sigma) ** 2
        )


class TestBicubicFeedback:
    def test_bicubic_interpolation_mode_runs(self):
        im1, im2 = make_pair()
        params = FlowParams(interpolation=Interpolation.BICUBIC)
        u, v, w = coarse2fine_flow_chw(im1, im2, 2, params)
        assert bool(jnp.isfinite(u).all())


class TestUnrolledOuterLoop:
    def test_unroll_matches_fori_loop(self):
        # unroll_outer_max_n trace-unrolls the outer fixed-point loop at
        # levels with n_outer <= threshold.  Identical per-point arithmetic;
        # only XLA fusion/FMA contraction may differ across the removed
        # loop boundary, so results agree to float-reassociation noise
        # (measured ~5e-7 px on real frames, ~1e-3 on chaotic-sensitive
        # pure-noise synthetics — use a smooth translated pair here).
        import dataclasses

        im1, im2 = make_pair(h=48, w=64)
        im1 = im1.astype(jnp.float32)
        im2 = im2.astype(jnp.float32)
        # Baseline must FORCE the fori_loop path: with 2 levels n_outer is
        # 7 and 8, both <= the default threshold 8, so FlowParams() would
        # also unroll and the comparison would be vacuous (ADVICE r3).
        p_rolled = dataclasses.replace(FlowParams(), unroll_outer_max_n=0)
        u0, v0, _ = coarse2fine_flow_chw(im1, im2, 2, p_rolled)
        p = dataclasses.replace(FlowParams(), unroll_outer_max_n=99)
        u1, v1, _ = coarse2fine_flow_chw(im1, im2, 2, p)
        err = np.hypot(
            np.asarray(u1 - u0, np.float64), np.asarray(v1 - v0, np.float64)
        ).mean()
        assert err < 5e-3, err


class TestBF16ImagePath:
    def test_bf16_close_to_f32(self):
        # image_dtype="bfloat16" stores image planes in bf16 while the flow
        # fields / SOR system / warp coordinates stay in the input dtype;
        # drift vs the f32 path must stay well inside the 0.1 px EPE budget
        # (measured ~1e-2 px on real frames).
        im1, im2 = make_pair()
        im1 = im1.astype(jnp.float32)
        im2 = im2.astype(jnp.float32)
        u0, v0, _ = coarse2fine_flow_chw(im1, im2, 2, FlowParams())
        params = FlowParams(image_dtype="bfloat16")
        u1, v1, w1 = coarse2fine_flow_chw(im1, im2, 2, params)
        assert w1.dtype == jnp.float32  # final warp uses raw frames
        err = np.hypot(
            np.asarray(u1 - u0, np.float64), np.asarray(v1 - v0, np.float64)
        ).mean()
        assert err < 0.05, err

    def test_invalid_dtype_rejected(self):
        with pytest.raises(ValueError):
            FlowParams(image_dtype="float16")


class TestMinWidthPyramid:
    def test_level_count_matches_reference_arithmetic(self):
        import math

        for w0, mw in [(240, 40), (1920, 30), (100, 20)]:
            want = int(math.log(mw / w0) / math.log(0.75))
            assert n_levels_for_min_width(w0, 0.75, mw) == want

    def test_build(self):
        im = jnp.asarray(RNG.random((1, 60, 80)))
        pyr = build_pyramid_min_width(im, 0.75, 40)
        assert len(pyr) == n_levels_for_min_width(80, 0.75, 40)
        assert pyr[-1].shape[-1] >= 40 * 0.75


class TestDebugOps:
    def test_mask_compat_swap(self):
        h, w = 8, 9
        vx = jnp.zeros((h, w)).at[2, 3].set(100.0)
        vy = jnp.zeros((h, w))
        # compat: y = i + vx -> large vx knocks the pixel out via the Y test
        m_compat = np.asarray(debug.gen_in_image_mask(vx, vy, 0, compat_swap=True))
        m_fixed = np.asarray(debug.gen_in_image_mask(vx, vy, 0, compat_swap=False))
        assert m_compat[2, 3] == 0
        assert m_fixed[2, 3] == 0  # x = j + vx also out of range
        assert m_compat.sum() == h * w - 1

    def test_sanity_check_zero_for_static_scene(self):
        im1, _ = make_pair()
        imdx, imdy, imdt = get_dxs(im1, im1)
        mean_r, max_r = debug.sanity_check(imdx, imdy, imdt, 0.0, 0.0)
        assert float(max_r) < 1e-12


class TestProfiling:
    def test_profiled_flow_phases(self):
        from papteam_opticalflow_tpu.utils.profiling import profiled_flow

        im1, im2 = make_pair()
        u, v, w, timings = profiled_flow(im1, im2, 2, FlowParams(use_pallas_sor=False))
        for key in ("Construction", "Allocation", "SmoothFlowSOR_total",
                    "PostProcessing", "Total Device Execution"):
            assert key in timings and timings[key] >= 0
        u2, v2, _ = coarse2fine_flow_chw(im1, im2, 2, FlowParams(use_pallas_sor=False))
        np.testing.assert_allclose(np.asarray(u), np.asarray(u2), atol=1e-10)

    def test_profiled_ops_accumulators(self):
        """Op-tier accumulators (reference total_* globals) must cover the
        hot ops and reproduce the production flow exactly (the staged
        per-op programs are the same arithmetic, differently fused)."""
        from papteam_opticalflow_tpu.utils.profiling import profiled_ops

        im1, im2 = make_pair()
        params = FlowParams(use_pallas_sor=False)
        u, v, w, t = profiled_ops(im1, im2, 2, params)
        for key in ("total_pyramid", "total_feature", "total_resize",
                    "total_warp", "total_dx", "total_assembly",
                    "total_sor", "total_bicubic", "total_sum"):
            assert key in t and t[key] >= 0, key
        assert t["total_sum"] >= t["total_sor"]
        u2, v2, w2 = coarse2fine_flow_chw(im1, im2, 2, params)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u2), atol=1e-10)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-10)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-10)


class TestDistributedHelpers:
    def test_shard_work_items(self):
        from papteam_opticalflow_tpu.parallel.distributed import (
            pad_batch_for_mesh,
            shard_work_items,
        )

        items = list(range(10))
        shards = [shard_work_items(items, i, 3) for i in range(3)]
        assert sorted(sum(shards, [])) == items
        assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1
        assert pad_batch_for_mesh(10, 4) == 2
        assert pad_batch_for_mesh(8, 4) == 0
