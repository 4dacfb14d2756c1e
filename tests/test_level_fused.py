"""CPU interpret-mode tests of the fused whole-level solver kernel
(``ops/pallas/level_fused.py``).

The kernel runs a level's ENTIRE SmoothFlowSOR — warp feedback, getDxs,
robust weights, assembly, every SOR sweep — in one launch; these tests pin
it against the composable op-by-op path (``models/solver.smooth_flow_sor``
with ``use_fused_level=False``) at f64, where the only differences are FMA
contraction / reduction order (~1e-12 after a full level).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import papteam_opticalflow_tpu.ops.pallas.level_fused as lf
from papteam_opticalflow_tpu.models.solver import _use_fused_level, smooth_flow_sor
from papteam_opticalflow_tpu.utils.params import FlowParams, NoiseModel

RNG = np.random.default_rng(21)

FUSED = FlowParams(use_pallas_sor=False)
PLAIN = FlowParams(use_pallas_sor=False, use_fused_level=False)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(lf, "_INTERPRET", True)


def make_level(c, h, w, fscale):
    feat1 = jnp.asarray(RNG.random((c, h, w)))
    feat2 = jnp.asarray(np.roll(np.asarray(feat1), 1, axis=2) * 0.9 + 0.05)
    u = jnp.asarray((RNG.random((h, w)) * 2 - 1) * fscale)
    v = jnp.asarray((RNG.random((h, w)) * 2 - 1) * fscale)
    return feat1, feat2, u, v


class TestFusedLevelParity:
    @pytest.mark.parametrize(
        "c,h,w,fscale,no,ni,ns",
        [
            (5, 2, 4, 1.0, 3, 1, 5),     # tiny coarsest level
            (3, 17, 32, 3.0, 3, 1, 8),   # 1-ch feature stack, OOB flows
            (5, 81, 144, 8.0, 2, 2, 6),  # level-9 @1920 shape, n_inner=2
            (5, 40, 128, 0.5, 3, 1, 7),  # w == wp (nj=1 boundary)
            (5, 30, 256, 2.0, 2, 1, 6),  # w == wp (nj=2 boundary)
            (5, 33, 150, 1.5, 4, 1, 10), # odd width, lane padding
            (5, 48, 300, 2.0, 2, 1, 6),  # nj=3 (two-vreg packed halves)
            (5, 40, 384, 1.0, 2, 1, 5),  # w == wp == 384 (nj=3 boundary)
            (5, 24, 450, 2.0, 2, 1, 5),  # nj=4 (r5 extent: level5@1920 shape class)
            (5, 20, 512, 1.0, 2, 1, 4),  # w == wp == 512 (nj=4 boundary)
        ],
    )
    def test_matches_op_by_op_path(self, c, h, w, fscale, no, ni, ns):
        feat1, feat2, u, v = make_level(c, h, w, fscale)
        assert _use_fused_level(feat1, u, no, ni, ns, FUSED, None)
        u1, v1, w1, _ = smooth_flow_sor(feat1, feat2, feat2, u, v, no, ni, ns, FUSED)
        u0, v0, w0, _ = smooth_flow_sor(feat1, feat2, feat2, u, v, no, ni, ns, PLAIN)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=5e-9)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=5e-9)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=5e-9)

    def test_garbage_columns_stay_finite_at_high_sweep_counts(self):
        # Regression (r5): packed scratch planes are w2p = njp*128 wide,
        # and the columns beyond the true packed width ceil(w/2) iterate
        # under the SOR sweep too.  With clamp-copied coefficients that
        # garbage iteration is non-contractive — on real 960px data it
        # grew ~6x/sweep, overflowed to inf by ~sweep 50, and the
        # masked-zero weights turned it into NaN across REAL lanes (the
        # 960px P8/P15 grid divergence).  This pins the f32 kernel at a
        # garbage-column shape (w=128 -> packed width 64, w2p=128) with a
        # sweep count long past the observed blow-up point; the pre-fix
        # kernel NaNs here deterministically.
        rng = np.random.default_rng(11)
        c, h, w = 5, 71, 128
        f1 = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        f2 = jnp.asarray(np.roll(np.asarray(f1), 2, axis=2) * 0.95 + 0.02)
        u = jnp.asarray((rng.random((h, w)) * 2 - 1) * 0.8, jnp.float32)
        v = jnp.asarray((rng.random((h, w)) * 2 - 1) * 0.8, jnp.float32)
        uf, vf, wf = lf.smooth_flow_level_fused(f1, f2, f2, u, v, 3, 1, 200, FUSED)
        assert bool(jnp.isfinite(uf).all())
        assert bool(jnp.isfinite(vf).all())
        assert bool(jnp.isfinite(jnp.asarray(wf, jnp.float32)).all())
        u0, v0, _, _ = smooth_flow_sor(
            f1, f2, f2, u, v, 3, 1, 200, PLAIN
        )
        np.testing.assert_allclose(
            np.asarray(uf), np.asarray(u0), atol=5e-4
        )  # f32, 3 outers x 200 sweeps: FMA/reduction-order drift only

    def test_full_pipeline_parity(self):
        from papteam_opticalflow_tpu.models.coarse2fine import coarse2fine_flow_chw

        im1 = jnp.asarray(RNG.random((3, 37, 61)))
        im2 = jnp.asarray(np.roll(np.asarray(im1), 2, axis=2) * 0.97 + 0.01)
        uf, vf, wf = coarse2fine_flow_chw(im1, im2, 3, FUSED)
        up, vp, wp = coarse2fine_flow_chw(im1, im2, 3, PLAIN)
        np.testing.assert_allclose(np.asarray(uf), np.asarray(up), atol=1e-10)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vp), atol=1e-10)
        np.testing.assert_allclose(np.asarray(wf), np.asarray(wp), atol=1e-10)

    def test_vmap_runs_fused_per_element(self):
        c, h, w = 5, 12, 40
        feats = [make_level(c, h, w, 1.0) for _ in range(2)]
        f1 = jnp.stack([f[0] for f in feats])
        f2 = jnp.stack([f[1] for f in feats])
        u = jnp.stack([f[2] for f in feats])
        v = jnp.stack([f[3] for f in feats])

        def solve(a, b, uu, vv):
            return smooth_flow_sor(a, b, b, uu, vv, 2, 1, 4, FUSED)[:2]

        ub, vb = jax.vmap(solve)(f1, f2, u, v)
        for i in range(2):
            u0, v0, _, _ = smooth_flow_sor(
                f1[i], f2[i], f2[i], u[i], v[i], 2, 1, 4, PLAIN
            )
            np.testing.assert_allclose(np.asarray(ub[i]), np.asarray(u0), atol=1e-10)
            np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(v0), atol=1e-10)


class TestFusedLevelGate:
    def test_rejects_non_default_paths(self):
        feat1, _, u, _ = make_level(5, 12, 40, 1.0)
        gm = dataclasses.replace(FUSED, noise_model=NoiseModel.GAUSSIAN_MIXTURE)
        assert not _use_fused_level(feat1, u, 2, 1, 4, gm, None)
        est = dataclasses.replace(FUSED, estimate_laplacian_noise=True)
        assert not _use_fused_level(feat1, u, 2, 1, 4, est, None)
        off = dataclasses.replace(FUSED, use_fused_level=False)
        assert not _use_fused_level(feat1, u, 2, 1, 4, off, None)
        lap = jnp.full((7,), 0.02)
        assert not _use_fused_level(feat1, u, 2, 1, 4, FUSED, lap)

    def test_rejects_big_levels(self):
        assert not lf.fused_level_fits(5, 256, 520, jnp.float32)  # nj=5
        assert not lf.fused_level_fits(5, 600, 256, jnp.float32)  # area
        assert lf.fused_level_fits(5, 143, 256, jnp.float32)      # level 7
        assert lf.fused_level_fits(5, 192, 341, jnp.float32)      # level 6
        # r5 extent (nj=4 / 140k): level 5 @1920, level 3 @960, finest @480
        assert lf.fused_level_fits(5, 256, 455, jnp.float32)
        assert lf.fused_level_fits(5, 228, 405, jnp.float32)
        assert lf.fused_level_fits(5, 270, 480, jnp.float32)
        assert not lf.fused_level_fits(5, 342, 607, jnp.float32)  # level 4 @1920

    def test_probe_failure_falls_back(self, monkeypatch):
        from papteam_opticalflow_tpu.models import solver as msolver

        monkeypatch.setattr(lf, "_INTERPRET", False)
        monkeypatch.setattr(msolver, "_FUSED_PROBES", {})

        class Boom:
            def lower(self, *a, **k):
                raise RuntimeError("mosaic rejected")

        monkeypatch.setattr(lf, "_fused_level_call", Boom())
        feat1, feat2, u, v = make_level(5, 12, 40, 1.0)
        assert not _use_fused_level(feat1, u, 2, 1, 4, FUSED, None)
        # The op-by-op path still solves the level.
        u0, v0, _, _ = smooth_flow_sor(feat1, feat2, feat2, u, v, 2, 1, 4, FUSED)
        assert bool(jnp.isfinite(u0).all())
