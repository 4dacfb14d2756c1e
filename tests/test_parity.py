"""End-to-end parity vs the compiled reference oracle (Serial build =
numerical baseline, SURVEY.md §2.9/§7.1).

Skipped when tools/ref_harness has not been built
(``tools/ref_harness/build.sh``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle
import papteam_opticalflow_tpu as pf

needs_oracle = pytest.mark.skipif(
    not oracle.have_oracle("serial"), reason="reference oracle not built"
)

needs_dataset = pytest.mark.skipif(
    not oracle.REF_IMAGES.exists(), reason="reference dataset not mounted"
)


@needs_oracle
class TestSyntheticParity:
    def test_gray_pair(self):
        rng = np.random.default_rng(3)
        base = rng.random((48, 64))
        im1 = base
        im2 = np.roll(base, 1, axis=1)
        uo, vo, wo, _ = oracle.run_reference(im1, im2, 3)
        _, u, v, w = pf.coarse2fine_flow(im1, im2, 3, dtype=jnp.float64)
        # Pure-noise images are adversarial for sweep-ordering differences
        # (red-black vs lexicographic); real frames agree to ~1e-4 px
        # (TestDatasetParity).  Budget here is the global 0.1 px target.
        assert oracle.epe(u, v, uo, vo) < 0.1

    def test_rgb_pair(self):
        rng = np.random.default_rng(4)
        im1 = rng.random((40, 56, 3))
        im2 = np.roll(im1, (1, 2), axis=(0, 1))
        uo, vo, wo, _ = oracle.run_reference(im1, im2, 4)
        _, u, v, w = pf.coarse2fine_flow(im1, im2, 4, dtype=jnp.float64)
        assert oracle.epe(u, v, uo, vo) < 0.1


@needs_oracle
@needs_dataset
class TestDatasetParity:
    @pytest.mark.parametrize("levels", [2, 4])
    def test_traffic_240(self, levels):
        im1, im2 = oracle.load_frame_pair("HoChiMinhTraffic_10FPS_240", 1)
        uo, vo, wo, _ = oracle.run_reference(im1, im2, levels)
        _, u, v, w = pf.coarse2fine_flow(im1, im2, levels, dtype=jnp.float64)
        e = oracle.epe(u, v, uo, vo)
        assert e < 1e-3, f"EPE {e}"
        # Warp parity: tiny flow differences amplify through the bicubic
        # gather at image edges, so bound the mean tightly and the max loosely.
        assert np.abs(w - wo).mean() < 1e-3
        assert np.abs(w - wo).max() < 0.05

    def test_traffic_240_float32_within_budget(self):
        # Production dtype: must stay within the 0.1 px BASELINE.md budget.
        im1, im2 = oracle.load_frame_pair("HoChiMinhTraffic_10FPS_240", 1)
        uo, vo, _, _ = oracle.run_reference(im1, im2, 3)
        _, u, v, _ = pf.coarse2fine_flow(im1, im2, 3, dtype=jnp.float32)
        e = oracle.epe(u, v, uo, vo)
        assert e < 0.1, f"float32 EPE {e}"
