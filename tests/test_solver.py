"""Solver tests: red-black SOR vs the reference's lexicographic Gauss-Seidel,
determinism, and single-level fixed-point behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

import np_ref
from papteam_opticalflow_tpu.models.solver import (
    SorSystem,
    build_sor_system,
    neighbor_weights,
    smooth_flow_sor,
    sor_solve_jnp,
)
from papteam_opticalflow_tpu.ops.features import get_dxs, im2feature
from papteam_opticalflow_tpu.utils.params import FlowParams

RNG = np.random.default_rng(7)


def make_system(h=12, w=15):
    phi = RNG.random((h, w)) * 5 + 0.2
    imdxy = RNG.normal(size=(h, w)) * 0.1
    imdx2 = RNG.random((h, w)) * 0.5 + 0.05
    imdy2 = RNG.random((h, w)) * 0.5 + 0.05
    rhsx = RNG.normal(size=(h, w)) * 0.01
    rhsy = RNG.normal(size=(h, w)) * 0.01
    return phi, imdxy, imdx2, imdy2, rhsx, rhsy


def to_sor_system(phi, imdxy, imdx2, imdy2, rhsx, rhsy, alpha):
    wl, wr, wu, wd = neighbor_weights(jnp.asarray(phi))
    coeff = (wl + wr + wu + wd) * alpha
    return SorSystem(
        jnp.asarray(phi),
        jnp.asarray(imdxy),
        jnp.asarray(imdx2) + alpha * 0.05 + coeff,
        jnp.asarray(imdy2) + alpha * 0.05 + coeff,
        jnp.asarray(rhsx),
        jnp.asarray(rhsy),
    )


class TestSOR:
    def test_red_black_converges_to_lexicographic_fixed_point(self):
        alpha = 0.012
        phi, imdxy, imdx2, imdy2, rhsx, rhsy = make_system()
        # Both orderings, run to (near) convergence, must agree: same system,
        # same fixed point.
        du_ref, dv_ref = np_ref.sor_lexicographic(
            phi, imdxy, imdx2, imdy2, rhsx, rhsy, alpha, n_iter=400
        )
        system = to_sor_system(phi, imdxy, imdx2, imdy2, rhsx, rhsy, alpha)
        du, dv = sor_solve_jnp(system, 400, FlowParams())
        np.testing.assert_allclose(np.asarray(du), du_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(dv), dv_ref, atol=1e-8)

    def test_red_black_close_after_reference_sweep_count(self):
        # At the reference's finest-level sweep count (30) the two orderings
        # must already agree to well under the 0.1 px EPE budget.
        alpha = 0.012
        phi, imdxy, imdx2, imdy2, rhsx, rhsy = make_system()
        du_ref, dv_ref = np_ref.sor_lexicographic(
            phi, imdxy, imdx2, imdy2, rhsx, rhsy, alpha, n_iter=30
        )
        system = to_sor_system(phi, imdxy, imdx2, imdy2, rhsx, rhsy, alpha)
        du, dv = sor_solve_jnp(system, 30, FlowParams())
        err = np.hypot(np.asarray(du) - du_ref, np.asarray(dv) - dv_ref).mean()
        assert err < 1e-3

    def test_deterministic(self):
        alpha = 0.012
        sys_args = make_system()
        system = to_sor_system(*sys_args, alpha)
        a = sor_solve_jnp(system, 25, FlowParams())
        b = sor_solve_jnp(system, 25, FlowParams())
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


class TestSmoothFlow:
    def test_single_level_reduces_residual(self):
        # A translated pattern: one level of SmoothFlowSOR should move the
        # flow toward the true shift and reduce the warp residual.
        h, w = 32, 40
        base = RNG.random((h, w))
        im1 = np.stack([base], 0)
        im2 = np.roll(base, 1, axis=1)[None]
        feat1 = im2feature(jnp.asarray(im1))
        feat2 = im2feature(jnp.asarray(im2))
        u = jnp.zeros((h, w))
        v = jnp.zeros((h, w))
        params = FlowParams()
        u2, v2, warp2, _ = smooth_flow_sor(
            feat1, feat2, feat2, u, v, 7, 1, 30, params
        )
        res_before = float(jnp.abs(feat2[0] - feat1[0]).mean())
        res_after = float(jnp.abs(warp2[0] - feat1[0]).mean())
        assert res_after < res_before
        # interior flow should move toward u = -1 (im2 shifted right means
        # im1 content found at x-1... sign: im1[x] == im2[x+1] -> u > 0)
        assert float(u2[4:-4, 4:-4].mean()) > 0.2

    def test_build_system_shapes(self):
        h, w = 10, 12
        im1 = RNG.random((3, h, w))
        im2 = RNG.random((3, h, w))
        imdx, imdy, imdt = get_dxs(jnp.asarray(im1), jnp.asarray(im2))
        system = build_sor_system(
            jnp.zeros((h, w)), jnp.zeros((h, w)), jnp.zeros((h, w)), jnp.zeros((h, w)),
            imdx, imdy, imdt, FlowParams(),
        )
        for field in system:
            assert field.shape == (h, w)
