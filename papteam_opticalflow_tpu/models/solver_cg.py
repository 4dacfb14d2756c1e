"""Conjugate-gradient solve of the coupled flow system.

The reference declares a CG-based solver path (``Matrix::ConjugateGradient``
/ ``SolveLinearSystem``, ``Code/Parallel/src/Matrix.h:443-500``, and the
``SmoothFlowPDE`` entry of ``OpticalFlow.h:49-53``) whose implementation was
removed from the PAP fork; this restores the capability TPU-natively as a
matrix-free CG on the exact same per-pixel system the SOR solves
(``OpticalFlow.cpp:478-518``):

    A (du, dv) = [ denom_x du - alpha S(du) + imdxy dv,
                   imdxy du + denom_y dv - alpha S(dv) ]  =  (rhs_x, rhs_y)

where ``S`` is the Phi-weighted 4-neighbor sum and ``denom`` carries the
``imdx^2 + 0.05 alpha + alpha sum(w)`` diagonal.  A is symmetric positive
definite (Psi, Phi > 0), so CG converges; every iteration is one stencil +
three reductions — all dense VPU work, and only two scalars of host-visible
state.  Select with ``FlowParams(solver="cg")``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .solver import SorSystem, _neighbor_sum, neighbor_weights


def cg_solve(
    system: SorSystem, n_iterations: int, params
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the coupled system from a zero initial guess with fixed-count
    CG (deterministic, shape-stable under jit)."""
    phi = system.phi
    t = phi.dtype.type
    alpha = t(params.alpha)
    wl, wr, wu, wd = neighbor_weights(phi)

    def a_op(du, dv):
        ax = system.denom_x * du - alpha * _neighbor_sum(du, wl, wr, wu, wd) \
            + system.imdxy * dv
        ay = system.denom_y * dv - alpha * _neighbor_sum(dv, wl, wr, wu, wd) \
            + system.imdxy * du
        return ax, ay

    def dot(ax, ay, bx, by):
        return jnp.sum(ax * bx) + jnp.sum(ay * by)

    x = (jnp.zeros_like(phi), jnp.zeros_like(phi))
    r = (system.rhs_x, system.rhs_y)
    p = r
    rs = dot(*r, *r)

    def body(_, carry):
        x, r, p, rs = carry
        ap = a_op(*p)
        pap = dot(*p, *ap)
        # Guard against exact convergence (pap -> 0) to keep NaNs out of a
        # fixed-count loop.
        alpha_k = jnp.where(pap > 0, rs / jnp.maximum(pap, t(1e-30)), t(0))
        x = (x[0] + alpha_k * p[0], x[1] + alpha_k * p[1])
        r = (r[0] - alpha_k * ap[0], r[1] - alpha_k * ap[1])
        rs_new = dot(*r, *r)
        beta = jnp.where(rs > 0, rs_new / jnp.maximum(rs, t(1e-30)), t(0))
        p = (r[0] + beta * p[0], r[1] + beta * p[1])
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, n_iterations, body, (x, r, p, rs))
    return x
