"""Single-level variational flow solver (``SmoothFlowSOR``).

TPU-native re-implementation of ``OpticalFlow::SmoothFlowSOR``
(``Code/Parallel/src/OpticalFlow.cpp:242-551``): outer fixed-point
re-linearization around the warp, inner re-weighting, and an SOR solve of the
coupled Euler-Lagrange system.

The reference parallelizes SOR "chaotically" — OpenMP splits the *sweep*
loop across threads which then race on ``du``/``dv``
(``OpticalFlow.cpp:469-520``); the Serial build does plain lexicographic
Gauss-Seidel.  Here the sweep is deterministic **red-black SOR**: each
half-sweep updates one checkerboard color using only the other color's
values, which vectorizes across the whole image on the VPU and shards across
chips with a 1-pixel halo.  Red-black converges to the same fixed point as
lexicographic GS for this 5-point system.

Per-point update (exact arithmetic of ``OpticalFlow.cpp:478-518``):

* neighbor weights: left ``phi[i,j-1]``, right ``phi[i,j]``, up
  ``phi[i-1,j]``, down ``phi[i,j]`` (missing at borders);
* ``sigma1 = -alpha * sum(w * du_nbr) + imdxy * dv[o]``
* ``du[o] = (1-w)du[o] + w (rhs_x - sigma1) / (imdx2 + 0.05 alpha + alpha sum(w))``
* ``sigma2`` uses the just-updated ``du[o]`` (u-v coupling), then ``dv[o]``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.bicubic import threshold01, warp_bicubic_ref
from ..ops.filters import dx_forward, dy_forward
from ..ops.interp import warp_bilinear
from ..ops.laplacian import weighted_laplacian
from ..ops.noise import est_laplacian_noise
from ..ops.robust import assemble_system, phi_weight, psi_weight
from ..utils.params import FlowParams, Interpolation, NoiseModel


class SorSystem(NamedTuple):
    """Dense per-pixel coefficients of the coupled SOR system."""

    phi: jnp.ndarray      # smoothness weights (H, W)
    imdxy: jnp.ndarray    # coupling term (H, W)
    denom_x: jnp.ndarray  # imdx2 + 0.05*alpha + alpha*coeff (H, W)
    denom_y: jnp.ndarray  # imdy2 + 0.05*alpha + alpha*coeff (H, W)
    rhs_x: jnp.ndarray    # -imdtdx - alpha*lap(u) (H, W)
    rhs_y: jnp.ndarray    # -imdtdy - alpha*lap(v) (H, W)


def neighbor_weights(phi: jnp.ndarray):
    """Border-masked neighbor weights (wl, wr, wu, wd) per the SOR stencil
    (``OpticalFlow.cpp:482-509``)."""
    z_col = jnp.zeros_like(phi[..., :, :1])
    z_row = jnp.zeros_like(phi[..., :1, :])
    wl = jnp.concatenate([z_col, phi[..., :, :-1]], axis=-1)
    # Right/down weights are phi at the CURRENT pixel, zeroed on the last
    # column/row (OpticalFlow.cpp:491,505 read phiData[offset]).
    wr = jnp.concatenate([phi[..., :, :-1], z_col], axis=-1)
    wu = jnp.concatenate([z_row, phi[..., :-1, :]], axis=-2)
    wd = jnp.concatenate([phi[..., :-1, :], z_row], axis=-2)
    return wl, wr, wu, wd


def _neighbor_sum(x, wl, wr, wu, wd):
    """sum_nbr w_nbr * x[nbr] with zero-padded shifts (border weights are
    already zero).  Shifts are four slices of ONE zero-padded buffer so XLA
    fuses the whole half-sweep into a single HBM pass."""
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad)
    left = xp[..., 1:-1, :-2]
    right = xp[..., 1:-1, 2:]
    up = xp[..., :-2, 1:-1]
    down = xp[..., 2:, 1:-1]
    return wl * left + wr * right + wu * up + wd * down


def checkerboard(h: int, w: int, dtype) -> jnp.ndarray:
    """(H, W) mask: 1 on "red" points ((i + j) even)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (((i + j) % 2) == 0).astype(dtype)


def build_sor_system(
    u: jnp.ndarray,
    v: jnp.ndarray,
    du: jnp.ndarray,
    dv: jnp.ndarray,
    imdx: jnp.ndarray,
    imdy: jnp.ndarray,
    imdt: jnp.ndarray,
    params: FlowParams,
    lap_para: jnp.ndarray | None = None,
    psi_fn=None,
) -> SorSystem:
    """Phases 2-4 of the inner loop (``OpticalFlow.cpp:296-459``): flow
    derivatives, Phi/Psi weights, system assembly, weighted Laplacian, rhs.

    ``psi_fn`` overrides the data-term weight (the Gaussian-mixture branch);
    default is the Laplacian-model Psi."""
    t = u.dtype.type
    alpha = t(params.alpha)
    # bf16 image path: the data-term derivatives come in as bf16; the robust
    # weights and SOR system are always built in the flow dtype.
    imdx = imdx.astype(u.dtype)
    imdy = imdy.astype(u.dtype)
    imdt = imdt.astype(u.dtype)
    uu = u + du
    vv = v + dv
    ux, uy = dx_forward(uu), dy_forward(uu)
    vx, vy = dx_forward(vv), dy_forward(vv)
    phi = phi_weight(ux, uy, vx, vy, params.varepsilon_phi)
    if psi_fn is not None:
        psi = psi_fn(imdx, imdy, imdt, du, dv)
    else:
        psi = psi_weight(
            imdx, imdy, imdt, du, dv, params.varepsilon_psi, lap_para=lap_para
        )
    imdxy, imdx2, imdy2, imdtdx, imdtdy = assemble_system(psi, imdx, imdy, imdt)
    lap_u = weighted_laplacian(u, phi, compat=params.compat_laplacian_borders)
    lap_v = weighted_laplacian(v, phi, compat=params.compat_laplacian_borders)
    rhs_x = -imdtdx - alpha * lap_u
    rhs_y = -imdtdy - alpha * lap_v

    wl, wr, wu, wd = neighbor_weights(phi)
    coeff = (wl + wr + wu + wd) * alpha
    diag = alpha * t(params.diag_reg_scale)
    denom_x = imdx2 + diag + coeff
    denom_y = imdy2 + diag + coeff
    return SorSystem(phi, imdxy, denom_x, denom_y, rhs_x, rhs_y)


def sor_solve_jnp(
    system: SorSystem,
    n_iterations: int,
    params: FlowParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Red-black SOR from a zero initial guess (``du.reset()``,
    ``OpticalFlow.cpp:463-464``), pure-XLA implementation.

    One reference sweep == one (red, black) pair of half-sweeps here.
    """
    phi = system.phi
    h, w = phi.shape[-2], phi.shape[-1]
    t = phi.dtype.type
    alpha = t(params.alpha)
    omega = t(params.omega)
    wl, wr, wu, wd = neighbor_weights(phi)
    red = checkerboard(h, w, jnp.bool_)
    # Divides hoisted out of the sweep loop (same transform as the Pallas
    # kernels, keeping all backends arithmetically identical).
    rdx = omega / system.denom_x
    rdy = omega / system.denom_y

    du0 = jnp.zeros_like(phi)
    dv0 = jnp.zeros_like(phi)

    def half_sweep(du, dv, mask):
        sigma1 = -alpha * _neighbor_sum(du, wl, wr, wu, wd) + system.imdxy * dv
        du_new = (1 - omega) * du + (system.rhs_x - sigma1) * rdx
        du = jnp.where(mask, du_new, du)
        sigma2 = -alpha * _neighbor_sum(dv, wl, wr, wu, wd) + system.imdxy * du
        dv_new = (1 - omega) * dv + (system.rhs_y - sigma2) * rdy
        dv = jnp.where(mask, dv_new, dv)
        return du, dv

    def body(_, carry):
        du, dv = carry
        du, dv = half_sweep(du, dv, red)
        du, dv = half_sweep(du, dv, ~red)
        return du, dv

    return jax.lax.fori_loop(0, n_iterations, body, (du0, dv0))


# Probe-compile results for the fused whole-level kernel, keyed by the
# full static configuration (same pattern as sor_dispatch._PLAN_PROBES):
# Mosaic admission is calibrated against one toolchain, so the first real
# use of a shape AOT-compiles it outside the enclosing jit and falls back
# to the op-by-op path on rejection instead of crashing the program.
_FUSED_PROBES: dict = {}


def _probe_fused_level(c, h, w, img_dtype, flow_dtype,
                       n_outer, n_inner, n_sor, params) -> bool:
    from ..ops.pallas import level_fused as lf

    if lf._INTERPRET:
        return True
    key = (c, h, w, jnp.dtype(img_dtype).str, jnp.dtype(flow_dtype).str,
           n_outer, n_inner, n_sor)
    hit = _FUSED_PROBES.get(key)
    if hit is not None:
        return hit
    try:
        feat = jax.ShapeDtypeStruct((c, h, w), img_dtype)
        flow = jax.ShapeDtypeStruct((h, w), flow_dtype)
        lf._fused_level_call.lower(
            feat, feat, feat, flow, flow,
            n_outer=n_outer, n_inner=n_inner, n_sor=n_sor,
            alpha=params.alpha, omega=params.omega,
            eps_phi=params.varepsilon_phi, eps_psi=params.varepsilon_psi,
            diag_scale=params.diag_reg_scale,
            compat=params.compat_laplacian_borders,
        ).compile()
        ok = True
    except Exception:
        ok = False
    _FUSED_PROBES[key] = ok
    return ok


def _use_fused_level(im1, u, n_outer, n_inner, n_sor, params, lap_para) -> bool:
    """Gate for the fused whole-level kernel: default hot path only."""
    from ..ops.pallas.level_fused import fused_level_fits
    from .sor_dispatch import _pallas_available

    if not (
        params.use_fused_level
        and params.interpolation == Interpolation.BILINEAR
        and params.noise_model == NoiseModel.LAPLACIAN
        and not params.estimate_laplacian_noise
        and lap_para is None
        and params.solver == "sor"
        and params.sor_red_black
        and u.ndim == 2
        and im1.ndim == 3
    ):
        return False
    c, h, w = im1.shape
    if not fused_level_fits(c, h, w, im1.dtype):
        return False
    from ..ops.pallas import level_fused as lf

    if not (_pallas_available() or lf._INTERPRET):
        return False
    return _probe_fused_level(
        c, h, w, im1.dtype, u.dtype, n_outer, n_inner, n_sor, params
    )


def smooth_flow_sor(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    warp_im2: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    n_outer: int,
    n_inner: int,
    n_sor: int,
    params: FlowParams,
    lap_para: jnp.ndarray | None = None,
):
    """Full single-level solve (``OpticalFlow.cpp:242-551``).

    ``im1``, ``im2``, ``warp_im2``: feature images ``(C, H, W)``;
    ``u``, ``v``: flow ``(H, W)``.  Returns updated ``(u, v, warp_im2,
    lap_para)``.
    """
    from .sor_dispatch import sor_solve  # late import to avoid cycle

    from ..ops.interp import pack_patch2x2, should_prebuild_pack

    if _use_fused_level(im1, u, n_outer, n_inner, n_sor, params, lap_para):
        from ..ops.pallas.level_fused import smooth_flow_level_fused

        u, v, warp_im2 = smooth_flow_level_fused(
            im1, im2, warp_im2, u, v, n_outer, n_inner, n_sor, params
        )
        return u, v, warp_im2, None

    # im2 is warped once per outer iteration with the updated flow; its 2x2
    # patch pack is flow-independent, so build it once for the whole level
    # (one gather per pixel per warp instead of four) — but only when the
    # packed slice width keeps the TPU gather on its fast path
    # (interp.should_pack_warp) OR the tile-windowed scheme applies
    # (wide slices gather in narrow channel chunks there).
    im2_pack = pack_patch2x2(im2) if should_prebuild_pack(im2) else None

    gmixture = params.noise_model == NoiseModel.GAUSSIAN_MIXTURE
    track_noise = lap_para is not None or gmixture
    if gmixture and lap_para is None:
        from ..ops.gmm import init_gmixture

        # GMPara.reset(nchannels + 2) (OpticalFlow.cpp:858-859); raw-channel
        # count + 2 equals the feature channel count for 1/3-channel inputs.
        lap_para = init_gmixture(im1.shape[0], u.dtype)

    # Frame 1's getDxs pre-smooth is loop-invariant (only warpIm2 changes
    # per outer iteration): hoist it out of the fixed-point loop — values
    # identical, one 5-tap smoothing per level instead of n_outer.
    from ..ops.features import get_dxs_presmoothed, presmooth_frame

    im1s = presmooth_frame(im1)

    def outer_body(carry):
        u, v, warp_im2, noise = carry
        imdx, imdy, imdt = get_dxs_presmoothed(im1s, warp_im2)
        du = jnp.zeros_like(u)
        dv = jnp.zeros_like(v)
        for _ in range(n_inner):
            if gmixture:
                from ..ops.gmm import psi_weight_gmixture

                psi_fn = lambda *a, **k: psi_weight_gmixture(*a[:5], noise)  # noqa: E731
            else:
                psi_fn = None
            system = build_sor_system(
                u, v, du, dv, imdx, imdy, imdt, params,
                lap_para=None if gmixture else (noise if track_noise else None),
                psi_fn=psi_fn,
            )
            du, dv = sor_solve(system, n_sor, params)
        u = u + du
        v = v + dv
        if params.interpolation == Interpolation.BILINEAR:
            warp_im2 = warp_bilinear(im1, im2, u, v, im2_pack=im2_pack)
        else:
            warp_im2 = threshold01(warp_bicubic_ref(im1, im2, u, v))
        if gmixture:
            from ..ops.gmm import est_gaussian_mixture

            noise = est_gaussian_mixture(im1, warp_im2, noise)
        elif track_noise and params.noise_model == NoiseModel.LAPLACIAN:
            noise = est_laplacian_noise(im1, warp_im2).astype(noise.dtype)
        return u, v, warp_im2, noise

    carry = (u, v, warp_im2,
             lap_para if track_noise else jnp.zeros((im1.shape[0],), u.dtype))
    if 0 < n_outer <= params.unroll_outer_max_n:
        # Same body, trace-unrolled: no fori_loop carry materialization
        # between outer iterations (see FlowParams.unroll_outer_max_n).
        for _ in range(n_outer):
            carry = outer_body(carry)
    else:
        carry = jax.lax.fori_loop(
            0, n_outer, lambda _, c: outer_body(c), carry
        )
    u, v, warp_im2, noise = carry
    return u, v, warp_im2, (noise if track_noise else None)
