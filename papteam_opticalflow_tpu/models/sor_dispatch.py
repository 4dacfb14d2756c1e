"""SOR backend dispatch: fused Pallas kernel on TPU when the level fits in
VMEM, pure-XLA red-black otherwise."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.params import FlowParams
from .solver import SorSystem, sor_solve_jnp


def _pallas_available() -> bool:
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu"


# Probe-compile results per (h_pad, w2p, window_rows, dtype): the blocked
# kernel's admission constants (window-area ceiling, VMEM planes budget)
# are calibrated against one Mosaic toolchain by observing compiler
# failures; a toolchain update could move the ceiling.  Before the first
# real use of a blocking plan, AOT-compile one chunk at the target shape
# and fall back to the next-smaller plan (ultimately the XLA path) if the
# compiler rejects it — turning a would-be hard crash of the whole program
# into a graceful downgrade.  Probing runs at Python trace time, outside
# the enclosing jit, and each shape is probed once per process (results
# also land in the persistent compilation cache).
_PLAN_PROBES: dict = {}


def _probe_blocked_plan(h: int, w: int, dtype, plan) -> bool:
    from ..ops.pallas import sor_blocked as blk

    if blk._INTERPRET:  # CPU interpret tests: nothing to probe
        return True
    band_rows, s = plan
    h_pad = -(-h // 8) * 8
    w2p = blk._half_width(w)
    window_rows = band_rows + 4 * s
    key = (h_pad, w2p, window_rows, jnp.dtype(dtype).str)
    hit = _PLAN_PROBES.get(key)
    if hit is not None:
        return hit
    try:
        args = [
            jax.ShapeDtypeStruct((h_pad, w2p), dtype) for _ in range(16)
        ]
        # Probe the SAME program shape production will use (n_sweeps = S):
        # a failure mode that depends on the compiled sweep program rather
        # than the window alone must also trip the probe, and the probe's
        # compile seeds the persistent cache for the real full chunks.
        blk._sor_blocked_chunk.lower(
            *args, h=h, w=w, n_sweeps=s, band_rows=band_rows,
            window_rows=window_rows, alpha=0.012, omega=1.8,
        ).compile()
        ok = True
    except Exception:
        ok = False
    _PLAN_PROBES[key] = ok
    return ok


def sor_solve(
    system: SorSystem, n_iterations: int, params: FlowParams
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if params.solver == "cg":
        from .solver_cg import cg_solve

        return cg_solve(system, n_iterations, params)
    if (
        params.use_pallas_sor
        and params.sor_red_black
        and system.phi.ndim == 2  # kernels are unbatched; vmap takes XLA path
        and _pallas_available()
    ):
        from ..ops.pallas.sor import sor_fits_vmem, sor_solve_pallas
        from ..ops.pallas.sor_blocked import (
            plan_blocking_candidates,
            sor_solve_blocked,
        )

        h, w = system.phi.shape[-2], system.phi.shape[-1]
        if sor_fits_vmem(h, w, system.phi.dtype):
            return sor_solve_pallas(system, n_iterations, params)
        for plan in plan_blocking_candidates(h, w, system.phi.dtype.itemsize):
            if _probe_blocked_plan(h, w, system.phi.dtype, plan):
                return sor_solve_blocked(system, n_iterations, params, plan)
    return sor_solve_jnp(system, n_iterations, params)
