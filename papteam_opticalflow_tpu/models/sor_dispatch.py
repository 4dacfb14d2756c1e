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
        from ..ops.pallas.sor_blocked import plan_blocking, sor_solve_blocked

        h, w = system.phi.shape[-2], system.phi.shape[-1]
        if sor_fits_vmem(h, w, system.phi.dtype):
            return sor_solve_pallas(system, n_iterations, params)
        plan = plan_blocking(h, w, system.phi.dtype.itemsize)
        if plan is not None:
            return sor_solve_blocked(system, n_iterations, params, plan)
    return sor_solve_jnp(system, n_iterations, params)
