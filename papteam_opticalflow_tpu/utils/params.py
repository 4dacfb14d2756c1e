"""Algorithm configuration for the TPU-native Coarse2Fine optical-flow engine.

The reference hardcodes every hyperparameter in C++
(``Code/Parallel/src/OpticalFlow.cpp:836-840`` — alpha, ratio, outer/inner/SOR
iteration counts; ``:462`` — omega; ``:265-266`` — epsilon; ``:33-34`` — the
interpolation / noise-model compile-time switches;
``Code/Parallel/src/Coarse2FineFlowWrapper.cpp:22`` — colType).  Here the whole
tier-2/tier-3 config surface is a single frozen dataclass that threads through
``jax.jit`` as a static argument, so every field is compile-time constant for
XLA exactly as it was compile-time constant for the C++ build.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class Interpolation(enum.Enum):
    """Per-level warp interpolation (``OpticalFlow.h:19``)."""

    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


class NoiseModel(enum.Enum):
    """Robust data-term noise model (``OpticalFlow.h:21``)."""

    GAUSSIAN_MIXTURE = "gmixture"
    LAPLACIAN = "laplacian"


class ColorType(enum.Enum):
    """Channel order for desaturation (``Image.h:32``)."""

    RGB = "rgb"
    BGR = "bgr"


@dataclasses.dataclass(frozen=True)
class FlowParams:
    """Frozen hyperparameters of the variational coarse-to-fine solver.

    Defaults reproduce the reference exactly
    (``Code/Parallel/src/OpticalFlow.cpp:836-840,462,265-266,912``).
    """

    # Regularization weight of the smoothness term.
    alpha: float = 0.012
    # Pyramid downsampling ratio (clamped to [0.4, 0.98] by the pyramid
    # builder, as in GaussianPyramid.cpp:81-83).
    ratio: float = 0.75
    # Outer fixed-point iterations at the finest level; level k runs
    # ``n_outer_fp_iterations + k`` (OpticalFlow.cpp:912).
    n_outer_fp_iterations: int = 7
    # Inner fixed-point iterations (re-weighting) per outer iteration.
    n_inner_fp_iterations: int = 1
    # SOR sweeps at the finest level; level k runs
    # ``n_sor_iterations + 3*k`` (OpticalFlow.cpp:912).
    n_sor_iterations: int = 30
    # SOR over-relaxation factor (OpticalFlow.cpp:462).
    omega: float = 1.8
    # Robust-penalty epsilon^2 for both Phi and Psi (OpticalFlow.cpp:265-266).
    varepsilon_phi: float = 1e-6
    varepsilon_psi: float = 1e-6
    # Diagonal regularizer of the SOR system: ``alpha * 0.05``
    # (OpticalFlow.cpp:515,518).
    diag_reg_scale: float = 0.05
    # Per-level warp feedback (OpticalFlow.cpp:33 sets Bilinear).
    interpolation: Interpolation = Interpolation.BILINEAR
    # Robust noise model (OpticalFlow.cpp:34 sets Lap).
    noise_model: NoiseModel = NoiseModel.LAPLACIAN
    # Channel order of 3-channel inputs (Coarse2FineFlowWrapper.cpp:22).
    color_type: ColorType = ColorType.RGB
    # Reproduce the reference's fused weighted-Laplacian border truncation
    # (OpticalFlow.cpp:746-774 drops the flux accumulation into the last
    # column / last row).  ``False`` uses the mathematically complete
    # divergence (the commented-out two-pass original, OpticalFlow.cpp:656-723).
    compat_laplacian_borders: bool = True
    # Run the per-outer-iteration Laplacian noise estimation
    # (OpticalFlow.cpp:545,609-654).  On the reference's default path the
    # estimate only feeds a `< 1e-20` guard that never fires in practice, so
    # the fast path may skip it entirely without changing results.
    estimate_laplacian_noise: bool = False
    # Linear solver for the inner system: "sor" (red-black, the reference's
    # default path) or "cg" (matrix-free conjugate gradient — the
    # SmoothFlowPDE capability the reference declares but removed,
    # Matrix.h:443-500).
    solver: str = "sor"
    # Checkerboard ordering replaces the reference's nondeterministic chaotic
    # OpenMP Gauss-Seidel (OpticalFlow.cpp:469-520) with deterministic
    # red-black sweeps; both converge to the same fixed point.
    sor_red_black: bool = True
    # Use the fused Pallas SOR kernel where the level fits in VMEM;
    # fall back to the XLA (jnp) red-black implementation otherwise.
    use_pallas_sor: bool = True
    # Ghost-zone depth of the SHARDED SOR (parallel/tiled.py): exchange a
    # ``2S``-row halo once per ``S`` sweeps instead of a 1-row halo every
    # half-sweep, cutting ICI collectives per inner iteration from
    # ``8 * n_sor`` to ``2 + 2 * ceil(n_sor / S)`` at the cost of ``4S``
    # redundant ghost rows of VPU work per shard per sweep.  Clamped per
    # level to ``h // 2`` so the exchange stays valid on small bands.
    sor_halo_sweeps: int = 8
    # Storage dtype for the pyramid/feature/warp IMAGES on the hot path
    # ("float32" or "bfloat16").  bfloat16 halves HBM traffic of the
    # image-plane passes; flow fields, warp coordinates, and the SOR system
    # always stay in the input float dtype, and the final full-resolution
    # bicubic warp uses the raw frames, so accuracy cost is bounded by the
    # ~0.4% bf16 quantization of image intensities (measured ~1e-2 px EPE
    # vs float32 — far inside the 0.1 px budget, but NOT bit-parity; keep
    # the default for oracle comparisons).
    image_dtype: str = "float32"
    # Run small pyramid levels through the fused whole-level Pallas kernel
    # (``ops/pallas/level_fused.py``): ALL outer fixed-point iterations of
    # a level — warp feedback, getDxs, system assembly, every SOR sweep —
    # in one kernel launch.  The coarse tail (levels >= 7 at 1920px) is
    # per-op-overhead-bound, ~22 ms of the r4 pair (VERDICT r4 #1); the
    # fused kernel collapses those thousands of tiny ops.  Applies only on
    # the default hot path (bilinear warp feedback, Laplacian noise model
    # without per-iteration estimation, red-black SOR); other configs keep
    # the composable op-by-op path.
    use_fused_level: bool = True
    # Trace-time unroll of the outer fixed-point loop for levels whose
    # ``n_outer <= unroll_outer_max_n`` (the FINEST levels — level k runs
    # ``7 + k`` outer iterations, so the default 8 unrolls levels 0-1).
    # Unrolling removes the ``lax.fori_loop`` iteration boundary (loop
    # carries materialize in HBM and block cross-iteration fusion) at the
    # cost of a larger trace/compile.  Measured at 1920px P15 on v5e:
    # 332.3 -> 290.7 ms/pair (threshold 8; 10/12/99 measure the same
    # 289-292 ms but compile up to 2x slower — the win saturates at the
    # two finest levels).  Results differ from the rolled loop only by
    # XLA fusion/FMA reassociation (~5e-7 px on real frames); 0 disables.
    unroll_outer_max_n: int = 8

    def __post_init__(self):
        if self.solver not in ("sor", "cg"):
            raise ValueError(
                f"FlowParams.solver must be 'sor' or 'cg', got {self.solver!r}"
            )
        if self.image_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "FlowParams.image_dtype must be 'float32' or 'bfloat16', "
                f"got {self.image_dtype!r}"
            )

    def level_schedule(self, level: int) -> Tuple[int, int, int]:
        """(n_outer, n_inner, n_sor) for pyramid level ``level``
        (0 = finest), per ``OpticalFlow.cpp:912``."""
        return (
            self.n_outer_fp_iterations + level,
            self.n_inner_fp_iterations,
            self.n_sor_iterations + 3 * level,
        )


DEFAULT_PARAMS = FlowParams()
