"""Typed, frozen flow parameters.

TPU-native replacement for the reference's untyped ``OperationParameters``
key->pointer bag (cuda-flow3d ``src/data_types/operation_parameters.h``,
SURVEY.md §4): a hashable frozen dataclass passed as a *static* jit argument,
so every tunable is a compile-time constant for XLA and Pallas.

The parameter *set* mirrors what the reference exposes (SURVEY.md §2):
alpha, pyramid levels + scale factor, warp iterations, inner (nonlinearity)
iterations, solver sweeps, relaxation omega, Charbonnier epsilons, Gaussian
sigma, median filtering, plus TPU-specific knobs (backend, sharding multiple,
flow clamp for bounded-halo warping).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Literal

Penalizer = Literal["charbonnier", "quadratic"]
Solver = Literal["sor", "jacobi", "multigrid"]
Backend = Literal["auto", "xla", "pallas"]


@dataclass(frozen=True)
class FlowParams:
    """All tunables of the variational solver. Hashable; jit-static."""

    # --- energy functional ---
    alpha: float = 0.05         # smoothness weight (for [0,1]-normalized
                                # intensities; tuned on the config ladder)
    penalizer_data: Penalizer = "charbonnier"
    penalizer_smooth: Penalizer = "charbonnier"
    eps_data: float = 1e-3      # Charbonnier epsilon, data term
    eps_smooth: float = 1e-3    # Charbonnier epsilon, smoothness term
    gamma: float = 0.0          # gradient-constancy weight (Brox et al.
                                # 2004): adds gamma*Psi(|grad I1(x+s) -
                                # grad I0(x)|^2) to the data term, making
                                # the match robust to additive intensity
                                # changes between frames. 0 = off
                                # (reference behavior). gamma > 0 solves
                                # the full symmetric 3x3 point system
                                # (pallas/sor_gc.py or the XLA path)
                                # instead of Sherman-Morrison.
    penalizer_grad: Penalizer = "charbonnier"
    eps_grad: float = 1e-3      # Charbonnier epsilon, gradient-constancy

    # --- coarse-to-fine pyramid ---
    levels: int = 4             # max pyramid levels (incl. full resolution)
    scale_factor: float = 0.5   # eta per axis, in (0, 0.95]
    min_dim: int = 8            # stop coarsening when any dim would go below
    presmooth_sigma: float = 0.8    # Gaussian presmooth of the inputs
    aa_sigma_factor: float = 0.6    # anti-alias sigma = factor*sqrt(eta^-2 - 1)

    # --- iteration counts ---
    warps: int = 3              # outer (warping) iterations per level
    inner_iterations: int = 3   # nonlinearity (psi-weight) updates per warp
    sweeps: int = 20            # solver sweeps per inner iteration (cap)
    solver: Solver = "sor"      # red-black SOR, (damped) Jacobi, or
                                # geometric multigrid V-cycles on the
                                # linearized system (mgsolver.py — a
                                # convergence-rate EXTENSION over the
                                # reference's plain SOR; in-core +
                                # sharded... see mgsolver docstring)
    omega: float = 1.9          # SOR relaxation; Jacobi uses min(omega, 1.0)
    # --- multigrid controls (solver="multigrid") ---
    mg_cycles: int = 2          # V-cycles per nonlinearity update (cap;
                                # residual_tol stops early too)
    mg_pre: int = 2             # pre-smoothing red-black sweeps per level
    mg_post: int = 2            # post-smoothing sweeps per level
    mg_coarse_sweeps: int = 16  # sweeps on the coarsest MG grid
    mg_omega: float = 1.3       # smoother relaxation (high-omega SOR is a
                                # poor MG smoother: it trades smoothing
                                # factor for low-frequency speed the
                                # coarse grid already provides)
    residual_tol: float = 0.0   # stop sweeping early once the mean update
                                # norm (psum across shards) falls below this
                                # (0 = always run all sweeps)

    # --- discretization ---
    deriv_order: int = 2        # image-gradient stencil: 2 (3-pt central)
                                # or 4 (5-pt, SURVEY.md §11 risk item 3);
                                # smoothness-term gradients stay 2nd order
                                # (consistent with the 6-neighbor stencil)
    interp: str = "trilinear"   # warp sampling: 'trilinear' (reference
                                # behavior, Pallas-fusable) or 'tricubic'
                                # (Catmull-Rom; cuts the sub-voxel
                                # interpolation bias that sets the converged
                                # EPE floor on textured volumes — XLA gather
                                # path, needs one extra halo plane)

    # --- post-processing ---
    median: bool = True         # 3x3x3 median filter on flow increments
    flow_clamp: float = 0.0     # clamp |flow component| per level (0 = off);
                                # also the bound used by the Pallas warp halo

    # --- numerics / execution ---
    normalize: bool = True      # rescale intensities to [0, 1] jointly
    dtype: str = "float32"      # solver dtype (f32; EPE budget excludes bf16)
    terms_dtype: str = "float32"  # storage dtype for the sweep constants
                                # (c, g): "bfloat16" cuts sweep HBM traffic
                                # ~27% at ~1e-3-voxel EPE cost (SURVEY.md
                                # §10: bf16 as a storage optimization only;
                                # du and all arithmetic stay f32)
    backend: Backend = "auto"   # 'pallas' on TPU, 'xla' elsewhere when 'auto'
    sweep_layout: str = "packed"  # Pallas SOR data layout: 'packed' stores
                                # du/terms checkerboard-split by color (36 vs
                                # 56 B/voxel per half-sweep, all VPU lanes
                                # active); 'flat' = full-layout kernel
    z_multiple: int = 1         # round every level's Z dim up to a multiple
                                # (set to the Z-mesh size for sharded runs)
    track_residuals: bool = False  # record per-sweep residual norms

    def __post_init__(self):
        if not (0.0 < self.scale_factor <= 0.95):
            raise ValueError("scale_factor must be in (0, 0.95]")
        if not (0.0 < self.omega < 2.0):
            raise ValueError("omega must be in (0, 2)")
        if self.levels < 1:
            raise ValueError("levels must be >= 1")
        if self.alpha <= 0.0:
            raise ValueError("alpha must be > 0")
        if self.gamma < 0.0:
            raise ValueError("gamma must be >= 0")
        if self.z_multiple < 1:
            raise ValueError("z_multiple must be >= 1")
        if self.sweeps < 1 or self.warps < 1 or self.inner_iterations < 1:
            raise ValueError("iteration counts must be >= 1")
        if self.sweep_layout not in ("packed", "flat"):
            raise ValueError("sweep_layout must be 'packed' or 'flat'")
        if self.deriv_order not in (2, 4):
            raise ValueError("deriv_order must be 2 or 4")
        if self.interp not in ("trilinear", "tricubic"):
            raise ValueError("interp must be 'trilinear' or 'tricubic'")
        if self.solver not in ("sor", "jacobi", "multigrid"):
            raise ValueError("solver must be 'sor', 'jacobi' or 'multigrid'")
        if self.solver == "multigrid":
            if min(self.mg_cycles, self.mg_coarse_sweeps) < 1 or \
                    min(self.mg_pre, self.mg_post) < 0:
                raise ValueError("multigrid iteration counts out of range")
            if self.mg_cycles > self.sweeps:
                raise ValueError("mg_cycles must be <= sweeps (the "
                                 "residual-slot width per inner iteration)")
            if not (0.0 < self.mg_omega < 2.0):
                raise ValueError("mg_omega must be in (0, 2)")

    # ---- derived quantities (all static) ----

    def aa_sigma(self) -> float:
        """Anti-aliasing sigma applied before each pyramid downsample."""
        eta = self.scale_factor
        return self.aa_sigma_factor * math.sqrt(max(eta ** -2 - 1.0, 0.0))

    def jacobi_omega(self) -> float:
        return min(self.omega, 1.0)

    def level_shapes(self, shape: tuple[int, int, int]) -> list[tuple[int, int, int]]:
        """Per-level (D, H, W), fine -> coarse, honoring min_dim/z_multiple.

        Level dims follow the reference's repeated-resample convention
        (dims_{l+1} = ceil(dims_l * eta), SURVEY.md §2 "Pyramid"), except Z is
        rounded up to ``z_multiple`` so Z-sharded and unsharded runs use
        identical discretizations.
        """
        zm = self.z_multiple
        d, h, w = shape
        d = zm * ((d + zm - 1) // zm)
        shapes = [(d, h, w)]
        for _ in range(self.levels - 1):
            d2 = math.ceil(d * self.scale_factor)
            h2 = math.ceil(h * self.scale_factor)
            w2 = math.ceil(w * self.scale_factor)
            d2 = zm * ((d2 + zm - 1) // zm)
            if min(d2, h2, w2) < self.min_dim or max(d2, h2, w2) < 2:
                break
            if (d2, h2, w2) == (d, h, w):
                break
            shapes.append((d2, h2, w2))
            d, h, w = d2, h2, w2
        return shapes

    def replace(self, **kw) -> "FlowParams":
        return dataclasses.replace(self, **kw)


# Presets mirroring the driver's config ladder (BASELINE.json:7-11).
PRESETS: dict[str, FlowParams] = {
    "ladder64": FlowParams(levels=3, scale_factor=0.5, warps=3,
                           inner_iterations=3, sweeps=20),
    "ladder128": FlowParams(levels=4, scale_factor=0.5, warps=3,
                            inner_iterations=3, sweeps=20),
    "ladder256": FlowParams(levels=5, scale_factor=0.5, warps=3,
                            inner_iterations=3, sweeps=20),
    "ladder512": FlowParams(levels=6, scale_factor=0.5, warps=3,
                            inner_iterations=3, sweeps=20, z_multiple=8),
    "ladder1024": FlowParams(levels=7, scale_factor=0.5, warps=3,
                             inner_iterations=3, sweeps=20, z_multiple=8),
    # r5: the accuracy-record configuration as a named preset (the
    # STUDY gate winner: tricubic fused warp + multigrid + early stop —
    # 256^3 EPE 3.4e-4 in-core, 384^3 EPE 2.0e-4 sharded; levels sized
    # for >= 256^3, override --levels for smaller volumes). The -bf16
    # twin stores sweep constants bfloat16 (certified EPE-unchanged,
    # STUDY_256 warps8_mg_tricubic_bf16; ~17% less sweep HBM traffic).
    "accurate": FlowParams(levels=5, scale_factor=0.5, warps=8,
                           inner_iterations=3, sweeps=20,
                           solver="multigrid", mg_cycles=3,
                           residual_tol=1e-6, interp="tricubic",
                           flow_clamp=2.0),
    "accurate-bf16": FlowParams(levels=5, scale_factor=0.5, warps=8,
                                inner_iterations=3, sweeps=20,
                                solver="multigrid", mg_cycles=3,
                                residual_tol=1e-6, interp="tricubic",
                                flow_clamp=2.0, terms_dtype="bfloat16"),
}
