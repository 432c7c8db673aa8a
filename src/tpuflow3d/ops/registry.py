"""Op registry: introspectable catalog of the framework's device ops.

The reference runtime enumerates its CUDA ops as ``CudaOperationBase``
subclasses with Initialize/Execute/Deinitialize lifecycles and a PTX module
per op (cuda-flow3d ``src/cuda_operations/``, SURVEY.md §4). On TPU the
lifecycle is owned by XLA (trace/compile/execute), so ops are plain jitted
functions; this registry keeps the *catalog* aspect — one entry per device
op with its halo requirement and roofline byte model — for the CLI, the
benchmark harness, and per-op testing. Compute never dispatches through
strings; the registry references the same functions the pipeline calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from tpuflow3d import derivatives as _derivatives
from tpuflow3d import median as _median
from tpuflow3d import pyramid as _pyramid
from tpuflow3d import solver as _solver
from tpuflow3d import warp as _warp


@dataclass(frozen=True)
class OpSpec:
    """One device op: function, Z-halo need, and an HBM byte model
    (bytes per voxel per invocation, for roofline reporting)."""
    name: str
    fn: Callable
    z_halo: str              # human-readable margin rule (SURVEY.md §5.3)
    bytes_per_voxel: float   # f32 read+write model for roofline fractions
    reference: str           # counterpart op in cuda-flow3d (SURVEY.md §4)
    doc: str = ""
    # Layout-dependent byte models, when the executing kernel varies:
    # bytes_per_voxel is the PRODUCTION layout's number; variants names the
    # others so --list-ops doesn't overstate (e.g. solve runs packed only
    # for even W >= 256 on real TPUs with a Pallas backend).
    byte_variants: dict | None = None


OPS: dict[str, OpSpec] = {}


def _register(spec: OpSpec) -> None:
    OPS[spec.name] = spec


def get_op(name: str) -> OpSpec:
    return OPS[name]


_register(OpSpec(
    name="convolution",
    fn=_pyramid.smooth,
    z_halo="kernel radius = ceil(3*sigma)",
    bytes_per_voxel=8.0 * 3,  # read+write per separable axis pass (fused)
    reference="CudaOperationConvolution3D",
    doc="Separable Gaussian smoothing (presmooth + pyramid antialias)."))

_register(OpSpec(
    name="resample",
    fn=_pyramid.resize3,
    z_halo="ceil(in/out) + 1 planes",
    bytes_per_voxel=8.0,
    reference="CudaOperationResample3D",
    doc="Trilinear resample at arbitrary scale; flow upsample scales values "
        "by the per-axis dim ratio."))

_register(OpSpec(
    name="registration",
    fn=_warp.warp_volume,
    z_halo="ceil(max |flow_z|) + 1 planes (+1 for tricubic)",
    bytes_per_voxel=4 + 12 + 4,  # read I1 + 3 flow comps, write warped
    byte_variants={"trilinear": 4 + 12 + 4,
                   # 64-tap Catmull-Rom: same streaming traffic (taps hit
                   # cache/VMEM lines already fetched), +1 halo plane
                   "tricubic": 4 + 12 + 4},
    reference="CudaOperationRegistration",
    doc="Backward warp of the moving volume by the current flow: trilinear "
        "(reference behavior) or tricubic Catmull-Rom (params.interp; "
        "breaks the trilinear interpolation-bias EPE floor)."))

def _warp_grad(i1, flow, i0, ctx, max_disp, interp="trilinear"):
    from tpuflow3d.pallas.warp_grad import warp_grad_pallas
    return warp_grad_pallas(i1, flow, i0, ctx, max_disp=max_disp,
                            interp=interp)


_register(OpSpec(
    name="warp_derivatives",
    fn=_warp_grad,
    z_halo="ceil(max |flow_z|) + 1 planes (+1 tricubic)",
    bytes_per_voxel=4 + 12 + 4 + 16,  # read i1+flow+i0, write g(3)+It
    reference="registration + derivative kernels (one fused HBM pass here; "
              "BASELINE.json 'warp+derivative fusion into one Pallas pass')",
    doc="Fused backward warp + spatiotemporal derivative stencils in one "
        "HBM pass (the production hot path; bench.py sources its byte "
        "model here). interp='tricubic' swaps tent select-interpolate "
        "weights for Catmull-Rom: identical HBM traffic, ~(2c+4)^3 vs "
        "(2c+2)^3 VPU terms (512 vs 216 at clamp 2) — VPU-compute-bound "
        "either way.",
    byte_variants={"trilinear": float(4 + 12 + 4 + 16),
                   # Same streaming traffic; the tricubic cost is VPU
                   # terms, not bytes (see doc).
                   "tricubic": float(4 + 12 + 4 + 16)}))

_register(OpSpec(
    name="derivatives",
    fn=_derivatives.derivatives,
    z_halo="1 plane",
    bytes_per_voxel=8 + 16 + 4,  # read I0,I1w; write g(3)+It
    reference="derivative stencil kernels (part of solve pipeline)",
    doc="Spatiotemporal central-difference stencils on (I0 + warped I1)/2."))

_register(OpSpec(
    name="grad_constancy",
    fn=_derivatives.grad_constancy_terms,
    z_halo="2 planes (two chained central diffs; 4 at deriv_order=4)",
    bytes_per_voxel=8 + 36 + 12,  # read I0,I1w; write gc_g(9)+gc_it(3)
    reference="none (capability extension: Brox 2004 gradient constancy; "
              "active when params.gamma > 0)",
    doc="Second-derivative linearization terms of the gradient-constancy "
        "assumption; feeds the full symmetric 3x3 point solve "
        "(solver.SolveTerms.ainv)."))

def _solve_bytes(packed: bool) -> float:
    # Single source of truth with the bench roofline (utils/roofline.py):
    # the production color-packed Pallas kernel streams 36 B/voxel per
    # half-sweep (flat compact-terms: 56; XLA fallback: 80).
    from tpuflow3d.utils.roofline import SweepByteModel
    return SweepByteModel(packed=packed).per_half_sweep


_register(OpSpec(
    name="solve",
    fn=_solver.sor_halfsweep,
    z_halo="1 plane per half-sweep (ppermute each sweep)",
    bytes_per_voxel=_solve_bytes(packed=True),
    reference="CudaOperationSolve3D",
    doc="Red-black SOR half-sweep on the coupled Euler-Lagrange system "
        "(Sherman-Morrison pointwise solve). bytes_per_voxel is the "
        "packed-layout production number; solver.solve_increment picks the "
        "layout per level (packed needs even W, and W >= 256 on real "
        "TPUs).",
    byte_variants={"packed (even W >= 256, Pallas)": _solve_bytes(True),
                   "flat (Pallas)": _solve_bytes(False),
                   "xla": 80.0,
                   # Gradient-constancy (gamma > 0) general-SPD sweeps:
                   # packed (pallas/sor_gc_packed.py, production at even
                   # W >= 256): active du 6r+6w, other du 6, c 6, ainv 12,
                   # psi_s both colors 4 = 40 B/voxel; flat
                   # (pallas/sor_gc.py): du 12r+12w, c 12, ainv 24,
                   # psi_s 4 = 64 B. The XLA twin additionally streams the
                   # 6 materialized weight volumes.
                   "gc packed (gamma > 0, even W >= 256)": 40.0,
                   "gc flat (gamma > 0, Pallas)": 64.0,
                   "gc xla": 88.0,
                   # terms_dtype=bfloat16 (storage-only c/g downcast;
                   # kernels upcast in VMEM): c 12 -> 6 halves the rhs
                   # stream of both packed layouts.
                   "packed bf16 terms": 30.0,
                   "gc packed bf16 terms": 34.0}))

_register(OpSpec(
    name="median",
    fn=_median.median3,
    z_halo="1 plane",
    bytes_per_voxel=24.0,
    reference="CudaOperationMedian3D",
    doc="3x3x3 median filter on flow increments."))

def _statistics(x):
    """Global volume statistics (min/max/mean/L2), psum-able per shard."""
    import jax.numpy as jnp
    return {"min": jnp.min(x), "max": jnp.max(x), "mean": jnp.mean(x),
            "l2": jnp.sqrt(jnp.sum(x * x))}


_register(OpSpec(
    name="statistics",
    fn=_statistics,
    z_halo="none",
    bytes_per_voxel=4.0,
    reference="stat/min-max helper ops (intensity normalization, "
              "diagnostics)",
    doc="Global min/max/mean/norm reductions (normalization prescan uses "
        "the native flowio fast path host-side, lax.pmin/pmax sharded)."))

_register(OpSpec(
    name="add",
    fn=lambda flow, du: flow + du,
    z_halo="none",
    bytes_per_voxel=36.0,
    reference="CudaOperationAdd3D",
    doc="Flow accumulation s += ds (fused into the level loop by XLA)."))
