"""tpuflow3d — TPU-native dense 3D optical flow.

A brand-new JAX/XLA/Pallas framework with the capabilities of the CUDA
research code ``axruff/cuda-flow3d`` (variational coarse-to-fine 3D optical
flow for volumetric tomography data), designed TPU-first rather than ported:

- volumes are ``jax.Array``s; the whole per-run pipeline is one ``jit``;
- the reference's op-object/param-bag runtime (``CudaOperationBase`` +
  ``OperationParameters``, see SURVEY.md §3/§4) is replaced by pure jitted
  functions plus a frozen ``FlowParams`` dataclass that is a static argument;
- the reference's out-of-core "piecewise" mode becomes true multi-chip
  Z-sharding over a ``jax.sharding.Mesh`` with ``ppermute`` halo exchange;
- hot kernels (red-black SOR sweep, fused warp+derivatives, 3x3x3 median)
  have hand-written Pallas TPU implementations.
"""

from tpuflow3d.params import FlowParams
from tpuflow3d.pipeline import compute_flow
from tpuflow3d.sharding import compute_flow_sharded, make_z_mesh

__version__ = "0.1.0"

__all__ = [
    "FlowParams",
    "compute_flow",
    "compute_flow_sharded",
    "make_z_mesh",
    "__version__",
]
