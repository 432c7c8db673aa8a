"""Hand-written Pallas TPU kernels for the hot ops (SURVEY.md §9 Stage 2).

These replace the reference's CUDA kernels (cuda-flow3d ``src/kernels``/
``src/cuda_operations``) on the paths where XLA alone does not reach the
HBM roofline: the red-black SOR sweep, the fused warp+derivative pass, and
the 3x3x3 median. Each kernel has a pure-JAX twin in the parent package
that serves as its bit-tolerance oracle (SURVEY.md §6 tier 2).
"""

from tpuflow3d.pallas.sor import sor_halfsweep_pallas

__all__ = ["sor_halfsweep_pallas"]
