"""Static backend dispatch: Pallas kernels vs pure-XLA ops.

The decision is made at trace time (params are jit-static): 'auto' picks
Pallas on TPU-like platforms (incl. the emulated 'axon' PJRT) and XLA
elsewhere; 'pallas' forces the kernels (interpreter mode off-TPU, which is
how the kernel tests run on CPU).
"""

from __future__ import annotations

import jax

from tpuflow3d.params import FlowParams

_TPU_PLATFORMS = ("tpu", "axon")


def use_pallas(p: FlowParams) -> bool:
    if p.backend == "pallas":
        return True
    if p.backend == "xla":
        return False
    return jax.devices()[0].platform in _TPU_PLATFORMS


def pallas_interpret() -> bool:
    return jax.devices()[0].platform not in _TPU_PLATFORMS
