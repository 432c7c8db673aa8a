"""3x3x3 median filtering of flow increments.

TPU-native equivalent of the reference op ``CudaOperationMedian3D``
(SURVEY.md §4): a 27-neighborhood median applied to each component of the
flow increment after the inner solve, rejecting outliers (standard in the
Brox-family warping scheme). Boundary handling: clamp-replicated window
(SURVEY.md §10 "Median").

XLA path: stack the 27 shifted volumes and take the middle order statistic.
The Pallas path (tpuflow3d.pallas.median3) uses a selection network on VMEM
blocks instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflow3d.grid import HaloCtx, replicate_pad


def median3_op(x: jax.Array, ctx: HaloCtx, p) -> jax.Array:
    """Backend-dispatching 27-point median (Pallas on TPU, XLA elsewhere)."""
    from tpuflow3d.backend import pallas_interpret, use_pallas
    if use_pallas(p):
        from tpuflow3d.pallas.median3 import (median3_pallas,
                                              median3_pallas_fits)
        if median3_pallas_fits(x.shape):
            return median3_pallas(ctx.zpad(x, 1),
                                  interpret=pallas_interpret())
    return median3(x, ctx)


def median3(x: jax.Array, ctx: HaloCtx = HaloCtx()) -> jax.Array:
    """27-point median of a (..., D, H, W) array (leading axes mapped)."""
    xp = ctx.zpad(x, 1)
    xp = replicate_pad(replicate_pad(xp, 1, axis=-2), 1, axis=-1)
    d, h, w = x.shape[-3], x.shape[-2], x.shape[-1]
    stack = []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = jax.lax.slice_in_dim(xp, 1 + dz, 1 + dz + d, axis=-3)
                s = jax.lax.slice_in_dim(s, 1 + dy, 1 + dy + h, axis=-2)
                s = jax.lax.slice_in_dim(s, 1 + dx, 1 + dx + w, axis=-1)
                stack.append(s)
    st = jnp.stack(stack)  # (27, ..., D, H, W)
    return jnp.sort(st, axis=0)[13]
