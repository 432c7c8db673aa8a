"""Backward trilinear warping ("registration").

TPU-native equivalent of the reference op ``CudaOperationRegistration``
(cuda-flow3d, SURVEY.md §4): Ĩ1(x) = I1(x + s(x)) by backward trilinear
interpolation with clamp-to-edge sampling. TPUs have no texture unit, so the
gather is expressed as a JAX trilinear gather here (XLA path) and as a
bounded-displacement shift-select kernel in ``tpuflow3d.pallas.warp_grad``.

In Z-sharded runs the displacement must be bounded (FlowParams.flow_clamp),
which bounds the halo margin exactly like the reference's piecewise-mode warp
margin (ceil(max |s_z|) + 1 planes, SURVEY.md §5.3).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tpuflow3d.grid import HaloCtx


def warp_halo(max_disp: float) -> int:
    """Z halo planes needed to warp with |s_z| <= max_disp."""
    return int(math.ceil(max_disp)) + 1


def _trilinear_gather(vol: jax.Array, cz, cy, cx) -> jax.Array:
    """Trilinear sample of vol (D,H,W) at real coords; coords must already
    be within [0, dim-1] (clamped by the caller)."""
    d, h, w = vol.shape[-3:]
    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fz, fy, fx = cz - z0, cy - y0, cx - x0
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    def at(zi, yi, xi):
        return vol[zi, yi, xi]

    c000 = at(z0, y0, x0)
    c001 = at(z0, y0, x1)
    c010 = at(z0, y1, x0)
    c011 = at(z0, y1, x1)
    c100 = at(z1, y0, x0)
    c101 = at(z1, y0, x1)
    c110 = at(z1, y1, x0)
    c111 = at(z1, y1, x1)

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def warp_volume(i1: jax.Array, flow: jax.Array, ctx: HaloCtx = HaloCtx(),
                max_disp: float = 0.0) -> jax.Array:
    """Backward-warp the (local slab of the) moving volume by ``flow``.

    i1: (D, H, W) local slab; flow: (3, D, H, W) local flow (z, y, x
    displacements in voxels of the current level). In sharded contexts
    ``max_disp`` must bound |flow_z| (enforced upstream via flow_clamp).
    """
    d_local, h, w = i1.shape
    d_global = ctx.d_global(d_local)
    if ctx.is_window:
        # Streamed chunk (piecewise mode): the slab already carries its
        # margin planes; clamp to the TRUE volume in the slab frame, then to
        # the slab itself (margin voxels may contaminate, the driver crops).
        nh = 0
        vol = i1
        z0 = ctx.z0(d_local)
        zi = jnp.arange(d_local, dtype=flow.dtype).reshape(d_local, 1, 1)
        yi = jnp.arange(h, dtype=flow.dtype).reshape(1, h, 1)
        xi = jnp.arange(w, dtype=flow.dtype).reshape(1, 1, w)
        cz = jnp.clip(jnp.clip(zi + flow[0], 0.0 - z0, (d_global - 1) - z0),
                      0, d_local - 1)
        cy = jnp.clip(yi + flow[1], 0.0, h - 1)
        cx = jnp.clip(xi + flow[2], 0.0, w - 1)
        return _trilinear_gather(vol, cz, cy, cx)
    if ctx.axis_name is None or ctx.n_shards == 1:
        nh = 0
        vol = i1
        z0 = 0
    else:
        assert max_disp > 0.0, "sharded warp requires a flow clamp"
        nh = warp_halo(max_disp)
        vol = ctx.zpad(i1, nh)
        z0 = ctx.z0(d_local)

    zi = jnp.arange(d_local, dtype=flow.dtype).reshape(d_local, 1, 1)
    yi = jnp.arange(h, dtype=flow.dtype).reshape(1, h, 1)
    xi = jnp.arange(w, dtype=flow.dtype).reshape(1, 1, w)
    # Clip in the *local* frame with global bounds so interior arithmetic is
    # identical between sharded and unsharded runs (bitwise, away from edges).
    cz = jnp.clip(zi + flow[0], 0.0 - z0, (d_global - 1) - z0) + nh
    cy = jnp.clip(yi + flow[1], 0.0, h - 1)
    cx = jnp.clip(xi + flow[2], 0.0, w - 1)
    return _trilinear_gather(vol, cz, cy, cx)
