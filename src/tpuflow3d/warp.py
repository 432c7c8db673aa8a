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
import numpy as np

from tpuflow3d.grid import HaloCtx


def warp_halo(max_disp: float, interp: str = "trilinear") -> int:
    """Z halo planes needed to warp with |s_z| <= max_disp: the farthest
    integer tap is ceil(|s|)+1 for the trilinear cell, one more for the
    cubic kernel's outer taps."""
    return int(math.ceil(max_disp)) + 1 + (1 if interp == "tricubic" else 0)


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


# Volume size (bytes) above which the tricubic gather streams its output in
# Z-chunks (module constant so tests can exercise the chunked path at small
# sizes). Z-chunking bounds the gather's concurrent temporaries to one
# chunk's worth — 64 concurrent full-volume gather buffers exceed single-chip
# HBM at 256^3+, and even the rolled 16-pair tap loop faults the emulated
# chip inside the full level program (VALIDATION.md); per-chunk unrolled
# gathers keep the working set ~MBs regardless of volume size.
_TRICUBIC_ROLL_BYTES = 128 << 20

# Target bytes per streamed output chunk (~16 MB -> 64 concurrent gather
# temporaries stay under ~1 GB at f32).
_TRICUBIC_CHUNK_BYTES = 16 << 20


def _cubic_weights(f):
    """Catmull-Rom weights for taps (-1, 0, +1, +2) at fraction f in [0,1).
    Interpolating (exact at integer coords), C^1, 4-point support — the
    standard high-quality resampling kernel; reduces the O(f(1-f)) local
    averaging bias of linear interpolation to a 3rd-order error."""
    f2 = f * f
    f3 = f2 * f
    return (0.5 * (-f3 + 2.0 * f2 - f),
            0.5 * (3.0 * f3 - 5.0 * f2 + 2.0),
            0.5 * (-3.0 * f3 + 4.0 * f2 + f),
            0.5 * (f3 - f2))


def _tricubic_gather(vol: jax.Array, cz, cy, cx) -> jax.Array:
    """Tricubic (separable Catmull-Rom) sample of vol (D,H,W) at real
    coords; coords must already be within [0, dim-1]. Out-of-range taps
    clamp to the boundary (consistent with the trilinear path's
    clamp-to-edge sampling)."""
    d, h, w = vol.shape[-3:]
    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    wz = _cubic_weights(cz - z0)
    wy = _cubic_weights(cy - y0)
    wx = _cubic_weights(cx - x0)
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    out_shape = jnp.broadcast_shapes(cz.shape, cy.shape, cx.shape)
    acc = jnp.zeros(out_shape, vol.dtype)
    big = int(np.prod(out_shape)) * 4 >= _TRICUBIC_ROLL_BYTES

    def z_group(iz_val, acc, wz_val):
        zi = jnp.clip(z0 + (iz_val - 1), 0, d - 1)
        pz = jnp.zeros(out_shape, vol.dtype)
        for iy in range(4):
            yi = jnp.clip(y0 + (iy - 1), 0, h - 1)
            for ix in range(4):
                xi = jnp.clip(x0 + (ix - 1), 0, w - 1)
                pz = pz + wy[iy] * (wx[ix] * vol[zi, yi, xi])
        return acc + wz_val * pz

    if big and len(out_shape) == 3 and out_shape[0] > 1:
        # Large volumes: stream the OUTPUT in Z-chunks so only one chunk's
        # 64 tap temporaries are live at a time (each gather still reads the
        # full volume — gathers are pointwise in output coords).
        dz, hh, ww = out_shape
        plane_bytes = hh * ww * 4
        chunk = max(1, min(dz, _TRICUBIC_CHUNK_BYTES // max(plane_bytes, 1)))
        nch = -(-dz // chunk)
        czb = jnp.broadcast_to(cz, out_shape)
        cyb = jnp.broadcast_to(cy, out_shape)
        cxb = jnp.broadcast_to(cx, out_shape)

        def body(i, a):
            # Clamp the last chunk's start so every slice is full-size
            # (overlapping recompute of consistent values, not padding).
            s = jnp.minimum(i * chunk, dz - chunk)
            sl = lambda q: jax.lax.dynamic_slice_in_dim(q, s, chunk, 0)
            out = _tricubic_gather_unrolled(vol, sl(czb), sl(cyb), sl(cxb))
            return jax.lax.dynamic_update_slice_in_dim(a, out, s, 0)

        return jax.lax.fori_loop(0, nch, body, acc)
    for iz in range(4):
        acc = z_group(iz, acc, wz[iz])
    return acc


def _tricubic_gather_unrolled(vol, cz, cy, cx):
    """The small-volume (fully unrolled) tricubic gather, used per streamed
    chunk by the big-volume path."""
    d, h, w = vol.shape[-3:]
    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    wz = _cubic_weights(cz - z0)
    wy = _cubic_weights(cy - y0)
    wx = _cubic_weights(cx - x0)
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    acc = jnp.zeros(cz.shape, vol.dtype)
    for iz in range(4):
        zi = jnp.clip(z0 + (iz - 1), 0, d - 1)
        pz = jnp.zeros(cz.shape, vol.dtype)
        for iy in range(4):
            yi = jnp.clip(y0 + (iy - 1), 0, h - 1)
            for ix in range(4):
                xi = jnp.clip(x0 + (ix - 1), 0, w - 1)
                pz = pz + wy[iy] * (wx[ix] * vol[zi, yi, xi])
        acc = acc + wz[iz] * pz
    return acc


def warp_volume(i1: jax.Array, flow: jax.Array, ctx: HaloCtx = HaloCtx(),
                max_disp: float = 0.0,
                interp: str = "trilinear") -> jax.Array:
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
        gather = (_tricubic_gather if interp == "tricubic"
                  else _trilinear_gather)
        return gather(vol, cz, cy, cx)
    if ctx.axis_name is None or ctx.n_shards == 1:
        nh = 0
        vol = i1
        z0 = 0
    else:
        assert max_disp > 0.0, "sharded warp requires a flow clamp"
        nh = warp_halo(max_disp, interp)
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
    gather = (_tricubic_gather if interp == "tricubic"
              else _trilinear_gather)
    return gather(vol, cz, cy, cx)
