"""Gaussian smoothing, trilinear resampling, and coarse-to-fine pyramids.

TPU-native equivalents of the reference ops ``CudaOperationConvolution3D``
(separable Gaussian presmooth/antialias) and ``CudaOperationResample3D``
(trilinear up/downsample at arbitrary scale factor, with flow-value scaling
on upsample) — SURVEY.md §4. Implemented as fused shift-multiply-add chains
and plane gathers that XLA maps onto the VPU; Z-axis margins go through
``HaloCtx.zpad`` so the same code runs unsharded or Z-sharded (the sharded
case replaces the reference's piecewise chunk margins, SURVEY.md §5.3).

Resampling convention: half-pixel centers — output index i samples input
coordinate (i + 0.5) * (in/out) - 0.5, clipped (clamp/Neumann edges), then
linear interpolation per axis (separable => trilinear).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow3d.grid import HaloCtx, Z_AXIS, neighbor_slices, replicate_pad
from tpuflow3d.params import FlowParams


def gaussian_kernel1d(sigma: float) -> np.ndarray:
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def smooth(x: jax.Array, sigma: float, ctx: HaloCtx = HaloCtx()) -> jax.Array:
    """Separable Gaussian smoothing with Neumann (replicate) boundaries."""
    if sigma <= 0.0:
        return x
    k = gaussian_kernel1d(sigma)
    r = (len(k) - 1) // 2

    # z axis: halo-aware
    xp = ctx.zpad(x, r)
    acc = None
    for j, w in enumerate(k):
        term = w * neighbor_slices(xp, r, Z_AXIS, j - r)
        acc = term if acc is None else acc + term
    x = acc

    # y, x axes: local replicate pad
    for axis in (-2, -1):
        xp = replicate_pad(x, r, axis=axis)
        acc = None
        for j, w in enumerate(k):
            term = w * neighbor_slices(xp, r, axis, j - r)
            acc = term if acc is None else acc + term
        x = acc
    return x


def _axis_coords(out_len_local: int, scale: float, z0_out,
                 dtype=jnp.float32):
    """Half-pixel source coordinates for a local output window: output index
    i (local) at global offset z0_out samples global input coordinate
    (i + z0_out + 0.5) * scale - 0.5, with scale = in_global/out_global."""
    i = jnp.arange(out_len_local, dtype=dtype)
    c = (i + z0_out + 0.5) * jnp.asarray(scale, dtype) - 0.5
    return c


def resize_axis_local(x: jax.Array, out_len: int, axis: int) -> jax.Array:
    """Linear resize along a fully-local axis (y or x)."""
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    c = _axis_coords(out_len, in_len / out_len, 0)
    c = jnp.clip(c, 0.0, in_len - 1)
    i0 = jnp.floor(c).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_len - 1)
    f = c - i0
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    fshape = [1] * x.ndim
    fshape[axis] = out_len
    f = f.reshape(fshape)
    return a * (1.0 - f) + b * f


def resize_z_window(xp: jax.Array, out_len: int, z0_out, z0_in, nh: int,
                    scale: float, in_global: int) -> jax.Array:
    """Core windowed Z resize: xp is an input window padded by nh planes
    whose plane 0 corresponds to global input plane (z0_in - nh); produces
    ``out_len`` output planes starting at global output plane z0_out.
    Shared by the sharded (equal-shard) and out-of-core (streamed chunk)
    paths so their numerics are identical."""
    c = _axis_coords(out_len, scale, z0_out)
    c = jnp.clip(c, 0.0, in_global - 1)
    i0g = jnp.floor(c).astype(jnp.int32)
    i1g = jnp.minimum(i0g + 1, in_global - 1)
    f = c - i0g
    i0 = i0g - z0_in + nh  # indices into the padded window
    i1 = i1g - z0_in + nh
    # mode="clip": indices are in range by the nh bound; clip (instead of
    # JAX's default NaN fill) so an off-by-one can't silently poison a run.
    a = jnp.take(xp, i0, axis=Z_AXIS, mode="clip")
    b = jnp.take(xp, i1, axis=Z_AXIS, mode="clip")
    fshape = [1] * xp.ndim
    fshape[Z_AXIS] = out_len
    f = f.reshape(fshape)
    return a * (1.0 - f) + b * f


def resize_z(x: jax.Array, out_len_global: int, ctx: HaloCtx) -> jax.Array:
    """Linear resize along the (possibly sharded) Z axis.

    Output Z length must be divisible by the shard count (guaranteed by
    FlowParams.z_multiple == mesh size in sharded runs).
    """
    d_local = x.shape[Z_AXIS]
    in_global = ctx.d_global(d_local)
    if in_global == out_len_global:
        return x
    assert out_len_global % ctx.n_shards == 0
    out_local = out_len_global // ctx.n_shards
    scale = in_global / out_len_global
    nh = int(math.ceil(scale)) + 1

    xp = ctx.zpad(x, nh)
    z0_out = ctx.shard_index() * out_local
    z0_in = ctx.shard_index() * d_local
    return resize_z_window(xp, out_local, z0_out, z0_in, nh, scale,
                           in_global)


def resize3(x: jax.Array, out_shape_global: tuple[int, int, int],
            ctx: HaloCtx = HaloCtx()) -> jax.Array:
    """Trilinear resize of a (..., D, H, W) array to a global (D, H, W)."""
    d, h, w = out_shape_global
    x = resize_z(x, d, ctx)
    x = resize_axis_local(x, h, axis=-2)
    x = resize_axis_local(x, w, axis=-1)
    return x


def build_pyramid(x: jax.Array, shapes: list[tuple[int, int, int]],
                  params: FlowParams, ctx: HaloCtx = HaloCtx()) -> list[jax.Array]:
    """Smooth + resample pyramid, fine -> coarse. ``shapes`` are global
    per-level shapes from FlowParams.level_shapes (shapes[0] == x's global
    shape)."""
    out = [x]
    sigma = params.aa_sigma()
    for shp in shapes[1:]:
        x = smooth(x, sigma, ctx)
        x = resize3(x, shp, ctx)
        out.append(x)
    return out


def upsample_flow(flow: jax.Array, out_shape_global: tuple[int, int, int],
                  ctx: HaloCtx = HaloCtx()) -> jax.Array:
    """Upsample a (3, D, H, W) flow field to the next finer level and scale
    the vector components by the actual per-axis dimension ratio (SURVEY.md
    §10 "Pyramid": NOT the nominal 1/eta, avoiding ceil drift)."""
    in_shape = (flow.shape[Z_AXIS] * ctx.n_shards, flow.shape[-2], flow.shape[-1])
    up = resize3(flow, out_shape_global, ctx)
    ratios = jnp.asarray([out_shape_global[i] / in_shape[i] for i in range(3)],
                         up.dtype).reshape(3, 1, 1, 1)
    return up * ratios
