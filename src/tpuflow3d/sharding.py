"""Multi-chip Z-sharded execution.

This is the TPU-native replacement for the reference's out-of-core
"piecewise" mode (``OpticalFlowP3D`` streaming Z-chunks through one GPU,
SURVEY.md §5.3): the volume is sharded along Z over a 1-D
``jax.sharding.Mesh``; every stencil/warp/resample op obtains its margin
planes by collective-permute from the neighboring shard (grid.HaloCtx), and
residual/statistics reductions are ``psum``s (BASELINE.json:5). ICI carries
the 2-plane halos each SOR half-sweep; volumes never leave device memory.

The math is the SAME code as the unsharded path (pipeline.compute_flow_impl)
run under ``jax.shard_map`` with a sharded HaloCtx — sharded == unsharded is
structural (SURVEY.md §6 tier 4 gate).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuflow3d.grid import HaloCtx
from tpuflow3d.params import FlowParams
from tpuflow3d.pipeline import compute_flow_impl

Z_AXIS_NAME = "z"

# Sharded runs need a static displacement bound: it sizes the warp's Z halo
# (ceil(clamp)+1 planes, like the reference's piecewise warp margin). The
# clamp caps the maximum recoverable motion at the finest level, so raise
# FlowParams.flow_clamp for large motions — halo exchange cost grows with
# it linearly, accuracy does not degrade otherwise.
DEFAULT_FLOW_CLAMP = 4.0


def make_z_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh along which volumes are Z-sharded."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (Z_AXIS_NAME,))


def prepare_params(params: FlowParams, n_shards: int) -> FlowParams:
    """Make params shard-compatible: every level's Z dim a multiple of the
    mesh size, and a positive flow clamp (bounds the warp halo)."""
    if params.z_multiple % n_shards != 0:
        params = params.replace(
            z_multiple=params.z_multiple * n_shards
            // math.gcd(params.z_multiple, n_shards))
    if params.flow_clamp <= 0.0:
        params = params.replace(flow_clamp=DEFAULT_FLOW_CLAMP)
    return params


def _sharded_fn(params: FlowParams, mesh: Mesh, diagnostics: bool):
    n = mesh.shape[Z_AXIS_NAME]
    ctx = HaloCtx(axis_name=Z_AXIS_NAME, n_shards=n)
    vol_spec = P(Z_AXIS_NAME, None, None)
    flow_spec = P(None, Z_AXIS_NAME, None, None)
    out_specs = (flow_spec, P()) if diagnostics else flow_spec

    def fn(i0, i1):
        return compute_flow_impl(i0, i1, params, ctx, diagnostics)

    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(vol_spec, vol_spec), out_specs=out_specs,
        check_vma=False,
    ))


def shard_volume(vol, mesh: Mesh):
    """Device-put a (D, H, W) volume Z-sharded over the mesh."""
    return jax.device_put(vol, NamedSharding(mesh, P(Z_AXIS_NAME, None, None)))


def compute_flow_sharded(i0, i1, params: FlowParams = FlowParams(),
                         mesh: Mesh | None = None,
                         diagnostics: bool = False):
    """Z-sharded dense 3D optical flow over a device mesh.

    i0/i1: (D, H, W) with D divisible by the mesh size (pad upstream via
    volume.pad_to_multiple if needed). Returns (3, D, H, W) flow sharded
    along Z (axis 1).
    """
    if mesh is None:
        mesh = make_z_mesh()
    n = mesh.shape[Z_AXIS_NAME]
    params = prepare_params(params, n)
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)
    if i0.shape[-3] % n != 0:
        raise ValueError(
            f"Z extent {i0.shape[-3]} not divisible by mesh size {n}; "
            "pad with volume.pad_to_multiple first")
    i0 = shard_volume(i0, mesh)
    i1 = shard_volume(i1, mesh)
    return _sharded_fn(params, mesh, diagnostics)(i0, i1)
