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

import functools
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


@functools.lru_cache(maxsize=16)
def _sharded_fn(params: FlowParams, mesh: Mesh, diagnostics: bool,
                comm_ablate: bool = False):
    # Memoized so repeated same-config solves (time-series mode, resumed
    # distributed runs) reuse one jit wrapper — and therefore one compiled
    # executable — instead of re-tracing per pair.
    n = mesh.shape[Z_AXIS_NAME]
    ctx = HaloCtx(axis_name=Z_AXIS_NAME, n_shards=n,
                  comm_ablate=comm_ablate)
    vol_spec = P(Z_AXIS_NAME, None, None)
    flow_spec = P(None, Z_AXIS_NAME, None, None)
    out_specs = (flow_spec, P()) if diagnostics else flow_spec

    def fn(i0, i1):
        return compute_flow_impl(i0, i1, params, ctx, diagnostics)

    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(vol_spec, vol_spec), out_specs=out_specs,
        check_vma=False,
    ))


@functools.lru_cache(maxsize=64)
def _sharded_prep_fn(params: FlowParams, mesh: Mesh, n_levels: int):
    """Pyramid build as a jitted shard_map, memoized like _sharded_fn so
    repeated same-config checkpointed/timed solves (each pair of a --frames
    series) reuse one wrapper — and so one compiled executable per shape —
    instead of re-tracing per pair."""
    from tpuflow3d.pipeline import prepare_pyramids

    ctx = HaloCtx(axis_name=Z_AXIS_NAME, n_shards=mesh.shape[Z_AXIS_NAME])
    vol_spec = P(Z_AXIS_NAME, None, None)
    return jax.jit(jax.shard_map(
        lambda a, b: prepare_pyramids(a, b, params, ctx)[:2],
        mesh=mesh, in_specs=(vol_spec, vol_spec),
        out_specs=([vol_spec] * n_levels, [vol_spec] * n_levels),
        check_vma=False))


@functools.lru_cache(maxsize=128)
def _sharded_level_fn(params: FlowParams, mesh: Mesh, gshape: tuple,
                      li: int):
    """One pyramid level (solve + upsample-to-next + clamp) as a jitted
    shard_map, memoized per (params, mesh, global shape, level): the
    checkpointed/timed driver calls this once per level per pair, and a
    fresh closure each time would force a full retrace + XLA recompile of
    an identical program (minutes per level on TPU for a long 4D series)."""
    from tpuflow3d.pipeline import solve_level
    from tpuflow3d.pyramid import upsample_flow

    ctx = HaloCtx(axis_name=Z_AXIS_NAME, n_shards=mesh.shape[Z_AXIS_NAME])
    vol_spec = P(Z_AXIS_NAME, None, None)
    flow_spec = P(None, Z_AXIS_NAME, None, None)
    shapes = params.level_shapes(gshape)

    def fn(i0l, i1l, fl):
        fl, _ = solve_level(i0l, i1l, fl, params, ctx)
        if li > 0:
            fl = upsample_flow(fl, shapes[li - 1], ctx)
            if params.flow_clamp > 0.0:
                fl = jnp.clip(fl, -params.flow_clamp, params.flow_clamp)
        return fl

    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(vol_spec, vol_spec, flow_spec),
        out_specs=flow_spec, check_vma=False))


def shard_volume(vol, mesh: Mesh):
    """Device-put a (D, H, W) volume Z-sharded over the mesh."""
    return jax.device_put(vol, NamedSharding(mesh, P(Z_AXIS_NAME, None, None)))


def compute_flow_sharded(i0, i1, params: FlowParams = FlowParams(),
                         mesh: Mesh | None = None,
                         diagnostics: bool = False,
                         checkpoint_dir: str | None = None,
                         timer=None, _comm_ablate: bool = False):
    """Z-sharded dense 3D optical flow over a device mesh.

    i0/i1: (D, H, W) with D divisible by the mesh size (pad upstream via
    volume.pad_to_multiple if needed). Returns (3, D, H, W) flow sharded
    along Z (axis 1).

    With ``checkpoint_dir`` the flow is saved per-shard at every pyramid
    level boundary and an interrupted run resumes at the level it reached
    (levels then execute as separate jit steps — see
    pipeline.compute_flow_checkpointed for the same trade on one chip).
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
    if checkpoint_dir is not None or timer is not None:
        if diagnostics:
            raise ValueError("diagnostics is not supported with "
                             "checkpoint_dir/timer (levels run as "
                             "separate jits)")
        return _compute_flow_sharded_checkpointed(i0, i1, params, mesh,
                                                  checkpoint_dir, timer)
    # _comm_ablate (bench/scaling.py --ablate-comm only): same program with
    # collectives replaced by local fallbacks — numerically wrong across
    # shard boundaries, used solely to measure the communication share.
    return _sharded_fn(params, mesh, diagnostics, _comm_ablate)(i0, i1)


def _flow_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, Z_AXIS_NAME, None, None))


def process_z_range(d_global: int, mesh: Mesh) -> tuple[int, int]:
    """The contiguous global-Z range owned by this process's devices."""
    n = mesh.devices.size
    assert d_global % n == 0, (d_global, n)
    per_dev = d_global // n
    flat = list(mesh.devices.flat)
    mine = [i for i, dev in enumerate(flat)
            if dev.process_index == jax.process_index()]
    # Host-local slab IO requires each process to own a contiguous Z run;
    # an interleaved device order would make every process read/write the
    # wrong slab (silently, via make_array_from_process_local_data).
    assert mine == list(range(mine[0], mine[-1] + 1)), (
        f"process {jax.process_index()} owns non-contiguous mesh positions "
        f"{mine}; build the Z mesh from process-ordered devices")
    return mine[0] * per_dev, (mine[-1] + 1) * per_dev


def _make_sharded_flow(local_np, mesh: Mesh, global_shape):
    """Assemble a Z-sharded (3, D, H, W) flow from each process's slab."""
    return jax.make_array_from_process_local_data(
        _flow_sharding(mesh), np.ascontiguousarray(local_np),
        global_shape=tuple(global_shape))


def _compute_flow_sharded_checkpointed(i0, i1, p: FlowParams, mesh: Mesh,
                                       checkpoint_dir: str | None,
                                       timer=None):
    """Per-level checkpointed Z-sharded solve: save per-shard slabs at each
    level boundary, resume by reading only this process's Z range
    (no process ever materializes the global flow). ``timer``: optional
    PhaseTimer for per-level timings (checkpoint_dir may be None when only
    timings are wanted)."""
    import sys

    from tpuflow3d import checkpoint as ckpt
    from tpuflow3d.utils.profiling import PhaseTimer

    phase = PhaseTimer.maybe(timer)

    gshape = tuple(i0.shape)
    shapes = p.level_shapes(gshape)
    n_levels = len(shapes)
    dtype = jnp.dtype(p.dtype)

    with phase("pyramids"):
        pyr0, pyr1 = _sharded_prep_fn(p, mesh, n_levels)(i0, i1)
        if timer is not None:
            jax.block_until_ready((pyr0, pyr1))

    start = n_levels - 1
    lo, hi = process_z_range(shapes[-1][0], mesh)
    flow = _make_sharded_flow(
        np.zeros((3, hi - lo, *shapes[-1][1:]), dtype),
        mesh, (3, *shapes[-1]))
    state = (ckpt.peek_level_checkpoint(checkpoint_dir)
             if checkpoint_dir is not None else None)
    if checkpoint_dir is not None and jax.process_count() > 1:
        # Every process peeks its own filesystem view; if they disagree
        # (non-shared checkpoint dir, or one host's files lost), processes
        # would enter different level jits with mismatched collective
        # sequences and deadlock. Require unanimity or start fresh on ALL.
        from jax.experimental import multihost_utils
        enc = np.asarray(tuple(state[0]) + (state[1],) if state is not None
                         else (-1, -1, -1, -1), dtype=np.int64)
        all_enc = np.asarray(multihost_utils.process_allgather(enc))
        if not (all_enc == all_enc[0]).all():
            print("tpuflow3d: checkpoint visibility/content differs across "
                  "processes; starting fresh on all (resume needs a "
                  "uniformly visible checkpoint directory)", file=sys.stderr)
            state = None
    if state is not None:
        (d, h, w), level = state
        if 0 <= level < n_levels and (d, h, w) == shapes[level]:
            lo, hi = process_z_range(d, mesh)
            slab, _ = ckpt.load_level_checkpoint(checkpoint_dir, lo, hi - lo)
            flow = _make_sharded_flow(slab, mesh, (3, d, h, w))
            start = level
        else:
            print(f"tpuflow3d: checkpoint at {checkpoint_dir} has shape "
                  f"{(d, h, w)} (level {level}) which does not match this "
                  "run's pyramid; starting fresh", file=sys.stderr)

    for li in range(start, -1, -1):
        with phase(f"level{li} {shapes[li]}"):
            flow = _sharded_level_fn(p, mesh, gshape, li)(
                pyr0[li], pyr1[li], flow)
            if timer is not None:
                flow.block_until_ready()
        if checkpoint_dir is not None and li > 0:
            flow.block_until_ready()
            # Saved state is "ready to solve level li-1".
            with phase(f"checkpoint L{li - 1}"):
                ckpt.save_level_checkpoint(checkpoint_dir, flow, li - 1, p)
    return flow
