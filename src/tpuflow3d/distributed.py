"""Multi-host distributed execution and host-local sharded IO.

Scales the Z-sharded pipeline (tpuflow3d.sharding) across a multi-host TPU
pod slice: ``jax.distributed`` bring-up (the TPU analog of the reference's
CUDA device/context init, SURVEY.md §5.4 — process boundary #0), a global
1-D Z mesh over all pod devices, and host-local volume IO where each
process reads/writes ONLY its own Z-slabs of the raw files — no process
ever materializes a terabyte-scale global volume (BASELINE.json:5
"host-side volume sharding/IO").

Collectives ride ICI within a slice and DCN across hosts, inserted by XLA
from the same ppermute/psum calls as the single-host path; nothing here is
transport-specific.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuflow3d.params import FlowParams
from tpuflow3d.sharding import (Z_AXIS_NAME, _sharded_fn, make_z_mesh,
                                prepare_params)
from tpuflow3d.volume import VolumeMeta, read_raw_slab, write_raw_slab


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Multi-process bring-up. On TPU pods with standard env metadata the
    arguments are auto-detected; pass them explicitly for manual launches
    (e.g. the localhost relay used for emulated multi-host runs)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_z_mesh() -> Mesh:
    """1-D Z mesh over every device in the (possibly multi-host) job."""
    return make_z_mesh(devices=jax.devices())


def _process_z_range(d_global: int, mesh: Mesh) -> tuple[int, int]:
    """The contiguous global-Z range owned by this process's devices
    (asserts contiguity — see sharding.process_z_range)."""
    from tpuflow3d.sharding import process_z_range
    return process_z_range(d_global, mesh)


def load_sharded_volume(path: str, meta: VolumeMeta, mesh: Mesh,
                        dtype=np.float32) -> jax.Array:
    """Build a Z-sharded global array, each process reading only its slab
    from disk (raw z-major => one contiguous range per process)."""
    d, h, w = meta.shape
    lo, hi = _process_z_range(d, mesh)
    slab = read_raw_slab(path, meta, lo, hi - lo).astype(dtype, copy=False)
    sharding = NamedSharding(mesh, P(Z_AXIS_NAME, None, None))
    return jax.make_array_from_process_local_data(sharding, slab,
                                                  global_shape=(d, h, w))


def save_sharded_flow(prefix: str, flow: jax.Array) -> None:
    """Write u/v/w raw files from a Z-sharded (3, D, H, W) flow; every
    process writes only its addressable slabs (reference naming: u=x, v=y,
    w=z displacement)."""
    _, d, h, w = flow.shape
    meta = VolumeMeta((d, h, w), "float32")
    names = {2: "u", 1: "v", 0: "w"}
    for shard in flow.addressable_shards:
        z_sl = shard.index[1]
        z0 = 0 if z_sl.start is None else int(z_sl.start)
        data = np.asarray(shard.data)
        for c in range(3):
            write_raw_slab(f"{prefix}{names[c]}.raw", meta, z0, data[c])


def compute_flow_distributed(frame0: str, frame1: str, meta: VolumeMeta,
                             params: FlowParams = FlowParams(),
                             mesh: Mesh | None = None,
                             out_prefix: str | None = None,
                             checkpoint_dir: str | None = None) -> jax.Array:
    """End-to-end multi-host run: host-local sharded load -> Z-sharded
    solve -> (optionally) host-local sharded write. Returns the sharded
    (3, D, H, W) flow array.

    The Z extent must be divisible by the total device count (pad the file
    or pass z_multiple-padded volumes upstream). With ``checkpoint_dir``
    the flow is saved per-shard at every pyramid-level boundary and resume
    reads only each process's own Z slab (SURVEY.md §7 checkpointing for
    the sharded 1024^3 case)."""
    if mesh is None:
        mesh = global_z_mesh()
    n = mesh.devices.size
    if meta.shape[0] % n != 0:
        raise ValueError(f"Z extent {meta.shape[0]} not divisible by "
                         f"device count {n}")
    params = prepare_params(params, n)
    i0 = load_sharded_volume(frame0, meta, mesh)
    i1 = load_sharded_volume(frame1, meta, mesh)
    if checkpoint_dir is not None:
        from tpuflow3d.sharding import _compute_flow_sharded_checkpointed
        flow = _compute_flow_sharded_checkpointed(i0, i1, params, mesh,
                                                  checkpoint_dir)
    else:
        flow = _sharded_fn(params, mesh, diagnostics=False)(i0, i1)
    if out_prefix is not None:
        flow.block_until_ready()
        save_sharded_flow(out_prefix, flow)
    return flow
