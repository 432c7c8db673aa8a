"""Per-level checkpoint / resume.

The reference recomputes everything per run and only writes final outputs
(SURVEY.md §7 "Checkpoint / resume"). At 1024^3 multi-host scale a failed
run is expensive, so this framework checkpoints the only live state — the
accumulated flow field at a pyramid-level boundary — and can resume by
re-entering the level loop there.

Crash safety: flow components are written to LEVEL-SUFFIXED files
(``flow{c}_L{level}.raw``) so a crash mid-save can never corrupt the
previously checkpointed level, and ``checkpoint.json`` is written last via
an atomic rename — the meta always points at a fully flushed set of files.

Sharded arrays are saved per-shard (each process writes only its
addressable shards; raw z-major slabs into one file) and RESUMED per-slab
(each process reads only its own Z range), so no process ever materializes
the global flow (BASELINE.json:5 "host-side volume sharding/IO").
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from tpuflow3d.params import FlowParams
from tpuflow3d.volume import VolumeMeta, read_raw_slab, write_raw_slab


def _meta_path(path: str) -> str:
    return os.path.join(path, "checkpoint.json")


def _flow_path(path: str, c: int, level: int) -> str:
    return os.path.join(path, f"flow{c}_L{level}.raw")


def _sync_processes() -> None:
    """Barrier so every process's slab writes land before the meta does."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("tpuflow3d_checkpoint")


def _write_meta_atomic(path: str, meta: dict) -> None:
    tmp = _meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _meta_path(path))


def _prune_stale(path: str, level: int) -> None:
    """Drop flow files from other levels (superseded by this checkpoint)."""
    for name in os.listdir(path):
        if name.startswith("flow") and name.endswith(".raw") \
                and f"_L{level}." not in name:
            try:
                os.remove(os.path.join(path, name))
            except OSError:
                pass


def save_level_checkpoint(path: str, flow, level: int,
                          params: FlowParams) -> None:
    """Save the flow field at a level boundary. flow: (3, D, H, W), possibly
    Z-sharded (axis 1); every process writes its addressable slabs."""
    os.makedirs(path, exist_ok=True)
    _, d, h, w = flow.shape
    comp_meta = VolumeMeta((d, h, w), "float32")
    if isinstance(flow, np.ndarray):
        # Host-resident flow (piecewise mode): plain full writes.
        for c in range(3):
            write_raw_slab(_flow_path(path, c, level), comp_meta, 0, flow[c])
    else:
        for shard in flow.addressable_shards:
            z_sl = shard.index[1]  # tuple of slices into the global array
            z0 = 0 if z_sl.start is None else int(z_sl.start)
            data = np.asarray(shard.data)  # (3, dz, h, w)
            for c in range(3):
                write_raw_slab(_flow_path(path, c, level), comp_meta, z0,
                               data[c])
    _sync_processes()
    if jax.process_index() == 0:
        _write_meta_atomic(path, {"level": level, "shape": [d, h, w],
                                  "params": repr(params)})
        _prune_stale(path, level)


def peek_level_checkpoint(path: str):
    """Returns (shape (D,H,W), level) without reading flow data, or None."""
    mp = _meta_path(path)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        meta = json.load(f)
    level = int(meta["level"])
    d, h, w = meta["shape"]
    comp_meta = VolumeMeta((d, h, w), "float32")
    for c in range(3):
        fp = _flow_path(path, c, level)
        if not os.path.exists(fp) or os.path.getsize(fp) != comp_meta.nbytes:
            return None  # torn checkpoint: meta exists but data incomplete
    return (d, h, w), level


def load_level_checkpoint(path: str, z0: int = 0, nz: int | None = None):
    """Returns (flow ndarray (3,nz,H,W) float32, level) or None.

    z0/nz select a Z slab — distributed resume reads only the calling
    process's range (pass nz=None for the full extent)."""
    peek = peek_level_checkpoint(path)
    if peek is None:
        return None
    (d, h, w), level = peek
    if nz is None:
        nz = d - z0
    comp_meta = VolumeMeta((d, h, w), "float32")
    comps = [read_raw_slab(_flow_path(path, c, level), comp_meta, z0, nz)
             for c in range(3)]
    return np.stack(comps), level
