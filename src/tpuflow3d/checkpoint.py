"""Per-level checkpoint / resume.

The reference recomputes everything per run and only writes final outputs
(SURVEY.md §7 "Checkpoint / resume"). At 1024^3 multi-host scale a failed
run is expensive, so this framework checkpoints the only live state — the
accumulated flow field at a pyramid-level boundary — and can resume by
re-entering the level loop there.

Sharded arrays are saved per-shard (each process writes only its
addressable shards; raw z-major slabs into one file), so no process
materializes the global flow.
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


def save_level_checkpoint(path: str, flow: jax.Array, level: int,
                          params: FlowParams) -> None:
    """Save the flow field at a level boundary. flow: (3, D, H, W), possibly
    Z-sharded (axis 1); every process writes its addressable slabs."""
    os.makedirs(path, exist_ok=True)
    _, d, h, w = flow.shape
    comp_meta = VolumeMeta((d, h, w), "float32")
    if isinstance(flow, np.ndarray):
        # Host-resident flow (piecewise mode): plain full writes.
        for c in range(3):
            write_raw_slab(os.path.join(path, f"flow{c}.raw"), comp_meta, 0,
                           flow[c])
        if jax.process_index() == 0:
            with open(_meta_path(path), "w") as f:
                json.dump({"level": level, "shape": [d, h, w],
                           "params": repr(params)}, f)
        return
    for shard in flow.addressable_shards:
        sl = shard.index  # tuple of slices into the global array
        z_sl = sl[1]
        z0 = 0 if z_sl.start is None else z_sl.start
        data = np.asarray(shard.data)  # (3, dz, h, w)
        for c in range(3):
            write_raw_slab(os.path.join(path, f"flow{c}.raw"),
                           comp_meta, z0, data[c])
    if jax.process_index() == 0:
        with open(_meta_path(path), "w") as f:
            json.dump({"level": level, "shape": [d, h, w],
                       "params": repr(params)}, f)


def load_level_checkpoint(path: str):
    """Returns (flow ndarray (3,D,H,W) float32, level) or None."""
    mp = _meta_path(path)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        meta = json.load(f)
    d, h, w = meta["shape"]
    comp_meta = VolumeMeta((d, h, w), "float32")
    comps = [read_raw_slab(os.path.join(path, f"flow{c}.raw"),
                           comp_meta, 0, d) for c in range(3)]
    return np.stack(comps), int(meta["level"])
