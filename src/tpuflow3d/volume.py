"""Volume container and raw-volume IO.

TPU-native equivalent of the reference's host-side data layer: ``Data3D`` /
``DataSize4`` volume containers and headerless `.raw` read/write
(cuda-flow3d ``src/data_types/`` + ``src/utils/io_utils.*``, SURVEY.md §4).

Raw format: headerless, z-major (z slowest, x fastest) — so a Z-slab is one
contiguous byte range, which is what makes host-local sharded IO trivial
(each host reads only its own slab; no process ever materializes the global
volume, BASELINE.json:5 "host-side volume sharding/IO"). Dimensions/dtype
come from the CLI or a JSON sidecar (``<file>.json``).

A native C++ fast path (mmap + parallel copy) is provided by
tpuflow3d.utils.native when the extension is built; these functions fall
back to NumPy transparently.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from tpuflow3d.utils import native


@dataclass(frozen=True)
class VolumeMeta:
    """Shape/dtype descriptor (the reference's DataSize4 analog; pitch is
    not needed since arrays are dense)."""
    shape: tuple[int, int, int]  # (D, H, W) = (z, y, x)
    dtype: str = "float32"

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape)) * np.dtype(self.dtype).itemsize

    def sidecar(self) -> dict:
        return {"shape": list(self.shape), "dtype": self.dtype,
                "order": "zyx"}


def write_sidecar(path: str, meta: VolumeMeta) -> None:
    with open(path + ".json", "w") as f:
        json.dump(meta.sidecar(), f)


def read_sidecar(path: str) -> VolumeMeta | None:
    p = path + ".json"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return VolumeMeta(shape=tuple(d["shape"]), dtype=d["dtype"])


def read_raw(path: str, meta: VolumeMeta | None = None,
             mmap: bool = False) -> np.ndarray:
    """Read a full headerless raw volume."""
    if meta is None:
        meta = read_sidecar(path)
        if meta is None:
            raise ValueError(f"no dims given and no sidecar for {path}")
    if mmap:
        return np.memmap(path, dtype=meta.dtype, mode="r", shape=meta.shape)
    n_expected = int(np.prod(meta.shape))
    actual = os.path.getsize(path)
    if actual != meta.nbytes:
        raise ValueError(f"{path}: {actual // np.dtype(meta.dtype).itemsize} "
                         f"elements, expected {n_expected} for {meta.shape}")
    buf = native.read_bytes(path, 0, meta.nbytes)  # threaded C++ fast path
    if buf is not None:
        return buf.view(meta.dtype).reshape(meta.shape)
    arr = np.fromfile(path, dtype=meta.dtype)
    return arr.reshape(meta.shape)


def read_raw_slab(path: str, meta: VolumeMeta, z0: int, nz: int) -> np.ndarray:
    """Read planes [z0, z0+nz) only — host-local sharded IO."""
    d, h, w = meta.shape
    if not (0 <= z0 and z0 + nz <= d):
        raise ValueError(f"slab [{z0},{z0 + nz}) out of range for D={d}")
    itemsize = np.dtype(meta.dtype).itemsize
    plane = h * w
    nbytes = nz * plane * itemsize
    offset = z0 * plane * itemsize
    buf = native.read_bytes(path, offset, nbytes)  # threaded C++ fast path
    if buf is not None:
        return buf.view(meta.dtype).reshape(nz, h, w)
    with open(path, "rb") as f:
        f.seek(offset)
        raw = f.read(nbytes)
    arr = np.frombuffer(raw, dtype=meta.dtype)
    return arr.reshape(nz, h, w).copy()


def write_raw(path: str, arr: np.ndarray, sidecar: bool = True) -> None:
    arr = np.ascontiguousarray(arr)
    arr.tofile(path)
    if sidecar:
        write_sidecar(path, VolumeMeta(tuple(arr.shape), str(arr.dtype)))


def write_raw_slab(path: str, meta: VolumeMeta, z0: int,
                   slab: np.ndarray) -> None:
    """Write planes [z0, z0+len(slab)) into a (pre-sized) raw file."""
    d, h, w = meta.shape
    itemsize = np.dtype(meta.dtype).itemsize
    plane = h * w
    slab = np.ascontiguousarray(slab.astype(meta.dtype, copy=False))
    if native.write_bytes(path, z0 * plane * itemsize, slab, meta.nbytes):
        return
    # Create-if-absent atomically (O_CREAT without O_TRUNC) and only ever
    # EXTEND, mirroring the native path (native/flowio.cpp): an
    # exists()+'w+b' dance races under concurrent multi-process saves —
    # one process's O_TRUNC can zero a slab another process just wrote,
    # and the resulting full-size file passes the torn-checkpoint size
    # check on resume.
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
    with os.fdopen(fd, "r+b") as f:
        if os.fstat(f.fileno()).st_size < meta.nbytes:
            f.truncate(meta.nbytes)
        f.seek(z0 * plane * itemsize)
        f.write(slab.tobytes())


def pad_to_multiple(vol: np.ndarray, m: int) -> np.ndarray:
    """Edge-replicate pad Z so D % m == 0 (for sharded runs)."""
    d = vol.shape[0]
    d_pad = m * ((d + m - 1) // m)
    if d_pad == d:
        return vol
    return np.concatenate(
        [vol, np.repeat(vol[-1:], d_pad - d, axis=0)], axis=0)


# Flow component naming: the flow array is (3, D, H, W) with components
# (z, y, x). File outputs follow the reference's (u, v, w) = (x, y, z)
# displacement convention.
FLOW_COMPONENT_FILES = {"u": 2, "v": 1, "w": 0}


def write_flow(prefix: str, flow: np.ndarray, magnitude: bool = True) -> None:
    """Write u.raw / v.raw / w.raw (+ magnitude.raw) like the reference CLI
    (SURVEY.md §5.1 final step)."""
    for name, ci in FLOW_COMPONENT_FILES.items():
        write_raw(f"{prefix}{name}.raw", np.asarray(flow[ci]))
    if magnitude:
        mag = np.sqrt((np.asarray(flow) ** 2).sum(axis=0))
        write_raw(f"{prefix}magnitude.raw", mag)
