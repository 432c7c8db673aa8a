"""Distributed-IO tier on the virtual 8-device CPU mesh: host-local slab
loading and sharded writes must round-trip, and the distributed entry must
match the plain sharded entry."""

import jax
import numpy as np
import pytest

from tpuflow3d import FlowParams
from tpuflow3d import synthetic as syn
from tpuflow3d import volume as vio
from tpuflow3d.distributed import (compute_flow_distributed,
                                   load_sharded_volume, save_sharded_flow)
from tpuflow3d.sharding import compute_flow_sharded, make_z_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >=4 virtual devices")


def test_load_sharded_volume(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(16, 6, 6)).astype(np.float32)
    path = str(tmp_path / "v.raw")
    vio.write_raw(path, vol)
    mesh = make_z_mesh(4)
    arr = load_sharded_volume(path, vio.VolumeMeta((16, 6, 6), "float32"),
                              mesh)
    assert arr.shape == (16, 6, 6)
    np.testing.assert_array_equal(np.asarray(arr), vol)
    # sharded along z across 4 devices
    assert len(arr.sharding.device_set) == 4


def test_distributed_end_to_end_matches_sharded(tmp_path):
    shape = (32, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=7)
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    mesh = make_z_mesh(4)
    p = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5,
                   alpha=0.05)
    meta = vio.VolumeMeta(shape, "float32")
    prefix = str(tmp_path / "flow_")
    flow = compute_flow_distributed(f0, f1, meta, p, mesh,
                                    out_prefix=prefix)
    ref = compute_flow_sharded(i0, i1, p, mesh)
    np.testing.assert_allclose(np.asarray(flow), np.asarray(ref), atol=1e-6)
    # sharded writes round-trip
    u = vio.read_raw(prefix + "u.raw", vio.VolumeMeta(shape, "float32"))
    np.testing.assert_allclose(u, np.asarray(flow)[2], atol=0)
