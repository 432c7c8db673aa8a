"""Checkpoint/resume on the Z-sharded path (SURVEY.md §7: per-level
checkpointing exists *for the sharded large-volume case*): per-shard slab
saves, slab-local resume, crash-safe (atomic) metadata."""

import os

import jax
import numpy as np
import pytest

from tpuflow3d import FlowParams
from tpuflow3d import checkpoint as ckpt
from tpuflow3d import synthetic as syn
from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                prepare_params)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >=4 virtual devices")


def _pair(shape=(32, 16, 16)):
    return syn.make_pair(shape, syn.translation((0.7, 0.0, 0.5)), seed=3)


def test_sharded_checkpointed_matches_plain(tmp_path):
    i0, i1, _ = _pair()
    n = 4
    mesh = make_z_mesh(n)
    p = FlowParams(levels=3, warps=2, inner_iterations=1, sweeps=5,
                   alpha=0.05)
    plain = np.asarray(compute_flow_sharded(i0, i1, p, mesh))
    ck = str(tmp_path / "ck")
    got = np.asarray(compute_flow_sharded(i0, i1, p, mesh,
                                          checkpoint_dir=ck))
    # Same discretization, levels as separate jits: tight tolerance.
    np.testing.assert_allclose(got, plain, atol=1e-5, rtol=1e-4)
    # Checkpoint dir holds exactly the last level's files + meta.
    names = sorted(os.listdir(ck))
    assert "checkpoint.json" in names
    assert [n for n in names if n.endswith(".raw")] == \
        ["flow0_L0.raw", "flow1_L0.raw", "flow2_L0.raw"]


def test_sharded_resume_matches_full(tmp_path):
    i0, i1, _ = _pair()
    n = 4
    mesh = make_z_mesh(n)
    p = FlowParams(levels=3, warps=2, inner_iterations=1, sweeps=5,
                   alpha=0.05)
    ck = str(tmp_path / "ck")
    full = np.asarray(compute_flow_sharded(i0, i1, p, mesh,
                                           checkpoint_dir=ck))
    # The saved state is "ready to solve level 0": resuming re-runs only
    # the finest level and must reproduce the full run exactly.
    resumed = np.asarray(compute_flow_sharded(i0, i1, p, mesh,
                                              checkpoint_dir=ck))
    np.testing.assert_allclose(resumed, full, atol=1e-6)


def test_slab_local_checkpoint_load(tmp_path):
    """Resume must NOT materialize the global flow: load only a Z range."""
    rng = np.random.default_rng(0)
    flow = rng.normal(size=(3, 16, 8, 8)).astype(np.float32)
    path = str(tmp_path / "ck")
    ckpt.save_level_checkpoint(path, flow, level=1, params=FlowParams())
    slab, level = ckpt.load_level_checkpoint(path, z0=4, nz=8)
    assert level == 1 and slab.shape == (3, 8, 8, 8)
    np.testing.assert_array_equal(slab, flow[:, 4:12])


def test_torn_checkpoint_detected(tmp_path):
    """A meta pointing at incomplete flow data (crash mid-save of a LATER
    overwrite, or partial copy) must be treated as no-checkpoint instead of
    silently resuming from corrupt data."""
    rng = np.random.default_rng(1)
    flow = rng.normal(size=(3, 8, 8, 8)).astype(np.float32)
    path = str(tmp_path / "ck")
    ckpt.save_level_checkpoint(path, flow, level=0, params=FlowParams())
    # Truncate one component file: peek/load must report None.
    with open(os.path.join(path, "flow1_L0.raw"), "r+b") as f:
        f.truncate(100)
    assert ckpt.peek_level_checkpoint(path) is None
    assert ckpt.load_level_checkpoint(path) is None


def test_level_suffixed_files_and_pruning(tmp_path):
    """A crash mid-save can't corrupt the previous level: levels use
    distinct filenames, and stale levels are pruned only after the new
    meta is atomically in place."""
    rng = np.random.default_rng(2)
    path = str(tmp_path / "ck")
    f2 = rng.normal(size=(3, 4, 4, 4)).astype(np.float32)
    ckpt.save_level_checkpoint(path, f2, level=2, params=FlowParams())
    f1 = rng.normal(size=(3, 8, 8, 8)).astype(np.float32)
    ckpt.save_level_checkpoint(path, f1, level=1, params=FlowParams())
    names = sorted(os.listdir(path))
    assert [n for n in names if n.endswith(".raw")] == \
        ["flow0_L1.raw", "flow1_L1.raw", "flow2_L1.raw"]
    back, level = ckpt.load_level_checkpoint(path)
    assert level == 1
    np.testing.assert_array_equal(back, f1)


def test_shape_mismatch_starts_fresh(tmp_path, capsys):
    """A checkpoint from a different pyramid (shape mismatch) is ignored."""
    i0, i1, _ = _pair()
    n = 4
    mesh = make_z_mesh(n)
    p = FlowParams(levels=3, warps=1, inner_iterations=1, sweeps=3,
                   alpha=0.05)
    ck = str(tmp_path / "ck")
    # Plant a checkpoint whose shape matches no level of this run.
    bogus = np.zeros((3, 12, 5, 5), np.float32)
    ckpt.save_level_checkpoint(ck, bogus, level=1, params=p)
    got = np.asarray(compute_flow_sharded(i0, i1, p, mesh,
                                          checkpoint_dir=ck))
    ref = np.asarray(compute_flow_sharded(i0, i1, p, mesh))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
