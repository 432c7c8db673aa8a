"""True multi-process distributed tier: a 2-process CPU 'cluster' (gloo)
runs the full host-local-IO -> sharded-solve -> host-local-write path and
must reproduce the single-process sharded result. This exercises the real
jax.distributed bring-up that a multi-host pod launch uses."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tpuflow3d import FlowParams
from tpuflow3d import synthetic as syn
from tpuflow3d import volume as vio
from tpuflow3d.sharding import compute_flow_sharded, make_z_mesh

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    shape = (16, 12, 12)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=11)
    vio.write_raw(str(tmp_path / "a.raw"), i0)
    vio.write_raw(str(tmp_path / "b.raw"), i1)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "2", "23461", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ok" in out, out

    # Reference: single-process run on a 2-device mesh (same mesh size =>
    # identical discretization and collectives pattern).
    p2 = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5,
                    alpha=0.05)
    ref = np.asarray(compute_flow_sharded(i0, i1, p2, make_z_mesh(2)))
    u = vio.read_raw(str(tmp_path / "mpflow_u.raw"),
                     vio.VolumeMeta(shape, "float32"))
    np.testing.assert_allclose(u, ref[2], atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_four_process_distributed(tmp_path):
    """4-process gloo cluster (one CPU device each): the ppermute ring has
    interior-only, top-face, and bottom-face shards simultaneously, and
    the coarse level's 2-plane slabs exercise the thin-slab halo path
    across real process boundaries."""
    shape = (16, 12, 12)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=11)
    vio.write_raw(str(tmp_path / "a.raw"), i0)
    vio.write_raw(str(tmp_path / "b.raw"), i1)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "4", "23671", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(4)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ok" in out, out

    p4 = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5,
                    alpha=0.05)
    ref = np.asarray(compute_flow_sharded(i0, i1, p4, make_z_mesh(4)))
    u = vio.read_raw(str(tmp_path / "mpflow_u.raw"),
                     vio.VolumeMeta(shape, "float32"))
    np.testing.assert_allclose(u, ref[2], atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_two_process_checkpoint_resume(tmp_path):
    """Distributed per-level checkpoint + slab-local resume on the real
    2-process gloo cluster (SURVEY.md §7 checkpoint item; the resume pass
    reads only each process's own Z range of the saved flow)."""
    # 16^3: a second pyramid level exists (8^3 >= min_dim), so a
    # level-boundary checkpoint is actually written.
    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=11)
    vio.write_raw(str(tmp_path / "a.raw"), i0)
    vio.write_raw(str(tmp_path / "b.raw"), i1)
    ckdir = str(tmp_path / "ck")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "2", "23571", str(tmp_path),
         ckdir], env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ok" in out, out

    p2 = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5,
                    alpha=0.05)
    ref = np.asarray(compute_flow_sharded(i0, i1, p2, make_z_mesh(2)))
    u = vio.read_raw(str(tmp_path / "mpflow_u.raw"),
                     vio.VolumeMeta(shape, "float32"))
    np.testing.assert_allclose(u, ref[2], atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_cli_distributed_sequence(tmp_path):
    """--frames over a real 2-process cluster through the CLI front door:
    3 frames -> 2 flows, each matching the single-process sharded solve."""
    shape = (16, 12, 12)
    # One texture (seed 11) translated by 0.5 voxels per step along z/x.
    a, b, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)), seed=11)
    c = syn.make_pair(shape, syn.translation((1.0, 0.0, 1.0)), seed=11)[1]
    paths = []
    for name, arr in [("t0", a), ("t1", b), ("t2", c)]:
        f = str(tmp_path / f"{name}.raw")
        vio.write_raw(f, arr)
        paths.append(f)

    src = os.path.join(os.path.dirname(__file__), "..", "src")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    env["PYTHONPATH"] = src + os.pathsep + env.get("PYTHONPATH", "")
    out = str(tmp_path / "seq_")
    base = [sys.executable, "-m", "tpuflow3d.cli", "--distributed",
            "--coordinator", "localhost:23981", "--num-processes", "2",
            "--frames", *paths, "--out", out, "--platform", "cpu",
            "--levels", "2", "--warps", "1", "--inner-iterations", "1",
            "--sweeps", "5", "--alpha", "0.05"]
    procs = [subprocess.Popen(base + ["--process-id", str(r)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for r in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    p2 = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5,
                    alpha=0.05)
    frames = [a, b, c]
    for t in range(2):
        ref = np.asarray(compute_flow_sharded(frames[t], frames[t + 1], p2,
                                              make_z_mesh(2)))
        u = vio.read_raw(f"{out}{t:04d}_u.raw",
                         vio.VolumeMeta(shape, "float32"))
        np.testing.assert_allclose(u, ref[2], atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_fault_detection_and_elastic_resume(tmp_path):
    """Failure detection + elastic recovery (SURVEY.md §7; upgrades the
    'partial' inventory row): rank 1 is KILLED mid-solve (fault injection:
    os._exit the moment the first level checkpoint lands), and

      1. detection — the surviving rank's next collective must FAIL
         promptly (nonzero exit, not a hang; bounded by the communicate
         timeout), matching the documented failure contract that dead
         peers surface as distributed-runtime errors;
      2. elastic recovery — relaunching the job with the same
         --checkpoint-dir resumes from the level boundary (each process
         reading only its own Z slab) and produces the same flow as the
         single-process reference.
    """
    shape = (24, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=11)
    vio.write_raw(str(tmp_path / "a.raw"), i0)
    vio.write_raw(str(tmp_path / "b.raw"), i1)
    ckdir = str(tmp_path / "ck")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    # 3 levels / heavy sweeps: two checkpoint boundaries and enough
    # post-checkpoint work that rank 0 is still inside the solve when the
    # injected kill fires at the FIRST checkpoint.
    env["MP_WORKER_LEVELS"] = "3"
    env["MP_WORKER_SWEEPS"] = "40"
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "2", "23771", str(tmp_path),
         ckdir, "die"], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for r in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    assert procs[1].returncode == 17, outs[1]  # the injected fault fired
    # Detection: the survivor errored out (did not hang, did not succeed).
    assert procs[0].returncode not in (0, None), outs[0]

    from tpuflow3d import checkpoint as ckpt
    state = ckpt.peek_level_checkpoint(ckdir)
    assert state is not None  # something to resume from survived the crash

    # Elastic recovery: relaunch with the same checkpoint dir.
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "2", "23772", str(tmp_path),
         ckdir], env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ok" in out, out

    pr = FlowParams(levels=3, warps=1, inner_iterations=1, sweeps=40,
                    alpha=0.05)
    ref = np.asarray(compute_flow_sharded(i0, i1, pr, make_z_mesh(2)))
    u = vio.read_raw(str(tmp_path / "mpflow_u.raw"),
                     vio.VolumeMeta(shape, "float32"))
    np.testing.assert_allclose(u, ref[2], atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_fault_rank0_coordinator_killed(tmp_path):
    """Complementary fault case (r4): rank 0 — the COORDINATOR — is killed
    mid-solve. The failure contract (ARCHITECTURE.md "Failure detection")
    is the same as a worker death plus loss of the distributed-service
    endpoint: the survivor's next collective must fail with BOUNDED
    latency (asserted below), never hang; recovery = relaunch + resume."""
    import time

    shape = (24, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=11)
    vio.write_raw(str(tmp_path / "a.raw"), i0)
    vio.write_raw(str(tmp_path / "b.raw"), i1)
    ckdir = str(tmp_path / "ck")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    env["MP_WORKER_LEVELS"] = "3"
    env["MP_WORKER_SWEEPS"] = "40"
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "2", "23773", str(tmp_path),
         ckdir, "die0"], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for r in range(2)]
    out0 = procs[0].communicate(timeout=300)[0].decode()
    assert procs[0].returncode == 17, out0  # coordinator killed as armed
    # Detection latency: from the coordinator's death to the survivor's
    # exit. Bounded (the contract), and must be an ERROR, not success.
    t0 = time.monotonic()
    out1 = procs[1].communicate(timeout=240)[0].decode()
    latency = time.monotonic() - t0
    assert procs[1].returncode not in (0, None), out1
    assert latency < 180.0, f"survivor detection took {latency:.0f}s"

    from tpuflow3d import checkpoint as ckpt
    state = ckpt.peek_level_checkpoint(ckdir)
    assert state is not None  # the checkpoint survived the crash

    # Elastic recovery: fresh 2-process launch, same checkpoint dir.
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "2", "23774", str(tmp_path),
         ckdir], env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ok" in out, out

    pr = FlowParams(levels=3, warps=1, inner_iterations=1, sweeps=40,
                    alpha=0.05)
    ref = np.asarray(compute_flow_sharded(i0, i1, pr, make_z_mesh(2)))
    u = vio.read_raw(str(tmp_path / "mpflow_u.raw"),
                     vio.VolumeMeta(shape, "float32"))
    np.testing.assert_allclose(u, ref[2], atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_two_process_distributed_multigrid(tmp_path):
    """The multigrid solver under the REAL multi-process backend (gloo
    jax.distributed, 1 device per process): the V-cycle's restriction/
    prolongation/psum'd while_loop early machinery all cross process
    boundaries; must match the single-process 2-device-mesh run."""
    shape = (16, 12, 12)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=11)
    vio.write_raw(str(tmp_path / "a.raw"), i0)
    vio.write_raw(str(tmp_path / "b.raw"), i1)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["MP_WORKER_SOLVER"] = "multigrid"
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "2", "23468", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ok" in out, out

    p2 = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5,
                    alpha=0.05, solver="multigrid", mg_cycles=2)
    ref = np.asarray(compute_flow_sharded(i0, i1, p2, make_z_mesh(2)))
    u = vio.read_raw(str(tmp_path / "mpflow_u.raw"),
                     vio.VolumeMeta(shape, "float32"))
    np.testing.assert_allclose(u, ref[2], atol=1e-5, rtol=1e-4)
