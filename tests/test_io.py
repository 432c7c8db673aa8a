import numpy as np

from tpuflow3d import volume as vio


def test_raw_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(8, 6, 4)).astype(np.float32)
    path = str(tmp_path / "vol.raw")
    vio.write_raw(path, arr)
    meta = vio.read_sidecar(path)
    assert meta.shape == (8, 6, 4) and meta.dtype == "float32"
    back = vio.read_raw(path)
    np.testing.assert_array_equal(back, arr)


def test_slab_io(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(16, 5, 7)).astype(np.float32)
    path = str(tmp_path / "vol.raw")
    meta = vio.VolumeMeta((16, 5, 7), "float32")
    # write as two slabs (out of order), read back whole + slab
    vio.write_raw_slab(path, meta, 8, arr[8:])
    vio.write_raw_slab(path, meta, 0, arr[:8])
    back = vio.read_raw(path, meta)
    np.testing.assert_array_equal(back, arr)
    slab = vio.read_raw_slab(path, meta, 4, 6)
    np.testing.assert_array_equal(slab, arr[4:10])


def test_uint8_volume(tmp_path):
    arr = np.arange(4 * 3 * 2, dtype=np.uint8).reshape(4, 3, 2)
    path = str(tmp_path / "v8.raw")
    vio.write_raw(path, arr)
    back = vio.read_raw(path)
    np.testing.assert_array_equal(back, arr)


def test_pad_to_multiple():
    arr = np.random.default_rng(0).normal(size=(10, 4, 4)).astype(np.float32)
    out = vio.pad_to_multiple(arr, 8)
    assert out.shape == (16, 4, 4)
    np.testing.assert_array_equal(out[10:], np.broadcast_to(arr[-1:],
                                                            (6, 4, 4)))


def test_write_flow(tmp_path):
    flow = np.random.default_rng(0).normal(size=(3, 6, 5, 4)).astype(
        np.float32)
    prefix = str(tmp_path / "flow_")
    vio.write_flow(prefix, flow)
    u = vio.read_raw(prefix + "u.raw")
    w = vio.read_raw(prefix + "w.raw")
    np.testing.assert_array_equal(u, flow[2])  # u = x displacement
    np.testing.assert_array_equal(w, flow[0])  # w = z displacement
    mag = vio.read_raw(prefix + "magnitude.raw")
    np.testing.assert_allclose(mag, np.sqrt((flow ** 2).sum(axis=0)),
                               rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tpuflow3d import checkpoint as ckpt
    from tpuflow3d.params import FlowParams

    flow = jnp.asarray(np.random.default_rng(2).normal(
        size=(3, 8, 6, 4)).astype(np.float32))
    path = str(tmp_path / "ck")
    ckpt.save_level_checkpoint(path, flow, level=2, params=FlowParams())
    back, level = ckpt.load_level_checkpoint(path)
    assert level == 2
    np.testing.assert_allclose(back, np.asarray(flow), rtol=1e-6)


def test_cli_end_to_end(tmp_path):
    from tpuflow3d import cli
    from tpuflow3d import synthetic as syn

    i0, i1, true = syn.make_pair((24, 24, 24),
                                 syn.translation((0.0, 0.0, 1.0)))
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    out = str(tmp_path / "flow_")
    rc = cli.main(["--frame0", f0, "--frame1", f1, "--out", out,
                   "--levels", "2", "--warps", "2", "--sweeps", "10",
                   "--alpha", "0.05"])
    assert rc == 0
    u = vio.read_raw(out + "u.raw")
    assert u.shape == (24, 24, 24)
    # recovered x-displacement ~ 1 where there is texture
    assert abs(np.median(u) - 1.0) < 0.3


def test_ops_registry():
    from tpuflow3d.ops import OPS
    for name in ["convolution", "resample", "registration", "solve",
                 "median", "add", "derivatives"]:
        assert name in OPS
        assert OPS[name].reference


def test_checkpointed_pipeline_resume(tmp_path):
    import jax.numpy as jnp

    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn
    from tpuflow3d.pipeline import compute_flow_checkpointed

    shape = (24, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 1.0)))
    p = FlowParams(levels=3, warps=2, inner_iterations=2, sweeps=5,
                   alpha=0.05)
    ref = np.asarray(compute_flow(i0, i1, p))
    ckdir = str(tmp_path / "ck")

    full = np.asarray(compute_flow_checkpointed(i0, i1, p, ckdir))
    np.testing.assert_allclose(full, ref, atol=1e-5, rtol=1e-4)

    # The last saved checkpoint is "ready to solve level 0"; resuming
    # re-runs only the finest level and must agree with the full run.
    resumed = np.asarray(compute_flow_checkpointed(i0, i1, p, ckdir))
    np.testing.assert_allclose(resumed, full, atol=1e-6)


def test_warp_stepped_matches_fused():
    """warp_stepped mode (one device program per WARP iteration — the
    bounded-dispatch workaround for the emulated chip's long-program kill)
    must equal the fused-level run: same arithmetic, different program
    boundaries."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn
    from tpuflow3d.pipeline import compute_flow_checkpointed

    shape = (24, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 1.0)))
    for p in (FlowParams(levels=3, warps=2, inner_iterations=2, sweeps=5,
                         alpha=0.05),
              FlowParams(levels=2, warps=2, inner_iterations=1, sweeps=4,
                         alpha=0.05, interp="tricubic", flow_clamp=2.0,
                         residual_tol=1e-6)):
        ref = np.asarray(compute_flow(i0, i1, p))
        got = np.asarray(compute_flow_checkpointed(i0, i1, p,
                                                   warp_stepped=True))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_cli_uint16_and_friendly_errors(tmp_path):
    from tpuflow3d import cli
    from tpuflow3d import synthetic as syn

    i0, i1, _ = syn.make_pair((16, 16, 16), syn.translation((0.0, 0.0, 1.0)))
    # store as uint16 (tomography-style) — exercises the native widening
    scale = 60000.0 / max(i0.max(), i1.max())
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, np.clip(i0 * scale, 0, 65535).astype(np.uint16))
    vio.write_raw(f1, np.clip(i1 * scale, 0, 65535).astype(np.uint16))
    out = str(tmp_path / "flow_")
    rc = cli.main(["--frame0", f0, "--frame1", f1, "--out", out,
                   "--levels", "2", "--warps", "2", "--sweeps", "10"])
    assert rc == 0
    u = vio.read_raw(out + "u.raw")
    assert abs(np.median(u[4:12, 4:12, 4:12]) - 1.0) < 0.35

    # friendly one-line error, not a traceback
    rc = cli.main(["--frame0", str(tmp_path / "missing.raw"),
                   "--frame1", f1, "--out", out])
    assert rc == 2


def test_cli_sharded_with_checkpoint(tmp_path):
    """--sharded --checkpoint-dir must run SHARDED with checkpointing (it
    used to fall through silently to the unsharded checkpointed path)."""
    import jax
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs >=2 virtual devices")
    from tpuflow3d import cli
    from tpuflow3d import synthetic as syn

    # 16^3 so a second pyramid level exists (8^3 >= min_dim) and a
    # level-boundary checkpoint is actually written.
    i0, i1, _ = syn.make_pair((16, 16, 16), syn.translation((0.0, 0.0, 1.0)))
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    out = str(tmp_path / "flow_")
    ck = str(tmp_path / "ck")
    rc = cli.main(["--frame0", f0, "--frame1", f1, "--out", out,
                   "--levels", "2", "--warps", "1", "--sweeps", "5",
                   "--sharded", "--devices", "2", "--checkpoint-dir", ck])
    assert rc == 0
    # Sharded-checkpointed leaves level-suffixed per-shard files behind.
    import os
    assert os.path.exists(os.path.join(ck, "checkpoint.json"))
    assert os.path.exists(os.path.join(ck, "flow0_L0.raw"))
    u = vio.read_raw(out + "u.raw")
    assert u.shape == (16, 16, 16)


def test_cli_mode_flags_mutually_exclusive(tmp_path):
    from tpuflow3d import cli

    f = str(tmp_path / "x.raw")
    vio.write_raw(f, np.zeros((8, 8, 8), np.float32))
    rc = cli.main(["--frame0", f, "--frame1", f, "--out",
                   str(tmp_path / "o_"), "--sharded", "--piecewise"])
    assert rc == 2


def test_cli_timings(tmp_path, capsys):
    """--timings logs per-phase wall times (pyramid + each level) — the
    analog of the reference's per-op timing prints."""
    import json as _json

    from tpuflow3d import cli
    from tpuflow3d import synthetic as syn

    i0, i1, _ = syn.make_pair((16, 16, 16), syn.translation((0.0, 0.0, 1.0)))
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    logf = str(tmp_path / "log.jsonl")
    rc = cli.main(["--frame0", f0, "--frame1", f1,
                   "--out", str(tmp_path / "flow_"),
                   "--levels", "2", "--warps", "1", "--sweeps", "5",
                   "--timings", "--log-json", logf])
    assert rc == 0
    events = [_json.loads(line) for line in open(logf)]
    timing = [e for e in events if e["event"] == "timings"]
    assert len(timing) == 1
    phases = timing[0]["phases"]
    assert "pyramids" in phases
    assert any(k.startswith("level0") for k in phases)
    assert any(k.startswith("level1") for k in phases)
    assert all(rec["seconds"] >= 0 for rec in phases.values())


def test_cli_stats(tmp_path):
    """--stats logs per-volume min/max/mean/L2 (the reference's volume-info
    prints) via the ops-registry statistics op."""
    import json as _json

    from tpuflow3d import cli
    from tpuflow3d import synthetic as syn

    i0, i1, _ = syn.make_pair((16, 16, 16), syn.translation((0.0, 0.0, 1.0)))
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    logf = str(tmp_path / "log.jsonl")
    rc = cli.main(["--frame0", f0, "--frame1", f1,
                   "--out", str(tmp_path / "flow_"),
                   "--levels", "2", "--warps", "1", "--sweeps", "5",
                   "--stats", "--log-json", logf])
    assert rc == 0
    events = [_json.loads(line) for line in open(logf)]
    stats = {e["volume"]: e for e in events if e["event"] == "statistics"}
    assert set(stats) == {"frame0", "frame1", "flow_magnitude"}
    for e in stats.values():
        assert {"min", "max", "mean", "l2"} <= set(e)
    assert stats["frame0"]["max"] >= stats["frame0"]["min"]
    assert stats["flow_magnitude"]["min"] >= 0.0


def test_cli_list_ops(capsys):
    from tpuflow3d import cli

    assert cli.main(["--list-ops"]) == 0
    out = capsys.readouterr().out
    for name in ["convolution", "resample", "registration", "solve",
                 "median", "add", "statistics", "derivatives"]:
        assert name in out
    assert "CudaOperationSolve3D" in out
    # no frames given and not --list-ops -> friendly error
    assert cli.main([]) == 2


def test_cli_sequence(tmp_path):
    """--frames: N volumes -> N-1 flow fields, one compile shared."""
    from tpuflow3d import cli
    from tpuflow3d import synthetic as syn

    i0, i1, _ = syn.make_pair((24, 24, 24), syn.translation((0.0, 0.0, 1.0)))
    i2, i3, _ = syn.make_pair((24, 24, 24), syn.translation((0.0, 0.0, 1.0)),
                              seed=3)
    paths = []
    # 4 frames so the IO-prefetch chain (frame t+2 loads during pair t)
    # and the overlapped-writer handoff both cycle at least once.
    for t, arr in enumerate([i0, i1, i2, i3]):
        p = str(tmp_path / f"t{t}.raw")
        vio.write_raw(p, arr)
        paths.append(p)
    out = str(tmp_path / "seq_")
    rc = cli.main(["--frames", *paths, "--out", out,
                   "--levels", "2", "--warps", "2", "--sweeps", "10",
                   "--alpha", "0.05", "--no-magnitude"])
    assert rc == 0
    for t in range(3):
        for comp in "uvw":
            arr = vio.read_raw(f"{out}{t:04d}_{comp}.raw")
            assert arr.shape == (24, 24, 24)
    # pair 0 is the prescribed unit x-shift
    u0 = vio.read_raw(out + "0000_u.raw")
    assert abs(np.median(u0) - 1.0) < 0.35


def test_cli_sequence_flag_conflicts(tmp_path):
    from tpuflow3d import cli

    assert cli.main(["--frames", "a.raw"]) == 2  # fewer than 2 frames -> err
    assert cli.main(["--frames", "a.raw", "b.raw", "--frame0", "x.raw"]) == 2


# ---- automatic path selection (reference: entire-vs-piecewise by free
# GPU memory, SURVEY.md §5.1) ----

def _auto_mode_pair(tmp_path):
    from tpuflow3d import synthetic as syn
    i0, i1, _ = syn.make_pair((24, 16, 16), syn.translation((0.0, 0.0, 1.0)))
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    return f0, f1


def _auto_mode_events(logf):
    import json
    with open(logf) as f:
        return [ev for ev in map(json.loads, f) if ev["event"] == "auto_mode"]


def test_incore_peak_bytes_model():
    from tpuflow3d.params import FlowParams
    from tpuflow3d.utils import memory as mem
    p = FlowParams(levels=3)
    small = mem.incore_peak_bytes((64, 64, 64), p)
    big = mem.incore_peak_bytes((128, 128, 128), p)
    assert 0 < small < big
    # dominated by ~18 live f32 fields + 2 pyramids at the finest level
    assert 70 * 128 ** 3 < big < 130 * 128 ** 3


def test_cli_auto_mode_selects_piecewise(tmp_path, monkeypatch):
    """A volume whose in-core peak exceeds every device budget must fall
    through to the out-of-core path, like the reference's memory check."""
    from tpuflow3d import cli
    f0, f1 = _auto_mode_pair(tmp_path)
    logf = str(tmp_path / "log.jsonl")
    monkeypatch.setenv("TPUFLOW_DEVICE_BYTES", "1000")  # ~1 KB "device"
    rc = cli.main(["--frame0", f0, "--frame1", f1,
                   "--out", str(tmp_path / "flow_"), "--levels", "2",
                   "--warps", "2", "--sweeps", "10", "--log-json", logf])
    assert rc == 0
    ev = _auto_mode_events(logf)
    assert ev and ev[0]["selected"] == "piecewise"
    u = vio.read_raw(str(tmp_path / "flow_u.raw"))
    assert abs(np.median(u[6:-6, 4:-4, 4:-4]) - 1.0) < 0.3


def test_cli_auto_mode_selects_sharded(tmp_path, monkeypatch):
    """When one device is too small but the local fleet fits, auto mode
    Z-shards instead of streaming."""
    import jax

    from tpuflow3d import cli
    from tpuflow3d.params import FlowParams
    from tpuflow3d.utils import memory as mem
    if len(jax.local_devices()) < 2:
        import pytest
        pytest.skip("needs a multi-device fleet")
    f0, f1 = _auto_mode_pair(tmp_path)
    need = mem.incore_peak_bytes((24, 16, 16), FlowParams(levels=2))
    logf = str(tmp_path / "log.jsonl")
    monkeypatch.setenv("TPUFLOW_DEVICE_BYTES", str(int(need * 0.7)))
    rc = cli.main(["--frame0", f0, "--frame1", f1,
                   "--out", str(tmp_path / "flow_"), "--levels", "2",
                   "--warps", "1", "--sweeps", "4", "--log-json", logf])
    assert rc == 0
    ev = _auto_mode_events(logf)
    assert ev and ev[0]["selected"] == "sharded"


def test_cli_incore_pins_path(tmp_path, monkeypatch):
    from tpuflow3d import cli
    f0, f1 = _auto_mode_pair(tmp_path)
    logf = str(tmp_path / "log.jsonl")
    monkeypatch.setenv("TPUFLOW_DEVICE_BYTES", "1000")
    rc = cli.main(["--frame0", f0, "--frame1", f1, "--incore",
                   "--out", str(tmp_path / "flow_"), "--levels", "2",
                   "--warps", "1", "--sweeps", "4", "--log-json", logf])
    assert rc == 0
    assert not _auto_mode_events(logf)
    rc = cli.main(["--frame0", f0, "--frame1", f1, "--incore", "--piecewise",
                   "--out", str(tmp_path / "flow_")])
    assert rc == 2  # mutually exclusive pins


def test_pick_chunk_z_model():
    from tpuflow3d.params import FlowParams
    from tpuflow3d.utils import memory as mem
    p = FlowParams(levels=2, flow_clamp=2.0)
    shape = (512, 256, 256)
    small = mem.pick_chunk_z(shape, p, 256 << 20)
    big = mem.pick_chunk_z(shape, p, 8 << 30)
    assert 8 <= small < big <= 512
    # a huge budget is capped at the volume depth
    assert mem.pick_chunk_z(shape, p, 1 << 60) == 512
    # a starved budget floors at the minimum streamable chunk
    assert mem.pick_chunk_z(shape, p, 1000) == 8


def test_cli_piecewise_auto_chunk(tmp_path, monkeypatch):
    """--piecewise without --chunk-z sizes the chunk from the device
    budget and logs the choice."""
    import json

    from tpuflow3d import cli
    f0, f1 = _auto_mode_pair(tmp_path)
    logf = str(tmp_path / "log.jsonl")
    monkeypatch.setenv("TPUFLOW_DEVICE_BYTES", str(16 << 30))
    rc = cli.main(["--frame0", f0, "--frame1", f1, "--piecewise",
                   "--out", str(tmp_path / "flow_"), "--levels", "2",
                   "--warps", "2", "--sweeps", "10", "--log-json", logf])
    assert rc == 0
    with open(logf) as f:
        ev = [e for e in map(json.loads, f) if e["event"] == "auto_chunk"]
    assert ev and ev[0]["chunk_z"] == 24  # capped at D for this volume
    u = vio.read_raw(str(tmp_path / "flow_u.raw"))
    assert abs(np.median(u[6:-6, 4:-4, 4:-4]) - 1.0) < 0.3


def test_write_raw_slab_python_fallback_never_truncates(tmp_path,
                                                        monkeypatch):
    """The pure-Python slab writer must mirror the native path's
    create-without-truncate semantics: writing one slab into an existing
    full-size file leaves every other plane intact (a 'w+b' open would
    zero them — silent corruption for concurrent multi-process
    checkpoint saves)."""
    from tpuflow3d.utils import native

    monkeypatch.setattr(native, "write_bytes",
                        lambda *a, **k: False)  # force the Python fallback
    rng = np.random.default_rng(7)
    arr = rng.normal(size=(12, 4, 6)).astype(np.float32)
    path = str(tmp_path / "vol.raw")
    meta = vio.VolumeMeta((12, 4, 6), "float32")
    vio.write_raw_slab(path, meta, 0, arr)          # full file
    new = rng.normal(size=(3, 4, 6)).astype(np.float32)
    vio.write_raw_slab(path, meta, 5, new)          # overwrite middle slab
    back = vio.read_raw(path, meta)
    np.testing.assert_array_equal(back[5:8], new)
    np.testing.assert_array_equal(back[:5], arr[:5])
    np.testing.assert_array_equal(back[8:], arr[8:])


def test_cli_piecewise_diagnostics_streamed(tmp_path, monkeypatch):
    """--piecewise --report-fit --stats must not stage full volumes on the
    device (the solve was out-of-core precisely because they don't fit):
    the fit streams Z-chunks and the stats run host-side, and the outputs
    are written BEFORE the diagnostics run."""
    import json

    from tpuflow3d import cli
    from tpuflow3d import synthetic as syn

    i0, i1, _ = syn.make_pair((16, 16, 16), syn.translation((0.0, 0.0, 1.0)))
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    logf = str(tmp_path / "log.jsonl")
    rc = cli.main(["--frame0", f0, "--frame1", f1, "--piecewise",
                   "--chunk-z", "8", "--out", str(tmp_path / "flow_"),
                   "--levels", "2", "--warps", "1", "--sweeps", "5",
                   "--report-fit", "--stats", "--log-json", logf])
    assert rc == 0
    events = [json.loads(line) for line in open(logf)]
    kinds = [e["event"] for e in events]
    assert kinds.index("written") < kinds.index("fit")
    fit = next(e for e in events if e["event"] == "fit")
    # Warping by the recovered flow must improve the fit.
    assert fit["mean_residual"] < fit["mean_abs_diff_unwarped"]
    stats = {e["volume"]: e for e in events if e["event"] == "statistics"}
    assert "flow_magnitude" in stats
    assert stats["flow_magnitude"]["min"] >= 0.0


def test_vtk_roundtrip(tmp_path):
    from tpuflow3d import vtkio

    rng = np.random.default_rng(7)
    flow = rng.normal(size=(3, 6, 5, 4)).astype(np.float32)
    fp = str(tmp_path / "flow.vtk")
    vtkio.write_vtk_flow(fp, flow)
    back, kind = vtkio.read_vtk(fp)
    assert kind == "vector"
    np.testing.assert_array_equal(back, flow)
    # On-disk payload is big-endian (vx,vy,vz) interleaved, per legacy-VTK
    # spec: check one voxel's bytes directly against the (dz,dy,dx) source.
    raw = open(fp, "rb").read()
    off = raw.index(b"VECTORS flow float\n") + len(b"VECTORS flow float\n")
    first = np.frombuffer(raw, dtype=">f4", count=3, offset=off)
    np.testing.assert_array_equal(
        first.astype(np.float32), flow[::-1, 0, 0, 0])

    mag = np.sqrt((flow ** 2).sum(axis=0))
    sp = str(tmp_path / "mag.vtk")
    vtkio.write_vtk_scalar(sp, mag, name="flow_magnitude")
    back, kind = vtkio.read_vtk(sp)
    assert kind == "scalar"
    np.testing.assert_allclose(back, mag, rtol=1e-6)


def test_cli_export_vtk(tmp_path):
    from tpuflow3d import cli, vtkio
    from tpuflow3d import synthetic as syn

    i0, i1, _ = syn.make_pair((16, 16, 16), syn.translation((0.0, 0.0, 1.0)))
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    out = str(tmp_path / "flow_")
    rc = cli.main(["--frame0", f0, "--frame1", f1, "--out", out,
                   "--levels", "1", "--warps", "1", "--sweeps", "4",
                   "--alpha", "0.05", "--export-vtk"])
    assert rc == 0
    vec, kind = vtkio.read_vtk(out + "flow.vtk")
    assert kind == "vector" and vec.shape == (3, 16, 16, 16)
    # The .vtk payload must be the same field as the raw outputs.
    u = vio.read_raw(out + "u.raw")
    np.testing.assert_allclose(vec[2], u, rtol=1e-6)
    mag, kind = vtkio.read_vtk(out + "magnitude.vtk")
    assert kind == "scalar"
    np.testing.assert_allclose(
        mag, vio.read_raw(out + "magnitude.raw"), rtol=1e-6)


def test_cli_apply_flow(tmp_path):
    from tpuflow3d import cli

    # A linear x-ramp backward-warped by a constant +1-voxel x flow must
    # equal ramp+1 in the interior (exact for trilinear on a ramp).
    d = 12
    ramp = np.broadcast_to(
        np.arange(d, dtype=np.float32), (d, d, d)).copy()
    vp = str(tmp_path / "vol.raw")
    vio.write_raw(vp, ramp)
    flow = np.zeros((3, d, d, d), np.float32)
    flow[2] = 1.0
    vio.write_flow(str(tmp_path / "f_"), flow, magnitude=False)
    out = str(tmp_path / "out_")
    rc = cli.main(["--apply-flow", str(tmp_path / "f_"), "--frame1", vp,
                   "--out", out])
    assert rc == 0
    warped = vio.read_raw(out + "warped.raw")
    np.testing.assert_allclose(warped[:, :, :-1], ramp[:, :, :-1] + 1.0,
                               atol=1e-5)
    # Last x-plane clamps to the boundary value.
    np.testing.assert_allclose(warped[:, :, -1], ramp[:, :, -1], atol=1e-5)

    # Grid mismatch is a friendly error, not a crash.
    bad = str(tmp_path / "bad.raw")
    vio.write_raw(bad, np.zeros((4, 4, 4), np.float32))
    assert cli.main(["--apply-flow", str(tmp_path / "f_"), "--frame1", bad,
                     "--out", out]) == 2


def test_cli_sequence_tracking(tmp_path):
    """--track: seed points advance by ~the prescribed shift per pair."""
    from tpuflow3d import cli
    from tpuflow3d import synthetic as syn

    shift = (0.0, 0.0, 1.0)
    i0, i1, _ = syn.make_pair((24, 24, 24), syn.translation(shift))
    paths = []
    for t, arr in enumerate([i0, i1, i1]):
        p = str(tmp_path / f"t{t}.raw")
        vio.write_raw(p, np.asarray(arr))
        paths.append(p)
    seeds = str(tmp_path / "seeds.csv")
    with open(seeds, "w") as fh:
        fh.write("z,y,x\n12.0,12.0,10.0\n12.0,10.0,14.0\n")
    out = str(tmp_path / "seq_")
    rc = cli.main(["--frames", *paths, "--out", out, "--track", seeds,
                   "--levels", "2", "--warps", "2", "--sweeps", "10",
                   "--alpha", "0.05", "--no-magnitude"])
    assert rc == 0
    rows = np.loadtxt(out + "tracks.csv", delimiter=",", skiprows=1)
    tracks = rows[:, 2:].reshape(3, 2, 3)  # (T+1, N, 3)
    np.testing.assert_allclose(tracks[0], [[12, 12, 10], [12, 10, 14]])
    # Pair 0 has real motion: x advances by ~1 voxel, z/y stay put.
    assert abs(tracks[1, 0, 2] - tracks[0, 0, 2] - 1.0) < 0.35
    assert abs(tracks[1, 0, 0] - tracks[0, 0, 0]) < 0.2
    # Pair 1 is identical frames: points stand still.
    np.testing.assert_allclose(tracks[2], tracks[1], atol=0.1)

    # --track outside --frames mode is a friendly error.
    assert cli.main(["--frame0", paths[0], "--frame1", paths[1],
                     "--out", out, "--track", seeds]) == 2


def test_cli_accurate_preset():
    """--preset accurate = the r5 record config (tricubic + multigrid +
    early stop); -bf16 twin adds the certified storage downcast."""
    from tpuflow3d.cli import build_parser, params_from_args
    args = build_parser().parse_args(
        ["--frame0", "a.raw", "--frame1", "b.raw", "--preset", "accurate"])
    p = params_from_args(args)
    assert (p.solver, p.interp, p.warps) == ("multigrid", "tricubic", 8)
    assert p.residual_tol == 1e-6
    args = build_parser().parse_args(
        ["--frame0", "a.raw", "--frame1", "b.raw",
         "--preset", "accurate-bf16", "--levels", "3"])
    p = params_from_args(args)
    assert p.terms_dtype == "bfloat16" and p.levels == 3


def test_cli_auto_mode_piecewise_multigrid(tmp_path, monkeypatch):
    """A too-big-for-device MULTIGRID run now streams instead of erroring
    (r5: mg x piecewise closed) — auto-mode's handoff preserves the
    record solver at any size on one device."""
    from tpuflow3d import cli
    f0, f1 = _auto_mode_pair(tmp_path)
    logf = str(tmp_path / "log.jsonl")
    # Budget below the in-core peak even x8 devices (~1.5 MB need vs
    # 8 x 180 KB) so auto-mode streams, yet big enough for the
    # device-resident mg coarse chain (~130 KB <= 0.75 x budget): the mg
    # chunk sizing accepts it (an infeasible-chain budget raises loudly
    # instead — see test_pick_chunk_z_mg_infeasible_raises).
    monkeypatch.setenv("TPUFLOW_DEVICE_BYTES", "180000")
    rc = cli.main(["--frame0", f0, "--frame1", f1,
                   "--out", str(tmp_path / "flow_"), "--levels", "2",
                   "--warps", "2", "--sweeps", "10",
                   "--solver", "multigrid", "--mg-cycles", "2",
                   "--log-json", logf])
    assert rc == 0
    ev = _auto_mode_events(logf)
    assert ev and ev[0]["selected"] == "piecewise"
    u = vio.read_raw(str(tmp_path / "flow_u.raw"))
    assert abs(np.median(u[6:-6, 4:-4, 4:-4]) - 1.0) < 0.3
