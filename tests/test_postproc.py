"""Derived-field post-processing (tpuflow3d.postproc): divergence, curl,
Jacobian determinant — the quantities tomography motion analysis computes
from the flow (capability extension; the reference writes only
u/v/w/magnitude, SURVEY.md §5.1)."""

import numpy as np
import pytest

from tpuflow3d.postproc import (DERIVED_FIELDS, curl, divergence,
                                jacobian_det, write_derived)


def _coords(shape):
    z, y, x = np.meshgrid(*(np.arange(n, dtype=np.float32) for n in shape),
                          indexing="ij")
    return z, y, x


def test_divergence_of_linear_field_is_trace():
    shape = (12, 10, 14)
    z, y, x = _coords(shape)
    # s_a = A[a] . (z, y, x): divergence = trace(A) everywhere.
    A = np.array([[0.2, 0.1, -0.3], [0.0, -0.4, 0.25], [0.5, 0.0, 0.1]],
                 np.float32)
    flow = np.stack([A[a, 0] * z + A[a, 1] * y + A[a, 2] * x
                     for a in range(3)])
    div = divergence(flow)
    interior = div[1:-1, 1:-1, 1:-1]
    np.testing.assert_allclose(interior, np.trace(A), atol=1e-5)
    # Replicate-edge convention: boundary central diffs are half-slope.
    assert abs(div[0, 5, 5] - (0.5 * A[0, 0] + A[1, 1] + A[2, 2])) < 1e-5


def test_curl_of_rigid_rotation_is_twice_omega():
    shape = (12, 12, 12)
    z, y, x = _coords(shape)
    # Rotation with angular velocity w about the z axis (axis 0), centered:
    # s = omega x r with omega = (w, 0, 0) in (z,y,x) components ->
    # s_y = -w*(x-cx)... using eps over (z,y,x) indices consistently.
    w = 0.05
    cy, cx = 5.5, 5.5
    flow = np.stack([np.zeros(shape, np.float32),
                     w * (x - cx),
                     -w * (y - cy)]).astype(np.float32)
    c = curl(flow)
    interior = (slice(1, -1),) * 3
    np.testing.assert_allclose(c[0][interior], -2.0 * w, atol=1e-5)
    np.testing.assert_allclose(c[1][interior], 0.0, atol=1e-5)
    np.testing.assert_allclose(c[2][interior], 0.0, atol=1e-5)


def test_jacdet_of_uniform_scaling():
    shape = (10, 10, 10)
    z, y, x = _coords(shape)
    s = 0.1  # x -> (1+s) x: volume ratio (1+s)^3
    flow = np.stack([s * z, s * y, s * x])
    jd = jacobian_det(flow)
    interior = jd[1:-1, 1:-1, 1:-1]
    np.testing.assert_allclose(interior, (1 + s) ** 3, rtol=1e-5)


def test_jacdet_of_zero_flow_is_one():
    jd = jacobian_det(np.zeros((3, 6, 6, 6), np.float32))
    np.testing.assert_allclose(jd, 1.0)


def test_write_derived_files(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.normal(size=(3, 8, 8, 8)).astype(np.float32)
    prefix = str(tmp_path / "f_")
    files = write_derived(prefix, flow, DERIVED_FIELDS)
    assert len(files) == 5  # div + 3 curl components + jacdet
    got = np.fromfile(f"{prefix}divergence.raw",
                      np.float32).reshape(8, 8, 8)
    np.testing.assert_allclose(got, divergence(flow), atol=0)
    # curl uses the u/v/w (x/y/z) suffix convention: curl_u = component 2.
    cu = np.fromfile(f"{prefix}curl_u.raw", np.float32).reshape(8, 8, 8)
    np.testing.assert_allclose(cu, curl(flow)[2], atol=0)
    with pytest.raises(ValueError, match="unknown derived"):
        write_derived(prefix, flow, ("nope",))


def test_cli_derived_end_to_end(tmp_path):
    """--derived through the real CLI on a tiny pair."""
    from tpuflow3d import synthetic as syn
    from tpuflow3d import volume as vio
    from tpuflow3d.cli import main

    shape = (16, 12, 12)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=1)
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    out = str(tmp_path / "flow_")
    rc = main(["--frame0", f0, "--frame1", f1, "--out", out,
               "--levels", "2", "--warps", "1", "--sweeps", "3",
               "--inner-iterations", "1", "--derived", "divergence,jacdet",
               "--incore"])
    assert rc == 0
    for name in ("divergence", "jacdet"):
        arr = np.fromfile(f"{out}{name}.raw", np.float32)
        assert arr.size == np.prod(shape)


def test_cli_derived_validated_before_solve(tmp_path):
    from tpuflow3d.cli import main
    rc = main(["--frame0", "missing.raw", "--frame1", "missing.raw",
               "--derived", "bogus"])
    assert rc != 0


def test_cli_derived_rejected_with_distributed():
    from tpuflow3d.cli import main
    rc = main(["--frame0", "a.raw", "--frame1", "b.raw", "--distributed",
               "--derived", "divergence"])
    assert rc != 0


def test_consistency_error_zero_for_inverse_pair():
    from tpuflow3d.postproc import consistency_error
    shape = (10, 10, 10)
    fwd = np.zeros((3, *shape), np.float32)
    fwd[0], fwd[1], fwd[2] = 0.5, -0.25, 1.0
    err = consistency_error(fwd, -fwd)
    # Constant fields: the warp samples the same constant everywhere.
    np.testing.assert_allclose(err, 0.0, atol=1e-6)


def test_consistency_error_flags_disagreement():
    from tpuflow3d.postproc import consistency_error
    shape = (8, 8, 8)
    fwd = np.full((3, *shape), 0.5, np.float32)
    bwd = np.zeros((3, *shape), np.float32)  # inconsistent backward flow
    err = consistency_error(fwd, bwd)
    np.testing.assert_allclose(err, np.sqrt(3 * 0.25), atol=1e-5)


def test_cli_check_consistency(tmp_path):
    from tpuflow3d import synthetic as syn
    from tpuflow3d import volume as vio
    from tpuflow3d.cli import main

    shape = (16, 12, 12)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=2)
    f0, f1 = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
    vio.write_raw(f0, i0)
    vio.write_raw(f1, i1)
    out = str(tmp_path / "flow_")
    rc = main(["--frame0", f0, "--frame1", f1, "--out", out,
               "--levels", "2", "--warps", "1", "--sweeps", "5",
               "--inner-iterations", "1", "--check-consistency",
               "--incore"])
    assert rc == 0
    err = np.fromfile(f"{out}consistency.raw", np.float32).reshape(shape)
    # A clean translation is fwd-bwd consistent away from the faces.
    assert np.median(err[4:-4, 3:-3, 3:-3]) < 0.25


def test_cli_check_consistency_rejected_with_frames():
    from tpuflow3d.cli import main
    rc = main(["--frames", "a.raw", "b.raw", "--check-consistency"])
    assert rc != 0


def test_streamed_ops_independent_of_chunk_size():
    """Z-streamed derived ops must stitch exactly: results identical for
    any chunk size (margin planes carry the stencil across seams)."""
    from tpuflow3d.postproc import consistency_error
    rng = np.random.default_rng(5)
    flow = rng.normal(size=(3, 19, 10, 12)).astype(np.float32) * 0.8
    bwd = rng.normal(size=(3, 19, 10, 12)).astype(np.float32) * 0.8
    for fn in (divergence, curl, jacobian_det):
        a = fn(flow, chunk_z=4)
        b = fn(flow, chunk_z=64)
        np.testing.assert_array_equal(a, b)
    # The warp computes sample coordinates in the slab-local frame, so
    # chunk size shifts the float addends by whole integers — agreement is
    # ulp-level, not bitwise.
    ca = consistency_error(flow, bwd, chunk_z=5)
    cb = consistency_error(flow, bwd, chunk_z=64)
    np.testing.assert_allclose(ca, cb, atol=1e-5, rtol=1e-5)


def test_sample_flow_at_and_advance():
    from tpuflow3d import postproc

    # Linear-in-x flow: s = (0, 0, 0.5 + 0.1*x). Trilinear sampling is
    # exact on linear fields at fractional positions.
    d = 8
    flow = np.zeros((3, d, d, d), np.float64)
    x = np.arange(d, dtype=np.float64)
    flow[2] = 0.5 + 0.1 * x[None, None, :]
    pts = np.array([[2.0, 3.0, 1.5], [4.25, 0.5, 6.0], [0.0, 0.0, 0.0]])
    s = postproc.sample_flow_at(flow, pts)
    np.testing.assert_allclose(s[:, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(s[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(s[:, 2], 0.5 + 0.1 * pts[:, 2], atol=1e-12)
    adv = postproc.advance_points(flow, pts)
    np.testing.assert_allclose(adv, pts + s, atol=1e-12)
    # Out-of-range points clamp (warp convention, SURVEY.md §10).
    far = postproc.sample_flow_at(flow, np.array([[0.0, 0.0, 99.0]]))
    np.testing.assert_allclose(far[0, 2], 0.5 + 0.1 * (d - 1), atol=1e-12)


def test_tracks_csv_roundtrip(tmp_path):
    from tpuflow3d import postproc

    tracks = np.arange(2 * 3 * 3, dtype=np.float64).reshape(2, 3, 3) / 7.0
    p = str(tmp_path / "tracks.csv")
    postproc.write_tracks_csv(p, tracks)
    rows = np.loadtxt(p, delimiter=",", skiprows=1)
    assert rows.shape == (6, 5)  # t,point,z,y,x per (t, point)
    np.testing.assert_allclose(
        rows[:, 2:].reshape(2, 3, 3), tracks, atol=1e-6)
    np.testing.assert_array_equal(rows[:, 0], [0, 0, 0, 1, 1, 1])

    # Seed files: z,y,x triples with a header line tolerated.
    sp = str(tmp_path / "seeds.csv")
    with open(sp, "w") as fh:
        fh.write("z,y,x\n1.0,2.0,3.0\n\n4.5,5.5,6.5\n")
    seeds = postproc.read_seed_csv(sp)
    np.testing.assert_allclose(seeds, [[1, 2, 3], [4.5, 5.5, 6.5]])


def test_read_seed_csv_rejects_malformed_rows(tmp_path):
    import pytest

    from tpuflow3d import postproc

    # A short row (fewer than 3 fields) must raise with its line number,
    # not produce a ragged-array crash downstream.
    p = str(tmp_path / "short.csv")
    with open(p, "w") as fh:
        fh.write("z,y,x\n1.0,2.0,3.0\n1,2\n")
    with pytest.raises(ValueError, match="short.csv:3"):
        postproc.read_seed_csv(p)

    # A typo'd later row must raise, not silently vanish as a "header".
    p = str(tmp_path / "typo.csv")
    with open(p, "w") as fh:
        fh.write("1.0,2.0,3.0\n4.x,5.0,6.0\n")
    with pytest.raises(ValueError, match="typo.csv:2"):
        postproc.read_seed_csv(p)

    # Only a non-numeric FIRST line passes as a header.
    p = str(tmp_path / "hdr.csv")
    with open(p, "w") as fh:
        fh.write("z,y,x\n7.0,8.0,9.0\n")
    np.testing.assert_allclose(postproc.read_seed_csv(p), [[7, 8, 9]])


def test_sample_flow_at_rejects_nonfinite_points():
    import pytest

    from tpuflow3d import postproc

    flow = np.zeros((3, 4, 4, 4), np.float64)
    pts = np.array([[1.0, 1.0, 1.0], [np.nan, 2.0, 2.0]])
    with pytest.raises(ValueError, match="non-finite"):
        postproc.sample_flow_at(flow, pts)


def test_cli_apply_flow_rejects_solve_mode_flags(tmp_path):
    from tpuflow3d import cli

    # --apply-flow combined with any solve-mode flag is an error (exit 2),
    # not a silently ignored flag.
    rc = cli.main(["--apply-flow", str(tmp_path / "pfx_"),
                   "--frame1", str(tmp_path / "f1.raw"), "--out",
                   str(tmp_path / "o_"), "--piecewise"])
    assert rc == 2
    rc = cli.main(["--apply-flow", str(tmp_path / "pfx_"),
                   "--frame1", str(tmp_path / "f1.raw"), "--out",
                   str(tmp_path / "o_"), "--track",
                   str(tmp_path / "seeds.csv")])
    assert rc == 2


def test_cli_export_vtk_rejected_with_distributed():
    import pytest

    from tpuflow3d import cli

    args = cli.build_parser().parse_args(
        ["--frame0", "a.raw", "--frame1", "b.raw", "--distributed",
         "--export-vtk"])
    with pytest.raises(ValueError, match="export-vtk"):
        cli._check_path_flags(args)


def test_read_seed_csv_comment_and_short_headers(tmp_path):
    """Non-numeric first lines without commas ('# comment', 'z y x') pass
    as headers; a truncated-but-NUMERIC first row does not."""
    import pytest

    from tpuflow3d import postproc

    p = str(tmp_path / "c.csv")
    with open(p, "w") as fh:
        fh.write("# my seed points\n1.0,2.0,3.0\n")
    np.testing.assert_allclose(postproc.read_seed_csv(p), [[1, 2, 3]])

    p = str(tmp_path / "s.csv")
    with open(p, "w") as fh:
        fh.write("z y x\n4.0,5.0,6.0\n")
    np.testing.assert_allclose(postproc.read_seed_csv(p), [[4, 5, 6]])

    p = str(tmp_path / "t.csv")
    with open(p, "w") as fh:
        fh.write("1,2\n4.0,5.0,6.0\n")
    with pytest.raises(ValueError, match="t.csv:1"):
        postproc.read_seed_csv(p)


def test_read_seed_csv_typod_first_row_raises(tmp_path):
    """A PARTIALLY numeric first line ('1.0,2.0,3.O') is a typo'd data
    row, not a header: it must raise with its line number, not silently
    vanish (ADVICE r4)."""
    import pytest

    from tpuflow3d import postproc

    p = str(tmp_path / "typo.csv")
    with open(p, "w") as fh:
        fh.write("1.0,2.0,3.O\n4.0,5.0,6.0\n")
    with pytest.raises(ValueError, match=":1:"):
        postproc.read_seed_csv(p)
    # ...but a '#'-comment first line may contain numbers and still pass
    # as a header.
    p = str(tmp_path / "numcomment.csv")
    with open(p, "w") as fh:
        fh.write("# shift 1.5, -1.0, 0.75\n4.0,5.0,6.0\n")
    np.testing.assert_allclose(postproc.read_seed_csv(p), [[4, 5, 6]])
