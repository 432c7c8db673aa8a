"""End-to-end gate: config #1 of the ladder (BASELINE.json:7) —
64^3 Gaussian-blob translation/rotation, 3-level pyramid, CPU-runnable,
analytic ground truth -> EPE assertions.

Thresholds are calibrated to what variational flow can recover per texture:
translations on blob texture are near-exact; nonrigid fields use dense
Fourier texture (blob texture under-constrains tangential components via
the aperture effect — see synthetic.FourierField)."""

import numpy as np
import pytest

from tpuflow3d import FlowParams, compute_flow
from tpuflow3d import synthetic as syn

P64 = FlowParams(levels=3, scale_factor=0.5, warps=3, inner_iterations=3,
                 sweeps=20, alpha=0.05)


def _run(shape, flow_fn, params=P64, seed=0, texture="blobs"):
    i0, i1, true = syn.make_pair(shape, flow_fn, seed=seed, texture=texture)
    est = np.asarray(compute_flow(i0, i1, params))
    mask = syn.gradient_mask(i0, 0.75) & syn.interior_mask(shape, 4)
    return syn.epe(est, true, mask), est, true


@pytest.mark.parametrize("shift", [(1.5, -1.0, 0.75), (0.0, 0.0, 2.0)])
def test_translation_64(shift):
    err, est, true = _run((64, 64, 64), syn.translation(shift))
    assert err < 0.05, err


def test_rotation_64():
    fn = syn.rotation(center=(32, 32, 32), axis="z", degrees=2.0)
    err, est, true = _run((64, 64, 64), fn)
    assert err < 0.15, err


def test_sinusoid_48_dense_texture():
    shape = (48, 48, 48)
    fn = syn.sinusoid(shape, amplitude=1.0)
    err, est, true = _run(shape, fn, P64.replace(alpha=0.02),
                          texture="fourier")
    assert err < 0.2, err


def test_median_and_clamp_paths():
    shape = (32, 32, 32)
    p = P64.replace(median=False, flow_clamp=3.0, levels=2)
    err, est, true = _run(shape, syn.translation((1.0, 0.5, -0.5)), p)
    assert err < 0.1, err
    assert np.abs(est).max() <= 3.0 + 1e-5


def test_nondivisible_z_padding():
    shape = (30, 32, 32)
    p = P64.replace(levels=2, z_multiple=8)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.0, 0.0, 0.0)))
    est = np.asarray(compute_flow(i0, i1, p))
    assert est.shape == (3, *shape)
    mask = syn.gradient_mask(i0, 0.75) & syn.interior_mask(shape, 4)
    assert syn.epe(est, true, mask) < 0.1


def test_jacobi_solver_end_to_end():
    shape = (32, 32, 32)
    p = P64.replace(solver="jacobi", sweeps=120, levels=2)
    err, est, true = _run(shape, syn.translation((0.8, -0.6, 0.4)), p)
    # Jacobi needs ~4x the sweeps of SOR for the same residual; this test
    # checks the solver path works, the SOR tests check accuracy.
    assert err < 0.2, err


def test_diagnostics_residuals():
    shape = (32, 32, 32)
    p = P64.replace(levels=2, track_residuals=True)
    i0, i1, _ = syn.make_pair(shape, syn.translation((1.0, 0.0, 0.0)))
    flow, diag = compute_flow(i0, i1, p, diagnostics=True)
    res = np.asarray(diag["residuals"])
    assert res.shape == (2, p.warps, p.inner_iterations * p.sweeps)
    assert (res > 0).all()


def test_large_translation_unclamped():
    """Motions far beyond one voxel are recovered through the pyramid when
    no clamp is set (the sharded path clamps; see sharding.py)."""
    shape = (64, 64, 64)
    err, est, true = _run(shape, syn.translation((0.0, 0.0, 6.0)),
                          P64.replace(levels=4))
    assert err < 0.1, err


def test_residual_tol_early_stop():
    """With a loose tolerance the solver stops sweeping early but still
    recovers the flow; with a tiny tolerance it matches the full-sweep
    result."""
    shape = (32, 32, 32)
    fn = syn.translation((1.0, 0.0, -0.5))
    p = P64.replace(levels=2)
    ref_err, ref, _ = _run(shape, fn, p)
    tight_err, tight, _ = _run(shape, fn, p.replace(residual_tol=1e-12))
    np.testing.assert_allclose(tight, ref, atol=1e-6)
    loose_err, _, _ = _run(shape, fn, p.replace(residual_tol=1e-4))
    assert loose_err < max(2 * ref_err, 0.1), (loose_err, ref_err)


def test_bf16_terms_storage():
    """terms_dtype=bfloat16 (storage-only downcast of the sweep constants)
    costs <1e-3 EPE vs the f32 run and recovers the flow. The budget is
    certified at the converged 256^3 config on the attached TPU: bf16
    EPE 2.43e-3 vs the 2.40e-3 f32 floor, a 3e-5 delta (STUDY_256.jsonl
    `warps8_restol_bf16terms_warpstepped`; VALIDATION.md bf16 row —
    VERDICT r2 item 6)."""
    shape = (48, 48, 48)
    fn = syn.translation((1.0, -0.5, 0.75))
    p = P64.replace(levels=3)
    err32, est32, _ = _run(shape, fn, p)
    err16, est16, _ = _run(shape, fn, p.replace(terms_dtype="bfloat16"))
    assert err16 < err32 + 1e-3, (err16, err32)
    assert np.abs(est16 - est32).mean() < 1e-3


def test_quadratic_penalizers_end_to_end():
    """Pure Horn-Schunck mode (quadratic data + smoothness, SURVEY.md §10
    penalizer flag) recovers translations too; charbonnier is sharper on
    the same budget but both must converge."""
    shape = (48, 48, 48)
    fn = syn.translation((1.0, 0.0, -0.5))
    p = P64.replace(penalizer_data="quadratic",
                    penalizer_smooth="quadratic", alpha=0.02)
    err, est, true = _run(shape, fn, p)
    assert err < 0.15, err


def test_mixed_penalizers():
    shape = (32, 32, 32)
    fn = syn.translation((0.5, 0.5, 0.5))
    p = P64.replace(levels=2, penalizer_data="charbonnier",
                    penalizer_smooth="quadratic")
    err, est, true = _run(shape, fn, p)
    assert err < 0.15, err


def test_deriv_order4_recovers_translation():
    """5-point derivative option (SURVEY.md §11 risk item 3): same analytic
    gate as the default stencil."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (24, 24, 24)
    i0, i1, true = syn.make_pair(shape, syn.translation((0.0, 0.0, 1.0)),
                                 seed=5)
    # The 5-point stencil's narrower effective support linearizes large
    # motions less well per warp iteration: give it more warps than the
    # order-2 gate needs (documented A/B in VALIDATION.md).
    p = FlowParams(levels=2, warps=5, inner_iterations=2, sweeps=10,
                   alpha=0.05, deriv_order=4)
    flow = np.asarray(compute_flow(i0, i1, p))
    assert abs(np.median(flow[2]) - 1.0) < 0.3
    # And it is actually a different discretization from the default.
    flow2 = np.asarray(compute_flow(i0, i1, p.replace(deriv_order=2)))
    assert np.abs(flow - flow2).max() > 1e-6


def test_deriv_order4_sharded_matches_unsharded():
    """Order-4 stencils need 2-plane halos: the zpad(2) exchange path."""
    import jax
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs >=4 virtual devices")
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn
    from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                    prepare_params)

    shape = (32, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.7, 0.0, 0.5)),
                              seed=6)
    p = FlowParams(levels=2, warps=1, inner_iterations=2, sweeps=6,
                   alpha=0.05, deriv_order=4)
    p_sharded = prepare_params(p, 4)
    ref = np.asarray(compute_flow(i0, i1, p_sharded))
    got = np.asarray(compute_flow_sharded(i0, i1, p, mesh=make_z_mesh(4)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_tricubic_interp_improves_subvoxel_epe():
    """interp='tricubic' must beat trilinear on a sub-voxel translation:
    the converged EPE floor on textured volumes is set by warp
    interpolation bias (VALIDATION.md 256^3 study), which Catmull-Rom
    reduces by two orders in smoothness."""
    shape = (48, 48, 48)
    i0, i1, true = syn.make_pair(shape, syn.translation((0.5, -0.25, 0.75)),
                                 texture="fourier", seed=21)
    kw = dict(levels=2, warps=4, inner_iterations=2, sweeps=15, alpha=0.05)
    mask = syn.interior_mask(shape, 4)
    f_lin = np.asarray(compute_flow(i0, i1, FlowParams(**kw)))
    f_cub = np.asarray(compute_flow(i0, i1,
                                    FlowParams(interp="tricubic", **kw)))
    e_lin = syn.epe(f_lin, true, mask)
    e_cub = syn.epe(f_cub, true, mask)
    assert e_cub < 0.7 * e_lin, (e_cub, e_lin)


def test_level_fns_memoized_across_calls():
    """The checkpointed/timed drivers must reuse one jit wrapper per
    (params, shape, level) across calls — a fresh closure per pair would
    recompile every level of every pair of a --frames series."""
    from tpuflow3d.pipeline import _level_fn_cached, _prep_fn_cached
    from tpuflow3d.sharding import _sharded_level_fn, make_z_mesh

    p = FlowParams(levels=2, warps=1, sweeps=2)
    assert _prep_fn_cached(p) is _prep_fn_cached(p)
    assert (_level_fn_cached(p, (16, 16, 16), 1)
            is _level_fn_cached(p, (16, 16, 16), 1))
    mesh = make_z_mesh(2)
    assert (_sharded_level_fn(p, mesh, (16, 16, 16), 0)
            is _sharded_level_fn(p, mesh, (16, 16, 16), 0))
