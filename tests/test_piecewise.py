"""Out-of-core (piecewise) mode: streamed must match in-core (the analog of
the reference's entire-vs-piecewise equivalence, SURVEY.md §5.3).

Tolerance note: in-core and streamed runs compile at different shapes, so
XLA's fusion/rounding differs at the last ulp; SOR at omega ~1.9 transiently
amplifies such seeds over many sweeps (Jacobi and single-sweep SOR agree to
<1e-6, the full high-omega config to ~1e-3). The strict gates are the
single-sweep/Jacobi tests; the full-config test checks flow-level
agreement."""

import numpy as np
import pytest

from tpuflow3d import FlowParams, compute_flow
from tpuflow3d import synthetic as syn
from tpuflow3d.piecewise import compute_flow_piecewise


def _pair(shape, seed=0):
    return syn.make_pair(shape, syn.translation((0.8, -0.5, 0.6)), seed=seed)


@pytest.mark.parametrize("chunk", [4, 8, 64])
def test_streamed_single_sweep_strict(chunk):
    """One SOR sweep, one warp: chunked streaming must reproduce the
    in-core update to float-noise level regardless of chunking."""
    shape = (24, 16, 16)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=1,
                   median=False, presmooth_sigma=0.0, normalize=False,
                   alpha=0.05, flow_clamp=4.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=chunk)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_streamed_linear_convergence():
    """With the nonlinearity frozen (1 inner iteration), chunked streaming
    tracks in-core through deep sweep counts (pure float accumulation)."""
    shape = (24, 16, 16)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=64,
                   median=False, presmooth_sigma=0.0, normalize=False,
                   alpha=0.05, flow_clamp=4.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=4)
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("chunk", [8, 64])
def test_streamed_matches_incore(chunk):
    """Full nonlinear config: the Charbonnier re-weighting amplifies
    ulp-level seeds (see module docstring), so the gate is flow-level
    agreement + equal ground-truth quality, not iterate equality."""
    shape = (24, 16, 16)
    i0, i1, true = _pair(shape)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=8,
                   alpha=0.05, flow_clamp=4.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=chunk)
    d = np.abs(got - ref)
    assert d.max() < 5e-2 and d.mean() < 1e-2, (d.max(), d.mean())
    mask = syn.interior_mask(shape, 3)
    assert abs(syn.epe(got, true, mask) - syn.epe(ref, true, mask)) < 0.02


def test_streamed_jacobi_and_median_off():
    shape = (16, 16, 16)
    i0, i1, _ = _pair(shape, seed=3)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=10,
                   solver="jacobi", median=False, alpha=0.05,
                   flow_clamp=4.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=4)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_streamed_nondivisible_z():
    shape = (22, 16, 16)  # chunk 8 -> partial last chunk
    i0, i1, _ = _pair(shape, seed=5)
    p = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5,
                   alpha=0.05, flow_clamp=4.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=8)
    assert got.shape == (3, *shape)
    d = np.abs(got - ref)
    assert d.max() < 5e-2 and d.mean() < 1e-2, (d.max(), d.mean())


def test_piecewise_checkpoint_resume(tmp_path):
    shape = (16, 16, 16)
    i0, i1, _ = _pair(shape, seed=9)
    p = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5,
                   alpha=0.05, flow_clamp=4.0, backend="xla")
    ck = str(tmp_path / "ck")
    full = compute_flow_piecewise(i0, i1, p, chunk_z=8, checkpoint_dir=ck)
    resumed = compute_flow_piecewise(i0, i1, p, chunk_z=8,
                                     checkpoint_dir=ck)
    np.testing.assert_allclose(resumed, full, atol=1e-6)


def test_piecewise_deriv_order4_matches_incore():
    """5-point stencils widen the warp/derivative chunk margin by one;
    single-sweep strict gate (margin correctness, no ulp amplification)."""
    shape = (24, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.6, 0.0, 0.4)),
                              seed=12)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=1,
                   median=False, presmooth_sigma=0.0, normalize=False,
                   alpha=0.05, flow_clamp=2.0, deriv_order=4, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=4)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("shape,chunk,sweeps,median",
                         [((22, 16, 16), 4, 3, True),
                          ((16, 12, 12), 8, 6, True),
                          ((9, 10, 10), 3, 2, False),
                          ((24, 16, 16), 4, 8, True)])
def test_fused_stream_matches_per_halfsweep(shape, chunk, sweeps, median):
    """The fully-fused streamed warp iteration (warp+derivs+terms+sweeps+
    median+accumulate in ONE launch per chunk, du frontier band carried
    on-device) must match per-half-sweep streaming — including the
    2*sweeps > chunk regime, partial chunks, and the global-face median
    replicate. Tolerance is ulp-level, NOT bitwise: the fused program
    recomputes warp/derivatives/terms inside one XLA fusion context, so
    FMA contraction rounds ~1 ulp differently than the phase-streamed
    terms. The wavefront frontier math itself IS gated bitwise by the
    trapezoid tests below (same frontier logic, shared terms inputs);
    a seam bug here would show as chunk-localized error far above 1e-6
    (verified: the residual diff is uniform across Z, max ~2e-8)."""
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.4, -0.3, 0.8)),
                              seed=11)
    p = FlowParams(levels=2, warps=2, inner_iterations=1, sweeps=sweeps,
                   median=median, flow_clamp=2.0)
    a = compute_flow_piecewise(i0, i1, p, chunk_z=chunk, fuse=True)
    b = compute_flow_piecewise(i0, i1, p, chunk_z=chunk,
                               temporal_block=False, fuse=False)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


@pytest.mark.parametrize("chunk", [1, 64])
def test_fused_stream_extreme_chunks(chunk):
    """Degenerate chunking: chunk_z=1 (one plane per launch, frontier band
    much wider than the chunk) and chunk_z > D (single launch + drain)."""
    shape = (10, 12, 12)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.3, -0.2, 0.5)),
                              seed=17)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=3,
                   flow_clamp=1.5)
    a = compute_flow_piecewise(i0, i1, p, chunk_z=chunk, fuse=True)
    b = compute_flow_piecewise(i0, i1, p, chunk_z=chunk,
                               temporal_block=False, fuse=False)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


def test_fused_stream_pallas_backend():
    """The fused streamed pass dispatches to the Pallas kernels (fused
    warp+deriv, flat SOR half-sweep, median) exactly like the in-core
    pipeline; interpret mode runs them on CPU. Gate: pallas == xla backend
    through the full streamed solve (negative-z0 slabs, frontier masking,
    clamped-twin median gather)."""
    shape = (18, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.4, -0.3, 0.8)),
                              seed=15)
    base = dict(levels=2, warps=2, inner_iterations=1, sweeps=3,
                flow_clamp=2.0)
    a = compute_flow_piecewise(i0, i1, FlowParams(backend="pallas", **base),
                               chunk_z=4, fuse=True)
    b = compute_flow_piecewise(i0, i1, FlowParams(backend="xla", **base),
                               chunk_z=4, fuse=True)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_fused_stream_deriv4():
    """Fused pass with the 5-point derivative stencil (wider slab margin)."""
    shape = (20, 14, 14)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.2, -0.4)),
                              seed=13)
    p = FlowParams(levels=1, warps=2, inner_iterations=1, sweeps=4,
                   deriv_order=4, flow_clamp=1.5)
    a = compute_flow_piecewise(i0, i1, p, chunk_z=5, fuse=True)
    b = compute_flow_piecewise(i0, i1, p, chunk_z=5,
                               temporal_block=False, fuse=False)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


@pytest.mark.parametrize("shape,chunk,sweeps",
                         [((22, 16, 16), 4, 3), ((16, 12, 12), 8, 6),
                          ((9, 10, 10), 3, 2)])
def test_trapezoid_exact_vs_per_halfsweep(shape, chunk, sweeps):
    """The wavefront temporal-blocked solver must be EXACTLY equivalent to
    streaming each half-sweep separately (same voxel updates, same
    order-visible states), including partial chunks and odd extents."""
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.0, 0.5, 1.0)),
                              seed=7)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=sweeps,
                   flow_clamp=2.0)
    a = compute_flow_piecewise(i0, i1, p, chunk_z=chunk, temporal_block=True)
    b = compute_flow_piecewise(i0, i1, p, chunk_z=chunk,
                               temporal_block=False)
    np.testing.assert_array_equal(a, b)


def test_fused_stream_tricubic_matches_per_halfsweep():
    """interp='tricubic' through the fused streamed path (wider slab
    margin, XLA warp inside the fused launch)."""
    shape = (20, 14, 14)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.2, -0.4)),
                              seed=23)
    p = FlowParams(levels=1, warps=2, inner_iterations=1, sweeps=4,
                   interp="tricubic", flow_clamp=1.5)
    a = compute_flow_piecewise(i0, i1, p, chunk_z=5, fuse=True)
    b = compute_flow_piecewise(i0, i1, p, chunk_z=5,
                               temporal_block=False, fuse=False)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


def test_fused_stream_tricubic_pallas_matches_xla():
    """interp='tricubic' streamed with the Pallas Catmull-Rom
    select-interpolate kernel engaged (backend='pallas', interpret on CPU)
    == the XLA-backend streamed solve."""
    shape = (18, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.4, -0.3, 0.8)),
                              seed=25)
    base = dict(levels=2, warps=2, inner_iterations=1, sweeps=3,
                interp="tricubic", flow_clamp=2.0)
    a = compute_flow_piecewise(i0, i1, FlowParams(backend="pallas", **base),
                               chunk_z=4, fuse=True)
    b = compute_flow_piecewise(i0, i1, FlowParams(backend="xla", **base),
                               chunk_z=4, fuse=True)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_piecewise_tricubic_matches_incore():
    shape = (18, 14, 14)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.4, -0.2, 0.6)),
                              seed=24)
    p = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=4,
                   interp="tricubic", flow_clamp=1.5, z_multiple=1)
    from tpuflow3d.pipeline import compute_flow as cf
    ref = np.asarray(cf(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=6)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_registration_fit_streamed_matches_incore():
    """registration_fit_streamed (the --report-fit path for out-of-core
    runs) must agree with the in-core jitted diagnostic."""
    import jax.numpy as jnp

    from tpuflow3d.piecewise import registration_fit_streamed
    from tpuflow3d.warp import warp_volume

    rng = np.random.default_rng(3)
    i0 = rng.normal(size=(14, 12, 16)).astype(np.float32)
    i1 = rng.normal(size=(14, 12, 16)).astype(np.float32)
    flow = rng.uniform(-1.5, 1.5, size=(3, 14, 12, 16)).astype(np.float32)
    p = FlowParams(flow_clamp=2.0)
    mean_r, max_r, before = registration_fit_streamed(i0, i1, flow, p,
                                                      chunk_z=5)
    r = np.abs(np.asarray(warp_volume(jnp.asarray(i1), jnp.asarray(flow),
                                      max_disp=2.0)) - i0)
    assert abs(mean_r - r.mean()) < 1e-6
    # max is O(4) here: compare relatively (slab-wise warp arithmetic may
    # differ from the in-core result in the last few f32 ulps).
    assert abs(max_r - r.max()) < 1e-6 * max(1.0, r.max())
    assert abs(before - np.abs(i1 - i0).mean()) < 1e-6


# ---- gradient-constancy (gamma > 0) on the streamed path (r3: the r2
# rejection is lifted — the gc terms are recomputed on-device per slab,
# see piecewise._ph_terms_gc / _ph_fused_warp_iter) ----

def test_gamma_fused_stream_matches_incore():
    """gamma > 0, inner_iterations == 1: the fully-fused streamed path
    computes the second-derivative terms on-device and must match the
    in-core gradient-constancy solve (single-warp config: the deep
    multi-warp Charbonnier configs amplify ulp seeds, see module
    docstring — that regime is gated streamed-vs-streamed below)."""
    shape = (24, 16, 16)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=4,
                   presmooth_sigma=0.0, normalize=False,
                   alpha=0.05, gamma=1.5, flow_clamp=2.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=6, fuse=True)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gamma_fused_matches_per_halfsweep():
    """gamma > 0 deep config: fused one-launch-per-chunk streaming equals
    per-half-sweep streaming (same arithmetic, ulp-level tolerance as the
    non-gamma twin test)."""
    shape = (22, 16, 16)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=2, warps=2, inner_iterations=1, sweeps=4,
                   alpha=0.05, gamma=1.5, flow_clamp=2.0, backend="xla")
    a = compute_flow_piecewise(i0, i1, p, chunk_z=4, fuse=True)
    b = compute_flow_piecewise(i0, i1, p, chunk_z=4,
                               temporal_block=False, fuse=False)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


@pytest.mark.parametrize("chunk", [4, 64])
def test_gamma_streamed_single_sweep_strict(chunk):
    """gamma > 0 on the unfused phases (inner_iterations > 1 forces the
    per-phase path): one sweep must reproduce in-core to float noise."""
    shape = (24, 16, 16)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=1, warps=1, inner_iterations=2, sweeps=1,
                   median=False, presmooth_sigma=0.0, normalize=False,
                   alpha=0.05, gamma=2.0, flow_clamp=4.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=chunk)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_gamma_trapezoid_matches_per_halfsweep():
    """gamma > 0: the wavefront trapezoid over the general-SPD system is
    exactly the per-half-sweep streaming order."""
    shape = (20, 12, 16)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=1, warps=1, inner_iterations=2, sweeps=5,
                   median=False, presmooth_sigma=0.0, normalize=False,
                   alpha=0.05, gamma=1.0, flow_clamp=4.0, backend="xla")
    a = compute_flow_piecewise(i0, i1, p, chunk_z=4, temporal_block=True)
    b = compute_flow_piecewise(i0, i1, p, chunk_z=4, temporal_block=False)
    np.testing.assert_array_equal(a, b)


def test_gamma_streamed_jacobi():
    """gamma > 0 with the Jacobi solver streams through _ph_jacobi_gc."""
    shape = (20, 12, 16)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=1, warps=1, inner_iterations=2, sweeps=6,
                   solver="jacobi", median=False, presmooth_sigma=0.0,
                   normalize=False, alpha=0.05, gamma=1.0, flow_clamp=4.0,
                   backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=4)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_gamma_fused_stream_pallas_matches_xla():
    """gamma > 0 streamed with backend='pallas' (interpret on CPU): the
    fused warp kernel's EMITTED warped slab feeds the gradient-constancy
    terms (r4, piecewise.py fused-warp branch) — must match the XLA
    backend's streamed solve, for both samplers."""
    shape = (22, 16, 16)
    i0, i1, _ = _pair(shape)
    for interp in ("trilinear", "tricubic"):
        base = dict(levels=2, warps=2, inner_iterations=1, sweeps=4,
                    alpha=0.05, gamma=1.5, flow_clamp=2.0, interp=interp)
        a = compute_flow_piecewise(
            i0, i1, FlowParams(backend="pallas", **base), chunk_z=4,
            fuse=True)
        b = compute_flow_piecewise(
            i0, i1, FlowParams(backend="xla", **base), chunk_z=4,
            fuse=True)
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4,
                                   err_msg=interp)


# ---- streamed multigrid (r5: solver="multigrid" out-of-core) ----

def _mg_frozen_system(shape=(48, 32, 32), gamma=0.0):
    import jax.numpy as jnp

    from tpuflow3d.derivatives import derivatives, grad_constancy_terms
    from tpuflow3d.grid import HaloCtx
    from tpuflow3d.mgsolver import data_block_d6
    from tpuflow3d.solver import compute_terms
    from tpuflow3d.warp import warp_volume

    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    gc = grad_constancy_terms(i0, i1, g=g) if gamma > 0 else None
    p = FlowParams(solver="multigrid", mg_cycles=2, mg_pre=2, mg_post=2,
                   alpha=0.05, gamma=gamma, backend="xla")
    flow = jnp.zeros((3, *shape), jnp.float32)
    du0 = jnp.zeros_like(flow)
    t = compute_terms(g, it, flow, du0, p, HaloCtx(), gc=gc)
    return t, p


@pytest.mark.parametrize("chunk", [8, 16])
def test_streamed_mg_frozen_solver_strict(chunk):
    """On a frozen linear system, the streamed V-cycle (_stream_mg_solve:
    trapezoid fine smooths + streamed residual/restriction + device
    coarse chain) reproduces the in-core mg_solve to float-noise level,
    independent of chunking."""
    from tpuflow3d.mgsolver import data_block_d6, mg_solve
    from tpuflow3d.piecewise import _stream_mg_solve

    t, p = _mg_frozen_system()
    shape = t.psi_s.shape
    du_ref, _ = mg_solve(np.zeros((3, *shape), np.float32), t, p)
    du_got = _stream_mg_solve(
        np.zeros((3, *shape), np.float32), np.asarray(t.c),
        np.asarray(t.psi_s), np.asarray(data_block_d6(t)), p, chunk)
    np.testing.assert_allclose(du_got, np.asarray(du_ref), atol=2e-6)


def test_streamed_mg_frozen_solver_gamma():
    """Gradient-constancy twin: the full-rank data block (t.d6) streams
    through the same machinery."""
    from tpuflow3d.mgsolver import data_block_d6, mg_solve
    from tpuflow3d.piecewise import _stream_mg_solve

    t, p = _mg_frozen_system(gamma=1.0)
    assert t.d6 is not None
    shape = t.psi_s.shape
    du_ref, _ = mg_solve(np.zeros((3, *shape), np.float32), t, p)
    du_got = _stream_mg_solve(
        np.zeros((3, *shape), np.float32), np.asarray(t.c),
        np.asarray(t.psi_s), np.asarray(data_block_d6(t)), p, 16)
    np.testing.assert_allclose(du_got, np.asarray(du_ref), atol=2e-6)


def test_streamed_mg_single_warp_strict():
    """One warp, one inner iteration: streamed mg pipeline must track
    in-core tightly (no nonlinear amplification)."""
    shape = (24, 16, 16)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=4,
                   solver="multigrid", mg_cycles=2, median=False,
                   presmooth_sigma=0.0, normalize=False,
                   alpha=0.05, flow_clamp=4.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=8)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_streamed_mg_pipeline_full():
    """Full coarse-to-fine mg pipeline (warps/inner/median/upsample)
    streamed vs in-core. The bound reflects nonlinear warp amplification
    of float noise, NOT solver drift (the frozen-system gate above is
    2e-6); the SOR streamed path measures ~1.5e-3 max at the same
    settings."""
    shape = (48, 32, 32)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=20,
                   solver="multigrid", mg_cycles=2, alpha=0.05,
                   backend="xla", flow_clamp=2.0)
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=16)
    np.testing.assert_allclose(got, ref, atol=1e-3)
    assert float(np.abs(got - ref).mean()) < 1e-4


def test_streamed_mg_gamma_pipeline():
    """Same bound rationale as test_streamed_mg_pipeline_full; the gc
    composition amplifies slightly more (second-derivative terms), max
    measured 1.9e-3 on 0.016% of voxels — the SOR streamed baseline is
    1.5e-3 at the same settings."""
    shape = (48, 32, 32)
    i0, i1, _ = _pair(shape)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=20,
                   solver="multigrid", mg_cycles=2, alpha=0.05, gamma=1.0,
                   backend="xla", flow_clamp=2.0)
    ref = np.asarray(compute_flow(i0, i1, p))
    got = compute_flow_piecewise(i0, i1, p, chunk_z=16)
    np.testing.assert_allclose(got, ref, atol=3e-3)
    assert float(np.abs(got - ref).mean()) < 1e-4


def test_streamed_mg_early_stop():
    """residual_tol > 0: the streamed host-side early stop reproduces the
    in-core while_loop's stopping decision and solution."""
    from tpuflow3d.mgsolver import data_block_d6, mg_solve
    from tpuflow3d.piecewise import _stream_mg_solve

    t, p = _mg_frozen_system()
    p = p.replace(mg_cycles=6, residual_tol=1e-4, sweeps=8)
    shape = t.psi_s.shape
    du_ref, _ = mg_solve(np.zeros((3, *shape), np.float32), t, p)
    du_got = _stream_mg_solve(
        np.zeros((3, *shape), np.float32), np.asarray(t.c),
        np.asarray(t.psi_s), np.asarray(data_block_d6(t)), p, 16)
    np.testing.assert_allclose(du_got, np.asarray(du_ref), atol=2e-6)
