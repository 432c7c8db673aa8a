"""Multigrid solver (mgsolver.py; FlowParams solver="multigrid"): a
convergence-rate extension over the reference's plain SOR. Gates:
correctness (V-cycles converge to the same solution of the frozen linear
system as exhaustive SOR), rate (a cost-equivalent sweep budget leaves MG
at a much smaller residual), pipeline recovery, and sharded==unsharded."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow3d import FlowParams, compute_flow
from tpuflow3d import synthetic as syn
from tpuflow3d.derivatives import derivatives
from tpuflow3d.grid import HaloCtx
from tpuflow3d.mgsolver import build_mg_levels, mg_residual, mg_solve, mg_shapes
from tpuflow3d.solver import compute_terms, parity_mask, sor_halfsweep
from tpuflow3d.warp import warp_volume


def _system(shape=(24, 24, 24), seed=0, alpha=0.05):
    """A frozen linearized system from real image data (du=0 terms)."""
    rng = np.random.default_rng(seed)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    p = FlowParams(alpha=alpha)
    flow = jnp.zeros((3, *shape), jnp.float32)
    du0 = jnp.zeros_like(flow)
    t = compute_terms(g, it, flow, du0, p, HaloCtx())
    return t, du0


def _sor_n(du, t, n, omega=1.9, ctx=HaloCtx()):
    parity = parity_mask(du.shape[1:], ctx)
    for _ in range(n):
        du = sor_halfsweep(du, t, omega, parity, 0, ctx)
        du = sor_halfsweep(du, t, omega, parity, 1, ctx)
    return du


def _rnorm(du, t, p=None):
    lvl0 = build_mg_levels(t, p or FlowParams(alpha=0.05), HaloCtx())[0]
    return float(jnp.mean(jnp.abs(mg_residual(du, lvl0, t.c, HaloCtx()))))


def test_mg_shapes_floor_and_multiple():
    shapes = mg_shapes((64, 48, 40), 1)
    assert shapes[0] == (64, 48, 40)
    assert all(min(s) >= 4 for s in shapes)
    shapes8 = mg_shapes((64, 64, 64), 8)
    assert all(s[0] % 8 == 0 for s in shapes8)


def test_vcycle_converges_to_exact():
    """Many V-cycles solve the frozen system to the same fixed point as
    exhaustive SOR (the linear system has a unique solution)."""
    t, du0 = _system()
    p = FlowParams(solver="multigrid", mg_cycles=10, mg_pre=2, mg_post=2,
                   alpha=0.05)
    du_mg, _ = mg_solve(du0, t, p)
    du_ref = _sor_n(du0, t, 400)
    # the reference really is converged (f32 asymptotic floor ~5e-6)
    assert _rnorm(du_ref, t) < 1e-5
    np.testing.assert_allclose(np.asarray(du_mg), np.asarray(du_ref),
                               atol=5e-5)


def test_mg_beats_sor_at_equal_cost():
    """Convergence rate: 2 V-cycles (nu1=nu2=2 => ~11 fine-sweep
    equivalents of HBM traffic incl. residual/coarse work) must leave the
    residual far below 12 plain SOR sweeps'."""
    t, du0 = _system(shape=(48, 48, 48))
    p = FlowParams(solver="multigrid", mg_cycles=2, mg_pre=2, mg_post=2,
                   alpha=0.05)
    du_mg, _ = mg_solve(du0, t, p)
    du_sor = _sor_n(du0, t, 12)
    r_mg, r_sor = _rnorm(du_mg, t), _rnorm(du_sor, t)
    assert r_mg < 0.5 * r_sor, (r_mg, r_sor)


def test_pipeline_multigrid_recovers_flow():
    """solver='multigrid' end-to-end: same translation recovery as the
    SOR pipeline at matched nonlinearity settings."""
    shape = (32, 32, 32)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.0, 0.0, -0.5)),
                                 seed=3)
    base = dict(levels=2, warps=2, inner_iterations=2, alpha=0.05,
                backend="xla")
    p_sor = FlowParams(solver="sor", sweeps=20, **base)
    p_mg = FlowParams(solver="multigrid", mg_cycles=2, sweeps=20, **base)
    ref = np.asarray(compute_flow(i0, i1, p_sor))
    got = np.asarray(compute_flow(i0, i1, p_mg))
    mask = syn.interior_mask(shape, 3)
    e_ref = syn.epe(ref, true, mask)
    e_got = syn.epe(got, true, mask)
    assert e_got < e_ref + 0.02, (e_got, e_ref)


def test_mg_sharded_matches_unsharded():
    """The V-cycle is HaloCtx-generic: restriction/prolongation/masks/
    parity all ride the sharded helpers, so a Z-sharded multigrid run
    must match in-core."""
    import jax

    from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                    prepare_params)
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    shape = (32, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=7)
    p = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=4,
                   solver="multigrid", mg_cycles=2, alpha=0.05,
                   backend="xla")
    ref = np.asarray(compute_flow(i0, i1, prepare_params(p, 4)))
    got = np.asarray(compute_flow_sharded(i0, i1, p, make_z_mesh(4)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_mg_residual_tracking():
    """track_residuals records per-cycle update norms, monotone-ish."""
    t, du0 = _system()
    p = FlowParams(solver="multigrid", mg_cycles=3, alpha=0.05)
    slot = jnp.zeros((p.sweeps,), jnp.float32)
    _, res = mg_solve(du0, t, p, residuals_slot=slot)
    res = np.asarray(res)
    assert res[0] > res[2] > 0.0


def test_mg_early_stop_while_loop():
    """residual_tol > 0 runs a genuine lax.while_loop (converged cycles
    cost zero sweeps): the early-stopped solution matches the full
    static-cycle run, and the residual slot shows untouched tail slots
    past the stopping cycle."""
    t, du0 = _system()
    # Full run to find where the update norm lands per cycle.
    p_full = FlowParams(solver="multigrid", mg_cycles=6, mg_pre=2,
                        mg_post=2, alpha=0.05, sweeps=8)
    slot = jnp.zeros((p_full.sweeps,), jnp.float32)
    du_full, res_full = mg_solve(du0, t, p_full, residuals_slot=slot)
    res_full = np.asarray(res_full)
    # Pick a tol that stops after ~3 cycles.
    tol = float(res_full[3]) * 1.5
    p_tol = p_full.replace(residual_tol=tol)
    du_tol, res_tol = mg_solve(du0, t, p_tol, residuals_slot=slot)
    res_tol = np.asarray(res_tol)
    n_ran = int(np.count_nonzero(res_tol))
    assert 0 < n_ran < p_full.mg_cycles, res_tol
    # Cycles that ran match the full run's residual trace bitwise...
    np.testing.assert_array_equal(res_tol[:n_ran], res_full[:n_ran])
    # ...tail slots untouched...
    assert np.all(res_tol[n_ran:] == 0.0)
    # ...and the stopped solution equals the full run truncated there.
    p_n = p_full.replace(mg_cycles=n_ran)
    du_n, _ = mg_solve(du0, t, p_n)
    np.testing.assert_array_equal(np.asarray(du_tol), np.asarray(du_n))


def test_mg_early_stop_sharded_matches_unsharded():
    """The while_loop early stop conditions on a psum'd norm: identical
    stopping decision and solution under the Z-sharded ctx."""
    import jax

    from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                    prepare_params)
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    shape = (32, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=7)
    p = FlowParams(levels=2, warps=1, inner_iterations=2, sweeps=4,
                   solver="multigrid", mg_cycles=4, residual_tol=1e-4,
                   alpha=0.05, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, prepare_params(p, 4)))
    got = np.asarray(compute_flow_sharded(i0, i1, p, make_z_mesh(4)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_piecewise_multigrid_runs():
    """solver='multigrid' composes with the out-of-core path (r5): the
    fine level streams, the coarse chain is device-resident. Deep
    equality gates live in test_piecewise.py; this is the smoke-level
    recovery check at the composition point."""
    from tpuflow3d.piecewise import compute_flow_piecewise
    shape = (32, 32, 32)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.0, 0.0, -0.5)),
                                 seed=3)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=20,
                   solver="multigrid", mg_cycles=2, alpha=0.05,
                   backend="xla", flow_clamp=2.0)
    got = compute_flow_piecewise(i0, i1, p, chunk_z=16)
    mask = syn.interior_mask(shape, 3)
    assert syn.epe(got, true, mask) < 0.1


def test_cli_multigrid_flags():
    from tpuflow3d.cli import build_parser, params_from_args
    args = build_parser().parse_args(
        ["--frame0", "a.raw", "--frame1", "b.raw", "--solver", "multigrid",
         "--mg-cycles", "3", "--mg-pre", "1", "--mg-post", "2",
         "--mg-coarse-sweeps", "8", "--mg-omega", "1.2"])
    p = params_from_args(args)
    assert p.solver == "multigrid"
    assert (p.mg_cycles, p.mg_pre, p.mg_post, p.mg_coarse_sweeps) == \
        (3, 1, 2, 8)
    assert p.mg_omega == 1.2


def test_mg_pallas_smoother_matches_xla():
    """The MG smoother dispatches to the gc Pallas kernel (uniform
    alpha_eff levels) under backend='pallas'; results must match the XLA
    smoother bit-tolerance-level."""
    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=5)
    base = dict(levels=2, warps=1, inner_iterations=1, sweeps=4,
                solver="multigrid", mg_cycles=2, alpha=0.05)
    ref = np.asarray(compute_flow(i0, i1, FlowParams(backend="xla", **base)))
    got = np.asarray(compute_flow(i0, i1,
                                  FlowParams(backend="pallas", **base)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def _system_gc(shape=(24, 24, 24), seed=0, alpha=0.05, gamma=1.0):
    """A frozen general-SPD system with the gradient-constancy block
    (compute_terms fills SolveTerms.ainv + .d6)."""
    from tpuflow3d.derivatives import grad_constancy_terms

    rng = np.random.default_rng(seed)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    gc = grad_constancy_terms(i0, i1, g=g)
    p = FlowParams(alpha=alpha, gamma=gamma)
    flow = jnp.zeros((3, *shape), jnp.float32)
    du0 = jnp.zeros_like(flow)
    t = compute_terms(g, it, flow, du0, p, HaloCtx(), gc=gc)
    return t, du0, p


def test_mg_gamma_converges_to_exact():
    """Multigrid x gradient-constancy: V-cycles on the full-rank data
    block (SolveTerms.d6) reach the same fixed point as exhaustive SOR on
    the identical general-SPD system."""
    t, du0, p0 = _system_gc()
    assert t.d6 is not None and t.ainv is not None
    p = FlowParams(solver="multigrid", mg_cycles=10, mg_pre=2, mg_post=2,
                   alpha=0.05, gamma=1.0)
    du_mg, _ = mg_solve(du0, t, p)
    du_ref = _sor_n(du0, t, 400)
    r_ref = float(jnp.mean(jnp.abs(mg_residual(
        du_ref, build_mg_levels(t, p, HaloCtx())[0], t.c, HaloCtx()))))
    # gc system's f32 asymptotic floor is slightly higher than the
    # rank-1 system's (~1.1e-5 observed): still converged.
    assert r_ref < 2e-5
    np.testing.assert_allclose(np.asarray(du_mg), np.asarray(du_ref),
                               atol=5e-5)


def test_mg_gamma_beats_sor_at_equal_cost():
    t, du0, _ = _system_gc(shape=(48, 48, 48))
    p = FlowParams(solver="multigrid", mg_cycles=2, mg_pre=2, mg_post=2,
                   alpha=0.05, gamma=1.0)
    du_mg, _ = mg_solve(du0, t, p)
    du_sor = _sor_n(du0, t, 12)
    lvl0 = build_mg_levels(t, p, HaloCtx())[0]
    r_mg = float(jnp.mean(jnp.abs(mg_residual(du_mg, lvl0, t.c, HaloCtx()))))
    r_sor = float(jnp.mean(jnp.abs(mg_residual(du_sor, lvl0, t.c,
                                               HaloCtx()))))
    assert r_mg < 0.5 * r_sor, (r_mg, r_sor)


def test_pipeline_mg_gamma_recovers_flow():
    """solver='multigrid' + gamma > 0 end-to-end vs the SOR gamma
    pipeline at matched nonlinearity settings."""
    shape = (32, 32, 32)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.0, 0.0, -0.5)),
                                 seed=3)
    base = dict(levels=2, warps=2, inner_iterations=2, alpha=0.05,
                gamma=1.0, backend="xla")
    p_sor = FlowParams(solver="sor", sweeps=20, **base)
    p_mg = FlowParams(solver="multigrid", mg_cycles=2, sweeps=20, **base)
    ref = np.asarray(compute_flow(i0, i1, p_sor))
    got = np.asarray(compute_flow(i0, i1, p_mg))
    mask = syn.interior_mask(shape, 3)
    e_ref = syn.epe(ref, true, mask)
    e_got = syn.epe(got, true, mask)
    assert e_got < e_ref + 0.02, (e_got, e_ref)


def test_mg_gamma_sharded_matches_unsharded():
    import jax

    from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                    prepare_params)
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    shape = (32, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=7)
    p = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=4,
                   solver="multigrid", mg_cycles=2, alpha=0.05, gamma=1.0,
                   flow_clamp=2.0, backend="xla")
    ref = np.asarray(compute_flow(i0, i1, prepare_params(p, 4)))
    got = np.asarray(compute_flow_sharded(i0, i1, p, make_z_mesh(4)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_mg_bf16_terms_epe_delta():
    """bf16-terms certification on the RECORD path (VERDICT r4 #7): the
    mg solver with terms_dtype='bfloat16' (storage-only downcast of c/g;
    the smoother/residual upcast — solver.py contract) must match the
    f32 twin's EPE within the r3 certification gate (3e-5), and the
    Pallas gc smoother (which upcasts bf16 c in VMEM) must match the XLA
    smoother on the same bf16 system."""
    shape = (48, 48, 48)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.0, 0.0, -0.5)),
                                 seed=3)
    mask = syn.interior_mask(shape, 3)
    base = dict(levels=2, warps=3, inner_iterations=2, sweeps=20,
                solver="multigrid", mg_cycles=2, alpha=0.05,
                interp="tricubic", flow_clamp=2.0)
    e = {}
    for name, kw in [("f32", {}), ("bf16", {"terms_dtype": "bfloat16"})]:
        fl = np.asarray(compute_flow(i0, i1,
                                     FlowParams(backend="xla", **base,
                                                **kw)))
        e[name] = syn.epe(fl, true, mask)
    assert abs(e["bf16"] - e["f32"]) < 3e-5, e
    fl_pal = np.asarray(compute_flow(
        i0, i1, FlowParams(backend="pallas", terms_dtype="bfloat16",
                           **base)))
    e_pal = syn.epe(fl_pal, true, mask)
    assert abs(e_pal - e["bf16"]) < 3e-5, (e_pal, e["bf16"])


def test_mg_gamma_bf16_packed_gc_matches_xla():
    """packed-gc x bf16 terms (the gamma production layout at even
    W >= 256 packs (c, ainv, psi_s); bf16 c halves its stream share):
    pallas backend == xla backend on the full mg+gamma+bf16 stack."""
    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=5)
    base = dict(levels=2, warps=1, inner_iterations=1, sweeps=4,
                solver="multigrid", mg_cycles=2, alpha=0.05, gamma=1.0,
                terms_dtype="bfloat16", flow_clamp=2.0)
    ref = np.asarray(compute_flow(i0, i1, FlowParams(backend="xla",
                                                     **base)))
    got = np.asarray(compute_flow(i0, i1, FlowParams(backend="pallas",
                                                     **base)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
