"""Gradient-constancy data term (FlowParams.gamma — Brox et al. 2004).

A capability extension over the reference's intensity-only data term
(SURVEY.md §2 lists no gamma term): adds gamma*Psi(|grad I1(x+s) -
grad I0(x)|^2), making the match robust to additive intensity changes
between frames. The point system becomes a general SPD 3x3 solved via a
precomputed exact symmetric inverse (solver.SolveTerms.ainv) instead of
Sherman-Morrison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow3d import FlowParams, compute_flow
from tpuflow3d import synthetic as syn
from tpuflow3d.grid import HaloCtx
from tpuflow3d.solver import SolveTerms, _du_star, compute_terms


def _rand_terms(seed=0, shape=(8, 6, 10)):
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    flow = jnp.asarray(
        rng.uniform(-1, 1, size=(3, *shape)).astype(np.float32))
    du = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(3, *shape)).astype(np.float32))
    return g, it, flow, du


def test_ainv_path_matches_sherman_morrison():
    """With zero gradient-constancy derivatives the full-3x3 system equals
    the rank-1 system, so the ainv point solve must reproduce the
    Sherman-Morrison one exactly (same A, different factorization)."""
    g, it, flow, du = _rand_terms(1)
    shape = it.shape
    ctx = HaloCtx()
    p0 = FlowParams(alpha=0.1)
    t_sm = compute_terms(g, it, flow, du, p0, ctx)
    gc0 = (jnp.zeros((3, 3, *shape), jnp.float32),
           jnp.zeros((3, *shape), jnp.float32))
    t_ainv = compute_terms(g, it, flow, du, p0.replace(gamma=0.7), ctx,
                           gc=gc0)
    assert t_ainv.ainv is not None
    x_sm = np.asarray(_du_star(du, t_sm, ctx))
    x_ainv = np.asarray(_du_star(du, t_ainv, ctx))
    # Same A, different factorization (adjugate vs Sherman-Morrison):
    # agreement is limited by f32 conditioning of the random system, not
    # by the math — wrong math would differ at O(1).
    np.testing.assert_allclose(x_ainv, x_sm, atol=1e-3, rtol=5e-3)


def test_ainv_is_true_inverse():
    """A @ ainv == I at every voxel for a nontrivial gc field."""
    g, it, flow, du = _rand_terms(2)
    shape = it.shape
    rng = np.random.default_rng(3)
    gc_g = jnp.asarray(rng.normal(size=(3, 3, *shape)).astype(np.float32))
    gc_it = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32))
    # Larger epsilons keep psi' at O(1) so the system is well-conditioned
    # and the f32 identity check can be tight.
    p = FlowParams(alpha=0.1, gamma=0.5, eps_data=0.3, eps_grad=0.3)
    ctx = HaloCtx()
    t = compute_terms(g, it, flow, du, p, ctx, gc=(gc_g, gc_it))

    # Rebuild A explicitly from the same ingredients.
    from tpuflow3d.solver import _psi_deriv

    r = it + jnp.einsum("cdhw,cdhw->dhw", g, du)
    psi_d = _psi_deriv(r * r, p.penalizer_data, p.eps_data)
    r_g = gc_it + jnp.einsum("acdhw,cdhw->adhw", gc_g, du)
    psi_g = p.gamma * _psi_deriv(jnp.sum(r_g * r_g, 0), p.penalizer_grad,
                                 p.eps_grad)
    sw = 1.0 / t.sw_inv
    A = np.zeros((3, 3, *shape), np.float32)
    for i in range(3):
        for j in range(3):
            e = psi_d * g[i] * g[j] + psi_g * jnp.sum(
                gc_g[:, i] * gc_g[:, j], 0)
            A[i, j] = np.asarray(e + (sw if i == j else 0.0))
    ai = np.asarray(t.ainv)
    Ainv = np.stack([np.stack([ai[0], ai[1], ai[2]]),
                     np.stack([ai[1], ai[3], ai[4]]),
                     np.stack([ai[2], ai[4], ai[5]])])
    prod = np.einsum("ikdhw,kjdhw->ijdhw", A, Ainv)
    eye = np.eye(3, dtype=np.float32)[:, :, None, None, None]
    np.testing.assert_allclose(prod, np.broadcast_to(eye, prod.shape),
                               atol=2e-4)


def test_gamma_requires_gc_and_vice_versa():
    g, it, flow, du = _rand_terms(4)
    with pytest.raises(ValueError, match="gradient-constancy"):
        compute_terms(g, it, flow, du, FlowParams(gamma=0.5), HaloCtx())
    gc0 = (jnp.zeros((3, 3, *it.shape), jnp.float32),
           jnp.zeros((3, *it.shape), jnp.float32))
    with pytest.raises(ValueError, match="gradient-constancy"):
        compute_terms(g, it, flow, du, FlowParams(), HaloCtx(), gc=gc0)


def test_negative_gamma_rejected():
    with pytest.raises(ValueError, match="gamma"):
        FlowParams(gamma=-0.1)


def test_small_gamma_limit_matches_gamma_zero():
    """gamma -> 0 must converge to the intensity-only solve: the general
    3x3 path with a vanishing gc weight and the Sherman-Morrison path with
    no gc branch are different programs, so this gates both the gc system
    assembly (a wrong A would not vanish with gamma) and the dispatch."""
    shape = (24, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=5)
    p = FlowParams(levels=2, warps=1, inner_iterations=1, sweeps=5)
    a = np.asarray(compute_flow(i0, i1, p))
    b = np.asarray(compute_flow(i0, i1, p.replace(gamma=1e-7)))
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_gamma_recovers_translation():
    """The gamma mode still solves the plain problem to similar EPE."""
    shape = (32, 24, 24)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.0, -0.5, 0.5)),
                                 seed=6)
    mask = syn.interior_mask(shape, border=4)
    p = FlowParams(levels=3, warps=2, inner_iterations=2, sweeps=10,
                   alpha=0.1)
    e0 = syn.epe(np.asarray(compute_flow(i0, i1, p)), true, mask)
    e1 = syn.epe(np.asarray(compute_flow(i0, i1, p.replace(gamma=0.5))),
                 true, mask)
    assert e1 < max(2.0 * e0, 0.08), (e0, e1)


def test_gamma_robust_to_brightness_change():
    """The actual point of the term: an additive intensity offset on the
    moving frame breaks the intensity-constancy assumption; the
    gradient-constancy term is invariant to it."""
    shape = (32, 24, 24)
    i0, i1, true = syn.make_pair(shape, syn.translation((1.0, 0.0, 0.5)),
                                 texture="fourier", seed=7)
    i1 = i1 + 0.25 * float(np.std(i1))  # additive brightness shift
    mask = syn.interior_mask(shape, border=4)
    p = FlowParams(levels=3, warps=2, inner_iterations=2, sweeps=10,
                   alpha=0.1)
    e_int = syn.epe(np.asarray(compute_flow(i0, i1, p)), true, mask)
    e_gc = syn.epe(np.asarray(compute_flow(i0, i1, p.replace(gamma=2.0))),
                   true, mask)
    assert e_gc < e_int, (e_gc, e_int)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_gamma_matches_unsharded():
    """grad_constancy_terms' second-derivative stencils must be
    halo-correct (two chained central diffs through HaloCtx.zpad)."""
    from tpuflow3d.sharding import (compute_flow_sharded, make_z_mesh,
                                    prepare_params)
    shape = (48, 24, 24)
    n = 4
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.8, 0.0, 0.6)),
                              seed=8)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=8,
                   alpha=0.05, gamma=0.5)
    p_sharded = prepare_params(p, n)
    ref = np.asarray(compute_flow(i0, i1, p_sharded))
    got = np.asarray(compute_flow_sharded(i0, i1, p, mesh=make_z_mesh(n)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_piecewise_supports_gamma():
    """r3: the r2 piecewise rejection is lifted — gamma composes with the
    streamed path (terms recomputed on-device per slab; full equality
    gates live in tests/test_piecewise.py::test_gamma_*)."""
    from tpuflow3d.piecewise import compute_flow_piecewise
    rng = np.random.default_rng(0)
    i0 = rng.normal(size=(16, 8, 8)).astype(np.float32)
    flow = compute_flow_piecewise(
        i0, i0, FlowParams(levels=1, warps=1, sweeps=2, gamma=0.5,
                           flow_clamp=2.0), chunk_z=8)
    assert np.all(np.isfinite(flow))


def test_cli_gamma_flags():
    from tpuflow3d.cli import build_parser, params_from_args
    args = build_parser().parse_args(
        ["--frame0", "a.raw", "--frame1", "b.raw", "--gamma", "0.8",
         "--eps-grad", "2e-3", "--penalizer-grad", "quadratic"])
    p = params_from_args(args)
    assert p.gamma == 0.8
    assert p.eps_grad == 2e-3
    assert p.penalizer_grad == "quadratic"
