"""Pallas-vs-pure-JAX bit-tolerance tests for the gradient-constancy SOR
kernel (pallas/sor_gc.py): the general-SPD half-sweep that streams the
precomputed symmetric inverse (SolveTerms.ainv). Interpreter mode on CPU;
the same code compiles for TPU. Oracle: solver.sor_halfsweep on terms with
ainv set (the full-3x3 XLA branch)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow3d.derivatives import derivatives, grad_constancy_terms
from tpuflow3d.grid import HaloCtx
from tpuflow3d.params import FlowParams
from tpuflow3d.pallas.sor_gc import sor_halfsweep_gc_pallas
from tpuflow3d.solver import compute_terms, parity_mask, sor_halfsweep
from tpuflow3d.warp import warp_volume

ALPHA = 0.05
GAMMA = 1.5


def _terms(shape=(12, 10, 14), seed=0):
    rng = np.random.default_rng(seed)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    gc = grad_constancy_terms(i0, i1, g=g)
    p = FlowParams(alpha=ALPHA, gamma=GAMMA)
    flow = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * 0.1
    du = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * 0.05
    t = compute_terms(g, it, flow, du, p, gc=gc)
    assert t.ainv is not None
    return du, t


def _pallas_half(du, t, omega, color, ctx=HaloCtx()):
    lo, hi = ctx.z_halo_planes(du)
    plo, phi = ctx.z_halo_planes(t.psi_s)
    d = du.shape[1]
    return sor_halfsweep_gc_pallas(du, t.c, t.ainv, t.psi_s, lo, hi,
                                   plo, phi, ctx.z0(d), ALPHA, omega, color,
                                   ctx.d_global(d), interpret=True)


@pytest.mark.parametrize("color", [0, 1])
@pytest.mark.parametrize("shape", [(12, 10, 14), (8, 16, 16), (7, 9, 11)])
def test_gc_halfsweep_matches_xla(shape, color):
    du, t = _terms(shape)
    omega = 1.7
    ctx = HaloCtx()
    parity = parity_mask(du.shape[1:], ctx)
    ref = sor_halfsweep(du, t, omega, parity, color, ctx)
    got = _pallas_half(du, t, omega, color)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5,
                               rtol=1e-5)


def test_gc_full_sweep_sequence_matches():
    du, t = _terms((10, 12, 8))
    omega = 1.8
    ctx = HaloCtx()
    parity = parity_mask(du.shape[1:], ctx)
    ref = sor_halfsweep(du, t, omega, parity, 0, ctx)
    ref = sor_halfsweep(ref, t, omega, parity, 1, ctx)

    got = du
    for color in (0, 1):
        got = _pallas_half(got, t, omega, color)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_gamma_pipeline_pallas_backend_matches_xla():
    """Full gradient-constancy pipeline with the Pallas solver (interpret
    mode on CPU) == XLA-solver pipeline — gamma now rides the Pallas sweep
    path instead of falling back (r2 exclusion lifted)."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=1)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=5,
                   alpha=0.05, gamma=1.0)
    ref = np.asarray(compute_flow(i0, i1, p.replace(backend="xla")))
    got = np.asarray(compute_flow(i0, i1, p.replace(backend="pallas")))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_gamma_piecewise_pallas_matches_xla():
    """The streamed fused path with gamma > 0 dispatches the gc kernel
    inside its one-launch-per-chunk program (piecewise._ph_fused_warp_iter)
    and must match the XLA-backend streamed run."""
    from tpuflow3d import FlowParams
    from tpuflow3d import synthetic as syn
    from tpuflow3d.piecewise import compute_flow_piecewise

    shape = (16, 12, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=2)
    base = dict(levels=2, warps=2, inner_iterations=1, sweeps=4,
                alpha=0.05, gamma=1.0, flow_clamp=2.0)
    ref = compute_flow_piecewise(i0, i1, FlowParams(backend="xla", **base),
                                 chunk_z=5)
    got = compute_flow_piecewise(i0, i1,
                                 FlowParams(backend="pallas", **base),
                                 chunk_z=5)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
