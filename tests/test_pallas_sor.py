"""Pallas-vs-pure-JAX bit-tolerance tests for the SOR kernel (SURVEY.md §6
tier 2). Runs the kernel in interpreter mode on CPU; the same code compiles
for TPU. The kernel consumes compact terms (c, g, psi_s, psi_d) and
recomputes weights in VMEM; the oracle uses the full precomputed terms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow3d.derivatives import derivatives
from tpuflow3d.grid import HaloCtx
from tpuflow3d.params import FlowParams
from tpuflow3d.pallas.sor import sor_halfsweep_pallas
from tpuflow3d.solver import compute_terms, parity_mask, sor_halfsweep
from tpuflow3d.warp import warp_volume

ALPHA = 0.05


def _terms(shape=(12, 10, 14), seed=0, alpha=ALPHA):
    rng = np.random.default_rng(seed)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    shift = jnp.zeros((3, *shape), jnp.float32).at[2].set(0.7)
    i1 = warp_volume(i0, -shift)
    g, it = derivatives(i0, i1)
    p = FlowParams(alpha=alpha)
    flow = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * 0.1
    du = jnp.asarray(rng.normal(size=(3, *shape)).astype(np.float32)) * 0.05
    t = compute_terms(g, it, flow, du, p)
    return du, t


def _pallas_half(du, t, omega, color, ctx=HaloCtx()):
    lo, hi = ctx.z_halo_planes(du)
    plo, phi = ctx.z_halo_planes(t.psi_s)
    d = du.shape[1]
    return sor_halfsweep_pallas(du, t.c, t.g, t.psi_s, t.psi_d, lo, hi,
                                plo, phi, ctx.z0(d), ALPHA, omega, color,
                                ctx.d_global(d), interpret=True)


@pytest.mark.parametrize("color", [0, 1])
@pytest.mark.parametrize("shape", [(12, 10, 14), (8, 16, 16), (7, 9, 11),
                                   (13, 64, 64)])  # prime D, BZ=1 (eta07
                                   # levels hit D=89: zero-size z-slice bug
def test_halfsweep_matches_xla(shape, color):
    du, t = _terms(shape)
    omega = 1.7
    ctx = HaloCtx()
    parity = parity_mask(du.shape[1:], ctx)
    ref = sor_halfsweep(du, t, omega, parity, color, ctx)
    got = _pallas_half(du, t, omega, color)
    # atol 5e-5: kernel and oracle accumulate the 6 neighbor terms in
    # different orders; at 13x64x64 the f32 rounding tail crosses 1e-5.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5,
                               rtol=1e-5)


def test_full_sweep_sequence_matches():
    """Red then black through the Pallas kernel == XLA full sweep."""
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


def test_pipeline_pallas_backend_matches_xla():
    """Full pipeline with the Pallas solver (interpret mode on CPU) ==
    XLA-solver pipeline."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=1)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=5,
                   alpha=0.05)
    ref = np.asarray(compute_flow(i0, i1, p.replace(backend="xla")))
    got = np.asarray(compute_flow(i0, i1, p.replace(backend="pallas")))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
