"""Fused warp+derivative Pallas kernel vs the XLA oracle
(warp_volume + derivatives), interpreter mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow3d.derivatives import derivatives
from tpuflow3d.grid import HaloCtx
from tpuflow3d.pallas.warp_grad import warp_grad_pallas
from tpuflow3d.warp import warp_volume


def _case(shape, seed=0, clamp=2.0):
    rng = np.random.default_rng(seed)
    i0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    i1 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    flow = jnp.asarray(
        rng.uniform(-clamp, clamp, size=(3, *shape)).astype(np.float32))
    return i0, i1, flow


@pytest.mark.parametrize("shape", [(8, 16, 16), (6, 24, 10), (4, 8, 8),
                                   (6, 44, 20), (4, 89, 12)])
# 44 and 89 have no multiple-of-8 divisor: exercises the cdiv grid with a
# partial last y-block + in-kernel face fix (eta=0.7 ladders hit H=180/89).
# The random flow includes inward y motion at the face, the case where the
# fix is load-bearing.
@pytest.mark.parametrize("clamp", [1.0, 2.0])
def test_warp_grad_matches_oracle(shape, clamp):
    i0, i1, flow = _case(shape, clamp=clamp)
    ctx = HaloCtx()
    i1w = warp_volume(i1, flow, ctx)
    g_ref, it_ref = derivatives(i0, i1w, ctx)
    g, it = warp_grad_pallas(i1, flow, i0, ctx, max_disp=clamp,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(it), np.asarray(it_ref), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5,
                               rtol=1e-5)


def test_warp_grad_zero_flow():
    i0, i1, _ = _case((6, 8, 8))
    flow = jnp.zeros((3, 6, 8, 8), jnp.float32)
    ctx = HaloCtx()
    g, it = warp_grad_pallas(i1, flow, i0, ctx, max_disp=1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(it), np.asarray(i1 - i0),
                               atol=1e-6)


def test_warp_grad_integer_shift():
    shape = (8, 8, 8)
    rng = np.random.default_rng(3)
    i1 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    i0 = jnp.zeros(shape, jnp.float32)
    flow = jnp.zeros((3, *shape), jnp.float32).at[2].set(2.0)
    ctx = HaloCtx()
    _, it = warp_grad_pallas(i1, flow, i0, ctx, max_disp=2.0, interpret=True)
    got = np.asarray(it)  # == warped i1 since i0 == 0
    vn = np.asarray(i1)
    np.testing.assert_allclose(got[:, :, :6], vn[:, :, 2:], atol=1e-6)


def test_pipeline_fused_warp_matches_xla():
    """Full pipeline with Pallas fused warp (clamped) == XLA pipeline with
    the same clamp."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=1)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=5,
                   alpha=0.05, flow_clamp=2.0)
    ref = np.asarray(compute_flow(i0, i1, p.replace(backend="xla")))
    got = np.asarray(compute_flow(i0, i1, p.replace(backend="pallas")))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("shape", [(8, 16, 16), (6, 24, 10), (4, 89, 12)])
@pytest.mark.parametrize("clamp", [1.0, 2.0])
def test_warp_grad_tricubic_matches_oracle(shape, clamp):
    """Catmull-Rom select-interpolate kernel vs the XLA tricubic gather +
    derivatives oracle (the accuracy-gate config's sampler)."""
    i0, i1, flow = _case(shape, clamp=clamp)
    ctx = HaloCtx()
    i1w = warp_volume(i1, flow, ctx, interp="tricubic")
    g_ref, it_ref = derivatives(i0, i1w, ctx)
    g, it = warp_grad_pallas(i1, flow, i0, ctx, max_disp=clamp,
                             interp="tricubic", interpret=True)
    np.testing.assert_allclose(np.asarray(it), np.asarray(it_ref), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5,
                               rtol=1e-5)


def test_warp_grad_tricubic_integer_shift():
    """Catmull-Rom is interpolating: integer displacements reproduce the
    shifted volume exactly (weights collapse to a one-hot)."""
    shape = (8, 8, 8)
    rng = np.random.default_rng(3)
    i1 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    i0 = jnp.zeros(shape, jnp.float32)
    flow = jnp.zeros((3, *shape), jnp.float32).at[2].set(2.0)
    ctx = HaloCtx()
    _, it = warp_grad_pallas(i1, flow, i0, ctx, max_disp=2.0,
                             interp="tricubic", interpret=True)
    got = np.asarray(it)
    vn = np.asarray(i1)
    np.testing.assert_allclose(got[:, :, :6], vn[:, :, 2:], atol=1e-5)


def test_pipeline_fused_tricubic_matches_xla():
    """Full pipeline with the Pallas fused tricubic warp == XLA pipeline
    (same clamp, interp=tricubic — the gate config's sampler)."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=1)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=5,
                   alpha=0.05, flow_clamp=2.0, interp="tricubic")
    ref = np.asarray(compute_flow(i0, i1, p.replace(backend="xla")))
    got = np.asarray(compute_flow(i0, i1, p.replace(backend="pallas")))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("interp", ["trilinear", "tricubic"])
def test_warp_grad_emit_warped(interp):
    """emit_warped returns the warped volume as a 5th channel, equal to
    the XLA warp oracle (the gradient-constancy mode consumes it)."""
    i0, i1, flow = _case((8, 16, 16), clamp=2.0)
    ctx = HaloCtx()
    i1w_ref = warp_volume(i1, flow, ctx, interp=interp)
    g_ref, it_ref = derivatives(i0, i1w_ref, ctx)
    g, it, i1w = warp_grad_pallas(i1, flow, i0, ctx, max_disp=2.0,
                                  interp=interp, emit_warped=True,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(i1w), np.asarray(i1w_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(it), np.asarray(it_ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_fused_gamma_matches_xla():
    """Full pipeline, gamma > 0, fused warp kernel WITH emitted warped
    volume (backend=pallas) == the XLA pipeline."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=1)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=5,
                   alpha=0.05, gamma=1.0, flow_clamp=2.0)
    ref = np.asarray(compute_flow(i0, i1, p.replace(backend="xla")))
    got = np.asarray(compute_flow(i0, i1, p.replace(backend="pallas")))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_tricubic_wide_w_falls_back_to_xla():
    """W > 512 tricubic levels skip the fused kernel (measured VMEM-stack
    budget at BY=8) and fall back to the XLA gather — the pipeline must
    still run and match the XLA backend."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (8, 8, 516)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=2)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=2,
                   alpha=0.05, interp="tricubic", flow_clamp=2.0,
                   min_dim=4)
    ref = np.asarray(compute_flow(i0, i1, p.replace(backend="xla")))
    got = np.asarray(compute_flow(i0, i1, p.replace(backend="pallas")))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_tricubic_wide_w_kernel_raises():
    """The W <= 512 cubic VMEM gate lives in warp_grad_pallas itself, so
    direct callers (e.g. the ops registry) fail loudly instead of hitting
    a Mosaic scoped-VMEM allocation fault."""
    import jax.numpy as jnp
    import pytest

    from tpuflow3d.pallas.warp_grad import warp_grad_pallas

    i = jnp.zeros((8, 8, 516), jnp.float32)
    fl = jnp.zeros((3, 8, 8, 516), jnp.float32)
    with pytest.raises(ValueError, match="W <= 512"):
        warp_grad_pallas(i, fl, i, interp="tricubic", interpret=True)
