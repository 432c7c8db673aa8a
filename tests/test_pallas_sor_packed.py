"""Color-packed SOR kernel (pallas/sor_packed.py) vs the flat kernel and
the XLA oracle: the packing is an exact lane permutation, so results must
match to float tolerance (SURVEY.md §6 tier 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow3d.grid import HaloCtx
from tpuflow3d.pallas.sor_packed import (pack_color, sor_halfsweep_packed,
                                         unpack_colors)
from tpuflow3d.solver import parity_mask, sor_halfsweep

from test_pallas_sor import ALPHA, _pallas_half, _terms


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(6, 8, 10), (3, 6, 8, 10), (5, 7, 12)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        x0 = pack_color(x, 0, 0)
        x1 = pack_color(x, 1, 0)
        assert x0.shape[-1] == shape[-1] // 2
        back = unpack_colors(x0, x1, 0)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pack_respects_global_parity():
    """With a shard z-offset, lane selection must follow GLOBAL (z+y+x)
    parity: packing a slab with z0=k equals slicing the packed volume."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 6, 10)).astype(np.float32))
    full0 = pack_color(x, 0, 0)
    slab0 = pack_color(x[3:6], 0, 3)
    np.testing.assert_array_equal(np.asarray(full0[3:6]), np.asarray(slab0))


def _packed_half(du, t, omega, color, ctx=HaloCtx()):
    d = du.shape[1]
    z0 = ctx.z0(d)
    pk = lambda a, c: pack_color(a, c, z0)
    dua, duo = pk(du, color), pk(du, 1 - color)
    lo, hi = ctx.z_halo_planes(duo)
    pso = pk(t.psi_s, 1 - color)
    plo, phi = ctx.z_halo_planes(pso)
    out = sor_halfsweep_packed(
        dua, duo, pk(t.c, color), pk(t.g, color), pk(t.psi_s, color), pso,
        pk(t.psi_d, color), lo, hi, plo, phi, z0, ALPHA, omega, color,
        ctx.d_global(d), interpret=True)
    if color == 0:
        return unpack_colors(out, duo, z0)
    return unpack_colors(duo, out, z0)


@pytest.mark.parametrize("color", [0, 1])
@pytest.mark.parametrize("shape", [(12, 10, 14), (8, 16, 16), (7, 9, 12),
                                   (13, 64, 64)])  # prime D forces BZ=1
def test_packed_halfsweep_matches_xla(shape, color):
    du, t = _terms(shape)
    omega = 1.7
    ctx = HaloCtx()
    parity = parity_mask(du.shape[1:], ctx)
    ref = sor_halfsweep(du, t, omega, parity, color, ctx)
    got = _packed_half(du, t, omega, color)
    # atol 5e-5: different neighbor-accumulation order vs the oracle; the
    # f32 rounding tail crosses 1e-5 at the 13x64x64 (BZ=1) case.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5,
                               rtol=1e-5)


def test_packed_matches_flat_kernel():
    """Packed and flat Pallas kernels: same math, different layout."""
    du, t = _terms((10, 12, 8))
    omega = 1.8
    got_flat = du
    got_packed = du
    for color in (0, 1):
        got_flat = _pallas_half(got_flat, t, omega, color)
        got_packed = _packed_half(got_packed, t, omega, color)
    np.testing.assert_allclose(np.asarray(got_packed), np.asarray(got_flat),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_packed_vs_flat_layout():
    """Full pipeline: sweep_layout='packed' (default) == 'flat'."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=2)
    p = FlowParams(levels=2, warps=2, inner_iterations=2, sweeps=5,
                   alpha=0.05, backend="pallas")
    flat = np.asarray(compute_flow(i0, i1, p.replace(sweep_layout="flat")))
    packed = np.asarray(compute_flow(i0, i1, p))
    np.testing.assert_allclose(packed, flat, atol=1e-5, rtol=1e-4)


def test_pipeline_packed_early_stop():
    """residual_tol early stopping under the packed layout (the residual is
    summed over the packed color pair)."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.0, 0.0, 0.5)),
                              seed=3)
    p = FlowParams(levels=2, warps=1, inner_iterations=2, sweeps=8,
                   alpha=0.05, backend="pallas", residual_tol=1e-4)
    ref = np.asarray(compute_flow(i0, i1, p.replace(backend="xla")))
    got = np.asarray(compute_flow(i0, i1, p))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_packed_odd_width_falls_back():
    """Odd W cannot pack: the solver silently uses the flat kernel."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (12, 12, 15)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.0, 0.0, 0.5)),
                              seed=4)
    p = FlowParams(levels=1, warps=1, inner_iterations=1, sweeps=4,
                   alpha=0.05)
    ref = np.asarray(compute_flow(i0, i1, p.replace(backend="xla")))
    got = np.asarray(compute_flow(i0, i1, p.replace(backend="pallas")))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
