"""Packed gradient-constancy SOR kernel (pallas/sor_gc_packed.py) vs the
flat gc kernel and the XLA oracle — closes the packed x gamma cell of the
mode matrix. Interpreter mode on CPU; the same code compiles for TPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow3d.derivatives import derivatives, grad_constancy_terms
from tpuflow3d.grid import HaloCtx
from tpuflow3d.pallas.sor_gc_packed import sor_halfsweep_gc_packed
from tpuflow3d.pallas.sor_packed import pack_color, unpack_colors
from tpuflow3d.params import FlowParams
from tpuflow3d.solver import compute_terms, parity_mask, sor_halfsweep
from tpuflow3d.warp import warp_volume

ALPHA = 0.05
GAMMA = 1.5


def _terms(shape, seed=0):
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


def _packed_full_sweep(du, t, omega, z0=0, dg=None):
    """Red then black half-sweep in the packed layout; returns unpacked."""
    ctx = HaloCtx()
    d = du.shape[1]
    dg = dg or d
    pk = lambda a, col: pack_color(a, col, z0)
    d0, d1 = pk(du, 0), pk(du, 1)
    c0, c1 = pk(t.c, 0), pk(t.c, 1)
    a0, a1 = pk(t.ainv, 0), pk(t.ainv, 1)
    ps0, ps1 = pk(t.psi_s, 0), pk(t.psi_s, 1)
    psh = [ctx.z_halo_planes(x) for x in (ps0, ps1)]
    lo, hi = ctx.z_halo_planes(d1)
    d0 = sor_halfsweep_gc_packed(d0, d1, c0, a0, ps0, ps1, lo, hi,
                                 psh[1][0], psh[1][1], z0, ALPHA, omega,
                                 0, dg, interpret=True)
    lo, hi = ctx.z_halo_planes(d0)
    d1 = sor_halfsweep_gc_packed(d1, d0, c1, a1, ps1, ps0, lo, hi,
                                 psh[0][0], psh[0][1], z0, ALPHA, omega,
                                 1, dg, interpret=True)
    return unpack_colors(d0, d1, z0)


@pytest.mark.parametrize("shape", [(12, 10, 14), (8, 16, 16), (7, 9, 12)])
def test_gc_packed_full_sweep_matches_xla(shape):
    du, t = _terms(shape)
    omega = 1.7
    ctx = HaloCtx()
    parity = parity_mask(du.shape[1:], ctx)
    ref = sor_halfsweep(du, t, omega, parity, 0, ctx)
    ref = sor_halfsweep(ref, t, omega, parity, 1, ctx)
    got = _packed_full_sweep(du, t, omega)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5,
                               rtol=1e-5)


def test_gc_packed_matches_flat_gc():
    from tpuflow3d.pallas.sor_gc import sor_halfsweep_gc_pallas

    shape = (10, 12, 16)
    du, t = _terms(shape, seed=3)
    omega = 1.85
    ctx = HaloCtx()
    d = du.shape[1]
    flat = du
    for color in (0, 1):
        lo, hi = ctx.z_halo_planes(flat)
        plo, phi = ctx.z_halo_planes(t.psi_s)
        flat = sor_halfsweep_gc_pallas(flat, t.c, t.ainv, t.psi_s, lo, hi,
                                       plo, phi, 0, ALPHA, omega, color, d,
                                       interpret=True)
    got = _packed_full_sweep(du, t, omega)
    np.testing.assert_allclose(np.asarray(got), np.asarray(flat),
                               atol=2e-5, rtol=1e-5)


def test_gamma_pipeline_packed_layout_matches_flat():
    """Full pipeline, gamma > 0, sweep_layout='packed' vs 'flat' under the
    Pallas backend (interpret on CPU): the packed gc kernel rides the
    production dispatch end to end."""
    from tpuflow3d import FlowParams, compute_flow
    from tpuflow3d import synthetic as syn

    shape = (16, 16, 16)
    i0, i1, _ = syn.make_pair(shape, syn.translation((0.5, 0.0, 0.5)),
                              seed=5)
    base = dict(levels=2, warps=2, inner_iterations=2, sweeps=5,
                alpha=0.05, gamma=1.0, flow_clamp=2.0, backend="pallas")
    packed = np.asarray(compute_flow(i0, i1, FlowParams(
        sweep_layout="packed", **base)))
    flat = np.asarray(compute_flow(i0, i1, FlowParams(
        sweep_layout="flat", **base)))
    np.testing.assert_allclose(packed, flat, atol=2e-5, rtol=1e-4)
    xla = np.asarray(compute_flow(i0, i1, FlowParams(
        backend="xla", **{k: v for k, v in base.items()
                          if k != "backend"})))
    np.testing.assert_allclose(packed, xla, atol=2e-5, rtol=1e-4)


def test_gc_packed_sharded_interpret():
    """Sharded packed-gc half-sweeps (global parity via z0, halo planes
    from neighbor shards) == unsharded packed run."""
    import jax
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import Mesh

    n = 4
    shape = (16, 12, 16)
    du, t = _terms(shape, seed=7)
    omega = 1.7
    ref = _packed_full_sweep(du, t, omega)

    mesh = Mesh(np.array(jax.devices()[:n]), ("z",))

    def body(du, c, ainv, psi_s):
        ctx = HaloCtx(axis_name="z", n_shards=n)
        d = du.shape[1]
        z0 = ctx.z0(d)
        dg = ctx.d_global(d)
        pk = lambda a, col: pack_color(a, col, z0)
        d0, d1 = pk(du, 0), pk(du, 1)
        c0, c1 = pk(c, 0), pk(c, 1)
        a0, a1 = pk(ainv, 0), pk(ainv, 1)
        ps0, ps1 = pk(psi_s, 0), pk(psi_s, 1)
        psh = [ctx.z_halo_planes(x) for x in (ps0, ps1)]
        lo, hi = ctx.z_halo_planes(d1)
        d0 = sor_halfsweep_gc_packed(d0, d1, c0, a0, ps0, ps1, lo, hi,
                                     psh[1][0], psh[1][1], z0, ALPHA,
                                     omega, 0, dg, interpret=True)
        lo, hi = ctx.z_halo_planes(d0)
        d1 = sor_halfsweep_gc_packed(d1, d0, c1, a1, ps1, ps0, lo, hi,
                                     psh[0][0], psh[0][1], z0, ALPHA,
                                     omega, 1, dg, interpret=True)
        return unpack_colors(d0, d1, z0)

    f4 = P(None, "z", None, None)
    got = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(f4, f4, f4, P("z", None, None)),
        out_specs=f4, check_vma=False))(du, t.c, t.ainv, t.psi_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
