"""Pallas TPU kernel: red-black SOR half-sweep, gradient-constancy form.

With the Brox gradient-constancy term active (FlowParams.gamma > 0) the
per-voxel system matrix A = sw*I + psi_d g g^T + psi_g sum_a h_a h_a^T is
general SPD — the rank-1-plus-identity Sherman-Morrison trick of
pallas/sor.py no longer applies. compute_terms precomputes the exact
symmetric inverse per nonlinear iteration (SolveTerms.ainv, rows
00,01,02,11,12,22); this kernel streams it and fuses neighbor
accumulation, the 3x3 apply, relaxation, and the red-black select into one
HBM pass.

Byte model (f32, per half-sweep): du 12 read + 12 write, c 12, ainv 24,
psi_s 4 = 64 B/voxel — vs ~88 B for the XLA sweep, which additionally
streams the six materialized weight volumes (24 B) instead of recomputing
w_pq from psi_s on the VPU. Recomputing ainv in-kernel instead would read
g(12) + gc_g(36) + psi_d/psi_g/psi_s(12) = worse; streaming the inverse is
the bandwidth-optimal split (ops/registry.py sor_halfsweep_gc op model).

Same halo/margin/mask contract as pallas/sor.py (shared _pick_block /
_shift6): Z halos from HaloCtx.z_halo_planes, Y margins as adjacent 8-row
blocks, Neumann faces from global coordinates, global-parity coloring.
Oracle: solver.sor_halfsweep on SolveTerms with ainv
(tests/test_pallas_sor_gc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow3d.pallas.sor import _pick_block, _shift6, sweep_specs


def _kernel(z0_ref,
            du_ref, du_zup_ref, du_zdn_ref, du_hlo_ref, du_hhi_ref,
            du_yup_ref, du_ydn_ref,
            ps_ref, ps_zup_ref, ps_zdn_ref, ps_hlo_ref, ps_hhi_ref,
            ps_yup_ref, ps_ydn_ref,
            c_ref, ainv_ref, out_ref,
            *, alpha: float, omega: float, color: int, bz: int, by: int,
            nzb: int, dg: int, h: int, w: int):
    k = pl.program_id(0)
    j = pl.program_id(1)

    du = du_ref[:]            # (3, BZ, BY, W)
    c = c_ref[:].astype(du.dtype)
    a = ainv_ref[:].astype(du.dtype)  # (6, BZ, BY, W)
    ps = ps_ref[:]            # (1, BZ, BY, W)

    du_zup = jnp.where(k == nzb - 1, du_hhi_ref[:], du_zup_ref[:])
    du_zdn = jnp.where(k == 0, du_hlo_ref[:], du_zdn_ref[:])
    ps_zup = jnp.where(k == nzb - 1, ps_hhi_ref[:], ps_zup_ref[:])
    ps_zdn = jnp.where(k == 0, ps_hlo_ref[:], ps_zdn_ref[:])

    du_nb = _shift6(du, du_zup, du_zdn, du_yup_ref[:], du_ydn_ref[:])
    ps_nb = _shift6(ps, ps_zup, ps_zdn, ps_yup_ref[:], ps_ydn_ref[:])

    shape3 = du.shape[1:]
    zi = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) + k * bz + z0_ref[0]
    yi = jax.lax.broadcasted_iota(jnp.int32, shape3, 1) + j * by
    xi = jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    f32 = du.dtype
    masks = [
        (zi < dg - 1).astype(f32)[None],
        (zi > 0).astype(f32)[None],
        (yi < h - 1).astype(f32)[None],
        (yi > 0).astype(f32)[None],
        (xi < w - 1).astype(f32)[None],
        (xi > 0).astype(f32)[None],
    ]

    b = c
    for pnb, m, dnb in zip(ps_nb, masks, du_nb):
        wd = jnp.where(m > 0.0, (alpha * 0.5) * (ps + pnb), 0.0)
        b = b + jnp.where(wd > 0.0, wd * dnb, 0.0)

    # x = A^-1 b with the streamed symmetric inverse (00,01,02,11,12,22).
    star = jnp.stack([
        a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
        a[1] * b[0] + a[3] * b[1] + a[4] * b[2],
        a[2] * b[0] + a[4] * b[1] + a[5] * b[2],
    ])
    new = (1.0 - omega) * du + omega * star

    par = (zi + yi + xi) & 1
    out_ref[:] = jnp.where((par == color)[None], new, du)


@functools.partial(jax.jit, static_argnames=("alpha", "omega", "color",
                                             "dg", "interpret"))
def sor_halfsweep_gc_pallas(du, c, ainv, psi_s, du_lo, du_hi, ps_lo, ps_hi,
                            z0, alpha: float, omega: float, color: int,
                            dg: int, interpret: bool = False):
    """One colored half-sweep of the general-SPD (gradient-constancy)
    system. du/c (3,D,H,W), ainv (6,D,H,W), psi_s (D,H,W); du_lo/du_hi
    (3,1,H,W) and ps_lo/ps_hi (1,H,W) from HaloCtx.z_halo_planes; z0 =
    global z offset (traced); dg = global Z extent (static)."""
    _, d, h, wd = du.shape
    bz, by = _pick_block(d, h, wd)
    nzb = d // bz
    nyb = pl.cdiv(h, by)
    center, haloed = sweep_specs(wd, d, h, bz, by)

    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),               # z0 (1,)
        *haloed(3),                                           # du
        *haloed(1),                                           # psi_s
        center(3),                                            # c
        center(6),                                            # ainv
    ]
    kernel = functools.partial(_kernel, alpha=float(alpha),
                               omega=float(omega), color=int(color),
                               bz=bz, by=by, nzb=int(nzb), dg=int(dg),
                               h=h, w=wd)
    out = pl.pallas_call(
        kernel,
        grid=(nzb, nyb),
        in_specs=specs,
        out_specs=center(3),
        out_shape=jax.ShapeDtypeStruct(du.shape, du.dtype),
        interpret=interpret,
    )(jnp.asarray(z0, jnp.int32).reshape(1),
      du, du, du, du_lo, du_hi, du, du,
      psi_s[None], psi_s[None], psi_s[None], ps_lo[None], ps_hi[None],
      psi_s[None], psi_s[None],
      c, ainv)
    return out
