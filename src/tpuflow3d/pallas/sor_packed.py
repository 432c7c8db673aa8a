"""Pallas TPU kernel: color-packed red-black SOR half-sweep.

The single biggest hot-loop win over pallas/sor.py (ARCHITECTURE.md "future
work"; VERDICT r1 next-#7): the flat kernel streams the FULL du + terms
every half-sweep but updates only half the voxels — half its HBM traffic
and half its VPU lanes are wasted on the masked color. Here everything is
stored CHECKERBOARD-PACKED along X: voxel (z, y, x) of color
c = (z+y+x) & 1 lives at packed lane i = x // 2 of the color-c array
(row offset off(z,y,c) = (z+y+c) & 1, so each packed row is dense).

Per half-sweep the kernel reads the active color's du/c/g/psi_d/psi_s and
the other color's du/psi_s (neighbors are ALWAYS the other color on a
6-neighborhood), and writes only the active du — 36 B/voxel(full-volume)
per half-sweep vs 56 for the flat compact-terms kernel (f32 terms), and
every output lane is a real update (no parity select at all). Neighbor
indexing in packed space: z/y neighbors keep the same packed lane; x
neighbors are the other array at lane i or i±1 selected by the row offset.

Packing/unpacking are exact lane permutations (pack_color/unpack_colors),
done once per nonlinearity iteration and amortized over the sweeps.
Halo/margin handling, global-parity bookkeeping (via the traced shard z0),
Neumann face masks, and the where-gating that keeps padding garbage out
are inherited from pallas/sor.py. Oracle: the flat kernel and
solver.sor_halfsweep (bit-tolerance tests, packed == flat == XLA).

Replaces the same reference hot loop (cuda-flow3d ``solve_3d.cu``,
SURVEY.md §5.2 HOT LOOP) — the packing trick has no CUDA analog because
GPU warps don't pay the TPU's dense-vector-lane cost for masked updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow3d.pallas.sor import _pick_block, sweep_specs


def _row_offset(d: int, h: int, z0, color: int):
    """(d, h, 1) int32: lane-0 x-parity of each packed row,
    off = (z_global + y + color) & 1."""
    zg = z0 + jnp.arange(d, dtype=jnp.int32).reshape(d, 1, 1)
    yy = jnp.arange(h, dtype=jnp.int32).reshape(1, h, 1)
    return (zg + yy + color) & 1


def pack_color(x: jax.Array, color: int, z0) -> jax.Array:
    """(..., D, H, W) -> (..., D, H, W//2): the color's lanes, row-dense.
    z0 = global z of plane 0 (traced; shard offset)."""
    d, h, w = x.shape[-3:]
    off = _row_offset(d, h, z0, color)
    xr = x.reshape(*x.shape[:-1], w // 2, 2)
    sel = (off == 1) if x.ndim == 3 else (off == 1)[None]
    return jnp.where(sel, xr[..., 1], xr[..., 0])


def unpack_colors(x0: jax.Array, x1: jax.Array, z0) -> jax.Array:
    """Inverse of pack_color: interleave the two color arrays back to
    (..., D, H, W)."""
    d, h, wp = x0.shape[-3:]
    off0 = _row_offset(d, h, z0, 0)
    sel = (off0 == 0) if x0.ndim == 3 else (off0 == 0)[None]
    even = jnp.where(sel, x0, x1)
    odd = jnp.where(sel, x1, x0)
    return jnp.stack([even, odd], axis=-1).reshape(*x0.shape[:-1], 2 * wp)


def _shift6_packed(o, zup, zdn, yup, ydn, sel_hi, sel_lo):
    """Neighbor values of each ACTIVE voxel, read from the OTHER-color
    tile ``o`` (4D: (C, BZ, BY, WP)). z/y neighbors keep the packed lane;
    x neighbors select lane i / i+1 (x+) or i / i-1 (x-) by row offset."""
    xl = jnp.concatenate([o[..., 1:], o[..., -1:]], axis=3)   # lane i+1
    xr = jnp.concatenate([o[..., :1], o[..., :-1]], axis=3)   # lane i-1
    if o.shape[1] == 1:
        # BZ=1 (prime Z extents): z-neighbors are exactly the margin planes
        # (o[:, 1:] would be a zero-size vector, rejected by Mosaic).
        zp, zm = zup, zdn
    else:
        zp = jnp.concatenate([o[:, 1:], zup], axis=1)
        zm = jnp.concatenate([zdn, o[:, :-1]], axis=1)
    return [
        zp,
        zm,
        jnp.concatenate([o[:, :, 1:], yup[:, :, :1]], axis=2),
        jnp.concatenate([ydn[:, :, -1:], o[:, :, :-1]], axis=2),
        jnp.where(sel_hi, xl, o),
        jnp.where(sel_lo, xr, o),
    ]


def _kernel(z0_ref,
            dua_ref, duo_ref, duo_zup_ref, duo_zdn_ref, duo_hlo_ref,
            duo_hhi_ref, duo_yup_ref, duo_ydn_ref,
            psa_ref, pso_ref, pso_zup_ref, pso_zdn_ref, pso_hlo_ref,
            pso_hhi_ref, pso_yup_ref, pso_ydn_ref,
            c_ref, g_ref, pd_ref, out_ref,
            *, alpha: float, omega: float, color: int, bz: int, by: int,
            nzb: int, dg: int, h: int, w: int):
    k = pl.program_id(0)
    j = pl.program_id(1)

    dua = dua_ref[:]          # (3, BZ, BY, WP) active color
    duo = duo_ref[:]          # other color
    c = c_ref[:].astype(dua.dtype)
    g = g_ref[:].astype(dua.dtype)
    psa = psa_ref[:]          # (1, BZ, BY, WP)
    pso = pso_ref[:]
    pd = pd_ref[:]

    duo_zup = jnp.where(k == nzb - 1, duo_hhi_ref[:], duo_zup_ref[:])
    duo_zdn = jnp.where(k == 0, duo_hlo_ref[:], duo_zdn_ref[:])
    pso_zup = jnp.where(k == nzb - 1, pso_hhi_ref[:], pso_zup_ref[:])
    pso_zdn = jnp.where(k == 0, pso_hlo_ref[:], pso_zdn_ref[:])

    # --- packed-space coordinates (GLOBAL, for faces + x-neighbor lanes)
    shape3 = dua.shape[1:]
    zi = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) + k * bz + z0_ref[0]
    yi = jax.lax.broadcasted_iota(jnp.int32, shape3, 1) + j * by
    ii = jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    off = (zi + yi + color) & 1
    xa = 2 * ii + off          # actual x of each active lane
    sel_hi = (off == 1)[None]  # x+ neighbor at other-lane i+1
    sel_lo = (off == 0)[None]  # x- neighbor at other-lane i-1

    du_nb = _shift6_packed(duo, duo_zup, duo_zdn, duo_yup_ref[:],
                           duo_ydn_ref[:], sel_hi, sel_lo)
    ps_nb = _shift6_packed(pso, pso_zup, pso_zdn, pso_yup_ref[:],
                           pso_ydn_ref[:], sel_hi, sel_lo)

    f32 = dua.dtype
    masks = [
        (zi < dg - 1).astype(f32)[None],
        (zi > 0).astype(f32)[None],
        (yi < h - 1).astype(f32)[None],
        (yi > 0).astype(f32)[None],
        (xa < w - 1).astype(f32)[None],
        (xa > 0).astype(f32)[None],
    ]

    b = c
    sw = jnp.zeros_like(psa)
    for pnb, m, dnb in zip(ps_nb, masks, du_nb):
        # where-gated (not mask-multiplied): garbage in partial-block /
        # face fetches must not reach sw even as 0*NaN (pallas/sor.py).
        wd = jnp.where(m > 0.0, (alpha * 0.5) * (psa + pnb), 0.0)
        sw = sw + wd
        b = b + jnp.where(wd > 0.0, wd * dnb, 0.0)

    sw_inv = 1.0 / sw
    q = pd * jnp.sum(g * g, axis=0, keepdims=True)
    smt = pd * sw_inv / (sw + q)
    gb = jnp.sum(g * b, axis=0, keepdims=True)
    star = b * sw_inv - g * (gb * smt)
    # Every lane is an active-color voxel: no parity select.
    out_ref[:] = (1.0 - omega) * dua + omega * star


@functools.partial(jax.jit, static_argnames=("alpha", "omega", "color",
                                             "dg", "interpret"))
def sor_halfsweep_packed(du_a, du_o, c_a, g_a, ps_a, ps_o, pd_a,
                         duo_lo, duo_hi, pso_lo, pso_hi, z0,
                         alpha: float, omega: float, color: int,
                         dg: int, interpret: bool = False):
    """One half-sweep updating the packed ``color`` arrays. All arrays are
    LOCAL-shard, color-packed: du_a/du_o/c_a/g_a (3,D,H,WP), ps/pd
    (D,H,WP); duo_lo/duo_hi (3,1,H,WP) and pso_lo/pso_hi (1,H,WP) are the
    OTHER color's Z halo planes (HaloCtx.z_halo_planes of the packed
    arrays); z0 = global z offset (traced); dg = global Z extent. Returns
    the updated active-color packed array."""
    _, d, h, wp = du_a.shape
    bz, by = _pick_block(d, h, wp)
    nzb = d // bz
    nyb = pl.cdiv(h, by)
    center, haloed = sweep_specs(wp, d, h, bz, by)

    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                # z0 (1,)
        center(3),                                            # du_a
        *haloed(3),                                           # du_o
        center(1),                                            # ps_a
        *haloed(1),                                           # ps_o
        center(3),                                            # c_a
        center(3),                                            # g_a
        center(1),                                            # pd_a
    ]
    # Full x extent of the ACTIVE color: w = 2 * wp exactly (pack_color
    # requires even W; solver falls back to the flat kernel otherwise).
    kernel = functools.partial(_kernel, alpha=float(alpha),
                               omega=float(omega), color=int(color),
                               bz=bz, by=by, nzb=int(nzb), dg=int(dg),
                               h=h, w=2 * wp)
    return pl.pallas_call(
        kernel,
        grid=(nzb, nyb),
        in_specs=specs,
        out_specs=center(3),
        out_shape=jax.ShapeDtypeStruct(du_a.shape, du_a.dtype),
        interpret=interpret,
    )(jnp.asarray(z0, jnp.int32).reshape(1),
      du_a, du_o, du_o, du_o, duo_lo, duo_hi, du_o, du_o,
      ps_a[None], ps_o[None], ps_o[None], ps_o[None], pso_lo[None],
      pso_hi[None], ps_o[None], ps_o[None],
      c_a, g_a, pd_a[None])
