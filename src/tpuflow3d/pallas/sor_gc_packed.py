"""Pallas TPU kernel: color-packed red-black SOR half-sweep,
gradient-constancy (general-SPD) form.

Closes the packed x gamma cell of the mode matrix (VERDICT r3 missing
#4): the gamma > 0 accuracy mode previously swept with the FLAT
general-SPD kernel (pallas/sor_gc.py, 64 B/voxel per half-sweep), paying
the same masked-color waste the packed layout removes for the gamma == 0
path. This kernel stores everything checkerboard-packed along X
(pallas/sor_packed.py layout) and streams, per half-sweep: active-color
du (6 B read + 6 write per full-volume voxel), other-color du for the
neighbors (6), c (6), ainv (12), psi_s of both colors (2+2) = 40
B/voxel — a 64 -> 40 byte-model cut, and every VPU lane is a real
update.

Point solve: x = A^-1 b with the streamed symmetric inverse
(SolveTerms.ainv rows 00,01,02,11,12,22), b = c + sum_q w_pq du_q with
w_pq recomputed in VMEM from psi_s (pallas/sor_gc.py's split: streaming
the 6-entry inverse is cheaper than recomputing it from g/gc_g).

Packing, neighbor lane selection, halo/margin/mask contracts are
pallas/sor_packed.py's. Oracle: the flat gc kernel and
solver.sor_halfsweep on ainv-terms (tests/test_pallas_sor_gc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow3d.pallas.sor import _pick_block, sweep_specs
from tpuflow3d.pallas.sor_packed import _shift6_packed


def _kernel(z0_ref,
            dua_ref, duo_ref, duo_zup_ref, duo_zdn_ref, duo_hlo_ref,
            duo_hhi_ref, duo_yup_ref, duo_ydn_ref,
            psa_ref, pso_ref, pso_zup_ref, pso_zdn_ref, pso_hlo_ref,
            pso_hhi_ref, pso_yup_ref, pso_ydn_ref,
            c_ref, ainv_ref, out_ref,
            *, alpha: float, omega: float, color: int, bz: int, by: int,
            nzb: int, dg: int, h: int, w: int):
    k = pl.program_id(0)
    j = pl.program_id(1)

    dua = dua_ref[:]          # (3, BZ, BY, WP) active color
    duo = duo_ref[:]          # other color
    c = c_ref[:].astype(dua.dtype)
    a = ainv_ref[:].astype(dua.dtype)  # (6, BZ, BY, WP)
    psa = psa_ref[:]          # (1, BZ, BY, WP)
    pso = pso_ref[:]

    duo_zup = jnp.where(k == nzb - 1, duo_hhi_ref[:], duo_zup_ref[:])
    duo_zdn = jnp.where(k == 0, duo_hlo_ref[:], duo_zdn_ref[:])
    pso_zup = jnp.where(k == nzb - 1, pso_hhi_ref[:], pso_zup_ref[:])
    pso_zdn = jnp.where(k == 0, pso_hlo_ref[:], pso_zdn_ref[:])

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
    for pnb, m, dnb in zip(ps_nb, masks, du_nb):
        wd = jnp.where(m > 0.0, (alpha * 0.5) * (psa + pnb), 0.0)
        b = b + jnp.where(wd > 0.0, wd * dnb, 0.0)

    # x = A^-1 b with the streamed symmetric inverse (00,01,02,11,12,22).
    star = jnp.stack([
        a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
        a[1] * b[0] + a[3] * b[1] + a[4] * b[2],
        a[2] * b[0] + a[4] * b[1] + a[5] * b[2],
    ])
    # Every lane is an active-color voxel: no parity select.
    out_ref[:] = (1.0 - omega) * dua + omega * star


@functools.partial(jax.jit, static_argnames=("alpha", "omega", "color",
                                             "dg", "interpret"))
def sor_halfsweep_gc_packed(du_a, du_o, c_a, ainv_a, ps_a, ps_o,
                            duo_lo, duo_hi, pso_lo, pso_hi, z0,
                            alpha: float, omega: float, color: int,
                            dg: int, interpret: bool = False):
    """One half-sweep updating the packed ``color`` arrays of the
    general-SPD system. All arrays are LOCAL-shard, color-packed:
    du_a/du_o/c_a (3,D,H,WP), ainv_a (6,D,H,WP), ps_a/ps_o (D,H,WP);
    duo_lo/duo_hi (3,1,H,WP) and pso_lo/pso_hi (1,H,WP) are the OTHER
    color's Z halo planes; z0 = global z offset (traced); dg = global Z
    extent. Returns the updated active-color packed array."""
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
        center(6),                                            # ainv_a
    ]
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
      c_a, ainv_a)
