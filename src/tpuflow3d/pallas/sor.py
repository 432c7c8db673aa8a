"""Pallas TPU kernel: red-black SOR half-sweep.

The hot loop of the whole framework (SURVEY.md §5.2 "HOT LOOP"): one colored
half-sweep of the coupled Euler-Lagrange system, replacing the reference's
``solve_3d.cu`` CUDA kernel with a VMEM-blocked VPU kernel.

Design (TPU-first, not a port):
- grid over (Z-blocks, Y-blocks); each step loads a (3, BZ, BY, W) tile of
  the increment plus its 6-neighborhood margins and fuses neighbor
  accumulation, the Sherman-Morrison 3x3 solve, relaxation, and the
  red-black select into ONE HBM pass (XLA's fusion re-reads shifted
  operands; this kernel reads each operand once).
- Z margins arrive as one-plane halo arrays supplied by the caller
  (grid.HaloCtx.z_halo_planes): edge-replicated locally or ppermute'd from
  the neighbor shard — the same collective-permute-per-sweep contract as
  the sharded XLA path (BASELINE.json:5). BZ divides the local Z extent so
  shard-boundary planes always sit at block boundaries.
- Y margins are fetched as adjacent 8-row blocks (Mosaic tiling: the
  second-to-last block dim must be a multiple of 8); X margins are
  in-block. At global faces the directional weights are zero, and neighbor
  terms are gated with where(w>0, w*nb, 0) so clamped/padding garbage can
  never propagate (not even as 0*NaN).
- Red/black voxels are selected by GLOBAL (z+y+x) parity via iota + the
  shard's z offset, so sharded and unsharded runs update identical sites.

The pure-JAX twin (solver.sor_halfsweep) is the bit-tolerance oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(d: int, h: int, w: int) -> tuple[int, int]:
    """(BZ, BY): BZ divides D (shard/global faces at block boundaries);
    BY a multiple of 8 (Mosaic sublane tiling). Sized so a grid step's live
    tiles stay ~2-3 MB (leaving VMEM room for double buffering)."""
    target_vox = (2 * 1024 * 1024) // (22 * 4)
    by = min(h, max(8, ((target_vox // (4 * w)) // 8) * 8))
    if h % 8 != 0 and by >= h:
        by = h
    bz_target = max(1, target_vox // (by * w))
    bz = 1
    for cand in range(1, min(d, bz_target) + 1):
        if d % cand == 0:
            bz = cand
    return int(bz), int(by)


def _kernel(z0_ref, du_ref, zup_ref, zdn_ref, hlo_ref, hhi_ref, yup_ref,
            ydn_ref, c_ref, g_ref, w_ref, sw_inv_ref, smt_ref, out_ref,
            *, omega: float, color: int, bz: int, by: int, nzb: int):
    k = pl.program_id(0)
    j = pl.program_id(1)

    du = du_ref[:]            # (3, BZ, BY, W)
    c = c_ref[:]
    g = g_ref[:]
    w = w_ref[:]              # (6, BZ, BY, W)
    sw_inv = sw_inv_ref[:]    # (1, BZ, BY, W)
    smt = smt_ref[:]

    # --- neighbor values of du (6-point stencil) ---
    zup_plane = jnp.where(k == nzb - 1, hhi_ref[:], zup_ref[:])  # (3,1,BY,W)
    zdn_plane = jnp.where(k == 0, hlo_ref[:], zdn_ref[:])
    nb = [
        jnp.concatenate([du[:, 1:], zup_plane], axis=1),          # z+
        jnp.concatenate([zdn_plane, du[:, :-1]], axis=1),         # z-
        jnp.concatenate([du[:, :, 1:], yup_ref[:, :, :1]], axis=2),   # y+
        jnp.concatenate([ydn_ref[:, :, -1:], du[:, :, :-1]], axis=2),  # y-
        jnp.concatenate([du[..., 1:], du[..., -1:]], axis=3),     # x+
        jnp.concatenate([du[..., :1], du[..., :-1]], axis=3),     # x-
    ]
    b = c
    for i, nbi in enumerate(nb):
        wi = w[i:i + 1]
        # Gate on w>0 so garbage behind zero-weight faces (clamped fetches,
        # partial-block padding) cannot propagate, even as 0*inf.
        b = b + jnp.where(wi > 0.0, wi * nbi, 0.0)

    gb = jnp.sum(g * b, axis=0, keepdims=True)  # (1, BZ, BY, W)
    star = b * sw_inv - g * (gb * smt)
    new = (1.0 - omega) * du + omega * star

    # --- global-parity red/black select ---
    shape3 = du.shape[1:]
    zi = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) + k * bz
    yi = jax.lax.broadcasted_iota(jnp.int32, shape3, 1) + j * by
    xi = jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    par = (zi + yi + xi + z0_ref[0]) & 1
    out_ref[:] = jnp.where((par == color)[None], new, du)


@functools.partial(jax.jit, static_argnames=("omega", "color", "interpret"))
def sor_halfsweep_pallas(du, c, g, w, sw_inv, smt, halo_lo, halo_hi, z0,
                         omega: float, color: int, interpret: bool = False):
    """One colored half-sweep. All arrays are the LOCAL shard:
    du/c/g (3,D,H,W), w (6,D,H,W), sw_inv/smt (D,H,W), halo_lo/halo_hi
    (3,1,H,W) from HaloCtx.z_halo_planes, z0 = global z offset (traced).
    """
    _, d, h, wd = du.shape
    bz, by = _pick_block(d, h, wd)
    nzb = d // bz
    nyb = pl.cdiv(h, by)
    n8 = pl.cdiv(h, 8)  # y fetched at 8-row granularity

    def vs(nc, bzz, byy, imap):
        return pl.BlockSpec((nc, bzz, byy, wd), imap,
                            memory_space=pltpu.VMEM)

    grid = (nzb, nyb)
    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),               # z0 (1,)
        vs(3, bz, by, lambda k, j: (0, k, j, 0)),            # du
        # z-neighbor planes (z block dim 1 => block index = plane index)
        vs(3, 1, by, lambda k, j: (0, jnp.minimum((k + 1) * bz, d - 1), j, 0)),
        vs(3, 1, by, lambda k, j: (0, jnp.maximum(k * bz - 1, 0), j, 0)),
        vs(3, 1, by, lambda k, j: (0, 0, j, 0)),             # halo_lo
        vs(3, 1, by, lambda k, j: (0, 0, j, 0)),             # halo_hi
        # y-neighbor 8-row blocks (clamped; zero weights guard the faces).
        # With a single y block the fetched values are never used (global
        # faces have zero weight), so any in-range block index works.
        (vs(3, bz, 8,
            lambda k, j: (0, k, jnp.minimum((j + 1) * (by // 8), n8 - 1), 0))
         if nyb > 1 else vs(3, bz, by, lambda k, j: (0, k, 0, 0))),
        (vs(3, bz, 8,
            lambda k, j: (0, k, jnp.maximum(j * (by // 8) - 1, 0), 0))
         if nyb > 1 else vs(3, bz, by, lambda k, j: (0, k, 0, 0))),
        vs(3, bz, by, lambda k, j: (0, k, j, 0)),            # c
        vs(3, bz, by, lambda k, j: (0, k, j, 0)),            # g
        vs(6, bz, by, lambda k, j: (0, k, j, 0)),            # w
        vs(1, bz, by, lambda k, j: (0, k, j, 0)),            # sw_inv
        vs(1, bz, by, lambda k, j: (0, k, j, 0)),            # smt
    ]
    kernel = functools.partial(_kernel, omega=float(omega), color=int(color),
                               bz=bz, by=by, nzb=int(nzb))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=vs(3, bz, by, lambda k, j: (0, k, j, 0)),
        out_shape=jax.ShapeDtypeStruct(du.shape, du.dtype),
        interpret=interpret,
    )(jnp.asarray(z0, jnp.int32).reshape(1), du, du, du, halo_lo, halo_hi,
      du, du, c, g, w, sw_inv[None], smt[None])
    return out
