"""Pallas TPU kernel: red-black SOR half-sweep (compact-terms form).

The hot loop of the whole framework (SURVEY.md §5.2 "HOT LOOP"): one colored
half-sweep of the coupled Euler-Lagrange system, replacing the reference's
``solve_3d.cu`` CUDA kernel with a VMEM-blocked VPU kernel.

Design (TPU-first, not a port):
- grid over (Z-blocks, Y-blocks); each step loads a (3, BZ, BY, W) tile of
  the increment plus its 6-neighborhood margins and fuses neighbor
  accumulation, the Sherman-Morrison 3x3 solve, relaxation, and the
  red-black select into ONE HBM pass.
- COMPACT TERMS: instead of streaming the six directional weight volumes
  plus two precomputed Sherman-Morrison factors (36 B/voxel), the kernel
  reads only psi_s and psi_d (8 B) and recomputes
  ``w_pq = alpha*(psi_s[p]+psi_s[q])/2 * face_mask`` and the factors on the
  VPU — HBM traffic drops from 80 to 56 B/voxel/half-sweep, and the weight
  volumes are never materialized at all (DCE'd from compute_terms).
- Z margins arrive as one-plane halo arrays supplied by the caller
  (grid.HaloCtx.z_halo_planes): edge-replicated locally or ppermute'd from
  the neighbor shard — the same collective-permute-per-sweep contract as
  the sharded XLA path (BASELINE.json:5). BZ divides the local Z extent so
  shard-boundary planes always sit at block boundaries.
- Y margins are fetched as adjacent 8-row blocks (Mosaic tiling: the
  second-to-last block dim must be a multiple of 8); X margins are
  in-block. Neumann faces use zero weights computed from GLOBAL voxel
  coordinates, and neighbor terms are gated with where(w>0, w*nb, 0) so
  clamped/padding garbage can never propagate (not even as 0*NaN).
- Red/black voxels are selected by GLOBAL (z+y+x) parity via iota + the
  shard's z offset, so sharded and unsharded runs update identical sites.

The pure-JAX twin (solver.sor_halfsweep on full SolveTerms) is the
bit-tolerance oracle.
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
    # 16-row granularity: bf16 terms tiles need a multiple-of-16 sublane
    # extent (f32 needs 8).
    target_vox = (2 * 1024 * 1024) // (22 * 4)
    by = min(h, max(16, ((target_vox // (4 * w)) // 16) * 16))
    if h % 16 != 0 and by >= h:
        by = h
    bz_target = max(1, target_vox // (by * w))
    bz = 1
    for cand in range(1, min(d, bz_target) + 1):
        if d % cand == 0:
            bz = cand
    return int(bz), int(by)


def _shift6(x, zup_plane, zdn_plane, yup_blk, ydn_blk):
    """Values at the 6 neighbors (z+, z-, y+, y-, x+, x-) of a 4D tile,
    using fetched margin planes/rows; X edges replicate in-block."""
    if x.shape[1] == 1:
        # BZ=1 (prime Z extents force it): both z-neighbors ARE the fetched
        # margin planes; x[:, 1:] would be a zero-size vector, which Mosaic
        # rejects ("vector types must have positive constant sizes").
        zp, zm = zup_plane, zdn_plane
    else:
        zp = jnp.concatenate([x[:, 1:], zup_plane], axis=1)
        zm = jnp.concatenate([zdn_plane, x[:, :-1]], axis=1)
    return [
        zp,
        zm,
        jnp.concatenate([x[:, :, 1:], yup_blk[:, :, :1]], axis=2),
        jnp.concatenate([ydn_blk[:, :, -1:], x[:, :, :-1]], axis=2),
        jnp.concatenate([x[..., 1:], x[..., -1:]], axis=3),
        jnp.concatenate([x[..., :1], x[..., :-1]], axis=3),
    ]


def _kernel(z0_ref,
            du_ref, du_zup_ref, du_zdn_ref, du_hlo_ref, du_hhi_ref,
            du_yup_ref, du_ydn_ref,
            ps_ref, ps_zup_ref, ps_zdn_ref, ps_hlo_ref, ps_hhi_ref,
            ps_yup_ref, ps_ydn_ref,
            c_ref, g_ref, pd_ref, out_ref,
            *, alpha: float, omega: float, color: int, bz: int, by: int,
            nzb: int, dg: int, h: int, w: int):
    k = pl.program_id(0)
    j = pl.program_id(1)

    du = du_ref[:]            # (3, BZ, BY, W)
    c = c_ref[:].astype(du.dtype)   # terms may be stored bf16
    g = g_ref[:].astype(du.dtype)
    ps = ps_ref[:]            # (1, BZ, BY, W)
    pd = pd_ref[:]

    # --- margin planes: shard halos override the clamped fetches at the
    # local-volume faces (equal to replicate unsharded) ---
    du_zup = jnp.where(k == nzb - 1, du_hhi_ref[:], du_zup_ref[:])
    du_zdn = jnp.where(k == 0, du_hlo_ref[:], du_zdn_ref[:])
    ps_zup = jnp.where(k == nzb - 1, ps_hhi_ref[:], ps_zup_ref[:])
    ps_zdn = jnp.where(k == 0, ps_hlo_ref[:], ps_zdn_ref[:])

    du_nb = _shift6(du, du_zup, du_zdn, du_yup_ref[:], du_ydn_ref[:])
    ps_nb = _shift6(ps, ps_zup, ps_zdn, ps_yup_ref[:], ps_ydn_ref[:])

    # --- Neumann face masks from GLOBAL coordinates ---
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

    # --- directional weights recomputed on the VPU (compute_terms formula:
    # alpha * 0.5 * (psi_s[p] + psi_s[q]) * mask) ---
    b = c
    sw = jnp.zeros_like(ps)
    for pnb, m, dnb in zip(ps_nb, masks, du_nb):
        # Gate via where (not multiply-by-mask): for a partial last Y block
        # the out-of-bounds rows of the fetched psi_s tile are unspecified
        # VMEM data, and mask*NaN = NaN would poison sw for the adjacent
        # valid row. where(m > 0, ...) keeps garbage out entirely.
        wd = jnp.where(m > 0.0, (alpha * 0.5) * (ps + pnb), 0.0)
        sw = sw + wd
        b = b + jnp.where(wd > 0.0, wd * dnb, 0.0)

    sw_inv = 1.0 / sw
    q = pd * jnp.sum(g * g, axis=0, keepdims=True)
    smt = pd * sw_inv / (sw + q)

    gb = jnp.sum(g * b, axis=0, keepdims=True)
    star = b * sw_inv - g * (gb * smt)
    new = (1.0 - omega) * du + omega * star

    par = (zi + yi + xi) & 1
    out_ref[:] = jnp.where((par == color)[None], new, du)


def sweep_specs(lane_w: int, d: int, h: int, bz: int, by: int):
    """Shared BlockSpec builders for the red-black sweep kernel family
    (flat/packed x rank-1/general-SPD). Returns (center, haloed):
    ``center(nc)`` is the (nc, bz, by, lane_w) grid block; ``haloed(nc)``
    is the 7-spec sequence every Z/Y-haloed field uses — center, the two
    clamped adjacent-z planes, the two z-halo plane inputs, and the two
    clamped 8-row y-margin blocks. The clamped index maps (especially
    the partial-y-block handling via n8 = cdiv(h, 8)) are the subtlest
    part of these kernels; this is the ONE copy."""
    nyb = pl.cdiv(h, by)
    n8 = pl.cdiv(h, 8)

    def vs(nc, bzz, byy, imap):
        return pl.BlockSpec((nc, bzz, byy, lane_w), imap,
                            memory_space=pltpu.VMEM)

    def center(nc):
        return vs(nc, bz, by, lambda k, j: (0, k, j, 0))

    def zplane(nc, up: bool):
        if up:
            return vs(nc, 1, by,
                      lambda k, j: (0, jnp.minimum((k + 1) * bz, d - 1),
                                    j, 0))
        return vs(nc, 1, by,
                  lambda k, j: (0, jnp.maximum(k * bz - 1, 0), j, 0))

    def zhalo(nc):
        return vs(nc, 1, by, lambda k, j: (0, 0, j, 0))

    def yblk(nc, up: bool):
        if nyb == 1:
            return vs(nc, bz, by, lambda k, j: (0, k, 0, 0))
        if up:
            return vs(nc, bz, 8,
                      lambda k, j: (0, k, jnp.minimum((j + 1) * (by // 8),
                                                      n8 - 1), 0))
        return vs(nc, bz, 8,
                  lambda k, j: (0, k, jnp.maximum(j * (by // 8) - 1, 0), 0))

    def haloed(nc):
        return [center(nc), zplane(nc, True), zplane(nc, False),
                zhalo(nc), zhalo(nc), yblk(nc, True), yblk(nc, False)]

    return center, haloed


@functools.partial(jax.jit, static_argnames=("alpha", "omega", "color",
                                             "dg", "interpret"))
def sor_halfsweep_pallas(du, c, g, psi_s, psi_d, du_lo, du_hi, ps_lo, ps_hi,
                         z0, alpha: float, omega: float, color: int,
                         dg: int, interpret: bool = False):
    """One colored half-sweep, compact-terms form. All arrays are the LOCAL
    shard: du/c/g (3,D,H,W), psi_s/psi_d (D,H,W); du_lo/du_hi (3,1,H,W) and
    ps_lo/ps_hi (1,H,W) from HaloCtx.z_halo_planes; z0 = global z offset
    (traced); dg = global Z extent (static)."""
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
        center(3),                                            # g
        center(1),                                            # psi_d
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
      c, g, psi_d[None])
    return out
