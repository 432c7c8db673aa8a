"""Geometric multigrid V-cycles on the linearized Euler-Lagrange system.

A convergence-rate EXTENSION over the reference, whose solver is plain
red-black SOR (SURVEY.md §2: "solved by SOR (red-black) or Jacobi
relaxation"): SOR kills high-frequency error fast but propagates
low-frequency corrections one voxel per sweep, so the sweep count to a
given residual grows with resolution. Real-time variational flow solvers
(Bruhn et al. 2005) fix this with multigrid; this module is that solver
for the TPU pipeline, selected by ``FlowParams(solver="multigrid")``.

Design:
- Per nonlinearity update (frozen psi weights), the system at each voxel
  is  (sw*I + psi_d g g^T) du_p - sum_q w_pq du_q = c  (solver.py). A
  V-cycle = mg_pre red-black sweeps -> residual -> trilinear restriction
  to a ~half-resolution grid -> recursive correction solve -> trilinear
  prolongation -> mg_post sweeps. The smoother IS the existing
  ``solver.sor_halfsweep`` (XLA or Pallas twin under it), at a damped
  ``mg_omega`` ~1.3: high-omega SOR trades smoothing factor for exactly
  the low-frequency speed the coarse grid already provides.
- Coarse SMOOTHNESS weights are rediscretized: psi_s is trilinearly
  restricted and the directional weights rebuilt at the coarse dims,
  scaled per axis by (coarse_dim/fine_dim)^2 — the 1/h^2 of the stencil
  under anisotropic coarsening. The DATA block D = psi_d g g^T is
  Galerkin-averaged instead: its 6 symmetric ENTRIES are restricted as a
  quadratic form (restricting the factors psi_d and g separately
  destroys the near-rank-1 pointwise structure — measured: the coarse
  correction overshoots ~50x and the cycle diverges). Every MG level
  point-solves the general SPD 3x3 via the precomputed symmetric inverse
  (the same SolveTerms.ainv machinery as the gradient-constancy mode).
- Everything is HaloCtx-generic: restriction/prolongation ride
  ``pyramid.resize3`` (halo-aware Z windows), masks/parity/neighbors the
  same grid helpers as the fine solver, so the V-cycle runs unchanged
  under shard_map with Z-sharded coarse grids (coarse Z dims stay
  multiples of the shard count). Static recursion depth: XLA sees one
  unrolled V-cycle program per level count.
- Cost accounting for the bench A/B: one V-cycle with nu1=nu2=2 costs
  ~4 + 4/8 + 4/64 + ... < 4.6 fine-sweep-equivalents of HBM traffic
  (each coarser level is ~1/8 the voxels) plus one residual (~1 sweep)
  and two resizes. bench/mg_convergence.py measures residual-vs-
  sweep-equivalents against plain SOR on the same frozen system.

Gradient constancy (gamma > 0) composes: compute_terms hands the full
data block D = psi_d g g^T + psi_g sum_a h_a h_a^T as six symmetric
entries (SolveTerms.d6) and the Galerkin quadratic-form restriction,
general-SPD point solve, and gc Pallas smoother are all rank-agnostic.
Not supported (v1): the out-of-core piecewise path (a V-cycle needs the
whole grid; the piecewise driver keeps solver="sor"/"jacobi").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpuflow3d.grid import HaloCtx, Z_AXIS, neighbor_slices, replicate_pad
from tpuflow3d.params import FlowParams
from tpuflow3d.pyramid import resize3
from tpuflow3d.solver import (SolveTerms, _face_masks, _neighbors6,
                              _sym3_inverse, parity_mask, sor_halfsweep)

_MAX_MG_LEVELS = 8
_COARSEST_MIN = 8  # stop coarsening once any dim would drop below ~4


class MGLevel(NamedTuple):
    terms: SolveTerms      # c=None; w + ainv set; rhs injected per cycle
    d6: jax.Array          # (6, D, H, W) data-matrix entries
                           # (00,01,02,11,12,22) — for the residual
    sw: jax.Array          # (D, H, W) sum of neighbor weights
    parity: jax.Array
    shape_global: tuple[int, int, int]
    alpha_eff: float | None = None
    # Static uniform effective smoothness weight alpha * (1/h^2) when the
    # three axis scales coincide (the common halving case) — lets the
    # smoother run as the gc Pallas kernel (sor_halfsweep_gc_pallas
    # consumes exactly (c, ainv, psi_s) and recomputes w from a single
    # alpha in VMEM: 64 B/voxel vs ~88 for the XLA sweep). alpha_eff is
    # None when axis rounding made the scales anisotropic -> XLA smoother
    # there; psi_s/axis_alpha are set on every build_mg_levels level.
    psi_s: jax.Array | None = None
    # Static per-axis effective alphas (z, y, x) — lets mg_residual
    # recompute the directional weights from psi_s on the fly instead of
    # streaming the materialized 6-volume w stack. With the Pallas
    # smoother (which also recomputes w in VMEM) the residual is then
    # the LAST w consumer, so XLA dead-code-eliminates the whole stack:
    # ~6 x 226 MB at the 384^3 fine level (the r4 mg OOM margin).
    axis_alpha: tuple | None = None


def mg_shapes(shape_global: tuple[int, int, int],
              z_multiple: int) -> list[tuple[int, int, int]]:
    """Global grid shapes, fine -> coarse: halve each axis (Z rounded up
    to z_multiple, i.e. the shard count, so coarse grids stay
    shard-mappable) until any axis hits the floor."""
    shapes = [tuple(shape_global)]
    while len(shapes) < _MAX_MG_LEVELS:
        d, h, w = shapes[-1]
        if min(d, h, w) < _COARSEST_MIN:
            break
        dc = max(z_multiple,
                 z_multiple * ((d // 2 + z_multiple - 1) // z_multiple))
        hc, wc = max(4, (h + 1) // 2), max(4, (w + 1) // 2)
        if (dc, hc, wc) == (d, h, w):
            break
        shapes.append((dc, hc, wc))
    return shapes


def _weights(psi_s, axis_scale, alpha, ctx: HaloCtx):
    """Directional smoothness weights + their sum for one MG grid
    (compute_terms' weight block at arbitrary dims, with the per-axis
    1/h^2 scale)."""
    shape = psi_s.shape
    dtype = psi_s.dtype
    masks = _face_masks(shape, ctx, dtype)
    psi_zp = ctx.zpad(psi_s, 1)
    sw = jnp.zeros(shape, dtype)
    w_dirs = []
    for i, (axis, delta) in enumerate([(Z_AXIS, +1), (Z_AXIS, -1),
                                       (-2, +1), (-2, -1),
                                       (-1, +1), (-1, -1)]):
        if axis == Z_AXIS:
            pnb = neighbor_slices(psi_zp, 1, Z_AXIS, delta)
        else:
            pnb = neighbor_slices(replicate_pad(psi_s, 1, axis), 1, axis,
                                  delta)
        a_eff = alpha * axis_scale[i // 2]
        wd = a_eff * 0.5 * (psi_s + pnb) * masks[i]
        sw = sw + wd
        w_dirs.append(wd)
    return jnp.stack(w_dirs), sw


def _assemble_level(w, sw, d6, shape_global, parity, alpha_eff=None,
                    psi_s=None, axis_alpha=None) -> MGLevel:
    ainv = _sym3_inverse(sw + d6[0], d6[1], d6[2],
                         sw + d6[3], d6[4], sw + d6[5])
    t = SolveTerms(c=None, g=None, w=w, sw_inv=None, smt=None, ainv=ainv)
    return MGLevel(terms=t, d6=d6, sw=sw, parity=parity,
                   shape_global=shape_global, alpha_eff=alpha_eff,
                   psi_s=psi_s, axis_alpha=axis_alpha)


def data_block_d6(t: SolveTerms):
    """The six symmetric data-matrix entries (00,01,02,11,12,22) of the
    per-voxel system. Gradient-constancy mode: compute_terms already
    assembled the full block D = psi_d g g^T + psi_g sum_a h_a h_a^T (the
    Galerkin quadratic-form restriction is rank-agnostic, so the whole
    hierarchy and the general-SPD smoother work unchanged); otherwise the
    rank-1 psi_d g g^T."""
    if t.d6 is not None:
        return t.d6
    g = t.g.astype(t.psi_s.dtype)
    pd = t.psi_d
    return jnp.stack([pd * g[0] * g[0], pd * g[0] * g[1],
                      pd * g[0] * g[2], pd * g[1] * g[1],
                      pd * g[1] * g[2], pd * g[2] * g[2]])


def build_mg_levels(t: SolveTerms, p: FlowParams, ctx: HaloCtx
                    ) -> list[MGLevel]:
    """MG hierarchy for one frozen nonlinearity update. Level 0 reuses the
    fine weights and forms D = psi_d g g^T; coarser levels restrict psi_s
    (weights rebuilt, 1/h^2-scaled) and the six D entries (Galerkin-
    averaged quadratic form)."""
    d_local = t.psi_s.shape[-3]
    gshape = (ctx.d_global(d_local), t.psi_s.shape[-2], t.psi_s.shape[-1])
    shapes = mg_shapes(gshape, ctx.n_shards)
    d6 = data_block_d6(t)
    # Rebuild (w, sw) from psi_s rather than reusing t.w + 1/t.sw_inv:
    # bitwise-identical weights (same op order as compute_terms' block)
    # but sw as the direct sum instead of the double reciprocal — which
    # makes the fine system EXACTLY the one the streamed piecewise
    # V-cycle assembles per slab (assemble_fine_system), so
    # streamed == in-core holds at fp-noise level rather than drifting
    # through the reciprocal's extra rounding.
    w0, sw0 = _weights(t.psi_s, (1.0, 1.0, 1.0), p.alpha, ctx)
    levels = [_assemble_level(w0, sw0, d6, shapes[0],
                              parity_mask(t.psi_s.shape, ctx),
                              alpha_eff=p.alpha, psi_s=t.psi_s,
                              axis_alpha=(p.alpha,) * 3)]
    levels += build_coarse_chain(t.psi_s, d6, shapes[1:], gshape, p, ctx)
    return levels


def build_coarse_chain(psi_s, d6, shapes, gshape_fine, p: FlowParams,
                       ctx: HaloCtx, inputs_at_first: bool = False
                       ) -> list[MGLevel]:
    """MG levels for the coarse ``shapes`` chain: psi_s restricted and the
    directional weights rebuilt per level with the cumulative per-axis
    1/h^2 scale vs the FINE global shape ``gshape_fine``; the six data-
    matrix entries Galerkin-averaged (resize3 of the quadratic form).

    ``inputs_at_first``: psi_s/d6 are already at shapes[0] (the piecewise
    driver restricts the fine level by streaming and hands the result
    here); otherwise they are fine-level fields restricted for every
    entry, which is build_mg_levels' behavior."""
    levels = []
    for i, shp in enumerate(shapes):
        if i > 0 or not inputs_at_first:
            d6 = resize3(d6, shp, ctx)
            psi_s = resize3(psi_s, shp, ctx)
        # Cumulative per-axis 1/h^2 of the smoothness stencil (z, y, x).
        axis_scale = tuple((shp[a] / gshape_fine[a]) ** 2
                           for a in range(3))
        w, sw = _weights(psi_s, axis_scale, p.alpha, ctx)
        uniform = max(axis_scale) - min(axis_scale) < 1e-9
        levels.append(_assemble_level(
            w, sw, d6, shp, parity_mask(psi_s.shape, ctx),
            alpha_eff=p.alpha * axis_scale[0] if uniform else None,
            psi_s=psi_s,
            axis_alpha=tuple(p.alpha * s for s in axis_scale)))
    return levels


def assemble_fine_system(c, psi_s, d6, p: FlowParams, ctx: HaloCtx):
    """(SolveTerms general-SPD branch: c/w/ainv, plus sw) for the FINE
    system rebuilt from its streamed constituents. The piecewise streamed
    V-cycle (piecewise._stream_mg_solve) stores only (c, psi_s, d6) on
    the host — 10 channels instead of 10 + w(6) + ainv(6) — and
    recomputes weights and the symmetric inverse per slab visit:
    identical arithmetic to _assemble_level at axis_scale 1, traded
    against per-visit VPU work (the same trade the gc Pallas smoother
    makes in VMEM)."""
    w, sw = _weights(psi_s, (1.0, 1.0, 1.0), p.alpha, ctx)
    ainv = _sym3_inverse(sw + d6[0], d6[1], d6[2],
                         sw + d6[3], d6[4], sw + d6[5])
    t = SolveTerms(c=c, g=None, w=w, sw_inv=None, smt=None, ainv=ainv)
    return t, sw


def fine_residual(du, c, psi_s, d6, sw, p: FlowParams, ctx: HaloCtx):
    """mg_residual on the fine system from streamed constituents (the
    piecewise residual phase): weights recomputed from psi_s on the fly,
    exactly as the in-core level-0 residual does."""
    lvl = MGLevel(terms=None, d6=d6, sw=sw, parity=None,
                  shape_global=None, psi_s=psi_s,
                  axis_alpha=(p.alpha,) * 3)
    return mg_residual(du, lvl, c, ctx)


def _smooth(du, lvl: MGLevel, rhs, p: FlowParams, n: int, ctx: HaloCtx):
    """n red-black sweeps on lvl's system with rhs. Dispatches to the gc
    Pallas kernel (64 B/voxel; it consumes exactly this level's
    (c, ainv, psi_s) and recomputes w in VMEM from the uniform alpha_eff)
    when the backend allows and the level's axis scales are uniform;
    otherwise the XLA sweep."""
    if n <= 0:
        return du
    from tpuflow3d.backend import pallas_interpret, use_pallas
    t = lvl.terms._replace(c=rhs)
    if use_pallas(p) and lvl.alpha_eff is not None:
        from tpuflow3d.pallas.sor_gc import sor_halfsweep_gc_pallas
        interp = pallas_interpret()
        plo, phi = ctx.z_halo_planes(lvl.psi_s)
        z0 = ctx.z0(du.shape[-3])
        dg = lvl.shape_global[0]

        def body(_, du):
            for color in (0, 1):
                lo, hi = ctx.z_halo_planes(du)
                du = sor_halfsweep_gc_pallas(
                    du, t.c, t.ainv, lvl.psi_s, lo, hi, plo, phi, z0,
                    lvl.alpha_eff, p.mg_omega, color, dg, interpret=interp)
            return du

        return lax.fori_loop(0, n, body, du)

    def body(_, du):
        du = sor_halfsweep(du, t, p.mg_omega, lvl.parity, 0, ctx)
        return sor_halfsweep(du, t, p.mg_omega, lvl.parity, 1, ctx)

    return lax.fori_loop(0, n, body, du)


def mg_residual(du, lvl: MGLevel, rhs, ctx: HaloCtx):
    """r = rhs + sum_q w du_q - (sw*I + D) du_p — the defect of the
    linearized system (solver.py's per-voxel form) at any MG level.

    The directional weights are recomputed from psi_s on the fly
    (w_pq = axis_alpha*(psi_s[p]+psi_s[q])/2, masked at global faces) —
    identical arithmetic to the materialized stack, but it leaves the
    6-volume w stack with no consumer under the Pallas smoother, so XLA
    DCEs it (the fine level's largest MG allocation). build_mg_levels
    sets psi_s/axis_alpha on every level, so no materialized-w fallback
    is needed here."""
    du_nb = _neighbors6(du, ctx)
    r = rhs.astype(du.dtype)
    psi_s = lvl.psi_s
    masks = _face_masks(psi_s.shape, ctx, psi_s.dtype)
    psi_nb = _neighbors6(psi_s, ctx)
    for i, (pnb, m, dnb) in enumerate(zip(psi_nb, masks, du_nb)):
        a_eff = lvl.axis_alpha[i // 2]
        wd = a_eff * 0.5 * (psi_s + pnb) * m
        r = r + wd[None] * dnb
    a = lvl.d6
    d_du = jnp.stack([
        a[0] * du[0] + a[1] * du[1] + a[2] * du[2],
        a[1] * du[0] + a[3] * du[1] + a[4] * du[2],
        a[2] * du[0] + a[4] * du[1] + a[5] * du[2],
    ])
    return r - (du * lvl.sw[None] + d_du)


def _vcycle(du, rhs, levels: list[MGLevel], li: int, p: FlowParams,
            ctx: HaloCtx):
    lvl = levels[li]
    du = _smooth(du, lvl, rhs, p, p.mg_pre, ctx)
    if li == len(levels) - 1:
        return _smooth(du, lvl, rhs, p, p.mg_coarse_sweeps, ctx)
    r = mg_residual(du, lvl, rhs, ctx)
    rc = resize3(r, levels[li + 1].shape_global, ctx)
    ec = jnp.zeros_like(rc)
    ec = _vcycle(ec, rc, levels, li + 1, p, ctx)
    du = du + resize3(ec, lvl.shape_global, ctx)
    return _smooth(du, lvl, rhs, p, p.mg_post, ctx)


def mg_solve(du, t: SolveTerms, p: FlowParams, ctx: HaloCtx = HaloCtx(),
             residuals_slot=None, slot_offset=0):
    """p.mg_cycles V-cycles on the frozen linear system ``t`` (c = rhs),
    starting from ``du``. With residual_tol > 0, stops cycling once the
    psum'd mean |update| falls below it. Optionally records the per-cycle
    update norm into ``residuals_slot`` at [slot_offset + cycle]."""
    levels = build_mg_levels(t, p, ctx)
    track = residuals_slot is not None
    n_global = 3.0 * ctx.d_global(du.shape[-3]) * du.shape[-2] * du.shape[-1]
    res = residuals_slot if track else jnp.zeros((), du.dtype)

    def one_cycle(du, res, k):
        du_new = _vcycle(du, t.c, levels, 0, p, ctx)
        delta = ctx.psum(jnp.sum(jnp.abs(du_new - du))) / n_global
        if track:
            res = res.at[slot_offset + k].set(delta)
        return du_new, res, delta

    if p.residual_tol > 0.0:
        # Genuine early stop (mirrors the SOR path, solver.py): converged
        # cycles cost ZERO sweeps on hardware, not masked-out full cycles.
        # The V-cycle body is traced once; the while_loop re-executes the
        # compiled program only while the psum'd update norm exceeds tol.
        def cond(carry):
            _, _, k, delta = carry
            return jnp.logical_and(k < p.mg_cycles, delta > p.residual_tol)

        def body(carry):
            du, res, k, _ = carry
            du, res, delta = one_cycle(du, res, k)
            return (du, res, k + 1, delta)

        du, res, _, _ = lax.while_loop(
            cond, body,
            (du, res, jnp.int32(0), jnp.asarray(jnp.inf, du.dtype)))
    else:
        def body(k, carry):
            du, res = carry
            du, res, _ = one_cycle(du, res, k)
            return (du, res)

        du, res = lax.fori_loop(0, p.mg_cycles, body, (du, res))
    return (du, res) if track else (du, None)
