"""Relaxation solver for the coupled Euler–Lagrange system.

TPU-native equivalent of the reference's hot op ``CudaOperationSolve3D``
(red-black SOR on the linearized Euler–Lagrange equations of the variational
energy, SURVEY.md §4/§10). Per nonlinearity update we precompute the
Charbonnier weights and the constant part of the right-hand side once; each
sweep is then a pure 6-neighbor stencil over the increment field.

Per-voxel system (SURVEY.md §10): with data weight psi_d, gradient
g = (Iz, Iy, Ix), neighbor weights w_pq = alpha*(psi_s[p]+psi_s[q])/2 and
sw = sum_q w_pq, the 3x3 matrix is

    A = sw * I + psi_d * g g^T          (rank-1 + scaled identity)

so instead of Cramer's rule we use the exact Sherman–Morrison inverse —
3 fused multiply-adds per voxel, ideal VPU shape:

    A^-1 b = b/sw - g * (psi_d * (g.b)) / (sw * (sw + psi_d*|g|^2))

Red/black coloring uses the *global* parity of (z+y+x) so Z-sharded and
unsharded runs perform identical updates; the increment's Z halo is
exchanged via collective-permute before every half-sweep (BASELINE.json:5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpuflow3d.derivatives import central_diff
from tpuflow3d.grid import HaloCtx, Z_AXIS, neighbor_slices, replicate_pad
from tpuflow3d.params import FlowParams


class SolveTerms(NamedTuple):
    """Per-nonlinear-iteration constants consumed by the sweeps.

    The Pallas sweep kernel consumes only (c, g, psi_s, psi_d) — 44 B/voxel
    — and recomputes the directional weights and Sherman-Morrison factors
    in VMEM; the XLA path uses the precomputed (w, sw_inv, smt). Unused
    outputs are dead-code-eliminated inside the level jit, so each backend
    only materializes what it reads."""
    c: jax.Array        # (3, D, H, W) constant RHS part
    g: jax.Array        # (3, D, H, W) spatial gradient
    w: jax.Array        # (6, D, H, W) neighbor weights: z+, z-, y+, y-, x+, x-
    sw_inv: jax.Array   # (D, H, W) 1 / sum_q w_pq
    smt: jax.Array      # (D, H, W) psi_d / (sw * (sw + psi_d*|g|^2))
    psi_s: jax.Array = None  # (D, H, W) smoothness penalizer derivative
    psi_d: jax.Array = None  # (D, H, W) data penalizer derivative
    ainv: jax.Array = None   # (6, D, H, W) symmetric A^-1 rows
                             # (00,01,02,11,12,22) — only when the
                             # gradient-constancy term is active (gamma>0),
                             # where A is no longer rank-1-plus-identity
                             # and Sherman-Morrison does not apply
    d6: jax.Array = None     # (6, D, H, W) data-matrix entries D =
                             # psi_d g g^T + psi_g sum_a h_a h_a^T (no sw
                             # on the diagonal) — gamma > 0 only; consumed
                             # by the multigrid hierarchy (mgsolver
                             # Galerkin-averages these as a quadratic
                             # form); DCE'd when the solver is plain SOR


def _psi_deriv(q2: jax.Array, penalizer: str, eps: float) -> jax.Array:
    """Psi'(q^2) up to a constant: Charbonnier 1/sqrt(q^2 + eps^2)."""
    if penalizer == "quadratic":
        return jnp.ones_like(q2)
    return lax.rsqrt(q2 + eps * eps)


def parity_mask(shape_local: tuple[int, int, int], ctx: HaloCtx) -> jax.Array:
    """(D,H,W) int32 global parity of (z + y + x): 0 = red, 1 = black."""
    d, h, w = shape_local
    zg = ctx.z_global(d)
    iy = jnp.arange(h).reshape(1, h, 1)
    ix = jnp.arange(w).reshape(1, 1, w)
    return (zg + iy + ix) & 1


def _neighbors6(x: jax.Array, ctx: HaloCtx) -> list[jax.Array]:
    """Values at the 6 neighbors (z+, z-, y+, y-, x+, x-), replicate edges.
    Works for (D,H,W) and (3,D,H,W)."""
    xp = ctx.zpad(x, 1)
    out = [neighbor_slices(xp, 1, Z_AXIS, +1),
           neighbor_slices(xp, 1, Z_AXIS, -1)]
    for axis in (-2, -1):
        xp = replicate_pad(x, 1, axis=axis)
        out.append(neighbor_slices(xp, 1, axis, +1))
        out.append(neighbor_slices(xp, 1, axis, -1))
    return out


def _face_masks(shape_local: tuple[int, int, int], ctx: HaloCtx,
                dtype) -> list[jax.Array]:
    """Validity of each of the 6 neighbors (0 at global faces -> true
    Neumann: missing neighbors are excluded from the system)."""
    d, h, w = shape_local
    dg = ctx.d_global(d)
    zg = ctx.z_global(d)
    iy = jnp.arange(h).reshape(1, h, 1)
    ix = jnp.arange(w).reshape(1, 1, w)
    zeros = jnp.zeros((d, h, w), dtype)
    return [
        (zg < dg - 1).astype(dtype) + zeros,
        (zg > 0).astype(dtype) + zeros,
        (iy < h - 1).astype(dtype) + zeros,
        (iy > 0).astype(dtype) + zeros,
        (ix < w - 1).astype(dtype) + zeros,
        (ix > 0).astype(dtype) + zeros,
    ]


def _sym3_inverse(m00, m01, m02, m11, m12, m22) -> jax.Array:
    """Inverse of a symmetric 3x3 (SPD here: sw*I + PSD data terms),
    via the adjugate — 6 cofactor volumes, pure VPU FMAs."""
    c00 = m11 * m22 - m12 * m12
    c01 = m02 * m12 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c11 = m00 * m22 - m02 * m02
    c12 = m01 * m02 - m00 * m12
    c22 = m00 * m11 - m01 * m01
    det_inv = 1.0 / (m00 * c00 + m01 * c01 + m02 * c02)
    return jnp.stack([c00, c01, c02, c11, c12, c22]) * det_inv


def compute_terms(g: jax.Array, it: jax.Array, flow: jax.Array,
                  du: jax.Array, p: FlowParams,
                  ctx: HaloCtx = HaloCtx(), gc=None) -> SolveTerms:
    """Nonlinearity update: recompute psi' weights and RHS constants for the
    current increment estimate (SURVEY.md §5.2 NONLINEAR LOOP).

    ``gc``: optional (gc_g, gc_it) from derivatives.grad_constancy_terms —
    required when p.gamma > 0 (Brox-style gradient constancy). It adds
    gamma*psi_g * sum_a h_a h_a^T to the point system, so A becomes a
    general SPD 3x3; we then precompute its exact inverse per nonlinear
    iteration (SolveTerms.ainv) instead of the Sherman-Morrison factors."""
    dtype = g.dtype
    shape = it.shape
    if (p.gamma > 0.0) != (gc is not None):
        raise ValueError("gamma > 0 requires grad_constancy_terms (and "
                         "vice versa); this execution path does not "
                         "support the gradient-constancy mode")

    # Data term weight from the linearized residual.
    r = it + jnp.einsum("cdhw,cdhw->dhw", g, du)
    psi_d = _psi_deriv(r * r, p.penalizer_data, p.eps_data)

    # Smoothness weight from |grad(total flow)|^2 (flow-driven isotropic).
    total = flow + du
    s2 = jnp.zeros(shape, dtype)
    for axis in (Z_AXIS, -2, -1):
        dgrad = central_diff(total, axis, ctx)  # (3, D, H, W)
        s2 = s2 + jnp.sum(dgrad * dgrad, axis=0)
    psi_s = _psi_deriv(s2, p.penalizer_smooth, p.eps_smooth)

    # Directional neighbor weights w_pq = alpha*(psi_s[p]+psi_s[q])/2
    # (masked to zero across global faces) and the constant RHS
    # -psi_d*g*It + sum_q w_pq*(u[q]-u[p]) (smoothness acts on the *total*
    # flow u+du; the du[q] part is added fresh each sweep). Accumulated one
    # direction at a time so only ONE neighbor volume is ever live —
    # materializing all six at once is what blew HBM at 512^3.
    masks = _face_masks(shape, ctx, dtype)
    alpha = jnp.asarray(p.alpha, dtype)
    sw = jnp.zeros(shape, dtype)
    nbu = jnp.zeros_like(flow)
    w_dirs = []
    # At large volumes, compute each direction's neighbor volume inside a
    # barriered step (threading the sources through the barrier so XLA
    # cannot hoist all six 12 B/voxel neighbor temps to the front and keep
    # them live simultaneously — that is what blew HBM at 512^3). Trades
    # ~6 extra nbu passes per nonlinear iteration for ~9 GB of peak memory
    # at 512^3; sweeps dominate runtime, memory bounds the max volume.
    sequentialize = int(np.prod(shape)) * 4 > 256 * 1024 * 1024
    flow_zp = ctx.zpad(flow, 1)
    psi_zp = ctx.zpad(psi_s, 1)

    def nb_pair(src, src_zp, axis, delta):
        if axis == Z_AXIS:
            return neighbor_slices(src_zp, 1, Z_AXIS, delta)
        xp = replicate_pad(src, 1, axis)
        return neighbor_slices(xp, 1, axis, delta)

    for i, (axis, delta) in enumerate([(Z_AXIS, +1), (Z_AXIS, -1),
                                       (-2, +1), (-2, -1),
                                       (-1, +1), (-1, -1)]):
        pnb = nb_pair(psi_s, psi_zp, axis, delta)
        unb = nb_pair(flow, flow_zp, axis, delta)
        wd = alpha * 0.5 * (psi_s + pnb) * masks[i]
        sw = sw + wd
        nbu = nbu + wd[None] * (unb - flow)
        w_dirs.append(wd)
        if sequentialize:
            sw, nbu, flow, flow_zp, psi_s, psi_zp = lax.optimization_barrier(
                (sw, nbu, flow, flow_zp, psi_s, psi_zp))
    # Stacked weights feed only the XLA sweep path (DCE'd under Pallas).
    w = jnp.stack(w_dirs)
    c = -(psi_d * it)[None] * g + nbu
    sw_inv = 1.0 / sw
    q = psi_d * jnp.sum(g * g, axis=0)
    smt = psi_d * sw_inv / (sw + q)

    ainv = None
    d6 = None
    if gc is not None:
        # Gradient constancy (Brox et al. 2004): one robust penalizer over
        # the summed per-axis derivative residuals r_a = gc_it[a] +
        # gc_g[a].du, weighted by gamma.
        gc_g, gc_it = gc
        r_g = gc_it + jnp.einsum("acdhw,cdhw->adhw", gc_g, du)
        psi_g = jnp.asarray(p.gamma, dtype) * _psi_deriv(
            jnp.sum(r_g * r_g, axis=0), p.penalizer_grad, p.eps_grad)
        c = c - jnp.einsum("adhw,acdhw->cdhw", psi_g[None] * gc_it, gc_g)
        # Full symmetric A = sw*I + psi_d g g^T + psi_g sum_a h_a h_a^T.
        def d_entry(i, j):
            return (psi_d * g[i] * g[j]
                    + psi_g * jnp.sum(gc_g[:, i] * gc_g[:, j], axis=0))
        d6 = jnp.stack([d_entry(0, 0), d_entry(0, 1), d_entry(0, 2),
                        d_entry(1, 1), d_entry(1, 2), d_entry(2, 2)])
        ainv = _sym3_inverse(d6[0] + sw, d6[1], d6[2],
                             d6[3] + sw, d6[4], d6[5] + sw)

    if p.terms_dtype != str(dtype):
        # Storage-only downcast of the sweep constants (SURVEY.md §10:
        # bf16 never enters the solver arithmetic — consumers upcast).
        td = jnp.dtype(p.terms_dtype)
        c = c.astype(td)
        g_store = g.astype(td)
    else:
        g_store = g
    return SolveTerms(c=c, g=g_store, w=w, sw_inv=sw_inv, smt=smt,
                      psi_s=psi_s, psi_d=psi_d, ainv=ainv, d6=d6)


def _du_star(du: jax.Array, t: SolveTerms, ctx: HaloCtx) -> jax.Array:
    """Exact pointwise solution A^-1 b given current neighbor values of du."""
    du_nb = _neighbors6(du, ctx)  # Z halo exchanged here, every call
    b = t.c.astype(du.dtype)  # terms may be stored bf16; compute in f32
    for wd, dnb in zip(t.w, du_nb):
        b = b + wd[None] * dnb
    if t.ainv is not None:
        # General SPD system (gradient-constancy mode): x = A^-1 b with
        # the precomputed symmetric inverse (rows 00,01,02,11,12,22).
        # t.g is not read here (may be None on the streamed path, which
        # only materializes what this branch consumes).
        a = t.ainv
        return jnp.stack([
            a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
            a[1] * b[0] + a[3] * b[1] + a[4] * b[2],
            a[2] * b[0] + a[4] * b[1] + a[5] * b[2],
        ])
    g = t.g.astype(du.dtype)
    gb = jnp.einsum("cdhw,cdhw->dhw", g, b)
    return b * t.sw_inv[None] - g * (gb * t.smt)[None]


def sor_halfsweep(du: jax.Array, t: SolveTerms, omega: float,
                  parity: jax.Array, color: int,
                  ctx: HaloCtx = HaloCtx()) -> jax.Array:
    star = _du_star(du, t, ctx)
    new = (1.0 - omega) * du + omega * star
    return jnp.where((parity == color)[None], new, du)


def jacobi_sweep(du: jax.Array, t: SolveTerms, omega: float,
                 ctx: HaloCtx = HaloCtx()) -> jax.Array:
    star = _du_star(du, t, ctx)
    return (1.0 - omega) * du + omega * star


def solve_increment(g: jax.Array, it: jax.Array, flow: jax.Array,
                    p: FlowParams, ctx: HaloCtx, parity: jax.Array,
                    residuals_slot=None, gc=None):
    """Full inner solve: nonlinearity loop x sweep loop. Returns the flow
    increment (du, dv, dw); optionally records per-sweep residual norms into
    ``residuals_slot`` (a (inner*sweeps,) array) when track_residuals.
    ``gc``: gradient-constancy terms, required iff p.gamma > 0 — that mode
    sweeps with the general-SPD Pallas kernels (packed layout
    pallas/sor_gc_packed.py at even W, flat pallas/sor_gc.py otherwise)
    or the XLA full-3x3 path."""
    du0 = jnp.zeros_like(flow)
    track = residuals_slot is not None
    n_global = 3.0 * ctx.d_global(it.shape[-3]) * it.shape[-2] * it.shape[-1]
    from tpuflow3d.backend import pallas_interpret, use_pallas
    gamma_mode = p.gamma > 0.0
    pallas_sweeps = p.solver == "sor" and use_pallas(p)
    if pallas_sweeps:
        interp = pallas_interpret()
    # Color-packed layout needs even W (pairs of lanes per packed lane),
    # and on real TPUs it only wins when the packed lane dim still fills
    # (multiples of) the 128-lane vector tile — W >= 256. Below that the
    # packed arrays waste lanes to tile padding and Mosaic compile time
    # explodes on the relayouts, so coarse pyramid levels use the flat
    # kernel (dispatch is static per level). Interpret mode (CPU tests)
    # keeps packed enabled at any even W for coverage. Gradient-constancy
    # mode packs (c, ainv, psi_s) and sweeps with the packed general-SPD
    # kernel (pallas/sor_gc_packed.py, 40 vs 64 B/voxel per half-sweep);
    # the flat gc kernel covers the odd-W/coarse-level regime.
    packed = (pallas_sweeps
              and p.sweep_layout == "packed"
              and it.shape[-1] % 2 == 0
              and (interp or it.shape[-1] >= 256))
    if pallas_sweeps:
        z0 = ctx.z0(it.shape[-3])
        dg = ctx.d_global(it.shape[-3])
        if packed:
            from tpuflow3d.pallas.sor_packed import (pack_color,
                                                     sor_halfsweep_packed,
                                                     unpack_colors)
            if gamma_mode:
                from tpuflow3d.pallas.sor_gc_packed import (
                    sor_halfsweep_gc_packed)
        elif gamma_mode:
            from tpuflow3d.pallas.sor_gc import sor_halfsweep_gc_pallas
        else:
            from tpuflow3d.pallas.sor import sor_halfsweep_pallas

    def one_sweep(du, t, ps_halos):
        """One full red+black sweep. ``du`` is the packed color pair under
        the packed layout, the full (3,D,H,W) increment otherwise."""
        if packed and gamma_mode:
            d0, d1 = du
            (c_pk, ai_pk, ps_pk), ps_halos_pk = t, ps_halos
            lo, hi = ctx.z_halo_planes(d1)
            d0 = sor_halfsweep_gc_packed(
                d0, d1, c_pk[0], ai_pk[0], ps_pk[0], ps_pk[1],
                lo, hi, ps_halos_pk[1][0], ps_halos_pk[1][1], z0,
                p.alpha, p.omega, 0, dg, interpret=interp)
            lo, hi = ctx.z_halo_planes(d0)
            d1 = sor_halfsweep_gc_packed(
                d1, d0, c_pk[1], ai_pk[1], ps_pk[1], ps_pk[0],
                lo, hi, ps_halos_pk[0][0], ps_halos_pk[0][1], z0,
                p.alpha, p.omega, 1, dg, interpret=interp)
            return (d0, d1)
        if packed:
            d0, d1 = du
            (c_pk, g_pk, ps_pk, pd_pk), ps_halos_pk = t, ps_halos
            lo, hi = ctx.z_halo_planes(d1)
            d0 = sor_halfsweep_packed(
                d0, d1, c_pk[0], g_pk[0], ps_pk[0], ps_pk[1], pd_pk[0],
                lo, hi, ps_halos_pk[1][0], ps_halos_pk[1][1], z0,
                p.alpha, p.omega, 0, dg, interpret=interp)
            lo, hi = ctx.z_halo_planes(d0)
            d1 = sor_halfsweep_packed(
                d1, d0, c_pk[1], g_pk[1], ps_pk[1], ps_pk[0], pd_pk[1],
                lo, hi, ps_halos_pk[0][0], ps_halos_pk[0][1], z0,
                p.alpha, p.omega, 1, dg, interpret=interp)
            return (d0, d1)
        if pallas_sweeps:
            du1 = du
            for color in (0, 1):
                lo, hi = ctx.z_halo_planes(du1)
                if gamma_mode:
                    du1 = sor_halfsweep_gc_pallas(
                        du1, t.c, t.ainv, t.psi_s, lo, hi,
                        ps_halos[0], ps_halos[1], z0, p.alpha, p.omega,
                        color, dg, interpret=interp)
                else:
                    du1 = sor_halfsweep_pallas(
                        du1, t.c, t.g, t.psi_s, t.psi_d, lo, hi,
                        ps_halos[0], ps_halos[1], z0, p.alpha, p.omega,
                        color, dg, interpret=interp)
            return du1
        if p.solver == "sor":
            du1 = sor_halfsweep(du, t, p.omega, parity, 0, ctx)
            du1 = sor_halfsweep(du1, t, p.omega, parity, 1, ctx)
        else:
            du1 = jacobi_sweep(du, t, p.jacobi_omega(), ctx)
        return du1

    def _abs_delta(a, b):
        if packed:
            return sum(jnp.sum(jnp.abs(x - y)) for x, y in zip(a, b))
        return jnp.sum(jnp.abs(a - b))

    def inner_body(k, carry):
        du, res = carry
        t = compute_terms(g, it, flow, du, p, ctx, gc=gc)
        if p.solver == "multigrid":
            # Geometric multigrid V-cycles on the frozen linear system
            # (mgsolver.py) — a convergence-rate extension over the
            # reference's plain SOR; per-cycle update norms land in the
            # residual slot at this inner iteration's offset.
            from tpuflow3d.mgsolver import mg_solve
            du, res = mg_solve(du, t, p, ctx,
                               residuals_slot=res if track else None,
                               slot_offset=k * p.sweeps)
            if not track:
                res = carry[1]
            return (du, res)
        if packed:
            # Pack du + the sweep constants once per nonlinearity update
            # (exact lane permutation, amortized over p.sweeps sweeps).
            # gc mode packs (c, ainv, psi_s); the rank-1 mode
            # (c, g, psi_s, psi_d).
            fields = ((t.c, t.ainv, t.psi_s) if gamma_mode
                      else (t.c, t.g, t.psi_s, t.psi_d))
            terms = tuple(
                tuple(pack_color(a, col, z0) for a in fields)
                for col in (0, 1))
            # Regroup as per-field color pairs; psi_s is field 2 in both.
            t_sw = tuple(tuple(terms[col][i] for col in (0, 1))
                         for i in range(len(fields)))
            ps_halos = tuple(ctx.z_halo_planes(t_sw[2][col])
                             for col in (0, 1))
            du_sw = (pack_color(du, 0, z0), pack_color(du, 1, z0))
        else:
            t_sw = t
            # psi_s halos are fixed within an inner iteration: exchange once.
            ps_halos = ctx.z_halo_planes(t.psi_s) if pallas_sweeps else None
            du_sw = du

        if p.residual_tol > 0.0:
            # Early stopping: sweep until the mean update norm (psum across
            # shards — the reference's convergence check, BASELINE.json:5)
            # drops below residual_tol, capped at p.sweeps.
            def cond(carry2):
                _, _, s, r = carry2
                return jnp.logical_and(s < p.sweeps, r > p.residual_tol)

            def body(carry2):
                du, res, s, _ = carry2
                du1 = one_sweep(du, t_sw, ps_halos)
                r = ctx.psum(_abs_delta(du1, du)) / n_global
                if track:
                    res = res.at[k * p.sweeps + s].set(r)
                return (du1, res, s + 1, r)

            du_sw, res, _, _ = lax.while_loop(
                cond, body,
                (du_sw, res, jnp.int32(0), jnp.asarray(jnp.inf, g.dtype)))
        else:
            def sweep_body(s, carry2):
                du, res = carry2
                du1 = one_sweep(du, t_sw, ps_halos)
                if track:
                    r = ctx.psum(_abs_delta(du1, du)) / n_global
                    res = res.at[k * p.sweeps + s].set(r)
                return (du1, res)

            du_sw, res = lax.fori_loop(0, p.sweeps, sweep_body,
                                       (du_sw, res))
        if packed:
            du = unpack_colors(du_sw[0], du_sw[1], z0)
        else:
            du = du_sw
        return (du, res)

    res0 = residuals_slot if track else jnp.zeros((), g.dtype)
    du, res = lax.fori_loop(0, p.inner_iterations, inner_body, (du0, res0))
    return (du, res) if track else (du, None)
