"""Out-of-core streamed execution — the "piecewise" mode.

Direct TPU-native counterpart of the reference's ``OpticalFlowP3D`` +
``*_p`` op family (SURVEY.md §5.3): when a volume pair does not fit in
device HBM (and a multi-chip mesh is not available), the volumes stay
host-resident and every pipeline phase streams Z-chunks with margin planes
through the device — margins sized per op exactly like the reference's
piecewise chunk margins (1 plane for stencils/median, ceil(max|s|)+1 for
warping, the kernel radius for convolution).

Numerics contract: streamed == in-core (tests/test_piecewise.py). The
phases call the SAME op implementations as the in-core pipeline, under a
window HaloCtx (grid.HaloCtx window mode) that maps slab coordinates to
true volume coordinates for clamping, red-black parity, and Neumann face
masks. Slab-edge margins are computed with replicate padding and cropped,
so only real data lands in the host arrays.

Gauss-Seidel ordering note: a red half-sweep reads only black voxels (and
vice versa), so streaming each HALF-sweep as its own in-place pass over the
host array preserves the exact in-core update order.

Trapezoidal temporal blocking (the solver hot loop): streaming one pass per
half-sweep moves du + all sweep constants over PCIe 2*sweeps times per
inner iteration (~160 B/voxel/sweep). `_stream_sor_trapezoid` instead
visits each chunk ONCE per inner iteration and advances all 2S half-sweeps
on-device with a wavefront: after launch k, the half-sweep-j frontier
stands at F_j(k) = clamp(k*chunk + 2S - j), so each launch advances every
frontier by exactly `chunk` planes and the host du array carries a
2S-plane graded-state band at the frontier. This is EXACT (not an
approximation): a half-sweep only reads opposite-color voxels, and a
plane's state-j vs state-(j+1) difference is confined to the color
half-sweep j+1 updates, so every read sees exactly the in-core value.
Transfer drops to ~(terms + du)/S per sweep — ~10x less PCIe traffic at
sweeps=6 — at the cost of ~(2S+2)/chunk redundant slab planes per visit.

Fully-fused streaming (the default for inner_iterations == 1): the
trapezoid generalizes to the ENTIRE warp iteration. Because a single
nonlinear iteration computes its sweep constants from a zero increment,
terms are a pure function of the slab inputs, and the only cross-launch
state is the trapezoid's graded du frontier band — which stays device-
resident (`_ph_fused_warp_iter` carry). One launch per chunk then performs
warp + derivatives + terms + all 2S half-sweeps + median + accumulate +
clamp, streaming in only (i0, i1, flow) and streaming out the new flow:
~8 floats/voxel/warp-iteration of PCIe traffic instead of ~48, and ZERO
intermediate host arrays (no g/it/terms/du in host RAM — at 1024^3 that
is ~56 GB less host memory than per-phase streaming).

Scale note: this is the single-device overflow path; the first-class way to
scale past one device is the Z-sharded mesh (tpuflow3d.sharding), which
keeps everything resident and exchanges halos over ICI instead of PCIe.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow3d.derivatives import derivatives, grad_constancy_terms
from tpuflow3d.grid import HaloCtx
from tpuflow3d.median import median3
from tpuflow3d.params import FlowParams
from tpuflow3d.pyramid import (gaussian_kernel1d, resize_axis_local,
                               resize_z_window, smooth)
from tpuflow3d.solver import (SolveTerms, compute_terms, jacobi_sweep,
                              parity_mask, sor_halfsweep)
from tpuflow3d.warp import warp_volume

DEFAULT_FLOW_CLAMP = 4.0


def _host_slab(x: np.ndarray, lo: int, size: int) -> np.ndarray:
    """Host window [lo, lo+size) along axis -3 with edge replication."""
    d = x.shape[-3]
    idx = np.clip(np.arange(lo, lo + size), 0, d - 1)
    return np.ascontiguousarray(np.take(x, idx, axis=-3))


def _wctx(z0, dg: int) -> HaloCtx:
    return HaloCtx(window_z0=z0, window_d_global=dg)


# ---- jitted slab phases (static slab shapes; z0 traced) ----

@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_warp_deriv(i0s, i1s, fls, z0, dg: int, p: FlowParams):
    ctx = _wctx(z0, dg)
    i1w = warp_volume(i1s, fls, ctx, max_disp=p.flow_clamp, interp=p.interp)
    g, it = derivatives(i0s, i1w, ctx, order=p.deriv_order)
    return g, it


@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_terms(gs, its, fls, dus, z0, dg: int, p: FlowParams):
    t = compute_terms(gs, its, fls, dus, p, _wctx(z0, dg))
    return t.c, t.w, t.sw_inv, t.smt


def _clamp_global_z(x, z0, dg: int):
    """Remap slab planes outside the global [0, dg) to their clamped
    in-range twins. Slab margins physically hold replicate copies of the
    RAW inputs; a stencil-of-a-stencil (the gradient-constancy second
    derivatives) needs replicate-of-the-DERIVED-field semantics at the
    global faces to match the in-core ctx.zpad convention — first
    derivatives of a replicated plane are ~0, not a copy of the face
    derivative."""
    size = x.shape[-3]
    zg = z0 + jnp.arange(size, dtype=jnp.int32)
    idx = jnp.clip(zg, 0, dg - 1) - z0
    return jnp.take(x, idx, axis=-3)


@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_terms_gc(i0s, i1s, fls, dus, z0, dg: int, p: FlowParams):
    """Sweep constants for the gradient-constancy mode (p.gamma > 0),
    recomputed on-device from the raw slab inputs: warp + derivatives +
    second-derivative constancy terms + compute_terms in one launch.
    Nothing beyond (i0, i1, flow, du) streams in — the 12 second-
    derivative volumes that made r2 reject this mode on the piecewise
    path exist only slab-at-a-time on the device. Returns (c, w, ainv):
    the 3+6+6 volumes the general-SPD sweep consumes (solver._du_star
    ainv branch); costs one redundant warp per inner iteration vs the
    gamma=0 path, which streams precomputed (g, it)."""
    ctx = _wctx(z0, dg)
    i1w = warp_volume(i1s, fls, ctx, max_disp=p.flow_clamp, interp=p.interp)
    g, it = derivatives(i0s, i1w, ctx, order=p.deriv_order)
    gc = grad_constancy_terms(i0s, i1w, ctx, order=p.deriv_order,
                              g=_clamp_global_z(g, z0, dg))
    t = compute_terms(g, it, fls, dus, p, ctx, gc=gc)
    return t.c, t.w, t.ainv


@partial(jax.jit, static_argnames=("dg", "p", "color"))
def _ph_halfsweep(dus, cs, gs, ws, swis, smts, z0, dg: int, p: FlowParams,
                  color: int):
    ctx = _wctx(z0, dg)
    t = SolveTerms(c=cs, g=gs, w=ws, sw_inv=swis, smt=smts)
    parity = parity_mask(dus.shape[1:], ctx)
    return sor_halfsweep(dus, t, p.omega, parity, color, ctx)


def _gc_terms(cs, ws, ainvs) -> SolveTerms:
    """SolveTerms for the streamed gradient-constancy sweeps: the general-
    SPD branch reads only (c, w, ainv)."""
    return SolveTerms(c=cs, g=None, w=ws, sw_inv=None, smt=None, ainv=ainvs)


@partial(jax.jit, static_argnames=("dg", "p", "color"))
def _ph_halfsweep_gc(dus, cs, ws, ainvs, z0, dg: int, p: FlowParams,
                     color: int):
    ctx = _wctx(z0, dg)
    parity = parity_mask(dus.shape[1:], ctx)
    return sor_halfsweep(dus, _gc_terms(cs, ws, ainvs), p.omega, parity,
                         color, ctx)


def _trapezoid_sweeps(dus, t, z0, kbase, dg, p, sweeps, chunk,
                      omega=None):
    """All 2*sweeps half-sweeps of one chunk visit, wavefront-masked.

    Half-sweep j (1-based, color (j-1)&1) updates global planes
    [F_j(k-1), F_j(k)) with F_j(k) = clamp(kbase + 2*sweeps - j, 0, dg),
    kbase = k*chunk. All reads see exactly the in-core state (see module
    docstring); everything else on the slab is passed through unchanged.
    ``omega`` overrides p.omega (the MG smoother passes p.mg_omega)."""
    ctx = _wctx(z0, dg)
    om = p.omega if omega is None else omega
    parity = parity_mask(dus.shape[1:], ctx)
    size = dus.shape[-3]
    zg = z0 + jnp.arange(size, dtype=jnp.int32)

    def body(j, dus):
        hi = jnp.clip(kbase + 2 * sweeps - j, 0, dg)
        # lo = F_j(k-1), the previous launch's frontier. Launch 0 has no
        # predecessor: its frontier is 0 by definition, NOT the virtual
        # -chunk + 2S - j (which is > 0 when 2S > chunk + j and would
        # permanently skip half-sweep j on planes [0, lo)).
        lo = jnp.where(kbase > 0,
                       jnp.clip(kbase - chunk + 2 * sweeps - j, 0, dg), 0)
        du_new = sor_halfsweep(dus, t, om, parity, (j - 1) & 1, ctx)
        m = ((zg >= lo) & (zg < hi)).reshape(1, size, 1, 1)
        return jnp.where(m, du_new, dus)

    return jax.lax.fori_loop(1, 2 * sweeps + 1, body, dus)


@partial(jax.jit, static_argnames=("dg", "p", "sweeps", "chunk"))
def _ph_sor_trapezoid(dus, cs, gs, ws, swis, smts, z0, kbase, dg: int,
                      p: FlowParams, sweeps: int, chunk: int):
    t = SolveTerms(c=cs, g=gs, w=ws, sw_inv=swis, smt=smts)
    return _trapezoid_sweeps(dus, t, z0, kbase, dg, p, sweeps, chunk)


@partial(jax.jit, static_argnames=("dg", "p", "sweeps", "chunk"))
def _ph_sor_trapezoid_gc(dus, cs, ws, ainvs, z0, kbase, dg: int,
                         p: FlowParams, sweeps: int, chunk: int):
    return _trapezoid_sweeps(dus, _gc_terms(cs, ws, ainvs), z0, kbase, dg,
                             p, sweeps, chunk)


# ---- streamed multigrid (solver="multigrid" out-of-core; VERDICT r4
# missing #3). Decomposition: the FINE level's pre/post-smooths run as
# trapezoid wavefront passes and its residual/restriction/prolongation as
# streamed stencil/resample phases; the coarse hierarchy (<= 1/8 the fine
# voxels) is built and V-cycled ENTIRELY in-core on the device. Host
# arrays per inner iteration: (c 3, psi_s 1, d6 6) — weights and the
# symmetric inverse are recomputed per slab visit from psi_s/d6
# (mgsolver.assemble_fine_system), so no w(6)/ainv(6) host arrays exist.

@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_terms_mg(gs, its, fls, dus, z0, dg: int, p: FlowParams):
    """Fine-level MG system constants (c, psi_s, d6) from precomputed
    streamed g/it (the gamma = 0 path)."""
    from tpuflow3d.mgsolver import data_block_d6
    t = compute_terms(gs, its, fls, dus, p, _wctx(z0, dg))
    return t.c, t.psi_s, data_block_d6(t)


@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_terms_mg_gc(i0s, i1s, fls, dus, z0, dg: int, p: FlowParams):
    """Gradient-constancy twin: recompute warp + derivatives + gc terms
    in-phase from the raw slab inputs (exactly _ph_terms_gc's layout) and
    emit the MG constituents (c, psi_s, d6) — t.d6 is the full data
    block here."""
    ctx = _wctx(z0, dg)
    i1w = warp_volume(i1s, fls, ctx, max_disp=p.flow_clamp, interp=p.interp)
    g, it = derivatives(i0s, i1w, ctx, order=p.deriv_order)
    gc = grad_constancy_terms(i0s, i1w, ctx, order=p.deriv_order,
                              g=_clamp_global_z(g, z0, dg))
    t = compute_terms(g, it, fls, dus, p, ctx, gc=gc)
    return t.c, t.psi_s, t.d6


@partial(jax.jit, static_argnames=("dg", "p", "sweeps", "chunk"))
def _ph_mg_trapezoid(dus, cs, pss, d6s, z0, kbase, dg: int, p: FlowParams,
                     sweeps: int, chunk: int):
    """MG smoother chunk visit: rebuild (w, ainv) from the streamed
    (psi_s, d6) in-slab, then the standard wavefront half-sweeps at
    mg_omega. Slab-edge w contamination (window-replicated psi_s) only
    touches the outermost slab plane, which is never inside the update
    window."""
    from tpuflow3d.mgsolver import assemble_fine_system
    ctx = _wctx(z0, dg)
    t, _ = assemble_fine_system(cs, pss, d6s, p, ctx)
    return _trapezoid_sweeps(dus, t, z0, kbase, dg, p, sweeps, chunk,
                             omega=p.mg_omega)


@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_mg_residual(dus, cs, pss, d6s, z0, dg: int, p: FlowParams):
    from tpuflow3d.mgsolver import assemble_fine_system, fine_residual
    ctx = _wctx(z0, dg)
    _, sw = assemble_fine_system(cs, pss, d6s, p, ctx)  # ainv is DCE'd
    return fine_residual(dus, cs, pss, d6s, sw, p, ctx)


@partial(jax.jit, static_argnames=("shapes", "gshape", "p"))
def _ph_coarse_vcycle(rc, psi_c, d6_c, shapes, gshape: tuple,
                      p: FlowParams):
    """The device-resident part of one streamed V-cycle: build the coarse
    chain from the restricted (psi_c, d6_c) (already at shapes[0]) and
    recurse — identical to the in-core _vcycle below level 0. The chain
    build re-executes per call (mg_cycles <= 4 and coarse work is <= 1/7
    of a fine sweep, so the redundancy is bounded)."""
    from tpuflow3d.grid import HaloCtx as _HC
    from tpuflow3d.mgsolver import _vcycle, build_coarse_chain
    ctx = _HC()
    levels = build_coarse_chain(psi_c, d6_c, list(shapes), gshape, p, ctx,
                                inputs_at_first=True)
    ec = jnp.zeros_like(rc)
    return _vcycle(ec, rc, levels, 0, p, ctx)


def _stream_mg_solve(du, c, psi_s, d6, p: FlowParams,
                     chunk: int) -> np.ndarray:
    """p.mg_cycles streamed V-cycles on the frozen fine system (c = rhs),
    early-stopped on the host-computed mean update norm when
    residual_tol > 0 — the same cycle structure as mgsolver.mg_solve:
    fine pre-smooth -> streamed residual -> streamed restriction ->
    in-core coarse V-cycle on device -> streamed prolongation + add ->
    fine post-smooth. With a single-entry MG ladder (tiny pyramid level)
    it degenerates to pre + coarse sweeps, exactly like the in-core
    coarsest-level branch."""
    from tpuflow3d.mgsolver import mg_shapes

    d, h, w = psi_s.shape
    gshape = (d, h, w)
    shapes = mg_shapes(gshape, 1)
    tarr = [c, psi_s, d6]

    def smooth(du, n):
        if n <= 0:
            return du
        ph = partial(_ph_mg_trapezoid, dg=d, p=p, sweeps=n, chunk=chunk)
        return _stream_sor_trapezoid(du, tarr, ph, p, chunk, sweeps=n)

    if len(shapes) > 1:
        # Device-resident coarse system, restricted once per frozen
        # system (psi/d6 do not change across cycles).
        psi_c = jnp.asarray(_stream_resample(psi_s, shapes[1], 0.0, chunk))
        d6_c = jnp.asarray(_stream_resample(d6, shapes[1], 0.0, chunk))
        sh_static = tuple(tuple(s) for s in shapes[1:])

    for _cyc in range(p.mg_cycles):
        # Early stop needs the pre-cycle du to form mean|du_new - du|
        # (the in-core metric). The full host copy costs one 3-channel
        # volume (12.9 GB at 1024^3) only when residual_tol > 0 — the
        # price of an exact stopping-decision match with mg_solve; a
        # chunk-wise accumulation inside the post-smooth drain would
        # avoid it but decide on partially-smoothed planes.
        du_prev = du.copy() if p.residual_tol > 0.0 else None
        if len(shapes) == 1:
            du = smooth(du, p.mg_pre)
            du = smooth(du, p.mg_coarse_sweeps)
        else:
            du = smooth(du, p.mg_pre)
            r = np.empty_like(du)
            _stream(partial(_ph_mg_residual, dg=d, p=p),
                    [du, *tarr], 1, chunk, [r], pipeline=True)
            rc = jnp.asarray(_stream_resample(r, shapes[1], 0.0, chunk))
            r = None
            ec = _ph_coarse_vcycle(rc, psi_c, d6_c, sh_static, gshape, p)
            du += _stream_resample(np.asarray(ec), gshape, 0.0, chunk)
            du = smooth(du, p.mg_post)
        if du_prev is not None:
            delta = float(np.mean(np.abs(du - du_prev)))
            if delta < p.residual_tol:
                break
    return du


@partial(jax.jit, static_argnames=("dg", "p", "sweeps", "chunk"))
def _ph_fused_warp_iter(i0s, i1s, fls, carry, z0, kbase, dg: int,
                        p: FlowParams, sweeps: int, chunk: int):
    """An ENTIRE warp iteration for one chunk visit: warp + derivatives +
    terms + all 2*sweeps half-sweeps + median + accumulate + clamp, with
    one H2D of (i0, i1, flow) and one D2H of the new flow. Requires
    inner_iterations == 1 (the fused-path gate in _solve_level_streamed).

    Why no intermediate state needs streaming: with a single nonlinear
    iteration the increment entering ``compute_terms`` is identically zero,
    so the sweep constants are a pure function of the slab inputs — no
    terms carry. And since du starts at zero, the only cross-launch du
    state is the trapezoid's graded frontier band: ``carry`` holds du
    planes [kbase - 2, kbase + 2S) from the previous launch (2S graded
    planes + 2 finalized planes so the trailing median stencil can read
    final du at kbase-2, kbase-1). Everything else on the slab is pristine
    zero.

    Frontier bookkeeping (same wavefront as _ph_sor_trapezoid): after this
    launch du is final below kbase, so the trailing median+accumulate
    stages cover planes [kbase - chunk - 1, kbase - 1) (their z+1 median
    reads stay in final territory), extended to dg once kbase >= dg where
    the global top face replicates. The host writes exactly that window.

    Slab layout: [kbase - chunk - mw, kbase + 2S + mw) where
    mw = warp margin + derivative radius (>= 2). Terms at the update
    window need image data within mw and flow within 2 — both covered.
    Returns (new flow slab, next carry = du[kbase + chunk - 2,
    kbase + chunk + 2S) at slab index chunk + mw - 2)."""
    from tpuflow3d.backend import pallas_interpret, use_pallas
    from tpuflow3d.median import median3_op

    ctx = _wctx(z0, dg)
    pal = use_pallas(p)
    # Same dispatch rules as pipeline._level_warp_loop: the fused Pallas
    # warp+derivative kernel handles 2-point stencils at bounded clamp;
    # sweeps use the flat Pallas kernel (the packed layout would add a
    # pack/unpack round-trip per chunk visit, a bad trade on a streamed
    # slab that is visited once).
    from tpuflow3d.pallas.warp_grad import (PALLAS_WARP_MAX_CLAMP,
                                            PALLAS_WARP_TRICUBIC_MAX_CLAMP,
                                            warp_grad_pallas)
    gc = None
    _max_clamp = (PALLAS_WARP_TRICUBIC_MAX_CLAMP if p.interp == "tricubic"
                  else PALLAS_WARP_MAX_CLAMP)
    # Cubic VMEM-stack width gate (pipeline.warp_iteration has the same
    # rule with the measurement behind it): wide-W tricubic slabs fall
    # back to the XLA gather rather than overflow scoped VMEM at BY=8.
    _cubic_fits = p.interp != "tricubic" or i1s.shape[-1] <= 512
    if (pal and p.deriv_order == 2 and _cubic_fits
            and 0.0 < p.flow_clamp <= _max_clamp):
        gamma = p.gamma > 0.0
        out = warp_grad_pallas(i1s, fls, i0s, ctx, max_disp=p.flow_clamp,
                               interp=p.interp, emit_warped=gamma,
                               interpret=pallas_interpret())
        if gamma:
            # gc rides the fused streamed kernel via the emitted warped
            # slab (r4); the stencils run on it exactly as the XLA branch
            # below.
            g, it, i1w = out
            gc = grad_constancy_terms(
                i0s, i1w, ctx, order=p.deriv_order,
                g=_clamp_global_z(g, z0, dg))
        else:
            g, it = out
    else:
        i1w = warp_volume(i1s, fls, ctx, max_disp=p.flow_clamp,
                          interp=p.interp)
        g, it = derivatives(i0s, i1w, ctx, order=p.deriv_order)
        if p.gamma > 0.0:
            # Gradient constancy composes with the fused streamed path for
            # free: its second-derivative terms are a pure function of the
            # slab inputs already on-device (stream_margin carries the
            # extra stencil radius), so no additional volumes stream.
            gc = grad_constancy_terms(
                i0s, i1w, ctx, order=p.deriv_order,
                g=_clamp_global_z(g, z0, dg))
    du0 = jnp.zeros_like(fls)
    t = compute_terms(g, it, fls, du0, p, ctx, gc=gc)
    s2 = 2 * sweeps
    size = fls.shape[-3]
    mw = (size - chunk - s2) // 2  # static slab margin (see host driver)
    du = du0.at[:, mw - 2:mw + s2].set(carry)
    zg = z0 + jnp.arange(size, dtype=jnp.int32)

    if pal:
        from tpuflow3d.pallas.sor import sor_halfsweep_pallas
        from tpuflow3d.pallas.sor_gc import sor_halfsweep_gc_pallas
        interp = pallas_interpret()
        plo, phi = ctx.z_halo_planes(t.psi_s)

        def halfsweep(du, color):
            lo, hi = ctx.z_halo_planes(du)
            if p.gamma > 0.0:
                # General-SPD system: the gradient-constancy flat kernel
                # streams the precomputed symmetric inverse.
                return sor_halfsweep_gc_pallas(du, t.c, t.ainv, t.psi_s,
                                               lo, hi, plo, phi,
                                               ctx.z0(size), p.alpha,
                                               p.omega, color, dg,
                                               interpret=interp)
            return sor_halfsweep_pallas(du, t.c, t.g, t.psi_s, t.psi_d,
                                        lo, hi, plo, phi, ctx.z0(size),
                                        p.alpha, p.omega, color, dg,
                                        interpret=interp)
    else:
        parity = parity_mask(du.shape[1:], ctx)

        def halfsweep(du, color):
            return sor_halfsweep(du, t, p.omega, parity, color, ctx)

    def one(du, j, color):
        """Half-sweep j (1-based) with its wavefront frontier mask. color
        is STATIC (the Pallas kernel requires it), so the loop runs per
        full sweep with both colors unrolled."""
        hi = jnp.clip(kbase + s2 - j, 0, dg)
        lo = jnp.where(kbase > 0,
                       jnp.clip(kbase - chunk + s2 - j, 0, dg), 0)
        du_new = halfsweep(du, color)
        m = ((zg >= lo) & (zg < hi)).reshape(1, size, 1, 1)
        return jnp.where(m, du_new, du)

    def body(s, du):
        j = 2 * s + 1
        du = one(du, j, 0)
        return one(du, j + 1, 1)

    du = jax.lax.fori_loop(0, sweeps, body, du)
    new_carry = du[:, chunk + mw - 2:chunk + mw + s2]
    if p.median:
        # Restore the global-face replicate semantics of the in-core
        # median: slab planes outside [0, dg) hold pristine zeros, so
        # gather each plane's clamped-global twin first. Slab-edge
        # contamination is outside the host write window.
        idx = jnp.clip(zg, 0, dg - 1) - z0
        du = median3_op(jnp.take(du, idx, axis=-3), HaloCtx(), p)
    fl_new = fls + du
    if p.flow_clamp > 0:
        fl_new = jnp.clip(fl_new, -p.flow_clamp, p.flow_clamp)
    return fl_new, new_carry


@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_jacobi(dus, cs, gs, ws, swis, smts, z0, dg: int, p: FlowParams):
    ctx = _wctx(z0, dg)
    t = SolveTerms(c=cs, g=gs, w=ws, sw_inv=swis, smt=smts)
    return jacobi_sweep(dus, t, p.jacobi_omega(), ctx)


@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_jacobi_gc(dus, cs, ws, ainvs, z0, dg: int, p: FlowParams):
    return jacobi_sweep(dus, _gc_terms(cs, ws, ainvs), p.jacobi_omega(),
                        _wctx(z0, dg))


@jax.jit
def _ph_median(dus):
    return median3(dus, HaloCtx())


@partial(jax.jit, static_argnames=("sigma",))
def _ph_smooth(xs, sigma: float):
    return smooth(xs, sigma, HaloCtx())


@partial(jax.jit, static_argnames=("sigma", "out_len", "scale", "in_global",
                                   "out_hw"))
def _ph_resample(xs, z0_out, z0_in, sigma: float, out_len: int, scale: float,
                 in_global: int, out_hw: tuple[int, int]):
    if sigma > 0.0:
        xs = smooth(xs, sigma, HaloCtx())
    ys = resize_z_window(xs, out_len, z0_out, z0_in, 0, scale, in_global)
    ys = resize_axis_local(ys, out_hw[0], axis=-2)
    ys = resize_axis_local(ys, out_hw[1], axis=-1)
    return ys


# ---- streaming drivers ----

def _stream_sor_trapezoid(du, terms, phase, p: FlowParams,
                          chunk: int, sweeps: int | None = None
                          ) -> np.ndarray:
    """One chunk pass advancing all 2*sweeps half-sweeps (see module
    docstring; sweeps defaults to p.sweeps — the MG smoother passes
    mg_pre/mg_post). ``terms``: host term arrays streamed alongside du
    (the phase's positional signature); ``phase``: a trapezoid slab jit
    (_ph_sor_trapezoid / _ph_sor_trapezoid_gc / _ph_mg_trapezoid,
    partially applied). Mutates and returns the host ``du``; exact equal
    to 2*sweeps separate streamed half-sweeps."""
    d = du.shape[-3]
    s2 = 2 * (p.sweeps if sweeps is None else sweeps)
    size = chunk + s2 + 2
    n_launch = -(-d // chunk) + 1  # +1 drains the graded frontier band
    for k in range(n_launch):
        lo = (k - 1) * chunk - 1
        slabs = [jnp.asarray(_host_slab(x, lo, size))
                 for x in (du, *terms)]
        res = phase(*slabs, jnp.int32(lo), jnp.int32(k * chunk))
        w0 = max((k - 1) * chunk, 0)       # F_2S(k-1)
        w1 = min(k * chunk + s2, d)        # >= F_1(k)
        if w1 > w0:
            du[:, w0:w1] = np.asarray(res)[:, w0 - lo:w1 - lo]
    return du


def _stream_fused_warp_iteration(i0l, i1l, flow, p: FlowParams, chunk: int,
                                 mw: int) -> np.ndarray:
    """One whole warp iteration as a single streamed pass (see
    _ph_fused_warp_iter): reads (i0, i1, flow) slabs, writes the new flow.
    No g/it/terms/du host arrays exist at all — host RAM per level is just
    the two image volumes plus flow in/out, and PCIe traffic per warp
    iteration drops from ~48 to ~8 floats/voxel.

    Software-pipelined depth 1: JAX dispatch is asynchronous, so launch
    k's D2H drain is deferred until after launch k+1 is enqueued — slab
    prep (host memcpy + H2D) for the next chunk overlaps the device
    compute of the current one. Safe because each launch reads the
    ORIGINAL `flow` and writes only the separate `out`."""
    d, h, w = i0l.shape
    s2 = 2 * p.sweeps
    size = chunk + s2 + 2 * mw
    out = np.empty_like(flow)
    carry = jnp.zeros((3, s2 + 2, h, w), jnp.float32)
    n_launch = -(-d // chunk) + 1  # +1 drains the graded frontier band
    pending = None  # (device flow slab, write window w0:w1, slab origin)

    def drain(pd):
        if pd is not None:
            pf, pw0, pw1, plo = pd
            out[:, pw0:pw1] = np.asarray(pf)[:, pw0 - plo:pw1 - plo]

    for k in range(n_launch):
        kbase = k * chunk
        lo = kbase - chunk - mw
        slabs = [jnp.asarray(_host_slab(x, lo, size))
                 for x in (i0l, i1l, flow)]
        fl_new, carry = _ph_fused_warp_iter(
            *slabs, carry, jnp.int32(lo), jnp.int32(kbase),
            dg=d, p=p, sweeps=p.sweeps, chunk=chunk)
        if p.median:
            w0 = max(kbase - chunk - 1, 0)
            w1 = d if kbase >= d else kbase - 1
        else:
            w0 = max(kbase - chunk, 0)
            w1 = min(kbase, d)
        drain(pending)
        pending = (fl_new, w0, w1, lo) if w1 > w0 else None
    drain(pending)
    return out


def _stream(fn, inputs: list[np.ndarray], margin: int, chunk: int,
            outs: list[np.ndarray], pipeline: bool = False):
    """Apply a slab phase over Z-chunks. fn(*slabs, z0) -> slab outputs of
    the same Z extent; interiors are written into ``outs`` (which may alias
    an input for colored half-sweeps).

    pipeline=True defers chunk k's D2H drain until chunk k+1 is enqueued
    (async dispatch overlap, as in _stream_fused_warp_iteration). ONLY
    legal when no output aliases an input: an in-place phase (SOR du) must
    see chunk k's written planes when slicing chunk k+1's margin, so it
    keeps the synchronous order."""
    if pipeline:
        assert not any(o is x for o in outs for x in inputs), \
            "pipeline=True requires outputs disjoint from inputs"
    d = inputs[0].shape[-3]
    size = chunk + 2 * margin
    pending = None  # (device results, z0, z1)

    def drain(pd):
        if pd is not None:
            res, z0, z1 = pd
            for o, r in zip(outs, res):
                o[..., z0:z1, :, :] = np.asarray(r)[
                    ..., margin:margin + z1 - z0, :, :]

    for z0 in range(0, d, chunk):
        z1 = min(z0 + chunk, d)
        lo = z0 - margin
        slabs = [jnp.asarray(_host_slab(x, lo, size)) for x in inputs]
        res = fn(*slabs, jnp.int32(lo))
        if not isinstance(res, tuple):
            res = (res,)
        if pipeline:
            drain(pending)
            pending = (res, z0, z1)
        else:
            drain((res, z0, z1))
    drain(pending)
    return outs


def _stream_resample(x: np.ndarray, out_shape, sigma: float, chunk: int,
                     ratios=None) -> np.ndarray:
    """Streamed smooth+trilinear resample (pyramid downsample / flow
    upsample). x: (..., Din, H, W) host; out_shape global (Dout, Hout,
    Wout); ratios: per-component scale for flow upsampling."""
    din, h, w = x.shape[-3], x.shape[-2], x.shape[-1]
    dout, hout, wout = out_shape
    scale = din / dout
    r = 0 if sigma <= 0 else (len(gaussian_kernel1d(sigma)) - 1) // 2
    win = int(math.ceil(chunk * scale)) + 2 * r + 4
    out = np.empty((*x.shape[:-3], dout, hout, wout), np.float32)
    pending = None  # (device result, o0, o1); x is never written -> safe

    def drain(pd):
        if pd is not None:
            ys, o0, o1 = pd
            out[..., o0:o1, :, :] = np.asarray(ys)[..., :o1 - o0, :, :]

    for o0 in range(0, dout, chunk):
        o1 = min(o0 + chunk, dout)
        a = int(math.floor((o0 + 0.5) * scale - 0.5)) - 1 - r
        slab = jnp.asarray(_host_slab(x, a, win))
        ys = _ph_resample(slab, jnp.int32(o0), jnp.int32(a), sigma, chunk,
                          scale, din, (hout, wout))
        drain(pending)
        pending = (ys, o0, o1)
    drain(pending)
    if ratios is not None:
        for c, rt in enumerate(ratios):
            out[c] *= np.float32(rt)
    return out


@partial(jax.jit, static_argnames=("dg", "p"))
def _ph_fit(i0s, i1s, fls, z0, dg: int, p: FlowParams):
    ctx = _wctx(z0, dg)
    i1w = warp_volume(i1s, fls, ctx, max_disp=p.flow_clamp, interp=p.interp)
    return jnp.abs(i1w - i0s)


def registration_fit_streamed(i0, i1, flow, p: FlowParams, chunk_z: int):
    """--report-fit for out-of-core runs: |warp(i1, flow) - i0| statistics
    (mean residual, max residual, mean unwarped |i1 - i0|) computed by
    streaming Z-chunks, so the device never holds a full volume (the
    in-core diagnostic needs ~7 full volumes resident — exactly what a
    --piecewise run cannot afford)."""
    if p.flow_clamp <= 0:
        p = p.replace(flow_clamp=DEFAULT_FLOW_CLAMP)
    i0 = np.asarray(i0, np.float32)
    i1 = np.asarray(i1, np.float32)
    flow = np.asarray(flow, np.float32)
    d = i0.shape[-3]
    mw = stream_margin(p)
    size = chunk_z + 2 * mw
    tot = mx = before = 0.0
    for z0 in range(0, d, chunk_z):
        z1 = min(z0 + chunk_z, d)
        lo = z0 - mw
        slabs = [jnp.asarray(_host_slab(x, lo, size))
                 for x in (i0, i1, flow)]
        r = np.asarray(_ph_fit(*slabs, jnp.int32(lo), dg=d, p=p))[
            mw:mw + z1 - z0]
        tot += float(r.sum(dtype=np.float64))
        mx = max(mx, float(r.max()))
        before += float(np.abs(i1[z0:z1] - i0[z0:z1]).sum(dtype=np.float64))
    n = float(i0.size)
    return tot / n, mx, before / n


def stream_margin(p: FlowParams) -> int:
    """Z margin planes a streamed solve chunk carries: warp margin (+1 tap
    for tricubic) + derivative stencil radius (1 for 2-point, 2 for
    5-point; doubled under gradient constancy, whose terms are second
    derivatives of the warped volume). Requires a positive flow_clamp
    (DEFAULT_FLOW_CLAMP is injected by compute_flow_piecewise)."""
    r_terms = (p.deriv_order // 2) * (2 if p.gamma > 0.0 else 1)
    return (int(math.ceil(p.flow_clamp)) + 1
            + (1 if p.interp == "tricubic" else 0) + r_terms)


def _solve_level_streamed(i0l, i1l, flow, p: FlowParams, chunk: int,
                          temporal_block: bool = True, fuse: bool = True):
    d, h, w = i0l.shape
    mw = stream_margin(p)
    if (fuse and temporal_block and p.solver == "sor"
            and p.inner_iterations == 1):
        # Single nonlinear iteration: the whole warp iteration collapses
        # into ONE streamed pass (warp+derivatives+terms+sweeps+median+
        # accumulate fused on-device, du frontier band carried in HBM).
        for _ in range(p.warps):
            flow = _stream_fused_warp_iteration(i0l, i1l, flow, p, chunk, mw)
        return flow
    gamma = p.gamma > 0.0
    mg = p.solver == "multigrid"
    for _ in range(p.warps):
        if not gamma:
            g = np.empty((3, d, h, w), np.float32)
            it = np.empty((d, h, w), np.float32)
            _stream(partial(_ph_warp_deriv, dg=d, p=p), [i0l, i1l, flow],
                    mw, chunk, [g, it], pipeline=True)
        du = np.zeros((3, d, h, w), np.float32)
        for _k in range(p.inner_iterations):
            if mg:
                # Streamed multigrid: stream the MG constituents
                # (c, psi_s, d6 — weights/ainv rebuilt per slab visit),
                # then V-cycle with streamed fine smooths and the
                # device-resident coarse chain (_stream_mg_solve).
                c = np.empty((3, d, h, w), np.float32)
                pss = np.empty((d, h, w), np.float32)
                d6 = np.empty((6, d, h, w), np.float32)
                if gamma:
                    _stream(partial(_ph_terms_mg_gc, dg=d, p=p),
                            [i0l, i1l, flow, du], mw, chunk,
                            [c, pss, d6], pipeline=True)
                else:
                    _stream(partial(_ph_terms_mg, dg=d, p=p),
                            [g, it, flow, du], 2, chunk,
                            [c, pss, d6], pipeline=True)
                du = _stream_mg_solve(du, c, pss, d6, p, chunk)
                c = pss = d6 = None
                continue
            if gamma:
                # Gradient-constancy terms: recompute warp+derivatives
                # inside the terms phase from the raw inputs (no g/it/gc
                # host arrays; _ph_terms_gc docstring) and sweep on the
                # general-SPD (c, w, ainv) system.
                c = np.empty((3, d, h, w), np.float32)
                wgt = np.empty((6, d, h, w), np.float32)
                ainv = np.empty((6, d, h, w), np.float32)
                _stream(partial(_ph_terms_gc, dg=d, p=p),
                        [i0l, i1l, flow, du], mw, chunk, [c, wgt, ainv],
                        pipeline=True)
                tarr = [c, wgt, ainv]
                ph_trap = partial(_ph_sor_trapezoid_gc, dg=d, p=p,
                                  sweeps=p.sweeps, chunk=chunk)
                ph_half = partial(_ph_halfsweep_gc, dg=d, p=p)
                ph_jac = partial(_ph_jacobi_gc, dg=d, p=p)
            else:
                c = np.empty((3, d, h, w), np.float32)
                wgt = np.empty((6, d, h, w), np.float32)
                swi = np.empty((d, h, w), np.float32)
                smt = np.empty((d, h, w), np.float32)
                # Margin 2, not 1: the neighbor weight at an interior
                # plane z reads psi_s[z+-1], which reads flow/du at z+-2.
                # With margin 1 that outermost plane is slab-replicate
                # contaminated and the streamed terms drift ~1e-3 from
                # in-core at chunk seams.
                _stream(partial(_ph_terms, dg=d, p=p), [g, it, flow, du],
                        2, chunk, [c, wgt, swi, smt], pipeline=True)
                tarr = [c, g, wgt, swi, smt]
                ph_trap = partial(_ph_sor_trapezoid, dg=d, p=p,
                                  sweeps=p.sweeps, chunk=chunk)
                ph_half = partial(_ph_halfsweep, dg=d, p=p)
                ph_jac = partial(_ph_jacobi, dg=d, p=p)
            if p.solver == "sor" and temporal_block:
                # Wavefront: one chunk visit advances all 2*sweeps
                # half-sweeps on-device (~sweeps x less host<->device
                # traffic, exact — see module docstring).
                du = _stream_sor_trapezoid(du, tarr, ph_trap, p, chunk)
            elif p.solver == "sor":
                for _s in range(p.sweeps):
                    # One in-place pass per color: red reads only black and
                    # vice versa, so chunk-sequential in-place updates
                    # reproduce the in-core order exactly.
                    for color in (0, 1):
                        _stream(partial(ph_half, color=color),
                                [du, *tarr], 1, chunk, [du])
            else:
                for _s in range(p.sweeps):
                    du_new = np.empty_like(du)
                    _stream(ph_jac, [du, *tarr], 1, chunk, [du_new],
                            pipeline=True)
                    du = du_new
        if p.median:
            du_m = np.empty_like(du)
            _stream(lambda s, z0: _ph_median(s), [du], 1, chunk, [du_m],
                    pipeline=True)
            du = du_m
        flow = flow + du
        if p.flow_clamp > 0:
            np.clip(flow, -p.flow_clamp, p.flow_clamp, out=flow)
    return flow


def compute_flow_piecewise(i0, i1, params: FlowParams = FlowParams(),
                           chunk_z: int = 32,
                           checkpoint_dir: str | None = None,
                           temporal_block: bool = True,
                           fuse: bool = True, timer=None) -> np.ndarray:
    """Dense 3D optical flow for volumes that exceed device memory.

    i0, i1: (D, H, W) host arrays (any dtype). All pipeline state stays in
    host RAM; the device only ever sees (chunk_z + margins) slabs — except
    solver="multigrid", whose coarse hierarchy (<= 1/8 the fine voxels)
    is device-resident (_stream_mg_solve). Returns (3, D, H, W) float32
    host flow. ``timer``: optional utils.profiling.PhaseTimer — records
    presmooth/pyramid/per-level solve and upsample wall times
    (CLI --timings).
    """
    from tpuflow3d.utils.profiling import PhaseTimer

    phase = PhaseTimer.maybe(timer)

    p = params
    if p.flow_clamp <= 0:
        p = p.replace(flow_clamp=DEFAULT_FLOW_CLAMP)
    i0 = np.asarray(i0, np.float32)
    i1 = np.asarray(i1, np.float32)
    d_orig = i0.shape[0]

    zm = p.z_multiple
    d_pad = zm * ((d_orig + zm - 1) // zm)
    if d_pad != d_orig:
        i0 = np.concatenate([i0, np.repeat(i0[-1:], d_pad - d_orig, 0)], 0)
        i1 = np.concatenate([i1, np.repeat(i1[-1:], d_pad - d_orig, 0)], 0)

    if p.normalize:
        from tpuflow3d.utils import native
        mm0 = native.minmax_f32(i0) or (float(i0.min()), float(i0.max()))
        mm1 = native.minmax_f32(i1) or (float(i1.min()), float(i1.max()))
        mn = np.float32(min(mm0[0], mm1[0]))
        mx = np.float32(max(mm0[1], mm1[1]))
        scale = np.float32(1.0) / max(mx - mn, np.float32(1e-12))
        i0 = (i0 - mn) * scale
        i1 = (i1 - mn) * scale

    if p.presmooth_sigma > 0:
        with phase("presmooth"):
            r = (len(gaussian_kernel1d(p.presmooth_sigma)) - 1) // 2
            sm = partial(_ph_smooth, sigma=p.presmooth_sigma)
            i0s = np.empty_like(i0)
            i1s = np.empty_like(i1)
            _stream(lambda s, z0: sm(s), [i0], r, chunk_z, [i0s],
                    pipeline=True)
            _stream(lambda s, z0: sm(s), [i1], r, chunk_z, [i1s],
                    pipeline=True)
            i0, i1 = i0s, i1s

    shapes = p.level_shapes(i0.shape)
    pyr0, pyr1 = [i0], [i1]
    with phase("pyramid"):
        for shp in shapes[1:]:
            pyr0.append(_stream_resample(pyr0[-1], shp, p.aa_sigma(),
                                         chunk_z))
            pyr1.append(_stream_resample(pyr1[-1], shp, p.aa_sigma(),
                                         chunk_z))

    start = len(shapes) - 1
    flow = np.zeros((3, *shapes[-1]), np.float32)
    if checkpoint_dir is not None:
        from tpuflow3d import checkpoint as ckpt
        state = ckpt.load_level_checkpoint(checkpoint_dir)
        if state is not None:
            flow_np, level = state
            if 0 <= level < len(shapes) and \
                    flow_np.shape[1:] == shapes[level]:
                flow, start = flow_np, level

    for li in range(start, -1, -1):
        with phase(f"level{li}_solve"):
            flow = _solve_level_streamed(pyr0[li], pyr1[li], flow, p,
                                         chunk_z,
                                         temporal_block=temporal_block,
                                         fuse=fuse)
        if li > 0:
            with phase(f"level{li}_upsample"):
                in_shape = flow.shape[1:]
                ratios = [shapes[li - 1][a] / in_shape[a]
                          for a in range(3)]
                flow = _stream_resample(flow, shapes[li - 1], 0.0, chunk_z,
                                        ratios=ratios)
                np.clip(flow, -p.flow_clamp, p.flow_clamp, out=flow)
            if checkpoint_dir is not None:
                from tpuflow3d import checkpoint as ckpt
                ckpt.save_level_checkpoint(checkpoint_dir, flow, li - 1, p)
    return flow[:, :d_orig]
