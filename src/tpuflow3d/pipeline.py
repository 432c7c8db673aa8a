"""Coarse-to-fine flow driver (the "entire-data" path).

TPU-native equivalent of the reference's ``OpticalFlowE3D::ComputeFlow``
(SURVEY.md §5.2): presmooth -> build pyramids -> per level (coarse to fine):
warp -> derivatives -> nonlinear/SOR inner solve -> median -> accumulate ->
upsample. Instead of an op-object sequence with per-op kernel launches, the
entire run is ONE jitted function: per-level loops are ``lax.fori_loop``s,
shapes are static per level, and XLA sees the whole loop nest (SURVEY.md §9
design stance). The same implementation runs Z-sharded when given a sharded
HaloCtx (see tpuflow3d.sharding).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax

from tpuflow3d.derivatives import derivatives
from tpuflow3d.grid import HaloCtx
from tpuflow3d.median import median3_op
from tpuflow3d.params import FlowParams
from tpuflow3d.pyramid import build_pyramid, smooth, upsample_flow
from tpuflow3d.solver import parity_mask, solve_increment
from tpuflow3d.warp import warp_volume


def normalize_pair(i0, i1, ctx: HaloCtx):
    """Jointly rescale both volumes to [0, 1] (global min/max across
    shards), so alpha/epsilon are intensity-scale invariant."""
    mn = ctx.pmin(jnp.minimum(jnp.min(i0), jnp.min(i1)))
    mx = ctx.pmax(jnp.maximum(jnp.max(i0), jnp.max(i1)))
    scale = 1.0 / jnp.maximum(mx - mn, jnp.asarray(1e-12, i0.dtype))
    return (i0 - mn) * scale, (i1 - mn) * scale


def _use_fused_warp(p: FlowParams) -> bool:
    from tpuflow3d.backend import use_pallas
    from tpuflow3d.pallas.warp_grad import (PALLAS_WARP_MAX_CLAMP,
                                            PALLAS_WARP_TRICUBIC_MAX_CLAMP)
    # The fused kernel computes 2-point derivatives in-VMEM and samples
    # trilinearly (tent select-interpolate) or tricubically (Catmull-Rom
    # select-interpolate — serves the accuracy-gate config); 4th-order
    # stencils take the XLA warp + derivative path. Gradient constancy
    # (gamma > 0) rides the fused kernel too: it emits the warped volume
    # as a 5th output channel (r4) and the gc stencils run on it in XLA.
    max_clamp = (PALLAS_WARP_TRICUBIC_MAX_CLAMP if p.interp == "tricubic"
                 else PALLAS_WARP_MAX_CLAMP)
    return (use_pallas(p) and p.deriv_order == 2
            and 0.0 < p.flow_clamp <= max_clamp)


def warp_iteration(i0l, i1l, flow, p: FlowParams, ctx: HaloCtx, parity,
                   slot=None):
    """ONE warp iteration: warp -> derivatives -> inner solve -> median ->
    accumulate -> clamp. Returns (flow, residual slot or None)."""
    from tpuflow3d.backend import pallas_interpret
    from tpuflow3d.pallas.warp_grad import warp_grad_pallas
    gc = None
    # Cubic VMEM-stack width gate: at BY=8 (the floor — DMA windows need
    # 8-row alignment) the cubic variant's extended-block temps grow
    # linearly with W, and the measured scoped-VMEM overflow point
    # ((BY=32, W=256) at 16.97M vs the 16M limit) puts W > 512 at BY=8
    # past the budget. Wide-W tricubic levels fall back to the XLA
    # gather (correct, slower) instead of failing Mosaic allocation.
    cubic_fits = p.interp != "tricubic" or i0l.shape[-1] <= 512
    if _use_fused_warp(p) and cubic_fits:
        gamma = p.gamma > 0.0
        out = warp_grad_pallas(i1l, flow, i0l, ctx,
                               max_disp=p.flow_clamp, interp=p.interp,
                               emit_warped=gamma,
                               interpret=pallas_interpret())
        if gamma:
            from tpuflow3d.derivatives import grad_constancy_terms
            g, it, i1w = out
            gc = grad_constancy_terms(i0l, i1w, ctx,
                                      order=p.deriv_order, g=g)
        else:
            g, it = out
    else:
        i1w = warp_volume(i1l, flow, ctx, max_disp=p.flow_clamp,
                          interp=p.interp)
        g, it = derivatives(i0l, i1w, ctx, order=p.deriv_order)
        if p.gamma > 0.0:
            from tpuflow3d.derivatives import grad_constancy_terms
            gc = grad_constancy_terms(i0l, i1w, ctx,
                                      order=p.deriv_order, g=g)
    du, slot_out = solve_increment(g, it, flow, p, ctx, parity, slot,
                                   gc=gc)
    if p.median:
        du = median3_op(du, ctx, p)
    flow = flow + du
    if p.flow_clamp > 0.0:
        flow = jnp.clip(flow, -p.flow_clamp, p.flow_clamp)
    return flow, slot_out


def solve_level(i0l, i1l, flow, p: FlowParams, ctx: HaloCtx,
                residuals_level=None):
    """All warp iterations at one pyramid level (static local shapes)."""
    parity = parity_mask(i0l.shape, ctx)
    track = residuals_level is not None

    def warp_body(wi, carry):
        flow, res = carry
        slot = res[wi] if track else None
        flow, slot_out = warp_iteration(i0l, i1l, flow, p, ctx, parity,
                                        slot)
        if track:
            res = res.at[wi].set(slot_out)
        return (flow, res)

    res0 = residuals_level if track else jnp.zeros((), i0l.dtype)
    flow, res = lax.fori_loop(0, p.warps, warp_body, (flow, res0))
    return (flow, res) if track else (flow, None)


def prepare_pyramids(i0, i1, p: FlowParams, ctx: HaloCtx):
    """Normalize + presmooth + build both pyramids (fine -> coarse)."""
    dtype = jnp.dtype(p.dtype)
    i0 = i0.astype(dtype)
    i1 = i1.astype(dtype)
    if p.normalize:
        i0, i1 = normalize_pair(i0, i1, ctx)
    if p.presmooth_sigma > 0.0:
        i0 = smooth(i0, p.presmooth_sigma, ctx)
        i1 = smooth(i1, p.presmooth_sigma, ctx)

    gshape = (ctx.d_global(i0.shape[-3]), i0.shape[-2], i0.shape[-1])
    shapes = p.level_shapes(gshape)
    assert shapes[0] == gshape, (shapes[0], gshape)
    pyr0 = build_pyramid(i0, shapes, p, ctx)
    pyr1 = build_pyramid(i1, shapes, p, ctx)
    return pyr0, pyr1, shapes


def compute_flow_impl(i0, i1, p: FlowParams, ctx: HaloCtx,
                      diagnostics: bool = False):
    """Local-slab implementation; i0/i1 are (D_local, H, W). The global Z
    extent is D_local * ctx.n_shards; level shapes are global."""
    pyr0, pyr1, shapes = prepare_pyramids(i0, i1, p, ctx)
    dtype = jnp.dtype(p.dtype)

    n_levels = len(shapes)
    track = diagnostics and p.track_residuals
    residuals = (jnp.zeros((n_levels, p.warps, p.inner_iterations * p.sweeps),
                           dtype) if track else None)

    coarsest = pyr0[-1].shape
    flow = jnp.zeros((3, *coarsest), dtype)
    for li in range(n_levels - 1, -1, -1):
        res_level = residuals[li] if track else None
        flow, res_level = solve_level(pyr0[li], pyr1[li], flow, p, ctx,
                                      res_level)
        if track:
            residuals = residuals.at[li].set(res_level)
        if li > 0:
            flow = upsample_flow(flow, shapes[li - 1], ctx)
            if p.flow_clamp > 0.0:
                flow = jnp.clip(flow, -p.flow_clamp, p.flow_clamp)

    if diagnostics:
        diag = {"residuals": residuals} if track else {}
        return flow, diag
    return flow


@partial(jax.jit, static_argnames=("params", "diagnostics"))
def _compute_flow_jit(i0, i1, params: FlowParams, diagnostics: bool):
    d = i0.shape[-3]
    zm = params.z_multiple
    d_pad = zm * ((d + zm - 1) // zm)
    if d_pad != d:
        rep = jnp.repeat(i0[-1:], d_pad - d, axis=0)
        i0 = jnp.concatenate([i0, rep], axis=0)
        i1 = jnp.concatenate([i1, jnp.repeat(i1[-1:], d_pad - d, axis=0)],
                             axis=0)
    out = compute_flow_impl(i0, i1, params, HaloCtx(), diagnostics)
    flow = out[0] if diagnostics else out
    flow = flow[:, :d]
    return (flow, out[1]) if diagnostics else flow


@lru_cache(maxsize=16)
def _prep_fn_cached(params: FlowParams):
    """Jitted pyramid build, memoized on params so repeated checkpointed/
    timed solves (every pair of a --frames series) reuse one jit wrapper —
    and therefore one compiled executable per input shape — instead of
    re-tracing per call."""
    return jax.jit(
        lambda a, b: prepare_pyramids(a, b, params, HaloCtx())[:2])


@lru_cache(maxsize=128)
def _warp_fn_cached(params: FlowParams, gshape: tuple, li: int):
    """ONE warp iteration at one pyramid level as its own jit. Used by
    warp_stepped mode (compute_flow_checkpointed): each device dispatch is
    a single warp's work, which keeps per-program device time bounded —
    the emulated chip kills programs that run too long (the 256^3
    tricubic-at-warps>=8 fault, VALIDATION.md), and on real hardware it
    gives warp-granular host visibility at the cost of dispatch overhead."""
    ctx = HaloCtx()

    def fn(i0l, i1l, fl):
        parity = parity_mask(i0l.shape, ctx)
        fl, _ = warp_iteration(i0l, i1l, fl, params, ctx, parity)
        return fl

    return jax.jit(fn)


@lru_cache(maxsize=128)
def _upsample_fn_cached(params: FlowParams, gshape: tuple, li: int):
    """Flow upsample to the next-finer level as its own jit (warp_stepped
    mode splits _level_fn_cached into per-warp steps + this)."""
    shapes = params.level_shapes(gshape)
    ctx = HaloCtx()

    def fn(fl):
        fl = upsample_flow(fl, shapes[li - 1], ctx)
        if params.flow_clamp > 0.0:
            fl = jnp.clip(fl, -params.flow_clamp, params.flow_clamp)
        return fl

    return jax.jit(fn)


@lru_cache(maxsize=128)
def _level_fn_cached(params: FlowParams, gshape: tuple, li: int):
    """One pyramid level (solve + upsample-to-next + clamp) as a jit,
    memoized per (params, global shape, level) — a fresh closure per call
    would retrace and recompile an identical program for every pair of a
    4D series (sharding._sharded_level_fn is the sharded twin)."""
    shapes = params.level_shapes(gshape)
    ctx = HaloCtx()

    def fn(i0l, i1l, fl):
        fl, _ = solve_level(i0l, i1l, fl, params, ctx)
        if li > 0:
            fl = upsample_flow(fl, shapes[li - 1], ctx)
            if params.flow_clamp > 0.0:
                fl = jnp.clip(fl, -params.flow_clamp, params.flow_clamp)
        return fl

    return jax.jit(fn)


def compute_flow_checkpointed(i0, i1, params: FlowParams = FlowParams(),
                              checkpoint_dir: str | None = None,
                              timer=None, warp_stepped: bool = False):
    """compute_flow with per-level checkpoint/resume (SURVEY.md §7
    "Checkpoint / resume"): the accumulated flow — the only live state — is
    saved at every pyramid-level boundary, and an interrupted run re-enters
    the level loop where it stopped. Levels execute as separate jit steps
    (host sync between levels) instead of one fused jit, which is the cost
    of resumability.

    ``timer``: optional utils.profiling.PhaseTimer — records pyramid-build
    and per-level wall times (the analog of the reference's per-op timing
    prints, SURVEY.md §7 "Tracing / profiling"); also usable without a
    checkpoint_dir purely for level-stepped timing."""
    from tpuflow3d import checkpoint as ckpt
    from tpuflow3d.utils.profiling import PhaseTimer

    p = params
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)
    d = i0.shape[-3]
    zm = p.z_multiple
    d_pad = zm * ((d + zm - 1) // zm)
    if d_pad != d:
        i0 = jnp.concatenate([i0, jnp.repeat(i0[-1:], d_pad - d, 0)], 0)
        i1 = jnp.concatenate([i1, jnp.repeat(i1[-1:], d_pad - d, 0)], 0)

    phase = PhaseTimer.maybe(timer)

    shapes = p.level_shapes(tuple(i0.shape))
    prep = _prep_fn_cached(p)
    with phase("pyramids"):
        pyr0, pyr1 = jax.block_until_ready(prep(i0, i1)) \
            if timer is not None else prep(i0, i1)
    n_levels = len(shapes)
    dtype = jnp.dtype(p.dtype)

    start = n_levels - 1
    flow = jnp.zeros((3, *shapes[-1]), dtype)
    if checkpoint_dir is not None:
        state = ckpt.load_level_checkpoint(checkpoint_dir)
        if state is not None:
            flow_np, level = state
            if 0 <= level < n_levels and flow_np.shape[1:] == shapes[level]:
                flow = jnp.asarray(flow_np)
                start = level

    gshape = tuple(i0.shape)
    for li in range(start, -1, -1):
        with phase(f"level{li} {shapes[li]}"):
            if warp_stepped:
                # Each warp iteration is its own device program (bounded
                # per-dispatch device time; see _warp_fn_cached).
                wf = _warp_fn_cached(p, gshape, li)
                for _ in range(p.warps):
                    flow = wf(pyr0[li], pyr1[li], flow)
                    flow.block_until_ready()
                if li > 0:
                    flow = _upsample_fn_cached(p, gshape, li)(flow)
            else:
                flow = _level_fn_cached(p, gshape, li)(pyr0[li], pyr1[li],
                                                       flow)
            if timer is not None:
                flow.block_until_ready()
        if checkpoint_dir is not None and li > 0:
            flow.block_until_ready()
            # Saved state is "ready to solve level li-1".
            with phase(f"checkpoint L{li - 1}"):
                ckpt.save_level_checkpoint(checkpoint_dir, flow, li - 1, p)
    return flow[:, :d]


def compute_flow(i0, i1, params: FlowParams = FlowParams(),
                 diagnostics: bool = False):
    """Compute dense 3D optical flow s with I1(x + s(x)) ~= I0(x).

    i0, i1: (D, H, W) volumes (any float/int dtype). Returns (3, D, H, W)
    flow (displacements along z, y, x in voxels), plus a diagnostics dict
    when requested (per-sweep residual curves if params.track_residuals).
    """
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)
    if i0.shape != i1.shape or i0.ndim != 3:
        raise ValueError(f"expected two equal-shape 3D volumes, got "
                         f"{i0.shape} vs {i1.shape}")
    return _compute_flow_jit(i0, i1, params, diagnostics)
