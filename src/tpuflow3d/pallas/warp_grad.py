"""Pallas TPU kernel: fused backward warp + spatiotemporal derivatives.

The "warp+derivative fusion into one Pallas pass" subsystem named in the
north-star spec (BASELINE.json:5): computes the warped moving volume
Ĩ1(x) = I1(x + s(x)) AND the derivative fields (Iz, Iy, Ix, It) in a single
HBM pass, replacing the reference's separate registration + derivative CUDA
kernels (SURVEY.md §5.2 steps a-b).

TPUs have no texture unit and no efficient per-voxel gather, so the gather
is reformulated for the VPU as a bounded-displacement select-interpolate:
with |s| <= clamp (FlowParams.flow_clamp, the same bound that sizes the
piecewise-mode margin in the reference and the Z halo here), the trilinear
sample is an exact sum over (2*ceil(clamp)+2)^3 statically-shifted slabs
weighted by per-voxel one-hot x fractional coefficients — dense vector
work instead of data-dependent addressing. Cost grows as clamp^3, so the
dispatcher uses this kernel for clamp <= PALLAS_WARP_MAX_CLAMP and falls
back to the XLA gather path above it.

Blocks need margin planes beyond BlockSpec granularity (overlapping
windows), so inputs stay in HBM (memory_space=ANY) and each grid step DMAs
its slab + margins into VMEM scratch explicitly. Z margins come from
pre-padded inputs whose pad planes the caller fills via HaloCtx.zpad
(replicate locally, collective-permute across shards).

Oracle: warp.warp_volume + derivatives.derivatives (bit-tolerance tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow3d.grid import HaloCtx

# Measured crossover vs the XLA gather path: the (2*ceil(c)+2)^3 term count
# makes the select-interpolate win decisively at ceil(clamp) <= 2 (216
# terms, 4.4x faster) and lose beyond it (512+ terms), so dispatch caps at
# clamp 2.
PALLAS_WARP_MAX_CLAMP = 2.0

# Tricubic variant: (2*ceil(c)+4)^3 statically-shifted slabs weighted by
# the Catmull-Rom kernel W(u-d) (support (-2,2), so 2mc+4 taps per axis
# cover every u in [-mc, mc+1]). 512 terms at clamp 2 — ~2.4x the
# trilinear term count, but the XLA alternative here is the 64-tap
# *dynamic-gather* tricubic (warp.py:95-174), which streams coordinate
# temps through HBM; the VPU select-interpolate stays one HBM pass.
PALLAS_WARP_TRICUBIC_MAX_CLAMP = 2.0


def _pick_by(h: int, w: int, cubic: bool = False) -> int:
    # ~40 extended-block temps live in the unrolled gather body: cap the
    # y-block so they fit scoped VMEM at any width. The cubic variant
    # keeps ~2x more live coefficient fields (2mc+4 per axis vs 2mc+2),
    # and at (BY=32, W=256) its VMEM stack measured 16.97M vs the 16M
    # scoped limit — halve the cap (the 256^3 gate config's shape).
    if cubic:
        cap = 16 if w <= 256 else 8
    else:
        cap = 32 if w <= 256 else (16 if w <= 768 else 8)
    cands = [b for b in range(8, h + 1, 8) if h % b == 0 and b <= cap]
    if cands:
        return max(cands)
    if h < 8:
        return h
    # H has no multiple-of-8 divisor <= cap (eta=0.7 ladders hit H=180, 89):
    # BY must still be a multiple of 8 — the manual DMA windows start at
    # j*BY on the sublane dim and Mosaic requires provably-8-aligned
    # offsets — so use a cdiv grid with a partial last block (the kernel
    # patches the face row, see _kernel's partial-face fix).
    return cap


def _pick_bz(d: int) -> int:
    # Small Z blocks: the unrolled (2mc+2)^2 y/x gather terms live in VMEM
    # per z-loop iteration, so block volume must stay modest.
    best = 1
    for cand in range(1, min(d, 2) + 1):
        if d % cand == 0:
            best = cand
    return best


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(z0_ref, i1p_ref, flp_ref, i0p_ref, out_ref, i1s, fls, i0s, sems,
            *, bz: int, by: int, w: int, mc: int, dg: int, h: int,
            nzb: int, nyb: int, z_sharded: bool, cubic: bool,
            emit_warped: bool):
    k = pl.program_id(0)
    j = pl.program_id(1)
    # i1 slab margin: deriv(1) + displacement(mc) + interp support (1
    # trilinear cell / 2 cubic outer tap).
    p = mc + 3 if cubic else mc + 2

    # DMA windows start at j*by (8-row aligned) in the y-padded arrays and
    # span the scratch's (8/128-aligned, slack-padded) extent; see
    # _warp_grad_call for the padding layout.
    cp1 = pltpu.make_async_copy(
        i1p_ref.at[pl.ds(k * bz, i1s.shape[0]),
                   pl.ds(j * by, i1s.shape[1]), :],
        i1s, sems.at[0])
    cp2 = pltpu.make_async_copy(
        flp_ref.at[:, pl.ds(k * bz, fls.shape[1]),
                   pl.ds(j * by, fls.shape[2]), :],
        fls, sems.at[1])
    cp3 = pltpu.make_async_copy(
        i0p_ref.at[pl.ds(k * bz, i0s.shape[0]),
                   pl.ds(j * by, i0s.shape[1]), :],
        i0s, sems.at[2])
    cp1.start()
    cp2.start()
    cp3.start()
    cp1.wait()
    cp2.wait()
    cp3.wait()

    eshape = (bz + 2, by + 2, w + 2)
    fz32 = jnp.float32
    fl = fls[:, :, 0:by + 2, 0:w + 2]       # trim alignment slack
    i0sv = i0s[0:bz + 2, 0:by + 2, 0:w + 2]
    z0 = z0_ref[0].astype(fz32)
    # Local (shard-frame) coordinates of extended voxels.
    lz = jax.lax.broadcasted_iota(jnp.int32, eshape, 0).astype(fz32) \
        + (k * bz - 1)
    ly = jax.lax.broadcasted_iota(jnp.int32, eshape, 1).astype(fz32) \
        + (j * by - 1)
    lx = jax.lax.broadcasted_iota(jnp.int32, eshape, 2).astype(fz32) - 1.0

    d_local = nzb * bz
    # Clamp sample coords to the GLOBAL volume (z in the shard frame).
    tz = jnp.clip(lz + fl[0], 0.0 - z0, (dg - 1) - z0)
    ty = jnp.clip(ly + fl[1], 0.0, h - 1)
    tx = jnp.clip(lx + fl[2], 0.0, w - 1)

    # Continuous slab-relative sample offsets, u = i + f in [-mc, mc+1].
    # The per-term select coefficient (1-f)*(i==d) + f*(i==d-1) is exactly
    # the tent max(0, 1 - |u - d|), so the 2mc+2 coefficient fields per
    # axis are PRECOMPUTED once (3 ops each) instead of being rebuilt with
    # compares+selects inside the (2mc+2)^2-term loop body: per term the
    # gather drops from ~8 VPU ops (2 cmp + 2 mul + 1 add coefficient
    # rebuild, then 2 mul + 1 add accumulate) to the 3-op accumulate —
    # a ~2.4x static op-count cut. (Not wall-clock-verifiable here: the
    # emulated device's kernel timings are load-regime-dependent.)
    uz = tz - lz
    uy = ty - ly
    ux = tx - lx

    def tent(u, dv):
        return jnp.maximum(0.0, 1.0 - jnp.abs(u - dv))

    def catrom(u, dv):
        # Catmull-Rom kernel W(t), t = u - dv: the per-tap weight of the
        # separable tricubic (matches warp._cubic_weights exactly — W(f+1),
        # W(f), W(f-1), W(f-2) are that function's four polynomials).
        t = jnp.abs(u - dv)
        w1 = (1.5 * t - 2.5) * t * t + 1.0            # t <= 1
        w2 = ((-0.5 * t + 2.5) * t - 4.0) * t + 2.0   # 1 < t < 2
        return jnp.where(t <= 1.0, w1,
                         jnp.where(t < 2.0, w2, 0.0))

    coeff = catrom if cubic else tent
    offs = (list(range(-mc - 1, mc + 3)) if cubic
            else list(range(-mc, mc + 2)))
    cys = [coeff(uy, float(dy)) for dy in offs]
    cxs = [coeff(ux, float(dx)) for dx in offs]

    # Accumulate the select-interpolate as a loop over dz (a rolled loop so
    # Mosaic reuses VMEM temporaries — a fully unrolled (2mc+2)^3 body
    # overflows scoped VMEM) with the y/x offsets unrolled statically:
    # Mosaic only supports *dynamic* offsets on the major (non-tiled) dim,
    # while static unaligned sublane/lane slices are legal.
    nterms = len(offs)
    off0 = offs[0]

    def z_body(dzi, acc):
        dz = dzi + off0
        cz = coeff(uz, dz.astype(fz32))
        slab_z = i1s[pl.ds(p - 1 + dz, bz + 2)]  # (bz+2, SY1, LX1)
        for yi, dy in enumerate(offs):
            czy = cz * cys[yi]
            y_lo = p - 1 + dy
            for xi, dx in enumerate(offs):
                x_lo = p - 1 + dx
                sl = slab_z[:, y_lo:y_lo + by + 2, x_lo:x_lo + w + 2]
                acc = acc + czy * (cxs[xi] * sl)
        return acc

    acc = jax.lax.fori_loop(0, nterms, z_body, jnp.zeros(eshape, fz32))

    # Neumann faces: replace virtual layers outside the GLOBAL volume with
    # their adjacent interior layer (== the XLA path's replicate-pad of the
    # warped volume before differencing).
    at_z_lo = (k == 0) if not z_sharded else jnp.logical_and(
        k == 0, z0 == 0.0)
    at_z_hi = (k == nzb - 1) if not z_sharded else jnp.logical_and(
        k == nzb - 1, z0 + d_local == dg)
    l0 = jnp.where(at_z_lo, acc[1:2], acc[0:1])
    ln = jnp.where(at_z_hi, acc[-2:-1], acc[-1:])
    acc = jnp.concatenate([l0, acc[1:-1], ln], axis=0)
    r0 = jnp.where(j == 0, acc[:, 1:2], acc[:, 0:1])
    rn = jnp.where(j == nyb - 1, acc[:, -2:-1], acc[:, -1:])
    acc = jnp.concatenate([r0, acc[:, 1:-1], rn], axis=1)
    if h % by != 0:
        # Partial last y-block (BY chosen as a multiple of 8 when H has no
        # such divisor): the TRUE y face sits at global row h-1, inside the
        # last block rather than at its top edge. Replace the extended row
        # just above the face with the face row's value so gy at h-1
        # becomes the oracle's replicate-pad Neumann derivative
        # 0.5*(ibar[h-1] - ibar[h-2]); rows >= h of the output block are
        # discarded by Mosaic. Static index: e = ext index of the face row.
        e = h - (nyb - 1) * by  # = (h-1) - (nyb-1)*by + 1
        fix = jnp.where(j == nyb - 1, acc[:, e:e + 1], acc[:, e + 1:e + 2])
        acc = jnp.concatenate([acc[:, :e + 1], fix, acc[:, e + 2:]], axis=1)
    acc = jnp.concatenate([acc[:, :, 1:2], acc[:, :, 1:-1], acc[:, :, -2:-1]],
                          axis=2)

    ibar = 0.5 * (i0sv + acc)
    gz = 0.5 * (ibar[2:, 1:-1, 1:-1] - ibar[:-2, 1:-1, 1:-1])
    gy = 0.5 * (ibar[1:-1, 2:, 1:-1] - ibar[1:-1, :-2, 1:-1])
    gx = 0.5 * (ibar[1:-1, 1:-1, 2:] - ibar[1:-1, 1:-1, :-2])
    it = acc[1:-1, 1:-1, 1:-1] - i0sv[1:-1, 1:-1, 1:-1]
    outs = [gz, gy, gx, it]
    if emit_warped:
        # The warped volume itself (gradient-constancy mode consumes it
        # for the second-derivative terms): +4 B/voxel of output, saving
        # the separate XLA gather pass.
        outs.append(acc[1:-1, 1:-1, 1:-1])
    out_ref[:] = jnp.stack(outs)


def _rep_pad(x, lo: int, hi: int, axis: int):
    """Asymmetric edge-replicate pad (hi side carries alignment slack)."""
    parts = []
    if lo:
        parts.append(jnp.take(x, jnp.zeros(lo, jnp.int32), axis=axis))
    parts.append(x)
    if hi:
        parts.append(jnp.take(x, jnp.full(hi, x.shape[axis] - 1, jnp.int32),
                              axis=axis))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


@functools.partial(jax.jit,
                   static_argnames=("dims", "mc", "d_global", "z_sharded",
                                    "cubic", "emit_warped", "interpret"))
def _warp_grad_call(i1p, flp, i0p, z0, dims, mc: int, d_global: int,
                    z_sharded: bool, cubic: bool, emit_warped: bool,
                    interpret: bool):
    d, h, w, bz, by = dims
    p = mc + 3 if cubic else mc + 2
    nzb, nyb = d // bz, pl.cdiv(h, by)
    sy1 = _round_up(by + 2 * p, 8)
    sys_ = _round_up(by + 2, 8)
    nout = 5 if emit_warped else 4

    kernel = functools.partial(
        _kernel, bz=bz, by=by, w=w, mc=mc, dg=d_global, h=h, nzb=nzb,
        nyb=nyb, z_sharded=z_sharded, cubic=cubic,
        emit_warped=emit_warped)
    out = pl.pallas_call(
        kernel,
        grid=(nzb, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # z0
            pl.BlockSpec(memory_space=pl.ANY),    # i1 padded (DMA'd)
            pl.BlockSpec(memory_space=pl.ANY),    # flow padded
            pl.BlockSpec(memory_space=pl.ANY),    # i0 padded
        ],
        out_specs=pl.BlockSpec((nout, bz, by, w), lambda k, j: (0, k, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nout, d, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * p, sy1, i1p.shape[-1]), jnp.float32),
            pltpu.VMEM((3, bz + 2, sys_, flp.shape[-1]), jnp.float32),
            pltpu.VMEM((bz + 2, sys_, i0p.shape[-1]), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(jnp.asarray(z0, jnp.int32).reshape(1), i1p, flp, i0p)
    if emit_warped:
        return out[0:3], out[3], out[4]
    return out[0:3], out[3]


def warp_grad_pallas(i1, flow, i0, ctx: HaloCtx = HaloCtx(),
                     max_disp: float = 2.0, interp: str = "trilinear",
                     emit_warped: bool = False, interpret: bool = False):
    """Fused warp + derivatives. i1/i0 (D,H,W) local slabs, flow (3,D,H,W)
    with |components| <= max_disp. Returns (g (3,D,H,W), it (D,H,W)), plus
    the warped volume i1w (D,H,W) when ``emit_warped`` (the
    gradient-constancy mode consumes it — one extra output channel
    instead of a separate gather pass).
    ``interp``: 'trilinear' (tent select-interpolate) or 'tricubic'
    (Catmull-Rom select-interpolate — the accuracy-gate config's sampler).

    Padding layout (DMA tiling alignment): each array is edge-replicate
    padded with its logical margin on the lo side of y/x and with margin +
    alignment slack on the hi side, so every DMA window starts at an
    8-row-aligned offset and spans an (8, 128)-aligned extent.
    """
    d, h, w = i1.shape
    cubic = interp == "tricubic"
    if cubic and w > 512:
        # Measured scoped-VMEM budget (VALIDATION.md): at BY=8 the cubic
        # kernel's coefficient/slab stack still overflows Mosaic's 16M
        # scoped VMEM beyond W=512. Enforced HERE so every entry point
        # (not just pipeline/piecewise, which pre-check) fails loudly
        # instead of dying inside Mosaic allocation.
        raise ValueError(
            f"tricubic fused warp kernel supports W <= 512 (got W={w}): "
            "its VMEM stack exceeds the scoped budget at any BY; use the "
            "XLA gather sampler (warp.warp_volume interp='tricubic') for "
            "wider volumes, as pipeline/piecewise auto-dispatch does")
    mc = max(1, int(math.ceil(max_disp)))
    p = mc + 3 if cubic else mc + 2
    bz = _pick_bz(d)
    by = _pick_by(h, w, cubic)
    nyb = -(-h // by)  # cdiv: partial last block when H % BY != 0
    sy1 = _round_up(by + 2 * p, 8)
    sys_ = _round_up(by + 2, 8)

    def prep(x, zpad_n, m, sy):
        xp = ctx.zpad(x, zpad_n)
        ly_hi = (nyb - 1) * by + sy - (h + m)  # slack so the last window fits
        xp = _rep_pad(xp, m, ly_hi, -2)
        lx = _round_up(w + 2 * m, 128)
        xp = _rep_pad(xp, m, lx - w - m, -1)
        return xp

    i1p = prep(i1, p, p, sy1)
    flp = prep(flow, 1, 1, sys_)
    i0p = prep(i0, 1, 1, sys_)
    return _warp_grad_call(i1p, flp, i0p, ctx.z0(d),
                           (d, h, w, bz, by), mc, ctx.d_global(d),
                           ctx.n_shards > 1, cubic, emit_warped, interpret)
